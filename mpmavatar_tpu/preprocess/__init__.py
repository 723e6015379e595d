from .garment_split import save_split, split_cloth_human  # noqa: F401
from .lbs_inpainting import transfer_and_inpaint  # noqa: F401
