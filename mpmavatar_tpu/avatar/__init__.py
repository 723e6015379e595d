from . import lbs  # noqa: F401
from .smplx import (SMPLXModel, SMPLXOutput, load_smplx_npz,  # noqa: F401
                    make_test_rig, smplx_forward)
