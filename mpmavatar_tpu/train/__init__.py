from . import appearance, demo, evaluate, material  # noqa: F401
