from . import io, losses, metrics, schedules  # noqa: F401
