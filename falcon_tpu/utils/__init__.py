from . import natsort  # noqa: F401
