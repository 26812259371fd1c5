from . import binaryops  # noqa: F401
