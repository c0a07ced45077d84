"""Multi-device scale-out: mesh helpers + ICI halo exchange."""
from . import mesh  # noqa: F401
from . import halo  # noqa: F401
