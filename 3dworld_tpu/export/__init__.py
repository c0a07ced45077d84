"""Export: heightmap images, mesh export, state artifacts."""
from . import heightmap_io  # noqa: F401
