"""Export: heightmap images, mesh export, state artifacts."""
from . import heightmap_io  # noqa: F401
from . import textures  # noqa: F401
from . import map_view  # noqa: F401
