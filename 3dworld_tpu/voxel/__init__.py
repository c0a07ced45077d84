"""Voxel engine: 3D density fields, isosurface extraction, realtime edits."""
from . import grid  # noqa: F401
from . import mc    # noqa: F401
from . import mc256  # noqa: F401
from . import edit  # noqa: F401
from . import ao    # noqa: F401
