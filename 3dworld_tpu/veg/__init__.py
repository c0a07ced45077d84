"""Vegetation & scenery: trees, small trees, grass, rocks/logs/plants."""
from . import trees    # noqa: F401
from . import grass    # noqa: F401
from . import scenery  # noqa: F401
from . import animals  # noqa: F401
