"""Procedural universe: cells/galaxies/systems/planets, surfaces, ships."""
from . import gen      # noqa: F401
from . import surface  # noqa: F401
from . import ships    # noqa: F401
from . import ship_config  # noqa: F401
