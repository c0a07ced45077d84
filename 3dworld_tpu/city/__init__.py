"""Procedural city: plots, roads, buildings, floorplans, traffic, crowds."""
from . import plots      # noqa: F401
from . import roads      # noqa: F401
from . import buildings  # noqa: F401
from . import floorplan  # noqa: F401
from . import traffic    # noqa: F401
from . import people     # noqa: F401
from . import objects    # noqa: F401
from . import room_content  # noqa: F401
