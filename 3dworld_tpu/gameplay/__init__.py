"""Gameplay & agents: waypoints/A*, weapons, explosions, smiley AI."""
from . import waypoints  # noqa: F401
from . import game       # noqa: F401
from . import teleport   # noqa: F401
from . import frame      # noqa: F401
