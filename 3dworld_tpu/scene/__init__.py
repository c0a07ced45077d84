"""Scene description: coll-obj DSL parser, scene assembly."""
from . import cobj  # noqa: F401
from . import model3d  # noqa: F401
