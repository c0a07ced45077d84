"""Scene description: coll-obj DSL parser, scene assembly."""
from . import cobj  # noqa: F401
