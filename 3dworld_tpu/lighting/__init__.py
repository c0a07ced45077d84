"""Lighting precompute: lmcell volumes + batched path tracing."""
from . import lmap   # noqa: F401
from . import trace  # noqa: F401
from . import dlights  # noqa: F401
