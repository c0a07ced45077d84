"""Core utilities: constants, RNG, config, profiling, checkpointing."""
from . import constants  # noqa: F401
from . import rng        # noqa: F401
from . import config      # noqa: F401
from . import profiler    # noqa: F401
from . import checkpoint  # noqa: F401
from . import events      # noqa: F401
