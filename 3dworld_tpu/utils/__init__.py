"""Core utilities: constants, RNG, config, profiling, checkpointing."""
from . import constants  # noqa: F401
from . import rng        # noqa: F401
