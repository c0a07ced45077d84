"""Physics engine: object type table, SoA object state, batched integrator,
collision (mesh / water / static cobjs / dynamic sphere pairs)."""
from . import types    # noqa: F401
from . import cobjs    # noqa: F401
from . import step     # noqa: F401
from . import platforms  # noqa: F401
from . import destroy    # noqa: F401
from . import movable    # noqa: F401
from . import groups     # noqa: F401
