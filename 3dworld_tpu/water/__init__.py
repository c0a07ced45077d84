"""Water & weather: ripples, valley flooding, smoke diffusion, accumulation."""
from . import ripples  # noqa: F401
from . import smoke    # noqa: F401
from . import valleys  # noqa: F401
from . import snow     # noqa: F401
from . import clouds   # noqa: F401
