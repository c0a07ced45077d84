"""Array-program kernels (JAX/Pallas): noise, erosion, stencils, ray ops."""
from . import noise    # noqa: F401
from . import erosion  # noqa: F401
from . import ao       # noqa: F401
from . import shadows  # noqa: F401
from . import ray      # noqa: F401
from . import pallas   # noqa: F401
