"""Array-program kernels (JAX/Pallas): noise, erosion, stencils, ray ops."""
from . import noise    # noqa: F401
from . import erosion  # noqa: F401
