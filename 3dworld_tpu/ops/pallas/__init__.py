"""Pallas TPU kernels for hot ops (with interpret-mode fallback off-TPU)."""
from . import noise_kernel  # noqa: F401
from . import stencil_kernel  # noqa: F401
