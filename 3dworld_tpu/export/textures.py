"""Procedural textures: clouds / marble / plasma / noise.

The reference generates several built-in textures procedurally via
fractal noise (`gen_*_texture` in Textures.cpp: cloud, marble, plasma
fractal, smoke) among its ~300 named textures.  Here each generator is a
jitted array program returning [H, W] (or [3, H, W]) float maps ready for
image export or lookup tables.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import noise as N


def _grid(n: int, scale: float):
    xi = jnp.arange(n, dtype=jnp.float32)[None, :] * scale
    yi = jnp.arange(n, dtype=jnp.float32)[:, None] * scale
    return jnp.broadcast_to(xi, (n, n)), jnp.broadcast_to(yi, (n, n))


@functools.partial(jax.jit, static_argnames=("n", "octaves"))
def cloud_texture(n: int = 256, octaves: int = 6, seed: int = 0):
    """Soft fBm cloud alpha map in [0, 1]."""
    x, y = _grid(n, 0.03)
    v = N.fbm2d(x, y, 1.1, 1.9, octaves=octaves, seed=seed)
    return jnp.clip(0.5 + 0.45 * v, 0.0, 1.0) ** 2


@functools.partial(jax.jit, static_argnames=("n", "octaves"))
def marble_texture(n: int = 256, octaves: int = 5, seed: int = 1):
    """Marble: sine bands warped by turbulence."""
    x, y = _grid(n, 0.04)
    turb = N.fbm2d(x, y, 1.7, 2.3, octaves=octaves, seed=seed)
    bands = jnp.sin(0.35 * (x / 0.04) * 0.04 * 8.0 + 4.0 * turb)
    return 0.5 + 0.5 * bands


@functools.partial(jax.jit, static_argnames=("n", "octaves"))
def plasma_texture(n: int = 256, octaves: int = 7, seed: int = 2):
    """Plasma fractal: high-octave ridged fBm, colorized -> [3, n, n]."""
    x, y = _grid(n, 0.05)
    v = N.fbm2d(x, y, 1.3, 2.7, octaves=octaves, shape=N.SHAPE_RIDGED, seed=seed)
    t = jnp.clip(0.5 + 0.35 * v, 0.0, 1.0)
    r = jnp.clip(1.6 * t, 0.0, 1.0)
    g = jnp.clip(1.6 * t - 0.4, 0.0, 1.0)
    b = jnp.clip(1.6 * t - 0.9, 0.0, 1.0)
    return jnp.stack([r, g, b])


@functools.partial(jax.jit, static_argnames=("n",))
def noise_texture(n: int = 256, seed: int = 3):
    """White-noise texture from the hash stream (gen_noise_texture)."""
    from ..utils import rng as w3d_rng
    idx = jnp.arange(n * n, dtype=jnp.uint32)
    h = w3d_rng.xxhash_u32(idx, seed=seed)
    return ((h >> 8).astype(jnp.float32) / (1 << 24)).reshape(n, n)


def texture_to_u8(tex) -> np.ndarray:
    t = np.asarray(tex)
    return np.clip(t * 255.0, 0, 255).astype(np.uint8)
