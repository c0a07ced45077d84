"""Tile ambient obscurance: 8-direction horizon ray march.

Re-expresses `tile_t::calc_mesh_ao_lighting` (tiled_mesh.cpp:586-661):
8 compass directions x NUM_AO_STEPS steps with linearly growing stride
(offsets = dir * s(s+1)/2, max AO_RAY_LEN=36 cells), ray rising
dz = 0.5*HALF_DXY per step; the FIRST occluding step s contributes
(NUM_AO_STEPS - s) obscurance; ao = 1 - atten / (8 * NUM_AO_STEPS).

TPU form: every (dir, step) pair is one whole-grid shifted compare on the
padded context heightmap — 64 fused shifts instead of per-vertex loops;
batches over tiles on a leading axis.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

NUM_AO_DIRS = 8
NUM_AO_STEPS = 8
AO_RAY_LEN = NUM_AO_STEPS * (NUM_AO_STEPS + 1) // 2  # 36 (triangular)

_DIRS = [(x, y) for y in (-1, 0, 1) for x in (-1, 0, 1) if (x, y) != (0, 0)]
_TRI = [s * (s + 1) // 2 for s in range(1, NUM_AO_STEPS + 1)]  # 1,3,6,...,36


@functools.partial(jax.jit, static_argnames=("stride",))
def tile_ao(context_zvals: jax.Array, stride: int, dz: float) -> jax.Array:
    """AO for the tile interior.

    context_zvals: [..., C, C] with C = stride + 2*AO_RAY_LEN (tile zvals
    padded by the halo the rays march through; may be batched over tiles).
    dz: per-step ray rise = 0.5*HALF_DXY.  Returns ao in [0,1],
    [..., stride, stride].
    """
    C = context_zvals.shape[-1]
    assert C == stride + 2 * AO_RAY_LEN, (C, stride)
    z0 = context_zvals[..., AO_RAY_LEN:AO_RAY_LEN + stride,
                       AO_RAY_LEN:AO_RAY_LEN + stride]
    atten = jnp.zeros_like(z0)
    for dx, dy in _DIRS:
        not_hit = jnp.ones_like(z0, dtype=bool)
        for s in range(NUM_AO_STEPS):
            off = _TRI[s]
            ys = AO_RAY_LEN + dy * off
            xs = AO_RAY_LEN + dx * off
            zn = context_zvals[..., ys:ys + stride, xs:xs + stride]
            hit = (zn > z0 + dz * (s + 1)) & not_hit
            atten = atten + hit.astype(z0.dtype) * (NUM_AO_STEPS - s)
            not_hit = not_hit & ~hit
    return 1.0 - atten / (NUM_AO_DIRS * NUM_AO_STEPS)
