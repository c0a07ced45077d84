"""Voxel ambient occlusion: per-cell openness from directional marches.

The reference computes an `ao_lighting` grid over the voxel model with
flow-based propagation (voxels.h voxel_model).  Here: for each cell, march
a set of upward/lateral directions through the solid mask with linearly
growing steps (the tile-AO pattern lifted to 3D); occlusion contribution
decays with first-hit distance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 9 directions: up, 4 laterals, 4 upward diagonals
_DIRS = [(0, 0, 1), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
         (1, 0, 1), (-1, 0, 1), (0, 1, 1), (0, -1, 1)]
NUM_STEPS = 4


def _shift3(a, dx, dy, dz):
    """Shift the solid mask; out-of-grid treated as open (False)."""
    out = jnp.roll(a, (-dz, -dy, -dx), (0, 1, 2))
    if dz > 0:
        out = out.at[-dz:].set(False)
    elif dz < 0:
        out = out.at[:-dz].set(False)
    if dy > 0:
        out = out.at[:, -dy:].set(False)
    elif dy < 0:
        out = out.at[:, :-dy].set(False)
    if dx > 0:
        out = out.at[:, :, -dx:].set(False)
    elif dx < 0:
        out = out.at[:, :, :-dx].set(False)
    return out


@functools.partial(jax.jit, static_argnames=())
def voxel_ao(values: jax.Array, isolevel: float = 0.0) -> jax.Array:
    """AO in [0, 1] per voxel cell ([nz, ny, nx]); 1 = fully open."""
    solid = values < isolevel
    atten = jnp.zeros(values.shape, jnp.float32)
    total = 0.0
    for (dx, dy, dz) in _DIRS:
        not_hit = jnp.ones(values.shape, bool)
        off = 0
        for s in range(NUM_STEPS):
            off += s + 1  # triangular growth like tile AO
            blocked = _shift3(solid, dx * off, dy * off, dz * off)
            hit = blocked & not_hit
            atten = atten + hit.astype(jnp.float32) * (NUM_STEPS - s)
            not_hit = not_hit & ~hit
        total += NUM_STEPS
    return 1.0 - atten / total
