"""Realtime voxel editing: brushes + modified-block tracking.

Reference: brush system with cube/constant/linear/quadratic falloff shapes
(voxels.h:11,40-56), applied by `update_voxel_sphere_region`
(voxels.cpp:1283,2112), with modified blocks queued and re-meshed next
frame (`proc_voxel_updates`, voxels.cpp:2118) and a brush journal for
save/undo (voxels.cpp:2135+).

TPU design: a brush application is a fused masked add over the whole grid
(131K cells of elementwise math beats any sparse-update machinery on TPU);
block-level change tracking uses the reference's num_blocks XY chunking so
only touched blocks re-extract their isosurface.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# voxels.h:11
VB_SHAPE_CUBE = 0
VB_SHAPE_CONSTANT = 1
VB_SHAPE_LINEAR = 2
VB_SHAPE_QUADRATIC = 3


class Brush(NamedTuple):
    """One brush application (voxel_brush_t): center, radius, weight, shape."""

    center: tuple
    radius: float
    weight: float       # positive adds material (lowers density value)
    shape: int = VB_SHAPE_LINEAR


@functools.partial(jax.jit, static_argnames=("shape",))
def apply_brush(values: jax.Array, lo_pos, vsz, center, radius, weight,
                shape: int = VB_SHAPE_LINEAR) -> jax.Array:
    """Apply one brush to the [nz, ny, nx] density grid.

    Material add = subtracting from the density (solid is < isolevel).
    Falloff by shape: cube (sharp box), constant (sharp sphere), linear
    (1 - d/r), quadratic (1 - (d/r)^2).
    """
    nz, ny, nx = values.shape
    xi = lo_pos[0] + vsz[0] * jnp.arange(nx, dtype=jnp.float32)[None, None, :]
    yi = lo_pos[1] + vsz[1] * jnp.arange(ny, dtype=jnp.float32)[None, :, None]
    zi = lo_pos[2] + vsz[2] * jnp.arange(nz, dtype=jnp.float32)[:, None, None]
    dx = xi - center[0]
    dy = yi - center[1]
    dz = zi - center[2]
    r = jnp.asarray(radius, jnp.float32)
    if shape == VB_SHAPE_CUBE:
        fall = ((jnp.abs(dx) <= r) & (jnp.abs(dy) <= r) & (jnp.abs(dz) <= r)
                ).astype(jnp.float32)
    else:
        d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        if shape == VB_SHAPE_CONSTANT:
            fall = (d <= r).astype(jnp.float32)
        elif shape == VB_SHAPE_QUADRATIC:
            fall = jnp.maximum(1.0 - (d / r) ** 2, 0.0)
        else:  # linear
            fall = jnp.maximum(1.0 - d / r, 0.0)
    return values - weight * fall


def modified_blocks(center, radius, lo_pos, vsz, grid_shape, num_blocks: int):
    """Which (bx, by) XY blocks a brush touches (host-side; mirrors the
    reference's modified-block queue keyed by num_blocks^2 chunks)."""
    nz, ny, nx = grid_shape
    bx_sz = max(1, nx // num_blocks)
    by_sz = max(1, ny // num_blocks)
    x0 = int((center[0] - radius - lo_pos[0]) / vsz[0])
    x1 = int((center[0] + radius - lo_pos[0]) / vsz[0])
    y0 = int((center[1] - radius - lo_pos[1]) / vsz[1])
    y1 = int((center[1] + radius - lo_pos[1]) / vsz[1])
    out = set()
    for by in range(max(0, y0 // by_sz), min(num_blocks - 1, y1 // by_sz) + 1):
        for bx in range(max(0, x0 // bx_sz), min(num_blocks - 1, x1 // bx_sz) + 1):
            out.add((bx, by))
    return sorted(out)


class BrushJournal:
    """Brush history for save/undo (voxels.cpp:2135+ brush journal files)."""

    def __init__(self):
        self.brushes: list[Brush] = []

    def add(self, brush: Brush):
        self.brushes.append(brush)

    def undo(self):
        return self.brushes.pop() if self.brushes else None

    def replay(self, values, lo_pos, vsz):
        for b in self.brushes:
            values = apply_brush(values, lo_pos, vsz, b.center, b.radius,
                                 b.weight, b.shape)
        return values

    def save(self, path: str):
        arr = np.array([(b.center[0], b.center[1], b.center[2], b.radius,
                         b.weight, b.shape) for b in self.brushes], np.float32)
        np.save(path, arr)

    @classmethod
    def load(cls, path: str) -> "BrushJournal":
        j = cls()
        for row in np.load(path):
            j.add(Brush((float(row[0]), float(row[1]), float(row[2])),
                        float(row[3]), float(row[4]), int(row[5])))
        return j


# ---------------------------------------------------------------------------
# falling / unsupported chunks (voxels.cpp:606-716)
# ---------------------------------------------------------------------------
#
# After an edit, the reference flood-fills an "anchored" region from the
# mesh-contact voxels through 6-connected solid cells
# (remove_unconnected_outside_range + flood_fill_range, voxels.cpp:759-830,
# FLOOD_FILL_INNER axis steps only); solid voxels left unanchored either
# fragment away, or — with enable_falling — shift down ONE z level per
# 1/40 s drop tick until they land (voxels.cpp:694-716, "only correct to
# drop one level at a time").  TPU form: the flood is iterative
# 6-neighbor dilation masked by solidity; the drop is a masked axis-0
# shift — both whole-grid fused elementwise ops.


def _dilate6(mask: jax.Array) -> jax.Array:
    """6-neighborhood (face-adjacent) binary dilation — the reference
    flood connectivity (FLOOD_FILL_INNER steps one axis at a time)."""
    m = mask.astype(jnp.float32)
    out = m
    for ax in range(3):
        out = jnp.maximum(out, jnp.maximum(
            jnp.roll(m, 1, ax).at[(slice(None),) * ax + (0,)].set(0.0),
            jnp.roll(m, -1, ax).at[(slice(None),) * ax + (-1,)].set(0.0)))
    return out > 0.0


@functools.partial(jax.jit, static_argnames=("anchor_layers",))
def falling_mask(values: jax.Array, isolevel: float,
                 anchor_layers: int = 1) -> jax.Array:
    """[nz,ny,nx] bool: solid voxels NOT 6-connected to the bottom
    `anchor_layers` ground-contact layers (the unanchored set of
    remove_unconnected_outside_range)."""
    solid = values < isolevel
    seed = jnp.zeros_like(solid).at[:anchor_layers].set(solid[:anchor_layers])

    def body(state):
        conn, _ = state
        new = (_dilate6(conn) & solid) | conn
        return new, jnp.any(new != conn)

    conn, _ = jax.lax.while_loop(lambda s: s[1], body,
                                 (seed, jnp.bool_(True)))
    return solid & ~conn


@functools.partial(jax.jit, static_argnames=("anchor_layers",))
def drop_unanchored_step(values: jax.Array, isolevel: float,
                         air_val: float = 1.0, anchor_layers: int = 1):
    """ONE drop tick: every unanchored solid voxel moves down one z level
    (voxels.cpp:706-714 — vacate the cell, write the value one step
    down).  The cell below a falling column bottom is always non-solid
    (else the column would be anchored through it), so the shift never
    overwrites standing material.  Returns (new_values, any_fell)."""
    fall = falling_mask(values, isolevel, anchor_layers=anchor_layers)
    vacated = jnp.where(fall, isolevel + air_val, values)
    fall_above = jnp.concatenate(
        [fall[1:], jnp.zeros_like(fall[:1])], axis=0)
    vals_above = jnp.concatenate([values[1:], values[-1:]], axis=0)
    new = jnp.where(fall_above, vals_above, vacated)
    return new, jnp.any(fall)


def settle_unanchored(values: jax.Array, isolevel: float,
                      air_val: float = 1.0, anchor_layers: int = 1,
                      max_steps: int | None = None):
    """Iterate drop ticks until every chunk lands (the reference reaches
    the same state over successive frames via next_frame_modified_blocks,
    voxels.cpp:685).  Returns (values, steps_fallen)."""
    if max_steps is None:
        max_steps = values.shape[0]

    def cond(state):
        _, more, steps = state
        return more & (steps < max_steps)

    def body(state):
        v, _, steps = state
        v2, fell = drop_unanchored_step(v, isolevel, air_val=air_val,
                                        anchor_layers=anchor_layers)
        return v2, fell, steps + fell.astype(jnp.int32)

    v, _, steps = jax.lax.while_loop(
        cond, body, (values, jnp.bool_(True), jnp.int32(0)))
    return v, steps
