"""Directional mesh shadows: sheared running-max scan.

The reference casts Bresenham scanlines from the light's upstream edge
(`mesh_shadow_gen`, visibility.cpp:400-505), tracking the current highest
blocker; tiles chain via per-edge `sh_in`/`sh_out` height vectors + a BFS
tile queue (tiled_mesh.cpp:664-692).

Closed form for a directional light: a point i along a light ray is
shadowed iff max over upstream k of (z_k - m*dist(k, i)) > z_i, with m the
light's descent per unit horizontal travel.  Defining the "shadow
potential" p = z + m*u (u = distance along the light's horizontal
direction), the test is simply runmax_upstream(p) > p + eps — a prefix
maximum along the light direction.

TPU form: a `lax.scan` along the dominant axis; between successive
columns the carried running-max row shifts laterally by slope in [-1, 1]
(linear interpolation = the Bresenham shear) and each step takes max with
the incoming column's potential.  The final carry is exactly the
reference's `sh_out` edge vector, so tiles chain identically (and the
chain maps onto `ppermute` halo exchange across shards).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

MESH_MIN_Z = -1.0e30


def _fractional_roll(row: jax.Array, shift: float) -> jax.Array:
    """Shift a row by a fractional number of cells (linear interp, edge
    cells keep their value)."""
    if shift == 0.0:
        return row
    s = int(np.floor(shift))
    f = shift - s
    a = jnp.roll(row, s, axis=-1)
    b = jnp.roll(row, s + 1, axis=-1)
    return a * (1.0 - f) + b * f


@functools.partial(jax.jit, static_argnames=("light_dir",))
def mesh_shadows(zvals: jax.Array, light_dir: tuple,
                 sh_in: jax.Array | None = None,
                 cell_w: float = 1.0):
    """Shadow mask for a directional light.

    zvals [..., ny, nx]; light_dir (lx, ly, lz) pointing TOWARD the light
    (lz > 0 above horizon).  Returns (shadowed [..., ny, nx] bool,
    sh_out [..., edge] running-max potentials for chaining downstream
    tiles; feed as `sh_in` of the next tile along the light direction).

    Scans along the dominant horizontal axis of the light; `cell_w` is the
    world size of one cell (for the slope-to-cells conversion).
    """
    lx, ly, lz = light_dir
    hmag = float(np.hypot(lx, ly))
    if hmag < 1e-9:  # straight down: no mesh shadows (visibility.cpp:516)
        shad = jnp.zeros(zvals.shape, bool)
        return shad, jnp.full(zvals.shape[:-1], MESH_MIN_Z)
    m = lz / hmag * cell_w        # light descent per cell of horizontal travel
    x_major = abs(lx) >= abs(ly)
    # work array with scan axis last and scan direction increasing
    z = zvals if x_major else jnp.swapaxes(zvals, -1, -2)
    major = lx if x_major else ly
    flip = major > 0  # light from +axis => scan from +edge downward
    if flip:
        z = jnp.flip(z, -1)
    lat = (ly if x_major else lx)
    # the ray travels away from the light: lateral drift is -lat/|major|
    # cells per scan step regardless of the scan flip (the lateral axis is
    # never flipped)
    slope = -lat / abs(major)
    n = z.shape[-1]

    # potential p[..., j, i] = z + m * i  (i = cells traveled along scan)
    steps = jnp.arange(n, dtype=z.dtype)
    p = z + m * steps

    if sh_in is None:
        init = jnp.full(z.shape[:-1], jnp.asarray(MESH_MIN_Z, z.dtype))
    else:
        init = sh_in if x_major else sh_in  # caller provides matching edge

    def scanf(carry, col):
        # carry: running max potential of strictly-upstream cells [..., lat]
        shadowed_col = carry > col + 1e-6
        new_carry = jnp.maximum(carry, col)
        new_carry = _fractional_roll(new_carry, slope)
        return new_carry, shadowed_col

    cols = jnp.moveaxis(p, -1, 0)               # [n, ..., lat]
    sh_out, shadowed = jax.lax.scan(scanf, init, cols)
    # express the outgoing carry in the NEXT tile's local frame (its scan
    # index restarts at 0, i.e. n cells further downstream): p' = p - m*n —
    # this makes sh_out plug directly into the downstream tile's sh_in
    # (the reference's sh_out edge height vectors, tiled_mesh.cpp:664)
    sh_out = sh_out - m * n
    shadowed = jnp.moveaxis(shadowed, 0, -1)    # [..., lat, n]
    if flip:
        shadowed = jnp.flip(shadowed, -1)
    if not x_major:
        shadowed = jnp.swapaxes(shadowed, -1, -2)
    return shadowed, sh_out


def carry_transform(carry: jax.Array, total_cols: int, light_dir: tuple,
                    cell_w: float = 1.0) -> jax.Array:
    """What a block of `total_cols` scan columns does to a PURE incoming
    carry (no local maxima): `total_cols` per-step fractional lateral
    rolls, then the downstream-frame potential shift -m*total_cols —
    exactly mesh_shadows' carry path with z = -inf.

    Used by the pod-scale sharded shadow scan (parallel/halo.py
    mode="carry") to propagate edge vectors between devices without
    re-running the full local scan.  With an axis-aligned light
    (slope == 0) this is bit-identical to threading the carry through
    mesh_shadows; with lateral drift the repeated interpolation matches
    the local scan's own smoothing (same op sequence).
    """
    lx, ly, lz = light_dir
    hmag = float(np.hypot(lx, ly))
    if hmag < 1e-9:
        return carry
    m = lz / hmag * cell_w
    x_major = abs(lx) >= abs(ly)
    major = lx if x_major else ly
    lat = (ly if x_major else lx)
    slope = -lat / abs(major)
    if slope == 0.0:
        return carry - m * total_cols
    def body(c, _):
        return _fractional_roll(c, slope), None
    c, _ = jax.lax.scan(body, carry, None, length=total_cols)
    return c - m * total_cols
