"""Water surface ripples: damped wave-equation stencil.

Re-expresses `compute_ripples` (Water.cpp:678-830) as a vectorized
8-neighbor stencil: each active water cell exchanges (rval_c - rval_n)
increments with its neighbors (diagonals x 1/sqrt(2)); transfer INTO a
neighbor only happens when that neighbor is water (the reference's
`inside8` bitmask), while the source cell always loses the increment —
preserving the reference's shoreline energy leak.  Then
zval = DAMP1*(rval + DAMP2*acc) clamped to the water depth, and
rval = ATTEN^tstep * zval.

Constants: Water.cpp:13-17.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

RIPPLE_DAMP1 = 0.95
RIPPLE_DAMP2 = 0.02
RIPPLE_MAT_ATTEN = 0.965
MAX_RIPPLE_HEIGHT = 1.0
SQRT2_INV = float(1.0 / np.sqrt(2.0))

# 8 neighbor shifts (dy, dx, weight)
_DIRS = [(0, -1, 1.0), (0, 1, 1.0), (-1, 0, 1.0), (1, 0, 1.0),
         (-1, -1, SQRT2_INV), (-1, 1, SQRT2_INV),
         (1, -1, SQRT2_INV), (1, 1, SQRT2_INV)]


class RippleState(NamedTuple):
    rval: jax.Array  # [my, mx] ripple height
    acc: jax.Array   # [my, mx] accumulated wave energy


def make_ripples(my: int, mx: int) -> RippleState:
    z = jnp.zeros((my, mx), jnp.float32)
    return RippleState(rval=z, acc=z)


def _shift(a, dy, dx):
    """Shift with zero boundary (off-mesh neighbors don't exist)."""
    out = jnp.roll(a, (dy, dx), (0, 1))
    if dy == 1:
        out = out.at[0, :].set(0.0)
    elif dy == -1:
        out = out.at[-1, :].set(0.0)
    if dx == 1:
        out = out.at[:, 0].set(0.0)
    elif dx == -1:
        out = out.at[:, -1].set(0.0)
    return out


@functools.partial(jax.jit, static_argnames=())
def step_ripples(state: RippleState, inside: jax.Array, depth: jax.Array,
                 tstep: float | jax.Array = 1.0) -> tuple:
    """One ripple step.  inside [my,mx] bool water mask; depth [my,mx]
    water depth (clamps wave height).  Returns (state, ripple_zval)."""
    ts = jnp.maximum(jnp.asarray(tstep, jnp.float32), 0.25)
    rm_atten = RIPPLE_MAT_ATTEN ** ts
    rdamp1 = RIPPLE_DAMP1 ** ts
    rdamp2 = RIPPLE_DAMP2 * ts

    ins = inside.astype(jnp.float32)
    rval = state.rval
    acc = state.acc * rm_atten

    out_flux = jnp.zeros_like(rval)
    in_flux = jnp.zeros_like(rval)
    for dy, dx, w in _DIRS:
        # difference toward the neighbor at (dy, dx), from active cells only
        d = (rval - _shift(rval, -dy, -dx)) * w * ins
        out_flux = out_flux + d
        # neighbor receives it only if the neighbor is water: accumulate the
        # flux shifted into place, masked by the receiving cell's inside bit
        in_flux = in_flux + _shift(d, dy, dx) * ins
    acc = acc - out_flux + in_flux

    zval = rdamp1 * (rval + rdamp2 * acc)
    zval = jnp.clip(zval, -depth, depth)      # wave height bounded by depth
    new_rval = jnp.where(inside, rm_atten * zval, 0.0)
    return RippleState(rval=new_rval, acc=jnp.where(inside, acc, 0.0)), zval


def add_splash(state: RippleState, gx, gy, radius_cells: int, energy,
               mx: int, my: int) -> RippleState:
    """Object/rain splash: inject wave energy around grid cell (gx, gy)
    (add_splash / draw_splash semantics)."""
    xi = jnp.arange(mx)[None, :]
    yi = jnp.arange(my)[:, None]
    d2 = (xi - gx) ** 2 + (yi - gy) ** 2
    mask = (d2 <= radius_cells ** 2).astype(jnp.float32)
    return state._replace(acc=state.acc + energy * mask)
