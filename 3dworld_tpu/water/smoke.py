"""3D smoke diffusion over the lighting grid.

Re-expresses `distribute_smoke` / `diffuse_smoke_xy/z` (smoke.cpp:141-260):
a cellular-automaton diffusion on the lmcell smoke channel with
direction-dependent rates (xy 0.05, z-up 0.08, z-down 0.03), optional
per-cell flow blocking (pflow — geometry-opaque faces), grid-edge cells as
infinite sinks, and values clamped to [0, SMOKE_MAX_VAL].

The reference staggers rows across 8 frames at 8x rate (SMOKE_SKIPVAL);
here the whole grid diffuses every step at 1x rate — the same steady
state, as one fused stencil.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# smoke.cpp:13-22
SMOKE_MAX_CELL = 0.125
SMOKE_MAX_VAL = 100.0
SMOKE_DIS_XY = 0.05
SMOKE_DIS_ZU = 0.08
SMOKE_DIS_ZD = 0.03


@functools.partial(jax.jit, static_argnames=())
def diffuse_smoke(smoke: jax.Array, flow_x: jax.Array | None = None,
                  flow_y: jax.Array | None = None,
                  flow_z: jax.Array | None = None) -> jax.Array:
    """One diffusion step on smoke [nz, ny, nx].

    flow_* in [0,1] gate transfer across each axis (None = fully open);
    edge cells leak smoke out of the grid (infinite sink).
    """
    nz, ny, nx = smoke.shape
    one = jnp.ones_like(smoke)
    fx = one if flow_x is None else flow_x
    fy = one if flow_y is None else flow_y
    fz = one if flow_z is None else flow_z

    def exchange(axis, rate_pos, rate_neg, flow):
        """Symmetric neighbor exchange along axis with edge sinks."""
        up = jnp.roll(smoke, -1, axis)     # neighbor at +axis
        dn = jnp.roll(smoke, 1, axis)      # neighbor at -axis
        # edge: treat out-of-grid neighbor as zero-smoke sink
        sl_hi = [slice(None)] * 3
        sl_hi[axis] = -1
        sl_lo = [slice(None)] * 3
        sl_lo[axis] = 0
        up = up.at[tuple(sl_hi)].set(0.0)
        dn = dn.at[tuple(sl_lo)].set(0.0)
        d_up = (up - smoke) * flow         # positive = inflow from +axis
        d_dn = (dn - smoke) * flow
        r_up = jnp.where(d_up > 0, rate_pos, rate_neg)
        r_dn = jnp.where(d_dn > 0, rate_neg, rate_pos)
        return d_up * r_up + d_dn * r_dn

    delta = (exchange(2, SMOKE_DIS_XY, SMOKE_DIS_XY, fx)
             + exchange(1, SMOKE_DIS_XY, SMOKE_DIS_XY, fy)
             # z: rising smoke — gaining from below/upward loss asymmetry:
             # transfer upward at ZU rate, downward at ZD rate
             + exchange(0, SMOKE_DIS_ZD, SMOKE_DIS_ZU, fz))
    return jnp.clip(smoke + delta, 0.0, SMOKE_MAX_VAL)


def add_smoke(smoke: jax.Array, idx_z, idx_y, idx_x, amount) -> jax.Array:
    """Inject smoke at cells (fires, explosions; add_smoke smoke.cpp)."""
    return smoke.at[idx_z, idx_y, idx_x].add(amount)
