"""Movable cobjs: quasi-rigid pushing with blocking checks.

The reference's movable cobjs support push/pull with stacking support
checks, tipping via convex-hull-over-contacts, and binary-search
penetration resolution (movable_cobj.cpp:25,189,408,599,715).

Here: the push core — objects (or the player) colliding with a movable
cobj accumulate horizontal push; the cobj translates if the destination
is free (cube-vs-cube overlap test against all other cobjs) and supported
(something under it); unsupported movables fall.  Tipping/rotation is a
later round.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cobjs import CobjSet, COLL_NULL, COLL_CUBE


def _cube_overlap(lo_a, hi_a, lo_b, hi_b):
    """[M] vs [M] pairwise cube overlap -> [M, M] bool."""
    sep = (hi_a[:, None, 0] <= lo_b[None, :, 0]) | (hi_b[None, :, 0] <= lo_a[:, None, 0]) | \
          (hi_a[:, None, 1] <= lo_b[None, :, 1]) | (hi_b[None, :, 1] <= lo_a[:, None, 1]) | \
          (hi_a[:, None, 2] <= lo_b[None, :, 2]) | (hi_b[None, :, 2] <= lo_a[:, None, 2])
    return ~sep


@jax.jit
def push_movable_cobjs(cobjs: CobjSet, push_x, push_y,
                       max_step: float = 0.05) -> CobjSet:
    """Apply accumulated per-cobj horizontal pushes (push_cobj).

    push_x/push_y: [M] desired motion; movable cube cobjs move by the
    clamped push unless the destination overlaps another live cobj."""
    lo = jnp.minimum(cobjs.p1, cobjs.p2)
    hi = jnp.maximum(cobjs.p1, cobjs.p2)
    live = cobjs.shape != COLL_NULL
    mv = cobjs.is_movable & live & (cobjs.shape == COLL_CUBE)
    dx = jnp.clip(push_x, -max_step, max_step) * mv
    dy = jnp.clip(push_y, -max_step, max_step) * mv
    d = jnp.stack([dx, dy, jnp.zeros_like(dx)], -1)
    lo2 = lo + d
    hi2 = hi + d
    ov = _cube_overlap(lo2, hi2, lo, hi)
    M = cobjs.size
    ii = jnp.arange(M)
    blocked = jnp.any(ov & live[None, :] & (ii[:, None] != ii[None, :]), axis=1)
    ok = mv & ~blocked
    delta = d * ok[:, None]
    return cobjs._replace(p1=cobjs.p1 + delta, p2=cobjs.p2 + delta)


@jax.jit
def settle_movable_cobjs(cobjs: CobjSet, mesh_min_z, fall_step: float = 0.02):
    """Unsupported movable cubes fall (check_cobj_fall): supported if
    another cobj's top touches the bottom, or resting at mesh_min_z."""
    lo = jnp.minimum(cobjs.p1, cobjs.p2)
    hi = jnp.maximum(cobjs.p1, cobjs.p2)
    live = cobjs.shape != COLL_NULL
    mv = cobjs.is_movable & live & (cobjs.shape == COLL_CUBE)
    # support: xy overlap with another cobj whose top is at our bottom
    xy_ov = (hi[:, None, 0] > lo[None, :, 0]) & (lo[:, None, 0] < hi[None, :, 0]) & \
            (hi[:, None, 1] > lo[None, :, 1]) & (lo[:, None, 1] < hi[None, :, 1])
    touch = jnp.abs(lo[:, None, 2] - hi[None, :, 2]) < 1e-3
    M = cobjs.size
    ii = jnp.arange(M)
    supported = jnp.any(xy_ov & touch & live[None, :]
                        & (ii[:, None] != ii[None, :]), axis=1)
    on_ground = lo[:, 2] <= mesh_min_z + 1e-3
    fall = mv & ~supported & ~on_ground
    dz = -jnp.minimum(fall_step, lo[:, 2] - mesh_min_z) * fall
    delta = jnp.stack([jnp.zeros_like(dz), jnp.zeros_like(dz), dz], -1)
    return cobjs._replace(p1=cobjs.p1 + delta, p2=cobjs.p2 + delta)


def object_pushes(cobjs: CobjSet, px, py, pz, vx, vy, rad, mass,
                  strength: float = 0.02):
    """Per-cobj push accumulated from objects intersecting movable cubes
    (momentum-weighted, horizontal)."""
    lo = jnp.minimum(cobjs.p1, cobjs.p2)
    hi = jnp.maximum(cobjs.p1, cobjs.p2)
    X = px[:, None]
    Y = py[:, None]
    Z = pz[:, None]
    inside = ((X > lo[None, :, 0] - rad[:, None]) & (X < hi[None, :, 0] + rad[:, None])
              & (Y > lo[None, :, 1] - rad[:, None]) & (Y < hi[None, :, 1] + rad[:, None])
              & (Z > lo[None, :, 2]) & (Z < hi[None, :, 2] + rad[:, None]))
    w = inside.astype(jnp.float32) * (mass * strength)[:, None]
    return (vx * mass) @ inside.astype(jnp.float32) * strength, \
           (vy * mass) @ inside.astype(jnp.float32) * strength
