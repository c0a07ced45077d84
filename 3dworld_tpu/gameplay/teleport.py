"""Teleporters + jump pads.

The reference's teleporters move objects entering a source sphere to a
destination point (teleporter.cpp:278, the 'x' cobj command); jump pads
boost vertical velocity.  One fused masked pass over the object SoA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..physics.step import ObjectState


class Teleporters(NamedTuple):
    sx: jax.Array   # source centers
    sy: jax.Array
    sz: jax.Array
    radius: jax.Array
    dx: jax.Array   # destinations
    dy: jax.Array
    dz: jax.Array
    is_jump_pad: jax.Array  # bool: boost vz instead of teleporting


def make_teleporters(entries) -> Teleporters:
    import numpy as np
    a = np.asarray(entries, np.float32).reshape(-1, 8)
    return Teleporters(
        sx=jnp.asarray(a[:, 0]), sy=jnp.asarray(a[:, 1]), sz=jnp.asarray(a[:, 2]),
        radius=jnp.asarray(a[:, 3]),
        dx=jnp.asarray(a[:, 4]), dy=jnp.asarray(a[:, 5]), dz=jnp.asarray(a[:, 6]),
        is_jump_pad=jnp.asarray(a[:, 7] > 0.5),
    )


@jax.jit
def apply_teleporters(state: ObjectState, tp: Teleporters,
                      jump_speed: float = 4.0) -> ObjectState:
    """Teleport/boost every live object inside a source sphere."""
    d2 = ((state.px[:, None] - tp.sx[None, :]) ** 2
          + (state.py[:, None] - tp.sy[None, :]) ** 2
          + (state.pz[:, None] - tp.sz[None, :]) ** 2)
    inside = (d2 <= tp.radius[None, :] ** 2) & (state.status > 0)[:, None]
    any_in = jnp.any(inside, axis=1)
    first = jnp.argmax(inside, axis=1)
    oh = jax.nn.one_hot(first, tp.sx.shape[0], dtype=jnp.float32)
    jump = (oh @ tp.is_jump_pad.astype(jnp.float32)) > 0.5
    tele = any_in & ~jump
    boost = any_in & jump
    return state._replace(
        px=jnp.where(tele, oh @ tp.dx, state.px),
        py=jnp.where(tele, oh @ tp.dy, state.py),
        pz=jnp.where(tele, oh @ tp.dz, state.pz),
        vz=jnp.where(boost, jump_speed, state.vz),
        status=jnp.where(any_in, 1, state.status),
    )


@jax.jit
def apply_teleporters_smileys(s, tp: Teleporters):
    """Smileys walking into a teleporter take it (smiley_select_target's
    teleporter use, ai.cpp: smileys route through teleporters); jump
    pads are ignored by the ground AI.  `s` is a gameplay SmileyState
    (x, y, z fields)."""
    d2 = ((s.x[:, None] - tp.sx[None, :]) ** 2
          + (s.y[:, None] - tp.sy[None, :]) ** 2
          + (s.z[:, None] - tp.sz[None, :]) ** 2)
    live = (s.health > 0)[:, None] if hasattr(s, "health") else \
        jnp.ones((s.x.shape[0], 1), bool)
    inside = (d2 <= tp.radius[None, :] ** 2) & \
        (~tp.is_jump_pad)[None, :] & live
    any_in = jnp.any(inside, axis=1)
    first = jnp.argmax(inside, axis=1)
    oh = jax.nn.one_hot(first, tp.sx.shape[0], dtype=jnp.float32)
    return s._replace(
        x=jnp.where(any_in, oh @ tp.dx, s.x),
        y=jnp.where(any_in, oh @ tp.dy, s.y),
        z=jnp.where(any_in, oh @ tp.dz, s.z))
