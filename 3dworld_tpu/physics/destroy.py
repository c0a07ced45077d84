"""Destructible cobjs: blast destruction + fragment spawning.

The reference marks cobjs destroyable/shatterable/explodeable and
fragments them into triangle debris on damage (`destroy_coll_objs`,
destroy_cobj.cpp; `color_tid_vol`), removing them from the collision
structures.

TPU form: destruction is a functional update of the padded CobjSet (slots
zeroed to COLL_NULL) plus FRAGMENT objects written into dead slots of the
object SoA — no reallocation, fixed shapes throughout.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import types as T
from .cobjs import CobjSet, COLL_NULL
from .step import ObjectState

# destroyability levels (collision_detect.h cobj destroy flags)
DESTROYABLE = 1
SHATTERABLE = 2
EXPLODEABLE = 3


class DestroyState(NamedTuple):
    levels: jax.Array   # [M] per-cobj destroyability (0 = indestructible)


def make_destroy_state(cobjs: CobjSet, levels=None) -> DestroyState:
    M = cobjs.size
    if levels is None:
        levels = jnp.zeros((M,), jnp.int32)
    return DestroyState(levels=jnp.asarray(levels, jnp.int32))


@jax.jit
def destroy_coll_objs(cobjs: CobjSet, ds: DestroyState, cx, cy, cz, radius,
                      min_level: int = DESTROYABLE):
    """Remove destroyable cobjs whose center lies in the blast radius
    (destroy_coll_objs core).  Returns (cobjs', destroyed_mask)."""
    center = 0.5 * (jnp.minimum(cobjs.p1, cobjs.p2) + jnp.maximum(cobjs.p1, cobjs.p2))
    d2 = ((center[:, 0] - cx) ** 2 + (center[:, 1] - cy) ** 2
          + (center[:, 2] - cz) ** 2)
    hit = (d2 <= radius * radius) & (ds.levels >= min_level) & \
        (cobjs.shape != COLL_NULL)
    new_shape = jnp.where(hit, COLL_NULL, cobjs.shape)
    return cobjs._replace(shape=new_shape), hit


def spawn_fragments(state: ObjectState, table: T.ObjTypeTable, destroyed_centers,
                    num_per_cobj: int = 8, key=None, speed: float = 1.0):
    """Spawn FRAGMENT objects from destroyed cobj centers into dead object
    slots (fragmenting into debris)."""
    if key is None:
        key = jax.random.key(0)
    centers = np.asarray(destroyed_centers, np.float32).reshape(-1, 3)
    if len(centers) == 0:
        return state
    dead = np.where(np.asarray(state.status) == 0)[0]
    need = min(len(dead), len(centers) * num_per_cobj)
    if need == 0:
        return state
    slots = dead[:need]
    src = np.repeat(centers, num_per_cobj, axis=0)[:need]
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key))[-1])
    vel = rng.normal(0, speed, (need, 3)).astype(np.float32)
    tid = T.type_id("FRAGMENT")
    idx = jnp.asarray(slots)
    return state._replace(
        px=state.px.at[idx].set(src[:, 0]),
        py=state.py.at[idx].set(src[:, 1]),
        pz=state.pz.at[idx].set(src[:, 2]),
        vx=state.vx.at[idx].set(vel[:, 0]),
        vy=state.vy.at[idx].set(vel[:, 1]),
        vz=state.vz.at[idx].set(jnp.abs(vel[:, 2])),
        otype=state.otype.at[idx].set(tid),
        status=state.status.at[idx].set(1),
        time=state.time.at[idx].set(0),
        # reused dead slots keep their old flags; stale Z/XY_STOPPED bits
        # would freeze the fragment mid-air (spawn_into_group resets too)
        flags=state.flags.at[idx].set(0),
        health=state.health.at[idx].set(float(table.health[tid])),
    )


class SurfaceDamage(NamedTuple):
    """surface_damage / charge_dist matrices (mesh.h:114-115) + decals."""

    damage: jax.Array    # [my, mx] accumulated surface damage
    decal_x: jax.Array   # [D] decal ring buffer
    decal_y: jax.Array
    decal_z: jax.Array
    decal_age: jax.Array
    head: jax.Array      # scalar ring position


def make_surface_damage(my: int, mx: int, max_decals: int = 256) -> SurfaceDamage:
    return SurfaceDamage(
        damage=jnp.zeros((my, mx)),
        decal_x=jnp.zeros(max_decals), decal_y=jnp.zeros(max_decals),
        decal_z=jnp.zeros(max_decals),
        decal_age=jnp.full((max_decals,), 1e9),
        head=jnp.int32(0),
    )


@jax.jit
def add_surface_damage(sd: SurfaceDamage, gx, gy, amount) -> SurfaceDamage:
    """Accumulate mesh surface damage at a cell (weapon impacts)."""
    return sd._replace(damage=sd.damage.at[gy, gx].add(amount))


@jax.jit
def add_decal(sd: SurfaceDamage, x, y, z) -> SurfaceDamage:
    """Write a decal into the ring buffer (decal objects)."""
    i = sd.head % sd.decal_x.shape[0]
    return sd._replace(
        decal_x=sd.decal_x.at[i].set(x),
        decal_y=sd.decal_y.at[i].set(y),
        decal_z=sd.decal_z.at[i].set(z),
        decal_age=sd.decal_age.at[i].set(0.0),
        head=sd.head + 1,
    )
