"""Precipitation: rain/snow/hail spawning + the accumulation matrix.

The reference spawns precipitation as object groups (precipitation.cpp,
object types RAIN/SNOW/HAIL with Z_SCENE_SIZE-scaled lifetimes,
Physics.cpp:102-127) and lands them into `accumulation_matrix`
(mesh.h:113): snow piles up per mesh cell, melts above freezing, and
rainfall routes into the valley water volumes (RAIN_VOLUME,
update_valleys).

TPU form: spawn is a batched write of fresh drops into dead slots of
the main object SoA; accumulation is one scatter-add of landed drops
per frame; melt is elementwise.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst, DEFAULT_WORLD
from ..physics import types as T
from ..physics.step import ObjectState

W_FREEZE_POINT = 0.0
MELT_RATE = 0.0015          # accumulation units per degree per frame
RAIN_VOLUME = 0.05          # water volume added per landed rain drop


def spawn_precip(state: ObjectState, key, n_spawn: int, kind: str,
                 world: WorldConst = DEFAULT_WORLD,
                 cloud_z: float = 1.5) -> ObjectState:
    """Recycle the oldest dead slots as fresh drops falling from the
    cloud layer (gen_precipitation: uniform over the scene)."""
    otype = T.type_id(kind)     # "RAIN" | "SNOW" | "HAIL"
    ks = jax.random.split(key, 3)
    dead_order = jnp.argsort(state.status, stable=True)
    idx = dead_order[:n_spawn]
    ok = state.status[idx] == 0
    u = lambda k, lo, hi: jax.random.uniform(k, (n_spawn,), minval=lo,
                                             maxval=hi)
    put = lambda a, v: a.at[idx].set(jnp.where(ok, v, a[idx]))
    return state._replace(
        px=put(state.px, u(ks[0], -world.x_scene, world.x_scene)),
        py=put(state.py, u(ks[1], -world.y_scene, world.y_scene)),
        pz=put(state.pz, jnp.full((n_spawn,), cloud_z)
               + 0.2 * jax.random.normal(ks[2], (n_spawn,))),
        vx=put(state.vx, jnp.zeros(n_spawn)),
        vy=put(state.vy, jnp.zeros(n_spawn)),
        vz=put(state.vz, jnp.zeros(n_spawn)),
        status=put(state.status, ok.astype(jnp.int32)),
        otype=put(state.otype, jnp.full((n_spawn,), otype, jnp.int32)),
        time=put(state.time, jnp.zeros(n_spawn, jnp.int32)),
        flags=put(state.flags, jnp.zeros(n_spawn, state.flags.dtype)))


@functools.partial(jax.jit, static_argnames=("world",))
def accumulate_landed(accum, state: ObjectState, mesh,
                      world: WorldConst = DEFAULT_WORLD):
    """Landed snow/hail adds to the accumulation matrix; landed rain
    returns a water-volume total for the valley update.  A drop 'lands'
    when stopped on the mesh (status 2/3/4 near ground).  Returns
    (accum, rain_volume, landed_mask)."""
    snow_id = T.type_id("SNOW")
    hail_id = T.type_id("HAIL")
    rain_id = T.type_id("RAIN")
    my, mx = accum.shape
    gx = jnp.clip((state.px * world.dx_inv + mx // 2).astype(jnp.int32),
                  0, mx - 1)
    gy = jnp.clip((state.py * world.dy_inv + my // 2).astype(jnp.int32),
                  0, my - 1)
    landed = (state.status >= 2) & (state.status <= 4)
    is_snowy = (state.otype == snow_id) | (state.otype == hail_id)
    is_rain = state.otype == rain_id
    add = (landed & is_snowy).astype(jnp.float32)
    accum = accum.at[gy, gx].add(add)
    rain_volume = RAIN_VOLUME * jnp.sum(landed & is_rain)
    return accum, rain_volume, landed & (is_snowy | is_rain)


def retire_landed(state: ObjectState, landed_mask) -> ObjectState:
    """Landed precipitation leaves the object population (the reference
    removes drops on ground contact after accumulating)."""
    return state._replace(status=jnp.where(landed_mask, 0, state.status))


@jax.jit
def melt_accumulation(accum, temperature):
    """Above-freezing melt (accumulation_matrix decay): linear in the
    temperature excess, floored at zero."""
    melt = jnp.maximum(temperature - W_FREEZE_POINT, 0.0) * MELT_RATE
    return jnp.maximum(accum - melt, 0.0)
