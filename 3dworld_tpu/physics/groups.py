"""Object group management: spawn rates, reaping, free-slot reuse.

The reference's `obj_group` holds a fixed-capacity array per object type
with per-frame appearance-rate spawning and oldest-replacement
(physics_objects.h:393-413; spawn logic build_world.cpp:408-445).

TPU form: the single SoA population is partitioned by type ranges;
spawning writes new objects into dead slots (oldest-first) with
threefry-drawn positions — a fused masked pass, no host compaction.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import types as T
from .step import ObjectState


class GroupSpec(NamedTuple):
    """Per-type group configuration (~ num_items / app_rate config)."""

    otype: int
    capacity: int
    app_rate: float      # expected spawns per frame


@functools.partial(jax.jit, static_argnames=("otype", "max_spawn"))
def spawn_into_group(state: ObjectState, table: T.ObjTypeTable, key,
                     otype: int, max_spawn: int,
                     x_range=(-3.0, 3.0), y_range=(-3.0, 3.0),
                     z_range=(2.0, 3.0), v_scale: float = 0.2) -> ObjectState:
    """Spawn up to `max_spawn` new objects of `otype` into dead slots.

    Dead slots are selected oldest-first via a sort of (alive, -age);
    spawn positions/velocities come from threefry.
    """
    n = state.px.shape[0]
    alive = state.status > 0
    # priority: dead first, then oldest alive (reference replaces oldest)
    key_order = alive.astype(jnp.int32) * (1 << 24) - state.time
    order = jnp.argsort(key_order)
    rank_of = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    chosen = (rank_of < max_spawn) & ~alive   # only actually-dead slots

    ks = jax.random.split(key, 7)
    u = lambda i, lo, hi: jax.random.uniform(ks[i], (n,), minval=lo, maxval=hi)
    hp = jnp.full((n,), 1.0) * table.health[otype]
    return state._replace(
        px=jnp.where(chosen, u(0, *x_range), state.px),
        py=jnp.where(chosen, u(1, *y_range), state.py),
        pz=jnp.where(chosen, u(2, *z_range), state.pz),
        vx=jnp.where(chosen, v_scale * jax.random.normal(ks[3], (n,)), state.vx),
        vy=jnp.where(chosen, v_scale * jax.random.normal(ks[4], (n,)), state.vy),
        vz=jnp.where(chosen, v_scale * jax.random.normal(ks[5], (n,)), state.vz),
        otype=jnp.where(chosen, otype, state.otype),
        status=jnp.where(chosen, 1, state.status),
        time=jnp.where(chosen, 0, state.time),
        flags=jnp.where(chosen, jnp.uint32(0), state.flags),
        health=jnp.where(chosen, hp, state.health),
    )


def frame_spawns(spec: GroupSpec, frame: int) -> int:
    """Deterministic integer spawn count for a frame from the fractional
    appearance rate (accumulated remainder, like fticks-scaled app rates)."""
    return int(np.floor((frame + 1) * spec.app_rate) - np.floor(frame * spec.app_rate))


def group_stats(state: ObjectState, otype: int):
    alive = (np.asarray(state.status) > 0) & (np.asarray(state.otype) == otype)
    return int(alive.sum())
