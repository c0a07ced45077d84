"""Game frame update: the explosion/damage loop.

The reference's `update_game_frame` + collision callbacks
(build_world.cpp:359-376, Gameplay.cpp): projectiles with EXPL_ON_COLL
explode on contact, dealing blast damage to objects, destroying
destroyable cobjs, spawning fragments, and marking smoke/decals.

This module wires those subsystems into one per-frame pass over the
object SoA: detect exploding projectiles (collided or expired), apply
blasts, destroy cobjs, spawn debris — fixed-shape throughout (a capped
number of explosions processed per frame, like the reference's effect
budgets).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..physics import types as T
from ..physics.step import ObjectState
from ..physics.cobjs import CobjSet
from ..physics import destroy as PD
from . import game as GG

MAX_EXPLOSIONS_PER_FRAME = 8
BLAST_RADIUS_SCALE = 8.0  # blast radius = scale * object radius


class GameFrameResult(NamedTuple):
    state: ObjectState
    cobjs: CobjSet
    explosions: np.ndarray   # [K, 4] x y z radius (for smoke/decals/fx)


def find_explosions(state: ObjectState, table: T.ObjTypeTable):
    """Objects that explode this frame: EXPL types that collided
    (EXPL_ON_COLL) or died of lifetime (grenade timers)."""
    tflags = np.asarray(table.flags)[np.asarray(state.otype)]
    is_expl = (tflags & T.OBJ_FLAG_EXPL) != 0
    expl_on_coll = (tflags & T.OBJ_FLAG_EXPL_COLL) != 0
    collided = (np.asarray(state.flags) & T.FL_COLLIDED) != 0
    alive = np.asarray(state.status) > 0
    life = np.asarray(table.lifetime)[np.asarray(state.otype)]
    expired = alive & (life > 0) & (np.asarray(state.time) >= life - 1)
    stopped = alive & (np.asarray(state.status) >= 2)
    boom = is_expl & alive & ((expl_on_coll & (collided | stopped)) | expired)
    return np.where(boom)[0]


def update_game_frame(state: ObjectState, cobjs: CobjSet,
                      destroy_state: PD.DestroyState, table: T.ObjTypeTable,
                      key=None) -> GameFrameResult:
    """One gameplay frame: process up to MAX_EXPLOSIONS_PER_FRAME booms."""
    if key is None:
        key = jax.random.key(0)
    idx = find_explosions(state, table)[:MAX_EXPLOSIONS_PER_FRAME]
    expl = []
    dam = np.asarray(table.damage)
    rad = np.asarray(table.radius)
    # one bulk device->host pull for the blast centers; per-element
    # float(state.px[i]) would sync the device once per scalar
    if len(idx):
        px, py, pz, ot_all = (np.asarray(state.px)[idx],
                              np.asarray(state.py)[idx],
                              np.asarray(state.pz)[idx],
                              np.asarray(state.otype)[idx])
    hit_flags = []
    for k, i in enumerate(idx):
        ot = int(ot_all[k])
        x, y, z = float(px[k]), float(py[k]), float(pz[k])
        r = BLAST_RADIUS_SCALE * rad[ot]
        d = max(dam[ot], 1.0)
        state = GG.apply_blast(state, x, y, z, r, d)
        cobjs, hit = PD.destroy_coll_objs(cobjs, destroy_state, x, y, z, r)
        hit_flags.append(jnp.any(hit))   # stays on device until the end
        expl.append((x, y, z, r))
    if len(idx):
        # all exploding projectiles die: one batched scatter
        state = state._replace(
            status=state.status.at[np.asarray(idx)].set(0))
        # single deferred sync for all cobj-hit flags
        hits = np.asarray(jnp.stack(hit_flags))
        centers = [e[:3] for e, h in zip(expl, hits) if h]
        if centers:
            state = PD.spawn_fragments(state, table, centers, key=key)
    return GameFrameResult(
        state=state, cobjs=cobjs,
        explosions=np.asarray(expl, np.float32).reshape(-1, 4))
