"""Deep smiley AI: target selection with LOS + memory, per-situation
weapon choice, range prediction, and island hopping.

Reference behaviors implemented (ai.cpp):
  * `smiley_select_target` (ai.cpp:674): prefer the nearest VISIBLE
    enemy (line-of-sight against cobjs); remember the last-seen position
    and pursue it when sight is lost (target_visible==2 pursuit state);
    stand down / seek pickups when nothing is visible.
  * `check_switch_weapon` (ai.cpp:1238): score every owned weapon with
    a random weight minus situation bonuses — ranged weapons get -0.2
    when the target is in range / +0.8 when not, +0.5 penalty for
    non-underwater weapons while submerged, bat x1.5 / small-ball x1.2
    multipliers — pick the argmin; out-of-ammo weapons are excluded.
  * `target_in_range` (ai.cpp:1290): projectile-velocity vs enemy
    relative velocity, range shrunk by (wvel - rel_vel)/wvel, and a
    gravity-weighted z cost when shooting upward.
  * `smiley_action` (ai.cpp:1315): fire when in_range==1; re-roll the
    weapon on a random cadence — every ~50 frames when the target is
    outranged, every ~500 otherwise.
  * island hopping (`advance_smiley` waypoint goals, ai.cpp:880-930):
    a smiley whose displacement stays tiny while it has a target is
    `stuck`; stuck smileys get flagged for waypoint routing
    (game.route_smileys / follow_paths run the A* leg).

TPU form: one fused step over the whole smiley population — P x P
pairwise masks for targeting, P x W weapon scoring, and a batched
P-ray cobj LOS test.  All decisions are argmin/argmax reductions, no
per-agent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import ray as R
from ..physics import types as PT
from . import game as GG

NUM_W = len(GG.WEAPONS)

# static per-weapon columns (Gameplay.cpp:71-93 via game.WEAPONS)
_W_RANGE = np.asarray([w[10] for w in GG.WEAPONS], np.float32)
_W_DELAY = np.asarray([w[4] for w in GG.WEAPONS], np.float32)
_W_VADD = np.asarray([w[3] for w in GG.WEAPONS], np.float32)
_W_UW = np.asarray([w[15] for w in GG.WEAPONS], np.float32)   # usable underwater
_W_NEED_AMMO = np.asarray([w[16] for w in GG.WEAPONS], bool)
_W_DEF_AMMO = np.asarray([w[12] for w in GG.WEAPONS], np.int32)
# per-weapon projectile gravity factor (object_types[obj_id].gravity;
# hitscan weapons fly flat)
_W_GRAV = np.asarray(
    [PT._TABLE.get(w[1], {}).get("grav", 1.0) if w[1] else 0.0
     for w in GG.WEAPONS], np.float32)
# weapon preference multipliers (check_switch_weapon, ai.cpp:1261-1262)
_W_MULT = np.ones(NUM_W, np.float32)
_W_MULT[GG.WEAPON_INDEX["bbbat"]] = 1.5
_W_MULT[GG.WEAPON_INDEX["sball"]] = 1.2

LOW_HEALTH = 25.0
STUCK_EPS = 1e-3          # displacement below this counts as stuck
STUCK_FRAMES = 30         # frames stuck before flagging for routing
MEM_FRAMES = 240          # give up pursuing a lost target after this


class SmileyAI(NamedTuple):
    """Per-smiley state, superset of game.SmileyState (same leading
    fields so route_smileys/follow_paths duck-type on it)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    health: jax.Array
    team: jax.Array
    tx: jax.Array        # current movement target
    ty: jax.Array
    cooldown: jax.Array
    vx: jax.Array        # velocity estimate (for range prediction)
    vy: jax.Array
    weapon: jax.Array    # [P] selected weapon id
    ammo: jax.Array      # [P, W]
    ltx: jax.Array       # last-seen enemy position (target memory)
    lty: jax.Array
    ltz: jax.Array
    tvis: jax.Array      # 0 = no target, 1 = enemy visible, 2 = pursuing memory
    tmem: jax.Array      # frames since the target was last seen
    stuck: jax.Array     # consecutive low-displacement frames


def make_ai_smileys(key, n: int, num_teams: int = 2,
                    spread: float = 3.0) -> SmileyAI:
    ks = jax.random.split(key, 3)
    z = lambda: jnp.zeros((n,))
    return SmileyAI(
        x=jax.random.uniform(ks[0], (n,), minval=-spread, maxval=spread),
        y=jax.random.uniform(ks[1], (n,), minval=-spread, maxval=spread),
        z=z(), health=jnp.full((n,), 100.0),
        team=jax.random.randint(ks[2], (n,), 0, num_teams),
        tx=z(), ty=z(), cooldown=z(), vx=z(), vy=z(),
        weapon=jnp.full((n,), GG.WEAPON_INDEX["sball"], jnp.int32),
        ammo=jnp.tile(jnp.asarray(_W_DEF_AMMO)[None, :], (n, 1)),
        ltx=z(), lty=z(), ltz=z(),
        tvis=jnp.zeros((n,), jnp.int32), tmem=jnp.zeros((n,), jnp.int32),
        stuck=jnp.zeros((n,), jnp.int32))


def los_visible(cobjs, ax, ay, az, bx, by, bz):
    """Segment a->b unobstructed by any cobj (sphere_visible /
    line_intersect checks inside find_nearest_enemy, ai.cpp:304-343)."""
    dx = bx - ax
    dy = by - ay
    dz = bz - az
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz) + 1e-9
    tmax = d * (1.0 - 1e-3)
    hit, t, *_ = R.ray_cobjs_nearest(ax, ay, az, dx / d, dy / d, dz / d,
                                     tmax, cobjs)
    return ~(hit & (t < tmax))


def check_switch_weapon(s: SmileyAI, key, in_range, underwater):
    """Vectorized check_switch_weapon (ai.cpp:1238-1274): returns the
    new [P] weapon choice.  in_range/underwater are [P] bools."""
    P = s.x.shape[0]
    wt = jax.random.uniform(key, (P, NUM_W))
    uw_pen = (~jnp.asarray(_W_UW, bool))[None, :] & underwater[:, None]
    wt = wt + jnp.where(uw_pen, 0.5, 0.0)
    ranged = (jnp.asarray(_W_RANGE) > 0.0)[None, :]
    wt = wt + jnp.where(ranged,
                        jnp.where(in_range[:, None], -0.2, 0.8), 0.0)
    wt = wt * jnp.asarray(_W_MULT)[None, :]
    ok = ~jnp.asarray(_W_NEED_AMMO)[None, :] | (s.ammo > 0)
    ok = ok & (jnp.arange(NUM_W) >= 1)[None, :]      # never pick unarmed
    wt = jnp.where(ok, wt, jnp.inf)
    return jnp.argmin(wt, axis=1).astype(jnp.int32)


def target_in_range(s: SmileyAI, tpx, tpy, tpz, tvx, tvy, has_tgt):
    """Vectorized target_in_range (ai.cpp:1290-1313): 0 = unreachable
    (enemy outrunning the projectile), 1 = in range, 2 = no target."""
    rng_w = jnp.asarray(_W_RANGE)[s.weapon]
    wvel = jnp.maximum(jnp.asarray(_W_VADD)[s.weapon], 1e-3)
    grav = jnp.asarray(_W_GRAV)[s.weapon]
    dx = tpx - s.x
    dy = tpy - s.y
    dz = tpz - s.z
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz) + 1e-9
    # enemy velocity component away from us (get_rel_enemy_vel)
    rel_vel = (tvx * dx + tvy * dy) / dist
    outrun = rel_vel > wvel
    eff_rng = rng_w * jnp.clip((wvel - rel_vel) / wvel, 0.0, 1.0)
    xy2 = dx * dx + dy * dy
    # gravity z-cost only when shooting upward (ai.cpp:1309-1312)
    eff_dz = jnp.where(dz > 0, (1.0 + grav) * dz, 0.0)
    in_r = jnp.where(rng_w <= 0.0, True,
                     (xy2 + eff_dz * eff_dz) < eff_rng * eff_rng)
    code = jnp.where(outrun, 0, jnp.where(in_r, 1, 0))
    return jnp.where(has_tgt, code, 2)


@jax.jit
def step_smileys_ai(s: SmileyAI, key, cobjs, speed: float = 0.01,
                    water_z: float = -1.0e9, view_dist: float = 8.0,
                    eye_height: float = 0.05):
    """One fused AI frame (advance_smiley + smiley_action).

    Returns (s', fire [P] bool, needs_route [P] bool).  `fire` smileys
    shoot their CURRENT weapon at (ltx, lty, ltz); ammo is decremented
    here.  `needs_route` smileys have a live target they cannot walk
    straight toward (island hopping) — callers run
    game.route_smileys/follow_paths on them.
    """
    P = s.x.shape[0]
    alive = s.health > 0
    k_sel, k_sw, k_cad, k_wander = jax.random.split(key, 4)

    # ---- pairwise targeting: nearest visible enemy (ai.cpp:674) ----
    ex = s.x[:, None] - s.x[None, :]
    ey = s.y[:, None] - s.y[None, :]
    d2 = ex * ex + ey * ey
    enemy = (s.team[:, None] != s.team[None, :]) & alive[None, :] \
        & alive[:, None]
    # LOS for ALL pairs in one batched ray call (P^2 rays; P is small)
    eyez = s.z + eye_height
    ax = jnp.broadcast_to(s.x[:, None], (P, P)).reshape(-1)
    ay = jnp.broadcast_to(s.y[:, None], (P, P)).reshape(-1)
    az = jnp.broadcast_to(eyez[:, None], (P, P)).reshape(-1)
    bx = jnp.broadcast_to(s.x[None, :], (P, P)).reshape(-1)
    by = jnp.broadcast_to(s.y[None, :], (P, P)).reshape(-1)
    bz = jnp.broadcast_to(eyez[None, :], (P, P)).reshape(-1)
    vis = los_visible(cobjs, ax, ay, az, bx, by, bz).reshape(P, P)
    cand = enemy & vis & (d2 < view_dist * view_dist)
    d2m = jnp.where(cand, d2, jnp.inf)
    sees_enemy = jnp.any(cand, axis=1)
    tgt = jnp.argmin(d2m, axis=1)
    toh = jax.nn.one_hot(tgt, P, dtype=jnp.float32)
    vtx = toh @ s.x
    vty = toh @ s.y
    vtz = toh @ s.z
    vtvx = toh @ s.vx
    vtvy = toh @ s.vy

    # ---- target memory (last_target_visible pursuit, ai.cpp:682-698) ----
    tmem = jnp.where(sees_enemy, 0, s.tmem + 1)
    pursuing = ~sees_enemy & (s.tvis > 0) & (tmem < MEM_FRAMES)
    reached_mem = pursuing & ((s.ltx - s.x) ** 2 + (s.lty - s.y) ** 2 < 0.01)
    pursuing = pursuing & ~reached_mem
    tvis = jnp.where(sees_enemy, 1, jnp.where(pursuing, 2, 0))
    ltx = jnp.where(sees_enemy, vtx, s.ltx)
    lty = jnp.where(sees_enemy, vty, s.lty)
    ltz = jnp.where(sees_enemy, vtz, s.ltz)
    has_tgt = tvis > 0

    # ---- range + weapon cadence (smiley_action, ai.cpp:1315-1323) ----
    in_r = target_in_range(s, ltx, lty, ltz,
                           jnp.where(sees_enemy, vtvx, 0.0),
                           jnp.where(sees_enemy, vtvy, 0.0), sees_enemy)
    underwater = s.z < water_z
    # re-roll every ~50 frames when outranged, ~500 otherwise; always
    # switch when the current weapon is out of ammo
    cad = jax.random.uniform(k_cad, (P,))
    no_ammo = jnp.take_along_axis(
        s.ammo, s.weapon[:, None], axis=1)[:, 0] <= 0
    no_ammo = no_ammo & jnp.asarray(_W_NEED_AMMO)[s.weapon]
    reroll = (cad < jnp.where(in_r == 0, 1.0 / 50.0, 1.0 / 500.0)) | no_ammo
    # ai.cpp:1261: ranged bonus applies when target_in_range != 0
    # (in range OR no target); only an outranged target penalizes
    new_w = check_switch_weapon(s, k_sw, in_r != 0, underwater)
    weapon = jnp.where(reroll, new_w, s.weapon)

    # ---- movement: seek / pursue / flee / wander ----
    flee = alive & (s.health < LOW_HEALTH) & sees_enemy
    seek = has_tgt & ~flee
    dirx = jnp.where(flee, s.x - ltx, ltx - s.x)
    diry = jnp.where(flee, s.y - lty, lty - s.y)
    # idle smileys wander (goal mode, ai.cpp:416-424)
    wx = jax.random.normal(k_wander, (P,))
    wy = jax.random.normal(jax.random.fold_in(k_wander, 1), (P,))
    dirx = jnp.where(has_tgt | flee, dirx, wx)
    diry = jnp.where(has_tgt | flee, diry, wy)
    dl = jnp.sqrt(dirx * dirx + diry * diry) + 1e-9
    move = alive & (seek | flee | ~has_tgt)
    stepx = jnp.where(move, speed * dirx / dl, 0.0)
    stepy = jnp.where(move, speed * diry / dl, 0.0)
    # don't walk through walls: cancel a step whose path is blocked
    clear = los_visible(cobjs, s.x, s.y, eyez,
                        s.x + stepx * 4.0, s.y + stepy * 4.0, eyez)
    stepx = jnp.where(clear, stepx, 0.0)
    stepy = jnp.where(clear, stepy, 0.0)
    x = s.x + stepx
    y = s.y + stepy

    # ---- stuck detection -> island hop via waypoints ----
    moved2 = stepx * stepx + stepy * stepy
    stuck = jnp.where(has_tgt & (moved2 < STUCK_EPS * STUCK_EPS),
                      s.stuck + 1, 0)
    needs_route = stuck >= STUCK_FRAMES

    # ---- fire (smiley_action: in_range==1 fires) ----
    fire = alive & (in_r == 1) & sees_enemy & (s.cooldown <= 0)
    delay = jnp.asarray(_W_DELAY)[weapon]
    cooldown = jnp.where(fire, delay, jnp.maximum(s.cooldown - 1.0, 0.0))
    spend = fire & jnp.asarray(_W_NEED_AMMO)[weapon]
    ammo = s.ammo.at[jnp.arange(P), weapon].add(
        -spend.astype(jnp.int32), mode="drop")
    ammo = jnp.maximum(ammo, 0)

    s2 = s._replace(
        x=x, y=y, tx=jnp.where(has_tgt, ltx, s.tx),
        ty=jnp.where(has_tgt, lty, s.ty),
        cooldown=cooldown, vx=stepx, vy=stepy, weapon=weapon, ammo=ammo,
        ltx=ltx, lty=lty, ltz=ltz, tvis=tvis, tmem=tmem, stuck=stuck)
    return s2, fire, needs_route
