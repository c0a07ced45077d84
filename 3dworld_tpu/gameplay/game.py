"""Gameplay: weapons, explosions/blast damage, smiley AI.

The reference's FPS layer: weapon table with per-weapon projectile
parameters (Gameplay.cpp:2884, weapon spawn in process_groups), blast
radius damage with cobj destruction (explosion.cpp:460,
`destroy_coll_objs`), and smiley AI seeking/attacking/fleeing over the
waypoint graph (`advance_smiley`, ai.cpp:1579).

TPU form: blast damage is one fused masked pass over the object SoA;
smiley decision-making is a vmapped state machine (seek nearest
enemy/health, flee at low hp) with waypoint routing on host.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..physics import types as PT
from ..physics.step import ObjectState

# full weapon table transcription (weapons[NUM_TOT_WEAPONS],
# Gameplay.cpp:71-93): obj_type None = hitscan/melee (UNDEF obj_id).
# (name, obj_type, v_mult, v_add, fire_delay, nshots, nfragments,
#  blast_damage, blast_radius, firing_error, range, recoil,
#  def_ammo, max_ammo, self_damage, use_underwater, need_ammo)
CBFD = 60
CBLADE_EXT = 0.5 * 0.04 * CBFD
WEAPONS = (
    ("unarmed",        None,        0.0, 0.0, 0,    0,  0,   0.0,    0.0,  0.0,   0.0,  0.00, 0,   0,   0, 1, 0),
    ("bbbat",          None,        0.0, 0.0, 23,   1,  1,   500.0,  0.25, 0.0,   0.25, 0.00, 0,   0,   0, 1, 0),
    ("ball",           "BALL",      1.5, 3.0, 25,   1,  1,   0.0,    0.0,  0.0,   3.0,  0.08, 1,   3,   0, 0, 1),
    ("sball",          "S_BALL",    1.3, 3.3, 18,   1,  1,   0.0,    0.0,  0.0,   1.5,  0.02, 30,  500, 0, 0, 1),
    ("rocket",         "ROCKET",    0.7, 3.1, 32,   1,  1,   1000.0, 0.42, 0.003, 0.0,  0.05, 10,  100, 3, 0, 1),
    ("landmine",       "LANDMINE",  0.0, 2.0, 30,   1,  1,   4000.0, 0.39, 0.0,   6.0,  0.00, 5,   50,  0, 0, 1),
    ("seek_d",         "SEEK_D",    0.5, 2.5, 60,   1,  1,   2300.0, 0.50, 0.0,   0.0,  0.10, 5,   50,  3, 0, 1),
    ("star5",          "STAR5",     1.1, 3.0, 10,   1,  1,   0.0,    0.0,  0.015, 2.0,  0.00, 25,  500, 0, 1, 1),
    ("m16",            None,        0.0, 0.0, 2,    1,  1,   70.0,   0.0,  0.020, 2.8,  0.01, 100, 600, 0, 1, 1),
    ("shotgun",        None,        0.0, 0.0, 27,   24, 1,   50.0,   0.0,  0.080, 2.5,  0.03, 12,  100, 0, 1, 1),
    ("grenade",        "GRENADE",   1.0, 1.2, 22,   1,  140, 700.0,  0.44, 0.010, 1.6,  0.02, 12,  60,  3, 0, 1),
    ("laser",          None,        0.0, 0.0, 1,    1,  1,   16.0,   0.0,  0.0,   0.0,  0.00, 200, 800, 0, 1, 1),
    ("plasma",         "PLASMA",    1.4, 3.5, 13,   1,  1,   200.0,  0.43, 0.0,   4.5,  0.00, 20,  200, 3, 0, 1),
    ("cblade",         None,        1.5, 4.0, CBFD, 1,  1,   40.0,   0.2,  0.0,   CBLADE_EXT, 0.00, 1, 10, 0, 1, 0),
    ("gasser",         "GASSED",    1.2, 2.8, 4,    1,  1,   100.0,  0.07, 0.1,   2.8,  0.00, 60,  250, 0, 0, 1),
    ("raptor",         "RAPT_PROJ", 1.2, 3.2, 14,   1,  1,   220.0,  0.35, 0.025, 6.0,  0.05, 25,  400, 1, 0, 1),
    ("translocator",   "XLOCATOR",  2.0, 4.0, 20,   1,  1,   0.0,    0.0,  0.0,   0.0,  0.03, 1,   1,   0, 1, 1),
    ("cgrenade",       "CGRENADE",  0.9, 1.1, 80,   1,  8,   800.0,  0.45, 0.02,  1.6,  0.04, 3,   20,  1, 0, 1),
    ("sawblade",       "SAWBLADE",  2.0, 4.0, CBFD, 1,  1,   0.0,    0.0,  0.01,  0.0,  0.03, 1,   10,  0, 1, 1),
    ("teleporter",     "TELEPORTER", 0.7, 1.5, 50,  1,  1,   0.0,    0.0,  0.0,   0.0,  0.00, 1,   10,  1, 0, 1),
)
WEAPON_INDEX = {w[0]: i for i, w in enumerate(WEAPONS)}


class WeaponState(NamedTuple):
    """Per-player weapon bookkeeping (player_state wweapon/ammo/cooldown,
    gameplay.h): selection, per-weapon ammo, fire cooldown."""

    sel: jax.Array        # [P] int32 selected weapon
    ammo: jax.Array       # [P, W] int32
    cooldown: jax.Array   # [P] int32 frames until can fire


def make_weapon_states(num_players: int) -> WeaponState:
    W = len(WEAPONS)
    ammo = np.tile(np.asarray([w[12] for w in WEAPONS], np.int32),
                   (num_players, 1))
    return WeaponState(sel=jnp.full((num_players,), WEAPON_INDEX["ball"],
                                    jnp.int32),
                       ammo=jnp.asarray(ammo),
                       cooldown=jnp.zeros((num_players,), jnp.int32))


def can_fire(ws: WeaponState, player: int) -> bool:
    w = WEAPONS[int(ws.sel[player])]
    if int(ws.cooldown[player]) > 0:
        return False
    if w[16] and int(ws.ammo[player, int(ws.sel[player])]) <= 0:
        return False
    return True


# global firing-error stream: the reference advances one global rgen
# per shot (deterministic per run, but successive shots differ); a
# fixed default seed here would make every volley's jitter identical
_FIRE_SEQ = [0]


def _next_fire_seed() -> int:
    _FIRE_SEQ[0] += 1
    return _FIRE_SEQ[0]


def reset_fire_stream(seed: int = 0) -> None:
    """Rewind the firing-error stream (rand_gen set_state analog), for
    deterministic replays."""
    _FIRE_SEQ[0] = seed


def fire_weapon(state: ObjectState, free_slots, weapon_idx: int,
                origin, direction, table, key=None,
                shooter_vel=(0.0, 0.0, 0.0)) -> ObjectState:
    """Spawn the weapon's projectile(s) into free object slots
    (fire_projectile/create_shell_casing spawn path): nshots pellets with
    firing_error direction jitter, launch speed v_add + v_mult * shooter
    speed (weapon_t::get_fire_vel)."""
    w = WEAPONS[weapon_idx]
    (_name, otype, v_mult, v_add, _fd, nshots, _nf, _bd, _br, f_err,
     *_rest) = w
    if otype is None:
        return state     # hitscan weapons use fire_hitscan
    tid = PT.type_id(otype)
    d = np.asarray(direction, np.float32)
    d = d / max(np.linalg.norm(d), 1e-9)
    sv = np.asarray(shooter_vel, np.float32)
    vel = v_add + v_mult * float(np.linalg.norm(sv))
    rng = np.random.default_rng(_next_fire_seed() if key is None else int(key))
    for k in range(min(nshots, len(free_slots))):
        slot = free_slots[k]
        dk = d + f_err * rng.standard_normal(3).astype(np.float32)
        dk = dk / max(np.linalg.norm(dk), 1e-9)
        state = state._replace(
            px=state.px.at[slot].set(origin[0]),
            py=state.py.at[slot].set(origin[1]),
            pz=state.pz.at[slot].set(origin[2]),
            vx=state.vx.at[slot].set(vel * dk[0]),
            vy=state.vy.at[slot].set(vel * dk[1]),
            vz=state.vz.at[slot].set(vel * dk[2]),
            otype=state.otype.at[slot].set(tid),
            status=state.status.at[slot].set(1),
            time=state.time.at[slot].set(0),
            health=state.health.at[slot].set(float(table.health[tid])),
        )
    return state


def fire_hitscan(state: ObjectState, cobjs, origin, direction, weapon_idx: int,
                 table, key=None):
    """Instant-hit weapons (M16/shotgun/laser: obj_id UNDEF in the
    table; fire_projectile's projectile_test ray path): per-pellet jittered
    rays, nearest object sphere hit unless a cobj blocks first, damage
    applied at the hit.  Returns (state', hit_mask [N], n_wall_hits)."""
    from ..ops import ray as R
    w = WEAPONS[weapon_idx]
    nshots, dam, f_err, rng_lim = w[5], w[7], w[9], w[10]
    rng = np.random.default_rng(_next_fire_seed() if key is None else int(key))
    d = np.asarray(direction, np.float32)
    d = d / max(np.linalg.norm(d), 1e-9)
    dirs = d[None, :] + f_err * rng.standard_normal((nshots, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ox = jnp.full((nshots,), float(origin[0]))
    oy = jnp.full((nshots,), float(origin[1]))
    oz = jnp.full((nshots,), float(origin[2]))
    reach = rng_lim if rng_lim > 0 else 100.0
    tmax = jnp.full((nshots,), reach)
    chit, ct, *_ = R.ray_cobjs_nearest(ox, oy, oz,
                                       jnp.asarray(dirs[:, 0]),
                                       jnp.asarray(dirs[:, 1]),
                                       jnp.asarray(dirs[:, 2]), tmax, cobjs)
    # ray-vs-object-sphere: nearest alive object per pellet
    rad = table.radius[state.otype]
    exo = state.px[None, :] - ox[:, None]
    eyo = state.py[None, :] - oy[:, None]
    ezo = state.pz[None, :] - oz[:, None]
    tproj = (exo * dirs[:, 0:1] + eyo * dirs[:, 1:2] + ezo * dirs[:, 2:3])
    perp2 = exo ** 2 + eyo ** 2 + ezo ** 2 - tproj ** 2
    okhit = (state.status[None, :] > 0) & (tproj > 0.0) & \
        (perp2 < (rad ** 2)[None, :]) & (tproj < tmax[:, None]) & \
        (tproj < jnp.where(chit, ct, jnp.inf)[:, None])
    t_obj = jnp.where(okhit, tproj, jnp.inf)
    best = jnp.argmin(t_obj, axis=1)
    has = jnp.isfinite(jnp.min(t_obj, axis=1))
    hit_counts = jnp.zeros((state.px.shape[0],)).at[best].add(
        has.astype(jnp.float32))
    hp = state.health - dam * hit_counts
    killed = (state.status > 0) & (hp <= 0) & (hit_counts > 0)
    state = state._replace(
        health=jnp.where(hit_counts > 0, hp, state.health),
        status=jnp.where(killed, 0, state.status))
    n_wall = jnp.sum(chit & ~has)
    return state, hit_counts > 0, n_wall


def blast_params(otype_name: str):
    """Blast damage/radius for a projectile's detonation, from the weapon
    that fires that object type (blast_radius/blast_damage columns)."""
    for w in WEAPONS:
        if w[1] == otype_name:
            return w[7], w[8]
    return 0.0, 0.0


@jax.jit
def apply_blast(state: ObjectState, cx, cy, cz, radius, damage) -> ObjectState:
    """Blast damage + impulse to all objects in range (explosion.cpp blast:
    falloff with distance, radial knockback)."""
    dx = state.px - cx
    dy = state.py - cy
    dz = state.pz - cz
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz) + 1e-9
    f = jnp.maximum(1.0 - d / radius, 0.0)
    hp = state.health - damage * f
    imp = 0.5 * damage * f / d * 0.01
    alive = state.status > 0
    killed = alive & (hp <= 0)
    return state._replace(
        health=jnp.where(alive, hp, state.health),
        vx=jnp.where(alive, state.vx + imp * dx, state.vx),
        vy=jnp.where(alive, state.vy + imp * dy, state.vy),
        vz=jnp.where(alive, state.vz + imp * dz, state.vz),
        status=jnp.where(killed, 0, state.status),
    )


class SmileyState(NamedTuple):
    """FPS AI agents (player_state + smiley fields, SoA)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    health: jax.Array
    team: jax.Array
    tx: jax.Array       # move target
    ty: jax.Array
    cooldown: jax.Array


def make_smileys(key, n: int, num_teams: int = 2, spread: float = 3.0):
    ks = jax.random.split(key, 3)
    return SmileyState(
        x=jax.random.uniform(ks[0], (n,), minval=-spread, maxval=spread),
        y=jax.random.uniform(ks[1], (n,), minval=-spread, maxval=spread),
        z=jnp.zeros(n),
        health=jnp.full((n,), 100.0),
        team=jax.random.randint(ks[2], (n,), 0, num_teams),
        tx=jnp.zeros(n), ty=jnp.zeros(n),
        cooldown=jnp.zeros(n),
    )


@jax.jit
def step_smileys(s: SmileyState, key, speed: float = 0.01):
    """advance_smiley core decisions, vmapped: seek the nearest enemy,
    flee when weak; fire when close (returns fire mask for the weapon
    layer)."""
    n = s.x.shape[0]
    alive = s.health > 0
    ex = s.x[:, None] - s.x[None, :]
    ey = s.y[:, None] - s.y[None, :]
    d2 = ex * ex + ey * ey
    enemy = (s.team[:, None] != s.team[None, :]) & alive[None, :] & alive[:, None]
    d2m = jnp.where(enemy, d2, jnp.inf)
    # a smiley with NO live enemy (team eliminated) must stand down:
    # argmin over an all-inf row returns 0, which would make everyone
    # chase smiley 0's position regardless of team
    has_enemy = jnp.any(enemy, axis=1)
    tgt = jnp.argmin(d2m, axis=1)
    toh = jax.nn.one_hot(tgt, n, dtype=jnp.float32)
    tx = jnp.where(has_enemy, toh @ s.x, s.tx)
    ty = jnp.where(has_enemy, toh @ s.y, s.ty)
    dist = jnp.sqrt(jnp.min(d2m, axis=1))
    flee = s.health < 25.0
    dirx = jnp.where(flee, s.x - tx, tx - s.x)
    diry = jnp.where(flee, s.y - ty, ty - s.y)
    dl = jnp.sqrt(dirx * dirx + diry * diry) + 1e-9
    move = alive & has_enemy
    x = s.x + jnp.where(move, speed * dirx / dl, 0.0)
    y = s.y + jnp.where(move, speed * diry / dl, 0.0)
    fire = alive & has_enemy & ~flee & (dist < 1.0) & (s.cooldown <= 0)
    cooldown = jnp.where(fire, 20.0, jnp.maximum(s.cooldown - 1.0, 0.0))
    return s._replace(x=x, y=y, tx=tx, ty=ty, cooldown=cooldown), fire


# ---------------------------------------------------------------------------
# scoring + blood decals (Gameplay.cpp kill credit / blood splatter)
# ---------------------------------------------------------------------------

class GameScore(NamedTuple):
    """Per-player match stats (the reference tracks kills/deaths/score
    per smiley + player in Gameplay.cpp)."""

    kills: jax.Array     # [P]
    deaths: jax.Array
    score: jax.Array     # f32 (weapon damage dealt + kill bonuses)


def make_scores(num_players: int) -> GameScore:
    z = jnp.zeros((num_players,), jnp.int32)
    return GameScore(kills=z, deaths=z, score=jnp.zeros((num_players,)))


KILL_BONUS = 100.0


@jax.jit
def credit_damage(sc: GameScore, attacker, damage, killed) -> GameScore:
    """Batched damage/kill credit: attacker [K] player ids, damage [K],
    killed [K] bool."""
    score = sc.score.at[attacker].add(damage + KILL_BONUS
                                      * killed.astype(jnp.float32))
    kills = sc.kills.at[attacker].add(killed.astype(jnp.int32))
    return sc._replace(score=score, kills=kills)


@jax.jit
def credit_death(sc: GameScore, victim) -> GameScore:
    return sc._replace(deaths=sc.deaths.at[victim].add(1))


def spawn_blood_decals(decals, state: ObjectState, hit_mask, key,
                       radius: float = 0.02, lifetime: int = 300,
                       max_spawn: int = 16):
    """Blood splatter where objects took damage: spawn decals at the
    first `max_spawn` hit positions (gen_blood_velocity / blood decal
    path in Gameplay.cpp), facing up on the ground under the object."""
    import numpy as np
    from ..physics import particles as PT
    idx = np.where(np.asarray(hit_mask))[0][:max_spawn]
    if len(idx) == 0:
        return decals
    n = len(idx)
    x = jnp.asarray(np.asarray(state.px)[idx])
    y = jnp.asarray(np.asarray(state.py)[idx])
    z = jnp.asarray(np.asarray(state.pz)[idx])
    zeros = jnp.zeros((n,))
    return PT.spawn_decals(
        decals, x, y, z, zeros, zeros, jnp.ones((n,)),
        jnp.full((n,), radius), jnp.ones((n,)),
        jnp.full((n,), -1, jnp.int32), jnp.full((n,), lifetime, jnp.int32))


# ---------------------------------------------------------------------------
# smiley waypoint navigation (ai.cpp: smileys route through the waypoint
# graph rather than beelining; run_a_star + per-smiley path following)
# ---------------------------------------------------------------------------

def route_smileys(s: SmileyState, graph, max_path: int = 16):
    """Host: A* route each smiley from its nearest waypoint to the
    waypoint nearest its current target; returns padded path arrays
    (wx, wy [N, max_path], plen [N]) for `follow_paths`."""
    import numpy as np
    from .waypoints import run_a_star
    sx = np.asarray(s.x)
    sy = np.asarray(s.y)
    tx = np.asarray(s.tx)
    ty = np.asarray(s.ty)
    gx, gy = np.asarray(graph.x), np.asarray(graph.y)
    n = len(sx)
    wx = np.zeros((n, max_path), np.float32)
    wy = np.zeros((n, max_path), np.float32)
    plen = np.zeros(n, np.int32)
    for i in range(n):
        start = int(np.argmin((gx - sx[i]) ** 2 + (gy - sy[i]) ** 2))
        goal = int(np.argmin((gx - tx[i]) ** 2 + (gy - ty[i]) ** 2))
        path = run_a_star(graph, start, goal)[:max_path]
        for k, w in enumerate(path):
            wx[i, k] = gx[w]
            wy[i, k] = gy[w]
        plen[i] = len(path)
    return jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(plen)


@jax.jit
def follow_paths(s: SmileyState, wx, wy, plen, pos, speed: float = 0.01):
    """Device: advance each smiley toward its current path waypoint;
    returns (new state, new pos index [N]) — waypoint reached -> next."""
    n = s.x.shape[0]
    W = wx.shape[1]
    oh = jax.nn.one_hot(jnp.minimum(pos, W - 1), W, dtype=jnp.float32)
    cx = jnp.sum(wx * oh, -1)
    cy = jnp.sum(wy * oh, -1)
    dx = cx - s.x
    dy = cy - s.y
    d = jnp.sqrt(dx * dx + dy * dy) + 1e-9
    alive = s.health > 0
    step = jnp.minimum(speed, d) * alive
    x = s.x + step * dx / d
    y = s.y + step * dy / d
    reached = d < 0.02
    pos2 = jnp.where(reached & (pos < plen - 1), pos + 1, pos)
    return s._replace(x=x, y=y), pos2
