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

# weapon table subset (Gameplay.cpp weapons -> spawned object type + params)
# (name, obj_type, velocity, fire_delay, damage_mult)
WEAPONS = (
    ("rocket", "ROCKET", 2.0, 20, 1.0),
    ("seek_d", "SEEK_D", 1.8, 40, 1.0),
    ("ball", "BALL", 1.5, 10, 1.0),
    ("grenade", "GRENADE", 1.2, 30, 1.0),
    ("plasma", "PLASMA", 1.6, 15, 1.0),
    ("star5", "STAR5", 2.5, 8, 1.0),
)


def fire_weapon(state: ObjectState, free_slots, weapon_idx: int,
                origin, direction, table) -> ObjectState:
    """Spawn a projectile into free object slots (object group spawn)."""
    name, otype, vel, _, _ = WEAPONS[weapon_idx]
    tid = PT.type_id(otype)
    slot = free_slots[0]
    d = np.asarray(direction, np.float32)
    d = d / max(np.linalg.norm(d), 1e-9)
    return state._replace(
        px=state.px.at[slot].set(origin[0]),
        py=state.py.at[slot].set(origin[1]),
        pz=state.pz.at[slot].set(origin[2]),
        vx=state.vx.at[slot].set(vel * d[0]),
        vy=state.vy.at[slot].set(vel * d[1]),
        vz=state.vz.at[slot].set(vel * d[2]),
        otype=state.otype.at[slot].set(tid),
        status=state.status.at[slot].set(1),
        time=state.time.at[slot].set(0),
        health=state.health.at[slot].set(float(table.health[tid])),
    )


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
    tgt = jnp.argmin(d2m, axis=1)
    toh = jax.nn.one_hot(tgt, n, dtype=jnp.float32)
    tx = toh @ s.x
    ty = toh @ s.y
    dist = jnp.sqrt(jnp.min(d2m, axis=1))
    flee = s.health < 25.0
    dirx = jnp.where(flee, s.x - tx, tx - s.x)
    diry = jnp.where(flee, s.y - ty, ty - s.y)
    dl = jnp.sqrt(dirx * dirx + diry * diry) + 1e-9
    x = s.x + jnp.where(alive, speed * dirx / dl, 0.0)
    y = s.y + jnp.where(alive, speed * diry / dl, 0.0)
    fire = alive & ~flee & (dist < 1.0) & (s.cooldown <= 0)
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
