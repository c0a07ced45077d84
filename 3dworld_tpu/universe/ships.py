"""Ships & space combat: class table, batched physics + AI step.

The reference defines config-driven ship classes and weapons (`us_class`
ship.h:503, `us_weapon` :562, parsed from ship_def_file by
ship_config.cpp), with per-ship AI (target selection, thrust control,
firing: `u_ship::ai_action` u_ship.cpp:954) updated on its own OMP thread
(Universe_control.cpp:292-300).

TPU form: the whole fleet is SoA arrays advanced by ONE vmapped step:
thrust toward target with max accel/speed clamps, alignment-masked
nearest-enemy targeting via masked pairwise distance argmin (MXU Gram
trick), ranged weapon fire with cooldowns and damage scatter.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# ship class subset (us_class: accel, max_speed, turn_r, armor, shields,
# weapon range/damage/cooldown) — config-overridable like ship_def_file
SHIP_CLASSES = np.array([
    # accel  vmax   armor shield w_range w_dam w_cool radius shield_re
    (0.002, 0.02, 100.0, 50.0, 0.5, 5.0, 20.0, 0.01, 0.2),   # fighter
    (0.001, 0.012, 400.0, 200.0, 0.8, 15.0, 40.0, 0.03, 0.5),  # cruiser
    (0.0005, 0.008, 1200.0, 600.0, 1.2, 40.0, 80.0, 0.08, 1.0),  # dreadnought
    (0.0015, 0.015, 200.0, 100.0, 0.6, 8.0, 30.0, 0.02, 0.3),  # corvette
], np.float32)
NUM_SHIP_CLASSES = len(SHIP_CLASSES)


class FleetState(NamedTuple):
    """SoA ships (~ free_obj/u_ship state)."""

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    cls: jax.Array       # class id
    align: jax.Array     # alignment/team id
    armor: jax.Array
    shields: jax.Array
    cooldown: jax.Array
    alive: jax.Array


def make_fleet(key, n: int, num_teams: int = 2, spread: float = 2.0) -> FleetState:
    ks = jax.random.split(key, 5)
    cls = jax.random.randint(ks[0], (n,), 0, NUM_SHIP_CLASSES)
    oh = jax.nn.one_hot(cls, NUM_SHIP_CLASSES, dtype=jnp.float32)
    tbl = jnp.asarray(SHIP_CLASSES)
    return FleetState(
        px=jax.random.uniform(ks[1], (n,), minval=-spread, maxval=spread),
        py=jax.random.uniform(ks[2], (n,), minval=-spread, maxval=spread),
        pz=jax.random.uniform(ks[3], (n,), minval=-spread, maxval=spread),
        vx=jnp.zeros(n), vy=jnp.zeros(n), vz=jnp.zeros(n),
        cls=cls,
        align=jax.random.randint(ks[4], (n,), 0, num_teams),
        armor=oh @ tbl[:, 2],
        shields=oh @ tbl[:, 3],
        cooldown=jnp.zeros(n),
        alive=jnp.ones(n, bool),
    )


@jax.jit
def step_fleet(f: FleetState, key) -> FleetState:
    """One combat frame: target -> thrust -> move -> fire -> damage."""
    n = f.px.shape[0]
    oh = jax.nn.one_hot(f.cls, NUM_SHIP_CLASSES, dtype=jnp.float32)
    tbl = jnp.asarray(SHIP_CLASSES)
    accel = oh @ tbl[:, 0]
    vmax = oh @ tbl[:, 1]
    w_range = oh @ tbl[:, 4]
    w_dam = oh @ tbl[:, 5]
    w_cool = oh @ tbl[:, 6]

    # nearest enemy via masked pairwise distances (ai_action target select)
    p_sq = f.px ** 2 + f.py ** 2 + f.pz ** 2
    G = (jnp.outer(f.px, f.px) + jnp.outer(f.py, f.py) + jnp.outer(f.pz, f.pz))
    d2 = p_sq[:, None] + p_sq[None, :] - 2.0 * G
    enemy = (f.align[:, None] != f.align[None, :]) & f.alive[None, :] & f.alive[:, None]
    d2m = jnp.where(enemy, d2, jnp.inf)
    tgt = jnp.argmin(d2m, axis=1)
    has_tgt = jnp.isfinite(jnp.min(d2m, axis=1))
    toh = jax.nn.one_hot(tgt, n, dtype=jnp.float32)
    tx = toh @ f.px
    ty = toh @ f.py
    tz = toh @ f.pz

    # thrust toward target (u_ship::thrust), clamp speed
    dx = tx - f.px
    dy = ty - f.py
    dz = tz - f.pz
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz) + 1e-9
    a = jnp.where(has_tgt & f.alive, accel, 0.0)
    vx = f.vx + a * dx / d
    vy = f.vy + a * dy / d
    vz = f.vz + a * dz / d
    sp = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-9
    scale = jnp.minimum(1.0, vmax / sp)
    vx, vy, vz = vx * scale, vy * scale, vz * scale
    px = f.px + vx
    py = f.py + vy
    pz = f.pz + vz

    # fire: in range + cooldown ready; damage applies shields-then-armor
    in_range = has_tgt & (d < w_range) & (f.cooldown <= 0) & f.alive
    dmg_dealt = jnp.where(in_range, w_dam, 0.0)
    # scatter damage to targets: dmg_in[j] = sum_i dealt[i] * onehot_tgt[i,j]
    dmg_in = dmg_dealt @ toh
    sh = jnp.maximum(f.shields - dmg_in, 0.0)
    overflow = jnp.maximum(dmg_in - f.shields, 0.0)
    armor = f.armor - overflow
    alive = f.alive & (armor > 0)
    cooldown = jnp.where(in_range, w_cool, jnp.maximum(f.cooldown - 1.0, 0.0))
    # shield regeneration up to the class max (us_class shield_re,
    # ship.h:507; ship_base.cpp regen path) — armor does not regen here
    sh_max = oh @ tbl[:, 3]
    sh_re = oh @ tbl[:, 8]
    sh = jnp.minimum(sh + sh_re * alive.astype(jnp.float32), sh_max)
    return f._replace(px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz,
                      armor=armor, shields=sh, cooldown=cooldown, alive=alive)


def gen_asteroid_belt(key, system_radius: float, n: int = 256):
    """Asteroid belt: torus distribution around the star (asteroid.cpp
    belt gen); returns (x, y, z, radius) SoA."""
    ks = jax.random.split(key, 4)
    ang = jax.random.uniform(ks[0], (n,), minval=0.0, maxval=2 * np.pi)
    rad = system_radius * (0.6 + 0.1 * jax.random.normal(ks[1], (n,)))
    zoff = 0.02 * system_radius * jax.random.normal(ks[2], (n,))
    size = 0.001 * system_radius * jax.random.uniform(ks[3], (n,), minval=0.3,
                                                      maxval=3.0)
    return rad * jnp.cos(ang), rad * jnp.sin(ang), zoff, size


def fleet_explosions(prev: FleetState, cur: FleetState):
    """Ships that died this step -> [K<=N] explosion records (x, y, z,
    blast radius ~ 3x ship radius; the reference spawns an explosion
    uobject per destroyed ship)."""
    died = np.asarray(prev.alive) & ~np.asarray(cur.alive)
    idx = np.where(died)[0]
    rad = np.asarray(SHIP_CLASSES)[np.asarray(cur.cls)[idx], 7] * 3.0
    return np.stack([np.asarray(cur.px)[idx], np.asarray(cur.py)[idx],
                     np.asarray(cur.pz)[idx], rad], -1) \
        if len(idx) else np.zeros((0, 4), np.float32)


@jax.jit
def orbit_step(f: FleetState, center, orbit_r, orbit_speed: float = 0.01,
               blend: float = 0.1):
    """Orbit-keeping for ships assigned to guard a body (u_ship
    orbiting behavior): steer velocity toward the tangential direction
    at `orbit_speed` plus a radial correction toward `orbit_r`."""
    cx, cy, cz = center[0], center[1], center[2]
    rx = f.px - cx
    ry = f.py - cy
    r = jnp.sqrt(rx * rx + ry * ry) + 1e-9
    tx = -ry / r
    ty = rx / r
    err = orbit_r - r
    vdx = tx * orbit_speed + (rx / r) * err * 0.05
    vdy = ty * orbit_speed + (ry / r) * err * 0.05
    vdz = (cz - f.pz) * 0.05
    vx = f.vx * (1 - blend) + vdx * blend
    vy = f.vy * (1 - blend) + vdy * blend
    vz = f.vz * (1 - blend) + vdz * blend
    return f._replace(px=f.px + vx, py=f.py + vy, pz=f.pz + vz,
                      vx=vx, vy=vy, vz=vz)
