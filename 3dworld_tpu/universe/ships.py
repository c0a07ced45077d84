"""Ships & space combat: class table, batched physics + AI step.

The reference defines config-driven ship classes and weapons (`us_class`
ship.h:503, `us_weapon` :562, parsed from ship_def_file by
ship_config.cpp), with per-ship AI (target selection, thrust control,
firing: `u_ship::ai_action` u_ship.cpp:954) updated on its own OMP thread
(Universe_control.cpp:292-300).

TPU form: the whole fleet is SoA arrays advanced by ONE vmapped step:
thrust toward target with max accel/speed clamps, alignment-masked
nearest-enemy targeting via masked pairwise distance argmin (MXU Gram
trick), ranged weapon fire with cooldowns (damage is
deterministic; the per-frame step key is reserved for future scatter).
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
    (0.0004, 0.006, 2000.0, 800.0, 1.0, 60.0, 60.0, 0.10, 0.8),  # abomination
    (0.0006, 0.009, 1500.0, 500.0, 1.1, 50.0, 70.0, 0.09, 0.6),  # reaper
    (0.0008, 0.010, 600.0, 300.0, 0.0, 0.0, 1.0, 0.05, 0.5),   # colony ship
], np.float32)
NUM_SHIP_CLASSES = len(SHIP_CLASSES)
CLS_FIGHTER, CLS_CRUISER, CLS_DREADNOUGHT, CLS_CORVETTE, \
    CLS_ABOMINATION, CLS_REAPER, CLS_COLONY = range(NUM_SHIP_CLASSES)

# multipart collision geometry (multipart_ship, u_ship.cpp:2880-2931):
# per-class body-frame part offsets (along +dir) + radii, in class-radius
# units; single-part classes use one part at the origin.  The
# abomination is a head + tail-sphere chain; the reaper is a main sphere
# + the blocking shield lobe aimed at the threat (USC_REAPER cobjs).
MAX_PARTS = 4
PART_OFFSETS = np.zeros((NUM_SHIP_CLASSES, MAX_PARTS, 4), np.float32)
PART_OFFSETS[:, 0] = (0.0, 0.0, 0.0, 1.0)          # main body everywhere
PART_OFFSETS[CLS_ABOMINATION] = [(0.0, 0.0, 0.0, 1.0),     # head/eye
                                 (-1.4, 0.0, 0.0, 0.6),    # tail spheres
                                 (-2.4, 0.0, 0.0, 0.45),
                                 (-3.2, 0.0, 0.0, 0.3)]
PART_OFFSETS[CLS_REAPER, 0] = (0.0, 0.0, 0.0, 1.0)
PART_OFFSETS[CLS_REAPER, 1] = (0.8, 0.0, 0.0, 0.45)        # shield lobe
NUM_PARTS = np.array([1, 1, 1, 1, 4, 2, 1], np.int32)
REAPER_BLOCK = 0.8         # damage fraction blocked by the shield lobe
ABOMIN_EYE_RATE = 0.01     # eye open/close speed (state_val units/frame)


# ship AI types (ship_config.cpp ai_strs order; u_ship::ai_action
# behavior selection, u_ship.cpp:954)
AI_IGNORE, AI_RETREAT, AI_ATT_WAIT, AI_ATT_ENEMY, AI_ATT_ALL, \
    AI_SEEKING, AI_NONE = range(7)


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
    ai: jax.Array = None        # [N] AI_* behavior (default ATT_ENEMY)
    attacked: jax.Array = None  # [N] bool: has taken damage (ATT_WAIT)
    # multipart state: facing dir (part placement + reaper shield aim)
    # and the per-class animation value (abomination eye open fraction,
    # multipart_ship state_val)
    dx: jax.Array = None
    dy: jax.Array = None
    dz: jax.Array = None
    state_val: jax.Array = None


def make_fleet(key, n: int, num_teams: int = 2, spread: float = 2.0,
               classes=None, tbl=None, aligns=None,
               center=(0.0, 0.0, 0.0)) -> FleetState:
    ks = jax.random.split(key, 6)
    if classes is None:
        cls = jax.random.randint(ks[0], (n,), 0, 4)   # combat classes
    else:
        cls = jnp.asarray(classes, jnp.int32)
    tbl = jnp.asarray(SHIP_CLASSES if tbl is None else tbl)
    oh = jax.nn.one_hot(cls, tbl.shape[0], dtype=jnp.float32)
    return FleetState(
        px=center[0] + jax.random.uniform(ks[1], (n,), minval=-spread, maxval=spread),
        py=center[1] + jax.random.uniform(ks[2], (n,), minval=-spread, maxval=spread),
        pz=center[2] + jax.random.uniform(ks[3], (n,), minval=-spread, maxval=spread),
        vx=jnp.zeros(n), vy=jnp.zeros(n), vz=jnp.zeros(n),
        cls=cls,
        align=(jnp.asarray(aligns, jnp.int32) if aligns is not None
               else jax.random.randint(ks[4], (n,), 0, num_teams)),
        armor=oh @ tbl[:, 2],
        shields=oh @ tbl[:, 3],
        cooldown=jnp.zeros(n),
        alive=jnp.ones(n, bool),
        dx=jnp.ones(n), dy=jnp.zeros(n), dz=jnp.zeros(n),
        state_val=jax.random.uniform(ks[5], (n,)),
    )


def ship_parts(f: FleetState, tbl=None, part_offsets=None,
               num_parts=None):
    """[N, K] part positions + radii in world space (multipart_ship
    collision geometry): parts lie along the facing direction, scaled by
    the class radius with static per-part radii from the class table
    (the reference also animates the abomination's tail sphere sizes
    with its state value, u_ship.cpp:2880 — not modeled here)."""
    tbl = jnp.asarray(SHIP_CLASSES if tbl is None else tbl)
    oh = jax.nn.one_hot(f.cls, tbl.shape[0], dtype=jnp.float32)
    po = jnp.asarray(PART_OFFSETS if part_offsets is None else part_offsets)
    nparr = jnp.asarray(NUM_PARTS if num_parts is None else num_parts,
                        jnp.float32)
    rad = oh @ tbl[:, 7]
    off = jnp.einsum("nc,ckj->nkj", oh, po)        # [N, K, 4]
    npart = (oh @ nparr).astype(jnp.int32)
    kidx = jnp.arange(po.shape[1])[None, :]
    valid = kidx < npart[:, None]
    pxk = f.px[:, None] + off[:, :, 0] * rad[:, None] * f.dx[:, None]
    pyk = f.py[:, None] + off[:, :, 0] * rad[:, None] * f.dy[:, None]
    pzk = f.pz[:, None] + off[:, :, 0] * rad[:, None] * f.dz[:, None]
    prk = jnp.where(valid, off[:, :, 3] * rad[:, None], 0.0)
    return pxk, pyk, pzk, prk, valid


@functools.partial(jax.jit, static_argnames=("abomin_id", "reaper_id"))
def step_fleet(f: FleetState, key, tbl=None,
               abomin_id: int = CLS_ABOMINATION,
               reaper_id: int = CLS_REAPER,
               fire_pts=None) -> FleetState:
    """One combat frame: target -> thrust -> move -> fire -> damage.
    `tbl` defaults to the built-in 7-class table; pass
    ship_config.ship_class_table(defs) for the full 40-class reference
    parameter set (abomin_id/reaper_id select the special-behavior
    classes: USC_ABOMIN=24, USC_REAPER=25 in the reference enum)."""
    n = f.px.shape[0]
    tbl = jnp.asarray(SHIP_CLASSES if tbl is None else tbl)
    oh = jax.nn.one_hot(f.cls, tbl.shape[0], dtype=jnp.float32)
    accel = oh @ tbl[:, 0]
    vmax = oh @ tbl[:, 1]
    w_range = oh @ tbl[:, 4]
    w_dam = oh @ tbl[:, 5]
    w_cool = oh @ tbl[:, 6]

    ai = (f.ai if f.ai is not None
          else jnp.full((n,), AI_ATT_ENEMY, jnp.int32))
    attacked = (f.attacked if f.attacked is not None
                else jnp.zeros((n,), bool))

    # nearest enemy via masked pairwise distances (ai_action target select)
    p_sq = f.px ** 2 + f.py ** 2 + f.pz ** 2
    G = (jnp.outer(f.px, f.px) + jnp.outer(f.py, f.py) + jnp.outer(f.pz, f.pz))
    d2 = p_sq[:, None] + p_sq[None, :] - 2.0 * G
    enemy = (f.align[:, None] != f.align[None, :]) & f.alive[None, :] & f.alive[:, None]
    d2m = jnp.where(enemy, d2, jnp.inf)
    tgt = jnp.argmin(d2m, axis=1)
    has_tgt = jnp.isfinite(jnp.min(d2m, axis=1))
    # behavior gating (u_ship::ai_action, u_ship.cpp:954): passive AIs
    # never engage; ATT_WAIT engages only once attacked; RETREAT ships
    # flee instead of closing when their shields are low
    passive = (ai == AI_IGNORE) | (ai == AI_NONE)
    waiting = (ai == AI_ATT_WAIT) & ~attacked
    has_tgt = has_tgt & ~passive & ~waiting
    toh = jax.nn.one_hot(tgt, n, dtype=jnp.float32)
    tx = toh @ f.px
    ty = toh @ f.py
    tz = toh @ f.pz

    # thrust toward target (u_ship::thrust), clamp speed; retreating
    # damaged ships thrust AWAY (ai_action retreat branch)
    dx = tx - f.px
    dy = ty - f.py
    dz = tz - f.pz
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz) + 1e-9
    sh_max = oh @ tbl[:, 3]
    fleeing = (ai == AI_RETREAT) & (f.shields < 0.25 * sh_max + 1e-6)
    a = jnp.where(has_tgt & f.alive, accel, 0.0)
    adir = jnp.where(fleeing, -1.0, 1.0)
    vx = f.vx + a * adir * dx / d
    vy = f.vy + a * adir * dy / d
    vz = f.vz + a * adir * dz / d
    sp = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-9
    scale = jnp.minimum(1.0, vmax / sp)
    vx, vy, vz = vx * scale, vy * scale, vz * scale
    px = f.px + vx
    py = f.py + vy
    pz = f.pz + vz

    # facing tracks the target direction (part placement + shield aim);
    # ships without a target keep their heading
    ndx = jnp.where(has_tgt, dx / d, f.dx)
    ndy = jnp.where(has_tgt, dy / d, f.dy)
    ndz = jnp.where(has_tgt, dz / d, f.dz)

    # abomination eye animation (multipart_ship USC_ABOMIN state_val,
    # u_ship.cpp:2880-2899): opens toward 1 in combat, drifts shut
    # otherwise; a mostly-closed eye cannot fire (ai_action :2905)
    is_abomin = f.cls == abomin_id
    sv = jnp.clip(f.state_val
                  + jnp.where(has_tgt, ABOMIN_EYE_RATE, -ABOMIN_EYE_RATE),
                  0.0, 1.0)
    eye_ok = ~is_abomin | (sv > 0.1)

    # fire: in range + cooldown ready; damage applies shields-then-armor.
    # With per-class firing points ($WEAP_PT, parsed by ship_config),
    # range is measured from the TRANSFORMED muzzle point (body-frame
    # offset scaled by class radius, rotated to the facing dir) instead
    # of the hull center — weapons mounted forward out-range rear mounts.
    if fire_pts is not None:
        fp = jnp.einsum("nc,cj->nj", oh, jnp.asarray(fire_pts))
        rad_c = oh @ tbl[:, 7]
        # body +x maps to the facing dir; lateral offsets stay small and
        # are dropped (no roll state) — forward offset is what matters
        fwd = fp[:, 0] * rad_c
        mx_ = f.px + fwd * ndx
        my_ = f.py + fwd * ndy
        mz_ = f.pz + fwd * ndz
        d_fire = jnp.sqrt((tx - mx_) ** 2 + (ty - my_) ** 2
                          + (tz - mz_) ** 2) + 1e-9
    else:
        d_fire = d
    in_range = has_tgt & ~fleeing & (d_fire < w_range) & (f.cooldown <= 0) \
        & f.alive & eye_ok
    dmg_dealt = jnp.where(in_range, w_dam, 0.0)
    # reaper shield lobe blocks most damage arriving from its aim
    # direction (USC_REAPER blocking shield, u_ship.cpp:2931-2960).
    # Reuse the Gram-trick pairwise distances and express the alignment
    # numerator as outer products instead of three [N,N] VPU
    # difference buffers
    el = jnp.sqrt(jnp.maximum(d2, 0.0)) + 1e-9
    num = (jnp.outer(f.px, ndx) - (f.px * ndx)[None, :]
           + jnp.outer(f.py, ndy) - (f.py * ndy)[None, :]
           + jnp.outer(f.pz, ndz) - (f.pz * ndz)[None, :])
    aligned = num / el > 0.5
    is_reaper_j = (f.cls == reaper_id)[None, :]
    block = jnp.where(aligned & is_reaper_j, 1.0 - REAPER_BLOCK, 1.0)
    dmg_in = jnp.sum(dmg_dealt[:, None] * toh * block, axis=0)
    sh = jnp.maximum(f.shields - dmg_in, 0.0)
    overflow = jnp.maximum(dmg_in - f.shields, 0.0)
    armor = f.armor - overflow
    alive = f.alive & (armor > 0)
    cooldown = jnp.where(in_range, w_cool, jnp.maximum(f.cooldown - 1.0, 0.0))
    attacked = attacked | (dmg_in > 0.0)
    # shield regeneration up to the class max (us_class shield_re,
    # ship.h:507; ship_base.cpp regen path) — armor does not regen here
    sh_re = oh @ tbl[:, 8]
    sh = jnp.minimum(sh + sh_re * alive.astype(jnp.float32), sh_max)
    return f._replace(px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz,
                      armor=armor, shields=sh, cooldown=cooldown, alive=alive,
                      ai=ai, attacked=attacked,
                      dx=ndx, dy=ndy, dz=ndz, state_val=sv)


@functools.partial(jax.jit, static_argnames=("frames", "abomin_id",
                                             "reaper_id"))
def fleet_frames_chained(f: FleetState, key, frames: int, tbl=None,
                         abomin_id: int = CLS_ABOMINATION,
                         reaper_id: int = CLS_REAPER,
                         fire_pts=None) -> FleetState:
    """K combat frames in ONE dispatch (lax.scan over step_fleet) so the
    live universe loop amortizes the relay round trip, exactly like the
    ground/tiled chained steps.  `tbl`/`fire_pts` ride as closure
    constants (loop-invariant arrays stay out of the scan carry)."""
    tblj = jnp.asarray(SHIP_CLASSES if tbl is None else tbl)
    fp = None if fire_pts is None else jnp.asarray(fire_pts)
    # materialize optional fields so the scan carry structure is stable
    # (step_fleet fills these defaults in its output)
    n = f.px.shape[0]
    if f.ai is None:
        f = f._replace(ai=jnp.full((n,), AI_ATT_ENEMY, jnp.int32))
    if f.attacked is None:
        f = f._replace(attacked=jnp.zeros((n,), bool))
    if f.dx is None:
        f = f._replace(dx=jnp.ones(n), dy=jnp.zeros(n), dz=jnp.zeros(n))
    if f.state_val is None:
        f = f._replace(state_val=jnp.zeros(n))

    def body(c, k):
        return step_fleet(c, k, tbl=tblj, abomin_id=abomin_id,
                          reaper_id=reaper_id, fire_pts=fp), None

    keys = jax.random.split(key, frames)
    out, _ = jax.lax.scan(body, f, keys)
    return out


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


def fleet_explosions(prev: FleetState, cur: FleetState, tbl=None):
    """Ships that died this step -> [K<=N] explosion records (x, y, z,
    blast radius ~ 3x ship radius; the reference spawns an explosion
    uobject per destroyed ship)."""
    died = np.asarray(prev.alive) & ~np.asarray(cur.alive)
    idx = np.where(died)[0]
    rad = np.asarray(SHIP_CLASSES if tbl is None else tbl)[
        np.asarray(cur.cls)[idx], 7] * 3.0
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


# ---------------------------------------------------------------------------
# colonization + orbital docks (u_ship::claim_world u_ship.cpp:808-830,
# orbiting_ship::ai_action :2974, try_orbital_regen :860)
# ---------------------------------------------------------------------------

class PlanetClaims(NamedTuple):
    """Ownership of a system's colonizable planets."""

    owner: jax.Array        # [P] int32 team (-1 unclaimed)
    homeworld_of: jax.Array  # [P] int32 claiming ship index (-1)


def make_claims(num_planets: int) -> PlanetClaims:
    return PlanetClaims(owner=jnp.full((num_planets,), -1, jnp.int32),
                        homeworld_of=jnp.full((num_planets,), -1, jnp.int32))


@jax.jit
def colonize_step(f: FleetState, planet_pos, claims: PlanetClaims,
                  claim_radius: float = 0.08):
    """One colonization frame: colony ships head for the nearest
    unclaimed planet and claim it on arrival (claim_world semantics: a
    claimed planet becomes the claimer's homeworld; first arrival wins
    a contested claim).  Returns (fleet', claims')."""
    P = planet_pos.shape[0]
    colonizer = (f.cls == CLS_COLONY) & f.alive
    unclaimed = claims.owner < 0
    # nearest unclaimed planet per ship
    ex = f.px[:, None] - planet_pos[None, :, 0]
    ey = f.py[:, None] - planet_pos[None, :, 1]
    ez = f.pz[:, None] - planet_pos[None, :, 2]
    d2 = ex * ex + ey * ey + ez * ez
    d2m = jnp.where(unclaimed[None, :], d2, jnp.inf)
    tgt = jnp.argmin(d2m, axis=1)
    has = jnp.isfinite(jnp.min(d2m, axis=1)) & colonizer
    toh = jax.nn.one_hot(tgt, P, dtype=jnp.float32)
    tx = toh @ planet_pos[:, 0]
    ty = toh @ planet_pos[:, 1]
    tz = toh @ planet_pos[:, 2]
    dx = tx - f.px
    dy = ty - f.py
    dz = tz - f.pz
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz) + 1e-9
    oh = jax.nn.one_hot(f.cls, NUM_SHIP_CLASSES, dtype=jnp.float32)
    tbl = jnp.asarray(SHIP_CLASSES)
    accel = oh @ tbl[:, 0]
    vmax = oh @ tbl[:, 1]
    a = jnp.where(has, accel, 0.0)
    vx = f.vx + a * dx / d
    vy = f.vy + a * dy / d
    vz = f.vz + a * dz / d
    sp = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-9
    s = jnp.minimum(1.0, vmax / sp)
    vx, vy, vz = vx * s, vy * s, vz * s

    # claims: for each planet, the nearest in-radius colonizer wins
    close = has[:, None] & (toh > 0.5) & (d[:, None] < claim_radius)
    d2c = jnp.where(close, d2, jnp.inf)
    winner = jnp.argmin(d2c, axis=0).astype(jnp.int32)
    any_claim = jnp.isfinite(jnp.min(d2c, axis=0)) & unclaimed
    woh = jax.nn.one_hot(winner, f.px.shape[0], dtype=jnp.float32)
    wteam = (woh @ f.align.astype(jnp.float32)).astype(jnp.int32)
    owner = jnp.where(any_claim, wteam, claims.owner)
    home = jnp.where(any_claim, winner, claims.homeworld_of)
    return (f._replace(px=f.px + vx, py=f.py + vy, pz=f.pz + vz,
                       vx=vx, vy=vy, vz=vz),
            PlanetClaims(owner=owner, homeworld_of=home))


@jax.jit
def orbital_regen(f: FleetState, dock_pos, dock_align, rate: float = 2.0,
                  dock_range: float = 0.3) -> FleetState:
    """Friendly ships near an orbiting dock regenerate armor
    (try_orbital_regen / orbiting docks, u_ship.cpp:860-900)."""
    ex = f.px[:, None] - dock_pos[None, :, 0]
    ey = f.py[:, None] - dock_pos[None, :, 1]
    ez = f.pz[:, None] - dock_pos[None, :, 2]
    d2 = ex * ex + ey * ey + ez * ez
    friendly = f.align[:, None] == dock_align[None, :]
    near = jnp.any(friendly & (d2 < dock_range * dock_range), axis=1)
    oh = jax.nn.one_hot(f.cls, NUM_SHIP_CLASSES, dtype=jnp.float32)
    amax = oh @ jnp.asarray(SHIP_CLASSES)[:, 2]
    armor = jnp.where(near & f.alive,
                      jnp.minimum(f.armor + rate, amax), f.armor)
    return f._replace(armor=armor)


# ---------------------------------------------------------------------------
# player ship control (u_ship::thrust, u_ship.cpp:282-340; player turn /
# hyperspeed semantics)
# ---------------------------------------------------------------------------

MOVE_FRONT, MOVE_BACK, MOVE_LEFT, MOVE_RIGHT, MOVE_STOP = range(5)
HYPERSPEED_MULT = 20.0     # hyperspeed_mult default
PLAYER_TURN_RATE = 0.08


class PlayerShip(NamedTuple):
    """The player-controlled ship (pos/vel/facing/up + hyperspeed latch);
    steered by thrust() commands per frame like the reference's
    player_controlled path."""

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    dx: jax.Array       # facing
    dy: jax.Array
    dz: jax.Array
    cls: jax.Array
    hyper: jax.Array    # bool latch (lhyper)


def make_player_ship(cls: int = 1, pos=(0.0, 0.0, 0.0)) -> PlayerShip:
    f = jnp.float32
    return PlayerShip(px=f(pos[0]), py=f(pos[1]), pz=f(pos[2]),
                      vx=f(0), vy=f(0), vz=f(0),
                      dx=f(1), dy=f(0), dz=f(0),
                      cls=jnp.int32(cls), hyper=jnp.asarray(False))


@functools.partial(jax.jit, static_argnames=("tdir",))
def player_thrust(s: PlayerShip, tdir: int, speed: float = 1.0,
                  hyperspeed: bool = False) -> PlayerShip:
    """One thrust command (u_ship::thrust): FRONT accelerates along the
    facing up to max_speed (x HYPERSPEED_MULT in hyperspeed, latched
    until slow — lhyper), BACK reverses, STOP brakes toward zero,
    LEFT/RIGHT yaw the facing at the player turn rate."""
    oh = jax.nn.one_hot(s.cls, NUM_SHIP_CLASSES, dtype=jnp.float32)
    tbl = jnp.asarray(SHIP_CLASSES)
    accel = jnp.sum(oh * tbl[:, 0])
    vmax = jnp.sum(oh * tbl[:, 1])
    if tdir in (MOVE_LEFT, MOVE_RIGHT):
        ang = (-1.0 if tdir == MOVE_LEFT else 1.0) * PLAYER_TURN_RATE * speed
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        ndx = s.dx * ca - s.dy * sa
        ndy = s.dx * sa + s.dy * ca
        return s._replace(dx=ndx, dy=ndy)
    sp = jnp.sqrt(s.vx ** 2 + s.vy ** 2 + s.vz ** 2)
    # hyperspeed latch: stays on until speed drops below normal max
    hyper = jnp.where(jnp.asarray(hyperspeed), True,
                      s.hyper & (sp > vmax))
    cap = jnp.where(hyper, HYPERSPEED_MULT * vmax, vmax)
    if tdir == MOVE_FRONT:
        a = accel * speed * jnp.where(hyper, HYPERSPEED_MULT, 1.0)
        vx = s.vx + a * s.dx
        vy = s.vy + a * s.dy
        vz = s.vz + a * s.dz
    elif tdir == MOVE_BACK:
        vx = s.vx - accel * speed * s.dx
        vy = s.vy - accel * speed * s.dy
        vz = s.vz - accel * speed * s.dz
    else:   # MOVE_STOP: brake toward zero (stoppable classes)
        brake = jnp.maximum(1.0 - accel * speed * 50.0, 0.0)
        vx, vy, vz = s.vx * brake, s.vy * brake, s.vz * brake
    nsp = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-12
    scl = jnp.minimum(1.0, cap / nsp)
    return s._replace(vx=vx * scl, vy=vy * scl, vz=vz * scl, hyper=hyper)


@jax.jit
def player_ship_frame(s: PlayerShip) -> PlayerShip:
    """Advance the player ship one frame (free_obj::advance_time core)."""
    return s._replace(px=s.px + s.vx, py=s.py + s.vy, pz=s.pz + s.vz)


@jax.jit
def avoid_hazards(f: FleetState, star_pos, star_radius, bhole_mask,
                  heat_mult: float = 6.0, gmax_dist: float = 0.5,
                  tbl=None):
    """Hazard avoidance (u_ship::ai_action, u_ship.cpp:995-1012): ships
    too close to a hot star fly a tangent veering away; near a black
    hole with excessive gravity they thrust directly away.  Applied
    after step_fleet; overrides the combat velocity for endangered
    ships."""
    ex = f.px[:, None] - star_pos[None, :, 0]
    ey = f.py[:, None] - star_pos[None, :, 1]
    ez = f.pz[:, None] - star_pos[None, :, 2]
    d2 = ex * ex + ey * ey + ez * ez
    near = jnp.argmin(d2, axis=1)
    noh = jax.nn.one_hot(near, star_pos.shape[0], dtype=jnp.float32)
    dx = jnp.sum(noh * ex, 1)
    dy = jnp.sum(noh * ey, 1)
    dz = jnp.sum(noh * ez, 1)
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz) + 1e-9
    srad = noh @ star_radius
    is_bh = (noh @ bhole_mask.astype(jnp.float32)) > 0.5
    hot = ~is_bh & (dist < heat_mult * srad)
    danger_bh = is_bh & (dist < gmax_dist)
    # hot: tangent + slight outward veer (orthogonalize dir against the
    # safe dir, then add 0.1 * safe)
    sx, sy, sz = dx / dist, dy / dist, dz / dist
    dp = f.dx * sx + f.dy * sy + f.dz * sz
    tx = f.dx - dp * sx + 0.1 * sx
    ty = f.dy - dp * sy + 0.1 * sy
    tz = f.dz - dp * sz + 0.1 * sz
    tl = jnp.sqrt(tx * tx + ty * ty + tz * tz) + 1e-9
    tblj = jnp.asarray(SHIP_CLASSES if tbl is None else tbl)
    oh = jax.nn.one_hot(f.cls, tblj.shape[0], dtype=jnp.float32)
    vmax = oh @ tblj[:, 1]
    esc = hot | danger_bh
    nvx = jnp.where(danger_bh, vmax * sx,
                    jnp.where(hot, vmax * tx / tl, f.vx))
    nvy = jnp.where(danger_bh, vmax * sy,
                    jnp.where(hot, vmax * ty / tl, f.vy))
    nvz = jnp.where(danger_bh, vmax * sz,
                    jnp.where(hot, vmax * tz / tl, f.vz))
    # override the VELOCITY only: step_fleet has already integrated this
    # frame's motion, so adding another position step here would move
    # escaping ships at up to 2x their class vmax (double integration)
    return f._replace(vx=nvx, vy=nvy, vz=nvz)


# ---------------------------------------------------------------------------
# reference-config fleets (ship_defs.txt -> sim)
# ---------------------------------------------------------------------------

def fleet_from_defs(defs, key, fleets=None):
    """Build ONE FleetState from parsed $FLEET specs (us_fleet::spawn,
    ship_config.cpp:473-505): per-class counts x multiplier, alignment
    from the spec, positions within rgen_dist of the fleet pos (offset by
    $START_POS like the reference's `ustart_pos + pos`).

    Returns (state, tbl, part_offsets, num_parts) — pass tbl/parts into
    step_fleet/ship_parts so all 40 reference classes drive the sim."""
    from . import ship_config as SC
    tbl = SC.ship_class_table(defs)
    offs, nparts = SC.ship_part_geometry(defs, max_parts=MAX_PARTS)
    start = defs.globals.get("start_pos", (0.0, 0.0, 0.0))
    cls_list, align_list, pos_list, spread_list, ai_list = [], [], [], [], []
    use = defs.fleets if fleets is None else fleets
    for fl in use:
        total = fl.multiplier * sum(fl.counts)
        if total == 0:
            continue
        for cid, cnt in enumerate(fl.counts):
            k = fl.multiplier * cnt
            cls_list.extend([cid] * k)
            align_list.extend([fl.align] * k)
            ai_list.extend([fl.ai_type] * k)
        center = tuple(s + p for s, p in zip(start, fl.pos))
        pos_list.extend([center] * total)
        spread_list.extend([fl.rgen_dist] * total)
    if not cls_list:
        # $SHIP_ADD_INIT + $ALIGN rows (ship_config.cpp:525-560): spawn
        # `num` instances of each alignment's counts distribution near
        # the start position (the fight/colonize configs populate this
        # way instead of $FLEET)
        spawn_d = float(defs.globals.get("spawn_dist", 0.5)) or 0.5
        for (mode, enabled, _dmax, a, num, counts) in defs.rand_spawns:
            if mode != "$SHIP_ADD_INIT" or not enabled:
                continue
            for _rep in range(max(num, 1)):
                for cid, cnt in enumerate(counts):
                    cls_list.extend([cid] * cnt)
                    align_list.extend([a] * cnt)
                    ai_list.extend([3] * cnt)      # AI_ATT_ENEMY
                    pos_list.extend([start] * cnt)
                    spread_list.extend([4.0 * spawn_d] * cnt)
    if not cls_list:
        raise ValueError("no fleets with ships in defs")
    # host-side numpy build: every stray jnp op here used to compile its
    # own XLA program over the relay (~19 compiles, ~9 s of init); only
    # the position draw touches the device, everything else uploads with
    # the first step
    n = len(cls_list)
    cls = np.asarray(cls_list, np.int32)
    tbl_np = np.asarray(tbl, np.float32)
    centers = np.asarray(pos_list, np.float32)
    spread = np.asarray(spread_list, np.float32)[:, None]
    u = np.asarray(jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0))
    pos = centers + u * spread
    z = np.zeros(n, np.float32)
    state = FleetState(
        px=pos[:, 0], py=pos[:, 1], pz=pos[:, 2],
        vx=z, vy=z, vz=z,
        cls=cls, align=np.asarray(align_list, np.int32),
        armor=tbl_np[cls, 2], shields=tbl_np[cls, 3],
        cooldown=z, alive=np.ones(n, bool),
        ai=np.asarray(ai_list, np.int32),
        attacked=np.zeros(n, bool),
        dx=np.ones(n, np.float32), dy=z, dz=z,
        state_val=z,
    )
    return state, tbl, offs, nparts


# reference special-class enum ids (ship_config.cpp ship_strs order)
USC_ABOMIN_ID = 24
USC_REAPER_ID = 25
