"""Ground/air/water animals: flocking birds, fish schools, butterflies.

The reference simulates birds/fish/butterflies in tiled terrain with
flocking behaviors (animals.cpp:689) plus building animals (rats, spiders,
snakes — building_animals.cpp) as per-agent state machines.

TPU form: classic boids — separation/alignment/cohesion from masked
neighbor sums over the population (dense [N,N] pair terms; populations
are O(100-1K)) — one fused vmapped step; fish clamp below the water
plane, birds above terrain.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

A_BIRD, A_FISH, A_BUTTERFLY, A_RAT, A_SPIDER, A_SNAKE, A_FLY = range(7)


class AnimalState(NamedTuple):
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    kind: jax.Array


def make_animals(key, n: int, kind: int = A_BIRD, center=(0.0, 0.0, 1.0),
                 spread: float = 1.0) -> AnimalState:
    ks = jax.random.split(key, 6)
    u = lambda i, lo, hi: jax.random.uniform(ks[i], (n,), minval=lo, maxval=hi)
    return AnimalState(
        px=center[0] + u(0, -spread, spread),
        py=center[1] + u(1, -spread, spread),
        pz=center[2] + u(2, -0.2 * spread, 0.2 * spread),
        vx=u(3, -0.01, 0.01), vy=u(4, -0.01, 0.01), vz=u(5, -0.002, 0.002),
        kind=jnp.full((n,), kind, jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=())
def step_flock(a: AnimalState, zmin, zmax,
               sep_r: float = 0.08, coh_r: float = 0.5,
               max_speed: float = 0.02, home=(0.0, 0.0)):
    """One boids step: separation + alignment + cohesion + homing, with
    altitude clamped to [zmin, zmax] (birds above terrain / fish below
    water)."""
    n = a.px.shape[0]
    ex = a.px[:, None] - a.px[None, :]
    ey = a.py[:, None] - a.py[None, :]
    ez = a.pz[:, None] - a.pz[None, :]
    d2 = ex * ex + ey * ey + ez * ez
    ii = jnp.arange(n)
    not_self = ii[:, None] != ii[None, :]
    near = (d2 < coh_r ** 2) & not_self
    nn = jnp.maximum(near.sum(1), 1).astype(jnp.float32)
    w = near.astype(jnp.float32)
    # cohesion: toward local center
    cx = (w @ a.px) / nn - a.px
    cy = (w @ a.py) / nn - a.py
    cz = (w @ a.pz) / nn - a.pz
    # alignment: toward local mean velocity
    ax_ = (w @ a.vx) / nn - a.vx
    ay_ = (w @ a.vy) / nn - a.vy
    az_ = (w @ a.vz) / nn - a.vz
    # separation: away from too-close neighbors
    close = (d2 < sep_r ** 2) & not_self
    cw = jnp.where(close, 1.0 / jnp.maximum(d2, 1e-5), 0.0)
    sx = cw @ jnp.ones(n) * a.px - cw @ a.px
    sy = cw @ jnp.ones(n) * a.py - cw @ a.py
    sz = cw @ jnp.ones(n) * a.pz - cw @ a.pz
    # homing: weak pull toward the flock's home region
    hx = home[0] - a.px
    hy = home[1] - a.py
    vx = a.vx + 0.02 * cx + 0.05 * ax_ + 0.002 * sx + 0.001 * hx
    vy = a.vy + 0.02 * cy + 0.05 * ay_ + 0.002 * sy + 0.001 * hy
    vz = a.vz + 0.01 * cz + 0.05 * az_ + 0.002 * sz
    sp = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-9
    lim = jnp.minimum(1.0, max_speed / sp)
    vx, vy, vz = vx * lim, vy * lim, vz * lim
    px = a.px + vx
    py = a.py + vy
    pz = jnp.clip(a.pz + vz, zmin, zmax)
    vz = jnp.where((pz <= zmin) | (pz >= zmax), -vz * 0.5, vz)
    return a._replace(px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz)


# ---------------------------------------------------------------------------
# tiled-terrain birds (animals.cpp bird_t::update :259 + vect_bird_t::flock
# :297): straight flight with random small turns, plus the reference's
# three xy flocking forces applied at CONSTANT speed
# (apply_force_xy_const_vel :277 — force turns the bird, never slows it)
# ---------------------------------------------------------------------------

BIRD_SPEED = 0.05      # animals.h BIRD_SPEED-equivalent in scene units


def step_birds(a: AnimalState, key, neighbor_dist: float = 0.5,
               fticks: float = 1.0):
    """One bird frame, vectorized over the population.

    bird_t::update: with probability 1/2 per bird per frame, jitter the
    direction by up to 5% and renormalize (speed preserved).  Then
    vect_bird_t::flock applies separation (0.05/d^2 within 0.2 nd^2),
    cohesion (0.05 toward the neighborhood mean within 0.3 nd^2) and
    alignment (0.5 x mean velocity within 0.25 nd^2), divided by mass
    100, as an xy force that TURNS the constant-speed velocity."""
    n = a.px.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    speed = jnp.sqrt(a.vx ** 2 + a.vy ** 2 + a.vz ** 2) + 1e-12
    # random 5% direction jitter on half the birds (rand()&1)
    do_turn = jax.random.uniform(k1, (n,)) < 0.5
    jx = 0.05 * jax.random.uniform(k2, (n,), minval=-1.0, maxval=1.0)
    jy = 0.05 * jax.random.uniform(k3, (n,), minval=-1.0, maxval=1.0)
    vx = a.vx + jnp.where(do_turn, jx * speed, 0.0)
    vy = a.vy + jnp.where(do_turn, jy * speed, 0.0)
    vm = jnp.sqrt(vx * vx + vy * vy + a.vz ** 2) + 1e-12
    vx, vy, vz = vx * speed / vm, vy * speed / vm, a.vz * speed / vm

    # flock forces (xy distances only, like the reference)
    nd_sq = neighbor_dist * neighbor_dist
    ex = a.px[:, None] - a.px[None, :]
    ey = a.py[:, None] - a.py[None, :]
    dxy_sq = ex * ex + ey * ey
    ii = jnp.arange(n)
    not_self = ii[:, None] != ii[None, :]
    sep = not_self & (dxy_sq < 0.2 * nd_sq)
    coh = not_self & (dxy_sq < 0.3 * nd_sq)
    ali = not_self & (dxy_sq < 0.25 * nd_sq)
    inv_d2 = jnp.where(sep, 1.0 / jnp.maximum(dxy_sq, 1e-8), 0.0)
    fx = 0.05 * jnp.sum(ex * inv_d2, axis=1)
    fy = 0.05 * jnp.sum(ey * inv_d2, axis=1)
    pc = jnp.maximum(coh.sum(1), 1).astype(jnp.float32)
    cw = coh.astype(jnp.float32)
    fx = fx + 0.05 * ((cw @ a.px) / pc - a.px) * (coh.any(1))
    fy = fy + 0.05 * ((cw @ a.py) / pc - a.py) * (coh.any(1))
    vc = jnp.maximum(ali.sum(1), 1).astype(jnp.float32)
    aw = ali.astype(jnp.float32)
    fx = fx + 0.5 * (aw @ a.vx) / vc * (ali.any(1))
    fy = fy + 0.5 * (aw @ a.vy) / vc * (ali.any(1))
    # apply_force_xy_const_vel: add xy force/mass, renormalize to speed
    vx2 = vx + fx / 100.0
    vy2 = vy + fy / 100.0
    vm2 = jnp.sqrt(vx2 * vx2 + vy2 * vy2 + vz * vz) + 1e-12
    vx, vy, vz = vx2 * speed / vm2, vy2 * speed / vm2, vz * speed / vm2
    return a._replace(px=a.px + vx * fticks, py=a.py + vy * fticks,
                      pz=a.pz + vz * fticks, vx=vx, vy=vy, vz=vz)


# ---------------------------------------------------------------------------
# tiled-terrain fish (animals.cpp fish_t::update :219): scatter from the
# player, drag back to cruise speed, random heading updates, shallow-water
# revert
# ---------------------------------------------------------------------------

FISH_SPEED = 0.002


def gen_fish(key, n: int, mesh, water_z: float, world,
             half_height: float = 0.01) -> AnimalState:
    """fish_t::gen: random xy in range, keep only where water depth >
    0.1; z uniform in [mesh + 1.6 hh, water_z - 2 hh] (disabled fish get
    kind -1)."""
    from ..physics.step import sample_mesh
    ks = jax.random.split(key, 4)
    px = jax.random.uniform(ks[0], (n,), minval=-world.x_scene,
                            maxval=world.x_scene)
    py = jax.random.uniform(ks[1], (n,), minval=-world.y_scene,
                            maxval=world.y_scene)
    h, *_ = sample_mesh(jnp.asarray(mesh), px, py, world)
    depth = water_z - h
    fzmin = h + 1.6 * half_height
    fzmax = water_z - 2.0 * half_height
    ok = (depth > 0.1) & (fzmin < fzmax)
    u = jax.random.uniform(ks[2], (n,))
    pz = fzmin + u * jnp.maximum(fzmax - fzmin, 0.0)
    ang = jax.random.uniform(ks[3], (n,), minval=0.0, maxval=2 * np.pi)
    sp = FISH_SPEED
    return AnimalState(px=px, py=py, pz=pz,
                       vx=sp * jnp.cos(ang), vy=sp * jnp.sin(ang),
                       vz=jnp.zeros((n,)),
                       kind=jnp.where(ok, A_FISH, -1).astype(jnp.int32))


def step_fish(a: AnimalState, key, mesh, world, player_pos,
              half_height: float = 0.01, fticks: float = 1.0):
    """fish_t::update, vectorized: within 15 r of the player swim
    directly AWAY at 10x cruise speed (xy only); when fast, drag by
    0.96^fticks; else 1/128 chance of a +-25% heading jitter.  A move
    into water shallower than 1.5 half-heights reverts and re-rolls the
    heading (or freezes when chased)."""
    from ..physics.step import sample_mesh
    n = a.px.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    alive = a.kind >= 0
    dx = a.px - player_pos[0]
    dy = a.py - player_pos[1]
    dz = a.pz - player_pos[2]
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz) + 1e-9
    radius = 2.0 * half_height
    chased = d < 15.0 * radius
    away = jnp.sqrt(dx * dx + dy * dy) + 1e-9
    vx = jnp.where(chased, 10.0 * FISH_SPEED * dx / away, a.vx)
    vy = jnp.where(chased, 10.0 * FISH_SPEED * dy / away, a.vy)
    vz = jnp.where(chased, 0.0, a.vz)
    speed = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    far = d > 20.0 * radius
    drag = far & (speed > FISH_SPEED)
    scale = jnp.where(drag, 0.96 ** fticks, 1.0)
    vx, vy, vz = vx * scale, vy * scale, vz * scale
    rnd = far & ~drag & (jax.random.randint(k1, (n,), 0, 128) == 0)
    jx = 0.25 * jax.random.uniform(k2, (n,), minval=-1.0, maxval=1.0)
    jy = 0.25 * jax.random.uniform(k3, (n,), minval=-1.0, maxval=1.0)
    vm = jnp.sqrt(vx * vx + vy * vy) + 1e-12
    nvx = (vx / vm + jx)
    nvy = (vy / vm + jy)
    nvm = jnp.sqrt(nvx * nvx + nvy * nvy) + 1e-12
    vx = jnp.where(rnd, speed * nvx / nvm, vx)
    vy = jnp.where(rnd, speed * nvy / nvm, vy)
    # try the move; revert where the water is too shallow
    px = a.px + vx * fticks
    py = a.py + vy * fticks
    pz = a.pz + vz * fticks
    h, *_ = sample_mesh(jnp.asarray(mesh), px, py, world)
    too_shallow = (pz - 1.5 * half_height) < h
    ang = jax.random.uniform(jax.random.fold_in(k1, 1), (n,),
                             minval=0.0, maxval=2 * np.pi)
    vx = jnp.where(too_shallow,
                   jnp.where(chased, 0.0, FISH_SPEED * jnp.cos(ang)), vx)
    vy = jnp.where(too_shallow,
                   jnp.where(chased, 0.0, FISH_SPEED * jnp.sin(ang)), vy)
    px = jnp.where(too_shallow, a.px, px)
    py = jnp.where(too_shallow, a.py, py)
    pz = jnp.where(too_shallow, a.pz, pz)
    keep = alive
    return a._replace(px=jnp.where(keep, px, a.px),
                      py=jnp.where(keep, py, a.py),
                      pz=jnp.where(keep, pz, a.pz),
                      vx=jnp.where(keep, vx, 0.0),
                      vy=jnp.where(keep, vy, 0.0),
                      vz=jnp.where(keep, vz, 0.0))


# ---------------------------------------------------------------------------
# butterflies (animals.cpp butterfly_t::update :335): acceleration random
# walks, xy heading rotation, altitude band over mesh/water, destination
# seek with rest at arrival and explore phases (update_dest :436)
# ---------------------------------------------------------------------------

class ButterflyState(NamedTuple):
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    dirx: jax.Array      # unit xy heading
    diry: jax.Array
    speed: jax.Array     # nominal forward speed
    fwd_accel: jax.Array     # the three [-1,1] accel random walks
    rot_accel: jax.Array
    alt_accel: jax.Array
    speed_factor: jax.Array  # [0.5, 1.5]
    rot_rate: jax.Array      # [-1, 1]
    alt_change: jax.Array    # [-1, 1]
    rest_time: jax.Array     # frames left resting at a flower
    explore_time: jax.Array  # frames of free roam before seeking a dest
    dest_x: jax.Array
    dest_y: jax.Array
    dest_z: jax.Array
    dest_valid: jax.Array    # bool


BFLY_RADIUS = 0.02
BFLY_SPEED = 0.004


def make_butterflies(key, n: int, world) -> ButterflyState:
    ks = jax.random.split(key, 4)
    px = jax.random.uniform(ks[0], (n,), minval=-world.x_scene,
                            maxval=world.x_scene)
    py = jax.random.uniform(ks[1], (n,), minval=-world.y_scene,
                            maxval=world.y_scene)
    ang = jax.random.uniform(ks[2], (n,), minval=0.0, maxval=2 * np.pi)
    alt = jax.random.uniform(ks[3], (n,), minval=0.2, maxval=0.8)
    z = lambda v=0.0: jnp.full((n,), v)
    return ButterflyState(
        px=px, py=py, pz=alt, dirx=jnp.cos(ang), diry=jnp.sin(ang),
        speed=z(BFLY_SPEED), fwd_accel=z(), rot_accel=z(), alt_accel=z(),
        speed_factor=z(1.0), rot_rate=z(), alt_change=z(),
        rest_time=z(), explore_time=z(60.0),
        dest_x=px, dest_y=py, dest_z=alt,
        dest_valid=jnp.zeros((n,), bool))


def step_butterflies(b: ButterflyState, key, mesh, world,
                     water_z: float = -1.0e9, fticks: float = 1.0,
                     flowers_xyz=None):
    """One butterfly frame (butterfly_t::update).  `flowers_xyz` is an
    optional ([K],[K],[K]) tuple of flower positions (the reference's
    choose_butterfly_dest picks tile flowers/plants); destinations are
    sampled from it when exploring ends."""
    from ..physics.step import sample_mesh
    n = b.px.shape[0]
    ks = jax.random.split(key, 6)
    resting = b.rest_time > 0.0
    rest_time = jnp.maximum(b.rest_time - fticks, 0.0)
    lift_off = resting & (rest_time <= 0.0)
    explore_time = jnp.where(lift_off,
                             15.0 + 15.0 * jax.random.uniform(ks[0], (n,)),
                             jnp.maximum(b.explore_time - fticks, 0.0))
    alt_change0 = jnp.where(lift_off, 0.5, b.alt_change)

    # the three accel random walks (update_accel: +-0.25 fticks clip pm1)
    upd = lambda acc, k: jnp.clip(
        acc + 0.25 * fticks * jax.random.uniform(k, (n,), minval=-1.0,
                                                 maxval=1.0), -1.0, 1.0)
    fwd = upd(b.fwd_accel, ks[1])
    rot = upd(b.rot_accel, ks[2])
    alt = upd(b.alt_accel, ks[3])
    uf = 0.01 * fticks
    speed_factor = jnp.clip(b.speed_factor + uf * fwd, 0.5, 1.5)
    rot_rate = jnp.clip(b.rot_rate + uf * rot, -1.0, 1.0)
    alt_change = jnp.clip(alt_change0 + uf * alt, -1.0, 1.0)
    delta_t = speed_factor * fticks
    rot_angle = 0.0005 * 2 * np.pi * delta_t * rot_rate * 100.0
    ca, sa = jnp.cos(rot_angle), jnp.sin(rot_angle)
    dirx = b.dirx * ca - b.diry * sa
    diry = b.dirx * sa + b.diry * ca

    # destination bias (dest_valid branch): blend heading toward dest
    ddx = b.dest_x - b.px
    ddy = b.dest_y - b.py
    rel_xy = jnp.sqrt(ddx * ddx + ddy * ddy) / BFLY_RADIUS
    alignment = jnp.where(b.dest_valid,
                          1.0 - jnp.minimum(0.005 * rel_xy, 1.0), 0.0)
    dl = jnp.sqrt(ddx * ddx + ddy * ddy) + 1e-9
    blend = 0.3 * alignment + 0.1
    bx = jnp.where(b.dest_valid, (1 - blend) * dirx + blend * ddx / dl, dirx)
    by = jnp.where(b.dest_valid, (1 - blend) * diry + blend * ddy / dl, diry)
    bl = jnp.sqrt(bx * bx + by * by) + 1e-9
    dirx, diry = bx / bl, by / bl
    # altitude toward dest when aligned (alt_change += 2 v^2 sign(dz))
    v = jnp.maximum(alignment - 0.5, 0.0)
    dz = b.dest_z - b.pz
    alt_change = jnp.clip(
        alt_change + 2.0 * v * v * jnp.sign(dz)
        * jnp.minimum(jnp.abs(dz) / BFLY_RADIUS, 1.0), -1.0, 1.0)

    move = ~resting | lift_off
    px = b.px + jnp.where(move, b.speed * dirx * delta_t * 10.0, 0.0)
    py = b.py + jnp.where(move, b.speed * diry * delta_t * 10.0, 0.0)
    pz = b.pz + jnp.where(move, 0.4 * alt_change * delta_t * BFLY_RADIUS, 0.0)

    # altitude band over terrain/water (get_butterfly_min/max_alt)
    h, *_ = sample_mesh(jnp.asarray(mesh), px, py, world)
    zmin_val = jnp.maximum(h, water_z) + 2.0 * BFLY_RADIUS
    max_alt = 0.10 * (world.x_scene + world.y_scene)
    pz = jnp.clip(pz, zmin_val, zmin_val + max_alt)

    # arrival: rest 5-10 s (at flowers), clear dest
    at_dest = b.dest_valid & (dl < 4.0 * BFLY_RADIUS)
    rest_time = jnp.where(at_dest,
                          5.0 + 5.0 * jax.random.uniform(ks[4], (n,)),
                          rest_time)
    dest_valid = b.dest_valid & ~at_dest
    # pick a new dest 10% of frames once exploring ends
    if flowers_xyz is not None:
        fx, fy, fz = flowers_xyz
        K = fx.shape[0]
        pick = (~dest_valid) & (explore_time <= 0.0) & ~resting & \
            (jax.random.uniform(ks[5], (n,)) < 0.1)
        fi = jax.random.randint(jax.random.fold_in(ks[5], 1), (n,), 0, K)
        # ignore dests behind us (dot(dir, dest-pos) < 0)
        ndx = fx[fi] - px
        ndy = fy[fi] - py
        ahead = (dirx * ndx + diry * ndy) > 0.0
        pick = pick & ahead
        dest_x = jnp.where(pick, fx[fi], b.dest_x)
        dest_y = jnp.where(pick, fy[fi], b.dest_y)
        dest_z = jnp.where(pick, fz[fi], b.dest_z)
        dest_valid = dest_valid | pick
    else:
        dest_x, dest_y, dest_z = b.dest_x, b.dest_y, b.dest_z

    return b._replace(px=px, py=py, pz=pz, dirx=dirx, diry=diry,
                      fwd_accel=fwd, rot_accel=rot, alt_accel=alt,
                      speed_factor=speed_factor, rot_rate=rot_rate,
                      alt_change=alt_change, rest_time=rest_time,
                      explore_time=explore_time, dest_x=dest_x,
                      dest_y=dest_y, dest_z=dest_z, dest_valid=dest_valid)


@functools.partial(jax.jit, static_argnames=("frames", "world"))
def step_tiled_fauna(birds: AnimalState, bfly: ButterflyState,
                     fish: AnimalState, key, mesh, world,
                     water_z: float, player_x, player_y, frames: int = 1):
    """Chain `frames` frames of the tiled-terrain fauna — birds (flock),
    butterflies (accel walks + altitude band), fish (scatter/cruise) —
    in one device program (the per-tile update loop of
    tile_draw_t::update_animals, animals.cpp, fused like the city
    frame)."""
    def body(carry, i):
        b, f, u = carry
        kk = jax.random.fold_in(key, i)
        b = step_birds(b, jax.random.fold_in(kk, 1))
        f = step_butterflies(f, jax.random.fold_in(kk, 2), mesh, world,
                             water_z=water_z)
        u = step_fish(u, jax.random.fold_in(kk, 3), mesh, world,
                      (player_x, player_y, water_z))
        return (b, f, u), None
    (birds, bfly, fish), _ = jax.lax.scan(body, (birds, bfly, fish),
                                          jnp.arange(frames))
    return birds, bfly, fish


# ---------------------------------------------------------------------------
# building spiders (building_animals.cpp:1005-1140 update_spiders)
# ---------------------------------------------------------------------------

class SpiderState(NamedTuple):
    """Wall/floor walkers: xy position + heading, z climbs toward a target
    height on walls; squished spiders stop moving."""

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    hx: jax.Array       # unit heading (xy)
    hy: jax.Array
    tz: jax.Array       # climb target height
    speed: jax.Array
    squished: jax.Array  # bool


def make_spiders(key, n: int, bounds, base_speed: float = 0.004,
                 size_range=(0.5, 1.0)) -> SpiderState:
    """add_animals_on_floor + set_spider_speed (speed = base * U(0.5,1))."""
    x1, y1, x2, y2 = bounds
    ks = jax.random.split(key, 6)
    u = lambda i, lo, hi: jax.random.uniform(ks[i], (n,), minval=lo, maxval=hi)
    ang = u(0, 0.0, 2.0 * np.pi)
    return SpiderState(
        px=u(1, x1, x2), py=u(2, y1, y2), pz=jnp.zeros((n,)),
        hx=jnp.cos(ang), hy=jnp.sin(ang),
        tz=u(3, 0.0, 0.5),
        speed=base_speed * u(4, *size_range),
        squished=jnp.zeros((n,), bool),
    )


@functools.partial(jax.jit, static_argnames=())
def step_spiders(s: SpiderState, key, bounds, ceil_z: float = 0.5,
                 turn_prob: float = 0.02) -> SpiderState:
    """One spider tick: walk the heading, bounce off the room bounds,
    occasionally retarget heading and climb height (update_spider's
    direction-change logic, batched)."""
    x1, y1, x2, y2 = bounds
    n = s.px.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    alive = ~s.squished
    mv = s.speed * alive
    near_wall = (s.px - x1 < 0.05) | (x2 - s.px < 0.05) | \
                (s.py - y1 < 0.05) | (y2 - s.py < 0.05)
    climbing = near_wall & (s.pz < s.tz - 0.01)
    # wall climbers hold xy and ascend; others walk the heading
    px = s.px + jnp.where(climbing, 0.0, mv * s.hx)
    py = s.py + jnp.where(climbing, 0.0, mv * s.hy)
    # wall bounce (reflect heading) only when not climbing
    hx = jnp.where(((px < x1) | (px > x2)) & ~climbing, -s.hx, s.hx)
    hy = jnp.where(((py < y1) | (py > y2)) & ~climbing, -s.hy, s.hy)
    px = jnp.clip(px, x1, x2)
    py = jnp.clip(py, y1, y2)
    pz = jnp.where(climbing, s.pz + mv,
                   jnp.where(near_wall, s.pz, jnp.maximum(s.pz - mv, 0.0)))
    # random retarget
    turn = jax.random.uniform(k1, (n,)) < turn_prob
    ang = jax.random.uniform(k2, (n,), minval=0.0, maxval=2.0 * np.pi)
    hx = jnp.where(turn, jnp.cos(ang), hx)
    hy = jnp.where(turn, jnp.sin(ang), hy)
    tz = jnp.where(turn, jax.random.uniform(k3, (n,), minval=0.0,
                                            maxval=ceil_z), s.tz)
    return s._replace(px=px, py=py, pz=pz, hx=hx, hy=hy, tz=tz)


def squish_spiders(s: SpiderState, x, y, radius: float = 0.05) -> SpiderState:
    """Player steps at (x, y): nearby floor spiders squish (they stop
    being updated, as the reference's `squished` flag)."""
    d2 = (s.px - x) ** 2 + (s.py - y) ** 2
    hit = (d2 < radius * radius) & (s.pz < 0.02)
    return s._replace(squished=s.squished | hit)


# ---------------------------------------------------------------------------
# building snakes (building_animals.cpp:1653-1900 update_snakes)
# ---------------------------------------------------------------------------

class SnakeState(NamedTuple):
    """Segmented bodies: the head wanders; each segment follows the one
    ahead of it (the reference stores per-snake segment chains)."""

    sx: jax.Array       # [N, S] segment x (segment 0 = head)
    sy: jax.Array
    hx: jax.Array       # [N] head heading
    hy: jax.Array
    speed: jax.Array


def make_snakes(key, n: int, bounds, num_segs: int = 10,
                base_speed: float = 0.003, seg_gap: float = 0.02) -> SnakeState:
    x1, y1, x2, y2 = bounds
    ks = jax.random.split(key, 4)
    u = lambda i, lo, hi: jax.random.uniform(ks[i], (n,), minval=lo, maxval=hi)
    ang = u(0, 0.0, 2.0 * np.pi)
    hx, hy = jnp.cos(ang), jnp.sin(ang)
    hx0 = u(1, x1, x2)
    hy0 = u(2, y1, y2)
    offs = jnp.arange(num_segs, dtype=jnp.float32) * seg_gap
    return SnakeState(
        sx=hx0[:, None] - hx[:, None] * offs[None, :],
        sy=hy0[:, None] - hy[:, None] * offs[None, :],
        hx=hx, hy=hy,
        speed=base_speed * u(3, 0.5, 1.0),
    )


@functools.partial(jax.jit, static_argnames=())
def step_snakes(s: SnakeState, key, bounds, seg_gap: float = 0.02,
                turn_prob: float = 0.03) -> SnakeState:
    """Head wanders with bounded turns; body segments chase the segment
    ahead, keeping `seg_gap` spacing (the follow constraint the reference
    enforces per segment pair)."""
    x1, y1, x2, y2 = bounds
    n = s.hx.shape[0]
    k1, k2 = jax.random.split(key)
    # head move + bounce + random small turns
    hx = jnp.where((s.sx[:, 0] < x1) | (s.sx[:, 0] > x2), -s.hx, s.hx)
    hy = jnp.where((s.sy[:, 0] < y1) | (s.sy[:, 0] > y2), -s.hy, s.hy)
    turn = jax.random.uniform(k1, (n,)) < turn_prob
    dth = jax.random.uniform(k2, (n,), minval=-0.8, maxval=0.8) * turn
    ca, sa = jnp.cos(dth), jnp.sin(dth)
    hx, hy = hx * ca - hy * sa, hx * sa + hy * ca
    head_x = jnp.clip(s.sx[:, 0] + s.speed * hx, x1, x2)
    head_y = jnp.clip(s.sy[:, 0] + s.speed * hy, y1, y2)
    # segments follow: seg i moves toward seg i-1 to seg_gap spacing
    prev_x = jnp.concatenate([head_x[:, None], s.sx[:, :-1]], axis=1)
    prev_y = jnp.concatenate([head_y[:, None], s.sy[:, :-1]], axis=1)
    dx = prev_x - s.sx
    dy = prev_y - s.sy
    d = jnp.sqrt(dx * dx + dy * dy) + 1e-9
    pull = jnp.maximum(d - seg_gap, 0.0) / d
    sx = s.sx + dx * pull
    sy = s.sy + dy * pull
    sx = sx.at[:, 0].set(head_x)
    sy = sy.at[:, 0].set(head_y)
    return s._replace(sx=sx, sy=sy, hx=hx, hy=hy)


# ---------------------------------------------------------------------------
# flies + tank fish (building_animals.cpp flies; building_fish.cpp fish
# constrained to tanks / flooded rooms) — thin bounded-flock wrappers
# ---------------------------------------------------------------------------

def make_flies(key, n: int, center, spread: float = 0.05) -> AnimalState:
    """A fly swarm buzzing around an attractor (trash/food): tiny
    erratic boids homed on `center`."""
    a = make_animals(key, n, A_FLY, center=center, spread=spread)
    return a._replace(vx=a.vx * 3.0, vy=a.vy * 3.0, vz=a.vz * 5.0)


@functools.partial(jax.jit, static_argnames=())
def step_flies(a: AnimalState, key, center, spread: float = 0.08):
    """Erratic jitter + strong homing; flies never wander far from the
    attractor (register_fly_attract semantics)."""
    n = a.px.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    jx = 0.004 * jax.random.normal(k1, (n,))
    jy = 0.004 * jax.random.normal(k2, (n,))
    jz = 0.004 * jax.random.normal(k3, (n,))
    hx = (center[0] - a.px) * 0.02
    hy = (center[1] - a.py) * 0.02
    hz = (center[2] - a.pz) * 0.02
    vx = jnp.clip(0.9 * a.vx + jx + hx, -0.02, 0.02)
    vy = jnp.clip(0.9 * a.vy + jy + hy, -0.02, 0.02)
    vz = jnp.clip(0.9 * a.vz + jz + hz, -0.02, 0.02)
    return a._replace(px=a.px + vx, py=a.py + vy, pz=a.pz + vz,
                      vx=vx, vy=vy, vz=vz)


@functools.partial(jax.jit, static_argnames=())
def step_tank_fish(a: AnimalState, bounds, sep_r: float = 0.02,
                   max_speed: float = 0.005):
    """Fish schooling inside a box (pet-store tanks / flooded rooms,
    building_fish.cpp): the flock step plus hard wall reflection."""
    x1, y1, z1, x2, y2, z2 = bounds
    a = step_flock(a, z1, z2, sep_r=sep_r, coh_r=0.2, max_speed=max_speed,
                   home=(0.5 * (x1 + x2), 0.5 * (y1 + y2)))
    vx = jnp.where((a.px < x1) | (a.px > x2), -a.vx, a.vx)
    vy = jnp.where((a.py < y1) | (a.py > y2), -a.vy, a.vy)
    vz = jnp.where((a.pz < z1) | (a.pz > z2), -a.vz, a.vz)
    return a._replace(px=jnp.clip(a.px, x1, x2), py=jnp.clip(a.py, y1, y2),
                      pz=jnp.clip(a.pz, z1, z2), vx=vx, vy=vy, vz=vz)
