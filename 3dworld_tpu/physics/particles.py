"""Secondary particle pools: bubbles, particle clouds (smoke puffs),
fires, decals.

The reference keeps these in dedicated fixed pools (`obj_vector_t`,
physics_objects.h) updated by `X::apply_physics` (Physics.cpp:1412-1590).
Update rules mirrored here:

* bubble: rises at its velocity, pops at the water surface, dies
  outside the mesh or frozen (Physics.cpp:1412-1431);
* particle_cloud: drifts with wind*0.5 + init_vel (z-wind halved),
  density *= 0.97^dt, darkness *= 0.98^dt, radius *= 1.03^dt, dies
  above the cloud ceiling / past max radius / underwater
  (Physics.cpp:1434-1475);
* fire: velocity decays 0.95^dt plus wind + jitter, radius random-walks
  with updraft coupling, heat relaxes toward U(0.25,1.2)/(0.9+2r),
  extinguishes on timeout / tiny radius / underwater, deposits surface
  damage 20*r*heat near the mesh (Physics.cpp:1497-1574);
* decal: ages out at `lifetime`; alpha holds 1 for the first half then
  fades linearly (Physics.cpp:1582-1590).

TPU design: every pool is a fixed-capacity SoA; spawn allocates dead
slots by sorting (status, slot) — no host loop, no dynamic shapes; each
update is one fused elementwise pass over the pool.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

W_FREEZE_POINT = 0.0
MAX_PART_CLOUD_RAD = 0.25
CLOUD_CEILING = 0.5
MAX_FIRE_TIME = 10000
FIRE_TOL = 1e-4


def alloc_slots(status, n_new: int):
    """Indices of up to min(n_new, capacity) dead slots (status==0),
    lowest-index first; `ok` masks slots that are genuinely free (spawns
    beyond capacity are dropped)."""
    order = jnp.argsort(status, stable=True)   # dead (0) sort first
    idx = order[:min(n_new, status.shape[0])]
    ok = status[idx] == 0
    return idx, ok


def _putter(idx, ok):
    """set() that tolerates spawn batches larger than the pool."""
    k = idx.shape[0]
    return lambda a, v: a.at[idx].set(jnp.where(ok, v[:k], a[idx]))


class BubblePool(NamedTuple):
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vel: jax.Array      # vertical rise speed
    radius: jax.Array
    time: jax.Array
    status: jax.Array   # int32: 0 dead, 1 live


def make_bubbles(capacity: int) -> BubblePool:
    z = jnp.zeros((capacity,), jnp.float32)
    return BubblePool(z, z, z, z, z, jnp.zeros((capacity,), jnp.int32),
                      jnp.zeros((capacity,), jnp.int32))


@jax.jit
def spawn_bubbles(p: BubblePool, x, y, z, vel, radius) -> BubblePool:
    """Add a batch of bubbles ([K] arrays) into free slots."""
    idx, ok = alloc_slots(p.status, x.shape[0])
    put = _putter(idx, ok)
    return p._replace(
        px=put(p.px, x), py=put(p.py, y), pz=put(p.pz, z),
        vel=put(p.vel, vel), radius=put(p.radius, radius),
        time=put(p.time, jnp.zeros(x.shape[0], jnp.int32)),
        status=put(p.status, ok.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=())
def step_bubbles(p: BubblePool, tstep, water_z, temperature,
                 mesh_xy_bound) -> tuple[BubblePool, jax.Array]:
    """One tick; returns (pool, popped mask) — popped bubbles are where
    the caller draws splashes (draw_splash, Physics.cpp:1428)."""
    live = p.status > 0
    frozen = temperature <= W_FREEZE_POINT
    pz = p.pz + tstep * p.vel
    outside = (jnp.abs(p.px) > mesh_xy_bound) | (jnp.abs(p.py) > mesh_xy_bound)
    popped = live & ~frozen & ~outside & (pz >= water_z)
    status = jnp.where(live & (frozen | outside | popped), 0, p.status)
    return p._replace(pz=jnp.where(live, pz, p.pz), time=p.time + live,
                      status=status), popped


class CloudPool(NamedTuple):
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    ivx: jax.Array      # init_vel
    ivy: jax.Array
    ivz: jax.Array
    radius: jax.Array
    density: jax.Array
    darkness: jax.Array
    damage: jax.Array
    time: jax.Array
    status: jax.Array


def make_clouds(capacity: int) -> CloudPool:
    z = jnp.zeros((capacity,), jnp.float32)
    return CloudPool(z, z, z, z, z, z, z, z, z, z,
                     jnp.zeros((capacity,), jnp.int32),
                     jnp.zeros((capacity,), jnp.int32))


@jax.jit
def spawn_clouds(p: CloudPool, x, y, z, ivx, ivy, ivz, radius, density,
                 darkness, damage) -> CloudPool:
    idx, ok = alloc_slots(p.status, x.shape[0])
    put = _putter(idx, ok)
    return p._replace(
        px=put(p.px, x), py=put(p.py, y), pz=put(p.pz, z),
        ivx=put(p.ivx, ivx), ivy=put(p.ivy, ivy), ivz=put(p.ivz, ivz),
        radius=put(p.radius, radius), density=put(p.density, density),
        darkness=put(p.darkness, darkness), damage=put(p.damage, damage),
        time=put(p.time, jnp.zeros(x.shape[0], jnp.int32)),
        status=put(p.status, ok.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=())
def step_clouds(p: CloudPool, tstep, wind, water_z, zmax_est) -> CloudPool:
    live = p.status > 0
    dead = (p.pz >= (CLOUD_CEILING + zmax_est)) \
        | (p.radius > MAX_PART_CLOUD_RAD) | (p.pz < water_z)
    status = jnp.where(live & dead, 0, p.status)
    vx = 0.5 * wind[0] + p.ivx
    vy = 0.5 * wind[1] + p.ivy
    vz = 0.25 * wind[2] + p.ivz        # z-wind halved then averaged
    ts = tstep / 0.025                 # fticks (1/TICKS_PER_SECOND=40 ticks)
    upd = live & ~dead
    density = jnp.where(upd, p.density * jnp.power(0.97, ts), p.density)
    darkness = jnp.where(upd, p.darkness * jnp.power(0.98, ts), p.darkness)
    density = jnp.where(density < 1e-4, 0.0, density)
    darkness = jnp.where(darkness < 1e-4, 0.0, darkness)
    return p._replace(
        px=jnp.where(upd, p.px + tstep * vx, p.px),
        py=jnp.where(upd, p.py + tstep * vy, p.py),
        pz=jnp.where(upd, p.pz + tstep * vz, p.pz),
        radius=jnp.where(upd, p.radius * jnp.power(1.03, ts), p.radius),
        density=density, darkness=darkness,
        time=p.time + upd, status=status)


class FirePool(NamedTuple):
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    radius: jax.Array
    heat: jax.Array
    time: jax.Array
    status: jax.Array   # 0 dead, 1 animated, 2 resting on object


def make_fires(capacity: int) -> FirePool:
    z = jnp.zeros((capacity,), jnp.float32)
    return FirePool(z, z, z, z, z, z, z, z,
                    jnp.zeros((capacity,), jnp.int32),
                    jnp.zeros((capacity,), jnp.int32))


@jax.jit
def spawn_fires(p: FirePool, x, y, z, radius) -> FirePool:
    idx, ok = alloc_slots(p.status, x.shape[0])
    put = _putter(idx, ok)
    zs = jnp.zeros_like(x)
    return p._replace(
        px=put(p.px, x), py=put(p.py, y), pz=put(p.pz, z),
        vx=put(p.vx, zs), vy=put(p.vy, zs), vz=put(p.vz, zs),
        radius=put(p.radius, radius),
        heat=put(p.heat, jnp.full_like(x, 0.5)),
        time=put(p.time, jnp.zeros(x.shape[0], jnp.int32)),
        status=put(p.status, ok.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=("world",))
def step_fires(p: FirePool, key, tstep, wind, water_z,
               surface_damage=None, world=None):
    """One fire tick; returns (pool, surface_damage, smoke_mask).

    smoke_mask marks fires that extinguished this tick (they emit one
    smoke puff, fire::extinguish)."""
    live = p.status > 0
    moving = p.status == 1
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = p.px.shape[0]
    jx = jax.random.uniform(k1, (n,), minval=-1.5, maxval=1.5)
    jy = jax.random.uniform(k2, (n,), minval=-1.5, maxval=1.5)
    jz = jax.random.uniform(k3, (n,), minval=-0.05, maxval=0.0585)
    ts = tstep / 0.025      # fticks: ticks of 1/TICKS_PER_SECOND=40
    decay = jnp.power(0.95, ts)
    vx = jnp.where(moving, p.vx * decay + (wind[0] + jx) * 0.005 * tstep, 0.0)
    vy = jnp.where(moving, p.vy * decay + (wind[1] + jy) * 0.005 * tstep, 0.0)
    vz = jnp.where(moving, p.vz * decay + jz * 0.005 * tstep, 0.0)
    # pos += fticks*velocity (Physics.cpp:1547) — the drift per simulated
    # second must not depend on the caller's tstep
    px = p.px + jnp.where(moving, vx * ts, 0.0)
    py = p.py + jnp.where(moving, vy * ts, 0.0)
    rj = jax.random.uniform(k4, (n,), minval=-0.02, maxval=0.02)
    radius = jnp.where(live, p.radius + (0.02 + p.radius)
                       * (rj + 250.0 * vz), p.radius)
    hr = jax.random.uniform(jax.random.fold_in(k4, 1), (n,),
                            minval=0.25, maxval=1.2)
    heat = jnp.where(live, 0.8 * p.heat + 0.2 * hr / (0.9 + 2.0 * radius),
                     p.heat)
    underwater = (p.pz - radius) < water_z
    # age timeout applies to status 1 AND 2 — the reference's guard is
    # is_static (placed fires, a separate flag this pool doesn't hold),
    # not the moving/resting status (Physics.cpp:1519)
    timeout = live & (p.time > MAX_FIRE_TIME)
    out = live & (timeout | (radius < FIRE_TOL) | underwater)
    status = jnp.where(out, 0, p.status)
    smoke_mask = out   # extinguish -> gen_smoke above the fire
    if surface_damage is not None and world is not None:
        gx = jnp.clip((px * world.dx_inv + world.mesh_x // 2).astype(jnp.int32),
                      0, world.mesh_x - 1)
        gy = jnp.clip((py * world.dy_inv + world.mesh_y // 2).astype(jnp.int32),
                      0, world.mesh_y - 1)
        dmg = jnp.where(live & ~out & moving, 20.0 * radius * heat, 0.0)
        surface_damage = surface_damage.at[gy, gx].add(dmg)
    return p._replace(px=px, py=py, vx=vx, vy=vy, vz=vz, radius=radius,
                      heat=heat, time=p.time + live,
                      status=status), surface_damage, smoke_mask


class DecalPool(NamedTuple):
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    nx: jax.Array       # surface normal
    ny: jax.Array
    nz: jax.Array
    radius: jax.Array
    alpha0: jax.Array
    cobj_id: jax.Array  # attached cobj (-1 = mesh)
    lifetime: jax.Array
    time: jax.Array
    status: jax.Array


def make_decals(capacity: int) -> DecalPool:
    z = jnp.zeros((capacity,), jnp.float32)
    i = jnp.zeros((capacity,), jnp.int32)
    return DecalPool(z, z, z, z, z, z, z, z, i, i, i, i)


@jax.jit
def spawn_decals(p: DecalPool, x, y, z, nx, ny, nz, radius, alpha,
                 cobj_id, lifetime) -> DecalPool:
    idx, ok = alloc_slots(p.status, x.shape[0])
    put = _putter(idx, ok)
    return p._replace(
        px=put(p.px, x), py=put(p.py, y), pz=put(p.pz, z),
        nx=put(p.nx, nx), ny=put(p.ny, ny), nz=put(p.nz, nz),
        radius=put(p.radius, radius), alpha0=put(p.alpha0, alpha),
        cobj_id=put(p.cobj_id, cobj_id), lifetime=put(p.lifetime, lifetime),
        time=put(p.time, jnp.zeros(x.shape[0], jnp.int32)),
        status=put(p.status, ok.astype(jnp.int32)))


@jax.jit
def step_decals(p: DecalPool) -> DecalPool:
    live = p.status > 0
    time = p.time + live
    return p._replace(time=time,
                      status=jnp.where(live & (time > p.lifetime), 0,
                                       p.status))


def decal_alpha(p: DecalPool) -> jax.Array:
    """First half full alpha, second half linear fade
    (decal_obj::get_alpha, Physics.cpp:1588-1590)."""
    frac = p.time.astype(jnp.float32) / jnp.maximum(
        p.lifetime.astype(jnp.float32), 1.0)
    return p.alpha0 * jnp.clip(2.0 - 2.0 * frac, 0.0, 1.0) \
        * (p.status > 0)
