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
