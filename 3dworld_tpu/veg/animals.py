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

A_BIRD, A_FISH, A_BUTTERFLY, A_RAT = range(4)


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
