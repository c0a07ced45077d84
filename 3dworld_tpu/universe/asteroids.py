"""Asteroid fields and procedural asteroid models.

uasteroid_field (asteroid.cpp:940-1140): a spherical field of drifting,
rotating asteroids with asteroid-asteroid elastic collisions resolved
through a uniform grid; models are noise-displaced spheres
(AS_MODEL_HMAP, asteroid.cpp:508 — the heightmap-displaced model is the
field default).

TPU design: the field is SoA ([N] component arrays); the collision
broad phase reuses the physics engine's Morton-sorted banded pair pass
(physics/step.py) instead of the reference's 3-D bucket grid — same
spatial-locality idea, no ragged buckets.  Models displace a lat-long
sphere mesh with fbm3d sampled at the vertices (one batched call).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import noise as NZ
from ..physics.step import morton_key, _pair_deltas

AST_VEL_SCALE = 0.002
AST_ROT_MAX = 0.02


class AsteroidField(NamedTuple):
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    radius: jax.Array
    rot: jax.Array      # accumulated rotation angle
    rot_rate: jax.Array
    rseed: jax.Array    # per-asteroid model seed (int32)


def gen_asteroid_field(key, field_radius: float, n: int = 512) -> AsteroidField:
    """gen_asteroid_placements: uniform sphere interior, random velocity
    and rotation rates, log-distributed sizes."""
    ks = jax.random.split(key, 6)
    # uniform in ball: r = R * u^(1/3)
    u = jax.random.uniform(ks[0], (n,))
    r = field_radius * jnp.power(u, 1.0 / 3.0)
    cth = jax.random.uniform(ks[1], (n,), minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(ks[2], (n,), minval=0.0, maxval=2 * np.pi)
    sth = jnp.sqrt(1.0 - cth * cth)
    vel = AST_VEL_SCALE * field_radius * jax.random.normal(ks[3], (3, n))
    size = field_radius * 0.01 * jnp.exp(
        jax.random.uniform(ks[4], (n,), minval=-1.2, maxval=0.8))
    return AsteroidField(
        px=r * sth * jnp.cos(phi), py=r * sth * jnp.sin(phi), pz=r * cth,
        vx=vel[0], vy=vel[1], vz=vel[2],
        radius=size,
        rot=jnp.zeros((n,)),
        rot_rate=AST_ROT_MAX * jax.random.uniform(ks[5], (n,), minval=-1.0,
                                                  maxval=1.0),
        rseed=jax.random.randint(jax.random.fold_in(key, 9), (n,), 0, 1 << 30),
    )


@functools.partial(jax.jit, static_argnames=("window",))
def step_asteroid_field(f: AsteroidField, field_radius, dt,
                        window: int = 32) -> AsteroidField:
    """apply_physics: drift + spin, reflect at the field boundary,
    elastic pair collisions (Morton-banded instead of the 3-D grid)."""
    px = f.px + dt * f.vx
    py = f.py + dt * f.vy
    pz = f.pz + dt * f.vz
    # boundary: reflect radially (the reference wraps/clamps to field)
    r = jnp.sqrt(px * px + py * py + pz * pz)
    out = r > field_radius
    inv = 1.0 / jnp.maximum(r, 1e-9)
    rd = (f.vx * px + f.vy * py + f.vz * pz) * inv
    vx = jnp.where(out, f.vx - 2.0 * rd * px * inv, f.vx)
    vy = jnp.where(out, f.vy - 2.0 * rd * py * inv, f.vy)
    vz = jnp.where(out, f.vz - 2.0 * rd * pz * inv, f.vz)
    scale = jnp.where(out, field_radius * inv, 1.0)
    px, py, pz = px * scale, py * scale, pz * scale

    # Morton co-sort the whole field, then banded pair pass
    key = morton_key(px, py, 0.05 * field_radius, 2.0 * field_radius)
    cols = [px, py, pz, vx, vy, vz, f.radius, f.rot, f.rot_rate,
            f.rseed.astype(jnp.float32)]
    srt = jax.lax.sort([key] + cols, num_keys=1)
    px, py, pz, vx, vy, vz, rad, rot, rr, rs = srt[1:]
    mass = rad ** 3
    act = jnp.ones_like(px, bool)
    dpx, dpy, dpz, dvx, dvy, dvz = _pair_deltas(
        px, py, pz, vx, vy, vz, rad, mass, jnp.ones_like(px), act,
        window=window)
    return AsteroidField(
        px=px + dpx, py=py + dpy, pz=pz + dpz,
        vx=vx + dvx, vy=vy + dvy, vz=vz + dvz,
        radius=rad, rot=rot + dt * rr, rot_rate=rr,
        rseed=rs.astype(jnp.int32))


# ---------------------------------------------------------------------------
# procedural asteroid model (AS_MODEL_HMAP)
# ---------------------------------------------------------------------------

def asteroid_rock_mesh(seed: int, radius: float = 1.0, n_lat: int = 16,
                       n_lon: int = 32, rough: float = 0.35):
    """Noise-displaced sphere (uobj_asteroid_rock3d / hmap model):
    vertices of a lat-long sphere pushed along their normals by fbm3d.
    Returns (positions [V, 3], faces [F, 3])."""
    th = np.linspace(0.0, np.pi, n_lat)
    ph = np.linspace(0.0, 2 * np.pi, n_lon, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    nx = np.sin(T) * np.cos(P)
    ny = np.sin(T) * np.sin(P)
    nz = np.cos(T)
    off = 13.7 * (seed & 0xFFFF) / 65536.0
    disp = np.asarray(NZ.fbm3d(
        jnp.asarray(2.5 * nx.ravel(), jnp.float32),
        jnp.asarray(2.5 * ny.ravel(), jnp.float32),
        jnp.asarray(2.5 * nz.ravel(), jnp.float32),
        rx=off, ry=0.37 * off + 1.1,
        octaves=4, seed=seed & 0x7FFFFFFF)).reshape(n_lat, n_lon)
    rr = radius * (1.0 + rough * disp)
    pos = np.stack([rr * nx, rr * ny, rr * nz], -1).reshape(-1, 3)
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = a + n_lon
            d = b + n_lon
            faces.append((a, b, c))
            faces.append((b, d, c))
    return pos.astype(np.float32), np.asarray(faces, np.int32)
