"""Planet/moon surfaces: spherical heightmaps from 3D sine noise.

Re-expresses `upsurface` (upsurface.cpp:16-72): separable 3D sine-table
noise sampled on the unit sphere yields the surface height per direction;
biome coloring by temperature + water level (uplanet surface gen,
Universe.cpp:2073).

TPU form: a lat-long grid of directions evaluated as one batched program;
the per-axis term trick doesn't apply on the sphere (non-grid points), so
the noise evaluates densely: ss = sin(fx*x+px) etc. as [P, K] outer
products — one matmul-shaped contraction per axis, K=60.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import noise as N
from ..utils.rng import RandGen


@functools.partial(jax.jit, static_argnames=("nlat", "nlon"))
def planet_surface(table: N.SineTable3D, nlat: int = 64, nlon: int = 128,
                   mag: float = 1.0):
    """Heightmap [nlat, nlon] over the sphere in approx [-1, 1]."""
    lat = (jnp.arange(nlat, dtype=jnp.float32) + 0.5) / nlat * np.pi - np.pi / 2
    lon = jnp.arange(nlon, dtype=jnp.float32) / nlon * 2 * np.pi
    cl = jnp.cos(lat)[:, None]
    x = (cl * jnp.cos(lon)[None, :]).reshape(-1)
    y = (cl * jnp.sin(lon)[None, :]).reshape(-1)
    z = jnp.broadcast_to(jnp.sin(lat)[:, None], (nlat, nlon)).reshape(-1)
    # dense separable eval: val = sum_k mag_k sx_k sy_k sz_k at each point
    sx = jnp.sin(table.fx[None, :] * x[:, None] * 4.0 + table.px[None, :])
    sy = jnp.sin(table.fy[None, :] * y[:, None] * 4.0 + table.py[None, :])
    sz = jnp.sin(table.fz[None, :] * z[:, None] * 4.0 + table.pz[None, :])
    val = jnp.einsum("pk,pk,pk,k->p", sx, sy, sz, table.mag,
                     preferred_element_type=jnp.float32)
    return (mag * val).reshape(nlat, nlon)


def gen_planet_surface(seed: int, nlat: int = 64, nlon: int = 128,
                       water_level: float = 0.0):
    """Full surface for a planet seed: (heights, water_mask)."""
    table = N.gen_sine_table_3d(1.0, 1.0, (seed & 0x7FFFFFFF) or 1,
                                ((seed * 77) & 0x7FFFFFFF) or 1)
    h = planet_surface(table, nlat, nlon)
    return h, h < water_level


def surface_color(heights, water_mask, temp: float):
    """Biome coloring by temperature/water (uplanet color model, simplified):
    returns [3, nlat, nlon] RGB planes."""
    h = jnp.asarray(heights)
    hot = np.clip(temp / 80.0, 0.0, 1.0)
    land_r = 0.4 + 0.4 * hot + 0.2 * jnp.clip(h, 0, 1)
    land_g = 0.5 - 0.2 * hot + 0.2 * jnp.clip(h, 0, 1)
    land_b = 0.25 + 0.1 * jnp.clip(h, 0, 1)
    snow = h > 0.6
    r = jnp.where(water_mask, 0.1, jnp.where(snow, 0.9, land_r))
    g = jnp.where(water_mask, 0.2, jnp.where(snow, 0.9, land_g))
    b = jnp.where(water_mask, 0.55, jnp.where(snow, 0.95, land_b))
    return jnp.stack([r, g, b])


def add_craters(heights, seed: int = 0, num: int = 24,
                max_radius: float = 0.12, depth: float = 0.35):
    """Crater displacement on the spherical heightmap (the reference
    renders craters in the planet fragment shader, craters.part via
    HAS_CRATERS, Universe.cpp:278-283; here they displace the surface
    geometry instead): classic bowl + raised-rim radial profile at
    hashed lat/lon centers, sizes log-distributed, one vectorized pass.
    heights: [nlat, nlon] in planet-radius units."""
    h = jnp.asarray(heights, jnp.float32)
    nlat, nlon = h.shape
    rg = RandGen(seed + 17, 5 * seed + 29)
    lat = jnp.linspace(0.0, np.pi, nlat)[:, None]
    lon = jnp.linspace(0.0, 2.0 * np.pi, nlon, endpoint=False)[None, :]
    for _ in range(num):
        clat = rg.rand_uniform(0.15, np.pi - 0.15)
        clon = rg.rand_uniform(0.0, 2.0 * np.pi)
        r = max_radius * float(np.exp(rg.rand_uniform(-2.0, 0.0)))
        # great-circle angular distance to the crater center
        cosd = (jnp.sin(lat) * np.sin(clat) * jnp.cos(lon - clon)
                + jnp.cos(lat) * np.cos(clat))
        ang = jnp.arccos(jnp.clip(cosd, -1.0, 1.0))
        t = ang / r
        # bowl (t<1): depth*(t^2-1); rim (1<t<1.6): raised lip fading out
        bowl = depth * r * (t * t - 1.0)
        rim = 0.25 * depth * r * jnp.maximum(1.0 - (t - 1.0) / 0.6, 0.0)
        prof = jnp.where(t < 1.0, bowl, jnp.where(t < 1.6, rim, 0.0))
        h = h + prof
    return h
