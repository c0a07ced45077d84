"""Overhead map view: heightmap/water/city render + fractal bonus modes.

The reference's `draw_overhead_map` (map_view.cpp:127) renders the
terrain as a colored 2D map (height bands, water, buildings) with bonus
fractal modes (Mandelbrot etc., map_view.cpp:51-160).  Here: the same
products as image arrays, device-computed.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def terrain_map(heightmap, water_z, zmin, zmax):
    """[3, my, mx] RGB overhead map: height-banded land + water shading."""
    h = jnp.asarray(heightmap)
    relh = jnp.clip((h - zmin) / jnp.maximum(zmax - zmin, 1e-9), 0.0, 1.0)
    wet = h < water_z
    depth = jnp.clip((water_z - h) * 4.0, 0.0, 1.0)
    land_r = 0.25 + 0.55 * relh
    land_g = 0.45 + 0.35 * relh
    land_b = 0.2 + 0.25 * relh
    snow = relh > 0.8
    r = jnp.where(wet, 0.1 * (1 - depth), jnp.where(snow, 0.95, land_r))
    g = jnp.where(wet, 0.3 * (1 - 0.7 * depth), jnp.where(snow, 0.95, land_g))
    b = jnp.where(wet, 0.55, jnp.where(snow, 1.0, land_b))
    return jnp.stack([r, g, b])


def overlay_roads_buildings(img, road_segs, building_parts, world):
    """Stamp roads (gray) and buildings (dark) onto the map (host-side
    rasterization of the city overlays)."""
    out = np.asarray(img).copy()
    _, my, mx = out.shape
    for (x1, y1, x2, y2, wdt) in np.asarray(road_segs):
        xa, xb = int(min(x1, x2)), int(max(x1, x2)) + 1
        ya, yb = int(min(y1, y2)), int(max(y1, y2)) + 1
        out[:, max(ya, 0):min(yb, my), max(xa, 0):min(xb, mx)] = 0.35
    for p in np.asarray(building_parts):
        xa = int(p[0] / world.dx + mx // 2)
        ya = int(p[1] / world.dy + my // 2)
        xb = int(p[3] / world.dx + mx // 2) + 1
        yb = int(p[4] / world.dy + my // 2) + 1
        out[:, max(ya, 0):min(yb, my), max(xa, 0):min(xb, mx)] = 0.15
    return out


@functools.partial(jax.jit, static_argnames=("n", "max_iter"))
def mandelbrot(cx: float, cy: float, scale: float, n: int = 512,
               max_iter: int = 96):
    """Mandelbrot escape-iteration map (map_view.cpp bonus mode)."""
    xi = (jnp.arange(n, dtype=jnp.float32)[None, :] / n - 0.5) * scale + cx
    yi = (jnp.arange(n, dtype=jnp.float32)[:, None] / n - 0.5) * scale + cy
    cr = jnp.broadcast_to(xi, (n, n))
    ci = jnp.broadcast_to(yi, (n, n))

    def body(_, st):
        zr, zi, cnt = st
        zr2 = zr * zr - zi * zi + cr
        zi2 = 2.0 * zr * zi + ci
        esc = (zr2 * zr2 + zi2 * zi2) > 4.0
        cnt = cnt + (~esc).astype(jnp.float32)
        return (jnp.where(esc, zr, zr2), jnp.where(esc, zi, zi2), cnt)

    _, _, cnt = jax.lax.fori_loop(0, max_iter, body,
                                  (jnp.zeros((n, n)), jnp.zeros((n, n)),
                                   jnp.zeros((n, n))))
    return cnt / max_iter
