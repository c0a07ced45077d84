"""Dynamic lights: per-frame packed light volumes.

The reference packs up to 1024 dynamic lights per frame into textures for
shader evaluation (light_source.cpp:651, lightmap.cpp dl_sources
packing, README.md:21).  The TPU analog: the frame's dlight set is SoA
arrays, and their contribution evaluates as one fused pass — either into
the light volume (for volumetric consumers) or at arbitrary query points
(for surfaces/objects).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_DLIGHTS = 1024  # README.md:21


class DLights(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array
    radius: jax.Array
    r: jax.Array
    g: jax.Array
    b: jax.Array
    enabled: jax.Array


def pack_dlights(entries, capacity: int = MAX_DLIGHTS) -> DLights:
    """Pack a frame's light list into the fixed-capacity SoA."""
    import numpy as np
    a = np.zeros((capacity, 7), np.float32)
    n = min(len(entries), capacity)
    if n:
        a[:n] = np.asarray(entries, np.float32)[:n]
    en = jnp.arange(capacity) < n
    J = jnp.asarray
    return DLights(x=J(a[:, 0]), y=J(a[:, 1]), z=J(a[:, 2]), radius=J(a[:, 3]),
                   r=J(a[:, 4]), g=J(a[:, 5]), b=J(a[:, 6]), enabled=en)


def material_sphere_dlights(objects, mat_first: int, mats,
                            capacity: int = None) -> DLights:
    """Emissive thrown material spheres as dynamic lights at their LIVE
    positions (throw_sphere binds a light to the object,
    sphere_materials.cpp:388-394: add_cube_face_lights/light_radius).
    Host-side pack: call per frame (or per chained chunk) with the
    current ObjectState."""
    import numpy as np
    ot = np.asarray(objects.otype)
    alive = np.asarray(objects.status) > 0
    px = np.asarray(objects.px)
    py = np.asarray(objects.py)
    pz = np.asarray(objects.pz)
    entries = []
    for i in np.nonzero(alive & (ot >= mat_first))[0]:
        m = mats[(int(ot[i]) - mat_first) % len(mats)]
        if m.emissive and m.light_radius > 1e-5:
            entries.append((px[i], py[i], pz[i], m.light_radius,
                            *m.diffuse_color))
    return pack_dlights(entries, capacity or MAX_DLIGHTS)


@jax.jit
def eval_dlights_at(dl: DLights, px, py, pz):
    """Summed dlight RGB at query points [N] (shader-side falloff:
    (1 - d/r)^2 inside the radius)."""
    dx = px[:, None] - dl.x[None, :]
    dy = py[:, None] - dl.y[None, :]
    dz = pz[:, None] - dl.z[None, :]
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    fall = jnp.maximum(1.0 - d / jnp.maximum(dl.radius[None, :], 1e-6), 0.0) ** 2
    fall = fall * dl.enabled[None, :].astype(jnp.float32)
    return fall @ dl.r, fall @ dl.g, fall @ dl.b


@functools.partial(jax.jit, static_argnames=("world",))
def dlight_volume(dl: DLights, grid, world):
    """Accumulate the frame's dlights into the local-light volume channels
    (the texture-packing consumer path)."""
    nz, ny, nx = grid.shape
    # cell CENTERS on every axis (+0.5, matching lmap.cell_index's floor
    # binning and the z axis below — lower-corner xy sampling would
    # shift every light's footprint half a cell toward -x/-y)
    xi = (jnp.arange(nx, dtype=jnp.float32) - nx // 2 + 0.5) * world.dx
    yi = (jnp.arange(ny, dtype=jnp.float32) - ny // 2 + 0.5) * world.dy
    zi = grid.z0 + (jnp.arange(nz, dtype=jnp.float32) + 0.5) * grid.dz
    # evaluate per z-layer to bound memory: [ny*nx] queries per layer
    px = jnp.broadcast_to(xi[None, :], (ny, nx)).reshape(-1)
    py = jnp.broadcast_to(yi[:, None], (ny, nx)).reshape(-1)

    def layer(z):
        r, g, b = eval_dlights_at(dl, px, py, jnp.full_like(px, z))
        return r.reshape(ny, nx), g.reshape(ny, nx), b.reshape(ny, nx)

    # lax.map keeps one layer's [ny*nx, MAX_DLIGHTS] intermediate live
    # at a time; vmap would materialize all nz at once (~GBs)
    rs, gs, bs = jax.lax.map(layer, zi)
    return grid._replace(lc_r=grid.lc_r + rs, lc_g=grid.lc_g + gs,
                         lc_b=grid.lc_b + bs)
