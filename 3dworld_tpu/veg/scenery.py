"""Scenery: rocks, voxel rocks, logs, stumps, plants.

The reference scatters scenery objects per tile with type-specific
generation (scenery.cpp:1643): surface rocks (scaled spheres), voxel
rocks (3D noise + marching cubes), logs/stumps (cylinders), plants
(stem + leaves).  TPU form: hashed placement like trees; voxel-rock
geometry reuses the voxel engine (sphere-attenuated 3D sine field +
marching tetrahedra).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import rng as w3d_rng

S_ROCK, S_VOXEL_ROCK, S_LOG, S_STUMP, S_PLANT = range(5)


class ScenerySet(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array
    kind: jax.Array     # S_* id
    size: jax.Array
    rot: jax.Array      # orientation angle (logs)
    valid: jax.Array


def place_scenery(seed: int, tile_x0: float, tile_y0: float, zvals, norm_z,
                  world, density: float = 0.3, max_objs: int = 128) -> ScenerySet:
    my, mx = zvals.shape
    cell = jnp.arange(my * mx, dtype=jnp.uint32)
    h = w3d_rng.xxhash_u32(cell, seed=seed ^ 0x5CE9)
    u = (h >> 8).astype(jnp.float32) / (1 << 24)
    ok = (u < density * 0.05) & (norm_z.reshape(-1) > 0.5)
    score = jnp.where(ok, h, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(score)[:max_objs]
    valid = jnp.take(ok, order)
    cy = (order // mx).astype(jnp.float32)
    cx = (order % mx).astype(jnp.float32)
    h2 = w3d_rng.xxhash_u32(order.astype(jnp.uint32), seed=seed + 7)
    kind = (h2 % 5).astype(jnp.int32)
    size = 0.02 + 0.06 * ((h2 >> 8).astype(jnp.float32) / (1 << 24))
    rot = 2 * np.pi * ((h2 >> 16).astype(jnp.float32) / (1 << 16))
    return ScenerySet(
        x=(tile_x0 + cx) * world.dx, y=(tile_y0 + cy) * world.dy,
        z=jnp.take(zvals.reshape(-1), order),
        kind=kind, size=size, rot=rot, valid=valid,
    )


def voxel_rock_mesh(seed: int, size: float = 1.0, res: int = 16):
    """One voxel-rock triangle mesh (surface_rock/voxel rock gen:
    sphere-attenuated 3D sine field + isosurface extraction)."""
    from ..ops import noise as N
    from ..voxel import mc as MC

    table = N.gen_sine_table_3d(1.0, 4.0, seed + 1, seed + 2)
    field = N.eval_sine3d_grid(table, (-1.0, -1.0, -1.0),
                               (2.0 / (res - 1),) * 3, res, res, res)
    # spherical attenuation: solid blob in the middle
    g = (jnp.arange(res, dtype=jnp.float32) / (res - 1) - 0.5) * 2.0
    r = jnp.sqrt(g[None, None, :] ** 2 + g[None, :, None] ** 2 + g[:, None, None] ** 2)
    field = 0.4 * field + (r - 0.7) * 3.0
    vx, vy, vz, valid = MC.marching_tets(field, 0.0, (-size, -size, -size),
                                         (2 * size / (res - 1),) * 3)
    return MC.compact_triangles(vx, vy, vz, valid)
