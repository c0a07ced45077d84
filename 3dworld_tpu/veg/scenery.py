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


# ---------------------------------------------------------------------------
# per-kind geometry (scenery.cpp): terrain-following logs, flared
# stumps, plants with leaf rings + berries, squashed surface rocks
# ---------------------------------------------------------------------------

# plant type table (pltype, scenery.cpp:28-37):
# (stem r,g,b, leaf r,g,b, berry r,g,b,a) — berry alpha 0 = no berries
PLANT_TYPES = np.array([
    (0.4, 0.6, 0.2, 0.7, 0.7, 0.7, 0.0, 0.0, 0.0, 0.0),   # mj_leaf
    (0.4, 0.6, 0.2, 0.7, 0.7, 0.7, 0.0, 0.0, 0.0, 0.0),   # plant1
    (0.4, 0.6, 0.2, 0.7, 0.7, 0.7, 0.5, 0.2, 0.7, 1.0),   # plant2 (purple)
    (0.4, 0.6, 0.2, 0.7, 0.7, 0.7, 0.9, 0.1, 0.05, 1.0),  # plant3 (red)
    (0.4, 0.6, 0.2, 0.7, 0.7, 0.7, 0.0, 0.0, 0.0, 0.0),   # plant4
    (0.6, 0.45, 0.25, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0),  # coffee
    (0.2, 0.7, 0.2, 0.1, 0.4, 0.1, 0.0, 0.0, 0.0, 0.0),   # seaweed (water)
], np.float32)
NUM_LAND_PLANT_TYPES = 6
NUM_PLANT_TYPES = 7


class LogSet(NamedTuple):
    """Terrain-following logs (s_log::create, scenery.cpp:569-600):
    endpoints independently snapped to the mesh, two radii."""

    x1: jax.Array
    y1: jax.Array
    z1: jax.Array
    x2: jax.Array
    y2: jax.Array
    z2: jax.Array
    r1: jax.Array
    r2: jax.Array
    valid: jax.Array


def gen_logs(set_: ScenerySet, mesh, world) -> LogSet:
    from ..physics.step import sample_mesh
    sel = set_.kind == S_LOG
    h = w3d_rng.xxhash_u32((set_.x * 1000).astype(jnp.int32).astype(jnp.uint32),
                           seed=0x106)
    u1 = (h & 0xFFFF).astype(jnp.float32) / 65535.0
    u2 = ((h >> 16) & 0xFFFF).astype(jnp.float32) / 65535.0
    r1 = 0.003 + 0.005 * u1           # rand_uniform2(0.003, 0.008)
    r2 = r1 * (0.9 + 0.2 * u2)
    length = jnp.clip(4.0 * r1 + u2 * 16.0 * r1, 0.03, 0.15)
    dx = jnp.cos(set_.rot) * length
    dy = jnp.sin(set_.rot) * length
    x2 = set_.x + dx
    y2 = set_.y + dy
    mh1, *_ = sample_mesh(mesh, set_.x, set_.y, world)
    mh2, *_ = sample_mesh(mesh, x2, y2, world)
    return LogSet(x1=set_.x, y1=set_.y, z1=mh1 + 0.85 * r1,
                  x2=x2, y2=y2, z2=mh2 + 0.85 * r2,
                  r1=r1, r2=r2, valid=set_.valid & sel)


class PlantSet(NamedTuple):
    """Plants: stem + leaf rings (s_plant::create_leaf_points) + berry
    clusters for types with a berry color."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    height: jax.Array
    radius: jax.Array
    ptype: jax.Array        # index into PLANT_TYPES
    theta0: jax.Array       # ring start angle (derived from height)
    has_berries: jax.Array
    valid: jax.Array


def gen_plants(set_: ScenerySet, mesh, world, water_z: float = -1e9) -> PlantSet:
    from ..physics.step import sample_mesh
    sel = set_.kind == S_PLANT
    mh, *_ = sample_mesh(mesh, set_.x, set_.y, world)
    underwater = mh < water_z
    h = w3d_rng.xxhash_u32((set_.y * 1000).astype(jnp.int32).astype(jnp.uint32),
                           seed=0x91A)
    # water cells force the seaweed type (place land_plants_only logic)
    ptype = jnp.where(underwater, NUM_PLANT_TYPES - 1,
                      (h % NUM_LAND_PLANT_TYPES).astype(jnp.int32))
    height = set_.size * (2.0 + ((h >> 8) % 256).astype(jnp.float32) / 256.0)
    # theta0 = (int(1e6 * height) % 360) degrees (create_leaf_points)
    theta0 = jnp.mod(jnp.floor(1.0e6 * height), 360.0) * (np.pi / 180.0)
    berry_a = jnp.asarray(PLANT_TYPES)[:, 9]
    has_berries = berry_a[ptype] > 0.5
    return PlantSet(x=set_.x, y=set_.y, z=mh, height=height,
                    radius=0.013 * height / 0.05 * set_.size,
                    ptype=ptype, theta0=theta0, has_berries=has_berries,
                    valid=set_.valid & sel)


def plant_leaf_points(p: PlantSet, nrings: int = 3, nleaves: int = 5):
    """[N, nrings*nleaves, 3] leaf positions: rings of leaves around the
    stem at increasing height, ring start angle theta0 (the reference's
    create_leaf_points layout)."""
    N = p.x.shape[0]
    ring = jnp.arange(nrings, dtype=jnp.float32)
    leaf = jnp.arange(nleaves, dtype=jnp.float32)
    th = (p.theta0[:, None, None] + ring[None, :, None] * 0.7
          + leaf[None, None, :] * (2 * np.pi / nleaves))
    zf = 0.5 + 0.5 * (ring[None, :, None] + 1.0) / nrings
    rr = p.radius[:, None, None] * (8.0 - 2.0 * ring[None, :, None])
    lx = p.x[:, None, None] + rr * jnp.cos(th)
    ly = p.y[:, None, None] + rr * jnp.sin(th)
    lz = p.z[:, None, None] + p.height[:, None, None] * zf
    return (lx.reshape(N, -1), ly.reshape(N, -1), lz.reshape(N, -1))


class RockSet(NamedTuple):
    """Surface rocks: spheres with per-axis squash (surface_rock /
    s_rock random scaling)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    radius: jax.Array
    sx: jax.Array
    sy: jax.Array
    sz: jax.Array
    valid: jax.Array


def gen_rocks(set_: ScenerySet, mesh, world) -> RockSet:
    from ..physics.step import sample_mesh
    sel = (set_.kind == S_ROCK) | (set_.kind == S_VOXEL_ROCK)
    mh, *_ = sample_mesh(mesh, set_.x, set_.y, world)
    h = w3d_rng.xxhash_u32((set_.x * 777).astype(jnp.int32).astype(jnp.uint32),
                           seed=0x20CC)
    sq = lambda sh: 0.7 + 0.6 * ((h >> sh) % 256).astype(jnp.float32) / 256.0
    return RockSet(x=set_.x, y=set_.y, z=mh + 0.3 * set_.size,
                   radius=set_.size, sx=sq(0), sy=sq(8), sz=sq(16),
                   valid=set_.valid & sel)


def scenery_cobjs(set_: ScenerySet, logs: LogSet, plants: PlantSet,
                  rocks: RockSet):
    """Collision objects for scenery (each type's add_cobjs)."""
    from ..scene import cobj as SC
    from ..physics.cobjs import COLL_SPHERE, COLL_CYLINDER_ROT, COLL_CYLINDER
    sp = SC.SceneParse()
    v = np.asarray(set_.valid)
    kind = np.asarray(set_.kind)
    for i in range(len(v)):
        if not v[i]:
            continue
        if kind[i] in (S_ROCK, S_VOXEL_ROCK):
            sp.cobjs.append(SC.RawCobj(
                COLL_SPHERE, (float(rocks.x[i]), float(rocks.y[i]),
                              float(rocks.z[i])), r1=float(rocks.radius[i])))
        elif kind[i] == S_LOG:
            sp.cobjs.append(SC.RawCobj(
                COLL_CYLINDER_ROT,
                (float(logs.x1[i]), float(logs.y1[i]), float(logs.z1[i])),
                (float(logs.x2[i]), float(logs.y2[i]), float(logs.z2[i])),
                r1=float(logs.r1[i]), r2=float(logs.r2[i])))
        elif kind[i] == S_STUMP:
            x, y = float(set_.x[i]), float(set_.y[i])
            z = float(np.asarray(set_.z)[i])
            s = float(np.asarray(set_.size)[i])
            # flared base: radius2 = 1.3x top radius (s_stump::create)
            sp.cobjs.append(SC.RawCobj(
                COLL_CYLINDER, (x, y, z), (x, y, z + 1.5 * s),
                r1=1.3 * s, r2=s))
        elif kind[i] == S_PLANT:
            x, y = float(plants.x[i]), float(plants.y[i])
            z = float(plants.z[i])
            hgt = float(plants.height[i])
            sp.cobjs.append(SC.RawCobj(
                COLL_CYLINDER, (x, y, z), (x, y, z + hgt),
                r1=0.25 * hgt, r2=0.1 * hgt))
    return SC.pack_cobjs(sp)
