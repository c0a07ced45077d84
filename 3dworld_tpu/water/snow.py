"""Snow coverage precompute: batched snowflake ray casting.

The reference casts up to 64M snowflake rays downward with wind offset
and deflection bounces, OMP-parallel, accumulating a sparse z-average
voxel map merged into render strips (`create_snow_map` snow.cpp:484-540,
`gen_snow_coverage`), with file save/load (snow.cpp:284-307).

TPU form: one jitted pass per ray batch — threefry positions + wind
drift, straight-down ray vs cobjs + heightfield, scatter-average of
landing heights into the (my, mx) snow map; depth = coverage counts
normalized.  64M rays = a few hundred 256K batches.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import rng as w3d_rng
from ..utils.constants import WorldConst, DEFAULT_WORLD
from ..physics.cobjs import CobjSet
from ..ops import ray as R


SNOW_RANDOM = 1.0        # snow_random config (deflection jitter scale)
MAX_DEFLECT = 4          # lockstep bound on the reference's iter<=100 loop
SNOW_MAX_SLOPE_NZ = 0.5  # surfaces steeper than this shed flakes


@functools.partial(jax.jit, static_argnames=("world", "batch"))
def snow_batch(key, mesh, cobjs: CobjSet, wind, world: WorldConst,
               batch: int = 65536):
    """One ray batch -> (cell ids, landing z, valid).

    Deflection bounces (create_snow_map, snow.cpp:484-540): a flake
    whose ray hits a surface too steep to hold snow doesn't stick — it
    deflects by a Gaussian lateral step scaled by its remaining height
    fraction, pushed away from the surface (dot(delta, cnorm) >= 0), and
    falls again; up to MAX_DEFLECT rounds in lockstep (the reference
    loops per flake; flakes needing more rounds than the bound land
    where they are).  The reference's cnorm.z <= 0 trigger is widened to
    cnorm.z < SNOW_MAX_SLOPE_NZ: with batched vertical rays and normals
    reported against the ray, exactly-vertical first hits cannot occur,
    so the trigger keys on steepness — the same shed-off-the-wall
    semantic the reference's lateral re-rays produce."""
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (batch,), minval=-world.x_scene, maxval=world.x_scene)
    y = jax.random.uniform(k2, (batch,), minval=-world.y_scene, maxval=world.y_scene)
    top = 2.0 * world.z_scene
    zbot = -world.z_scene
    # wind offset: flakes drift as they fall (snow.cpp wind_vector)
    fall_t = 1.5 * world.z_scene
    x = x + wind[0] * fall_t * 0.1
    y = y + wind[1] * fall_t * 0.1
    from ..physics.step import sample_mesh

    ox, oy = x, y
    oz = jnp.full((batch,), top)
    zero = jnp.zeros((batch,))
    done = jnp.zeros((batch,), bool)
    z_land = jnp.zeros((batch,))
    kd = key
    for it in range(MAX_DEFLECT):
        dz = jnp.full((batch,), -1.0)
        tmax = jnp.full((batch,), 4.0 * world.z_scene)
        chit, ct, cnx, cny, cnz, _ = R.ray_cobjs_nearest(
            ox, oy, oz, zero, zero, dz, tmax, cobjs)
        mh, _, _, _ = sample_mesh(mesh, ox, oy, world)
        z_cobj = oz - ct
        land_cobj = chit & (z_cobj > mh) & (cnz >= SNOW_MAX_SLOPE_NZ)
        deflect = chit & (z_cobj > mh) & (cnz < SNOW_MAX_SLOPE_NZ) & ~done
        landed = ~done & (land_cobj | ~(chit & (z_cobj > mh)))
        z_land = jnp.where(landed, jnp.where(land_cobj, z_cobj, mh), z_land)
        done = done | landed
        if it == MAX_DEFLECT - 1:
            # out of rounds: stick at the deflection point (iter>100 path)
            z_land = jnp.where(deflect, z_cobj, z_land)
            break
        # deflect: Gaussian lateral step scaled by height fraction, away
        # from the surface (snow.cpp:516-527)
        kd, ka, kb = jax.random.split(kd, 3)
        val = jnp.clip((z_cobj - zbot) / (top - zbot), 0.0, 1.0)
        dx_ = 0.1 * val * SNOW_RANDOM * jax.random.normal(ka, (batch,))
        dy_ = 0.1 * val * SNOW_RANDOM * jax.random.normal(kb, (batch,))
        flip = (dx_ * cnx + dy_ * cny) < 0.0
        dx_ = jnp.where(flip, -dx_, dx_)
        dy_ = jnp.where(flip, -dy_, dy_)
        ox = jnp.where(deflect, ox + dx_, ox)
        oy = jnp.where(deflect, oy + dy_, oy)
        oz = jnp.where(deflect, z_cobj + 1e-4, oz)

    mx, my = world.mesh_x, world.mesh_y
    gx = jnp.floor(ox * world.dx_inv + mx // 2).astype(jnp.int32)
    gy = jnp.floor(oy * world.dy_inv + my // 2).astype(jnp.int32)
    ok = (gx >= 0) & (gx < mx) & (gy >= 0) & (gy < my)
    cell = jnp.where(ok, gy * mx + gx, mx * my)
    return cell, z_land, ok


def create_snow_map(mesh, cobjs: CobjSet, num_rays: int, wind=(0.4, 0.2, 0.0),
                    world: WorldConst = DEFAULT_WORLD, seed: int = 0,
                    batch: int = 65536):
    """Full snow map: (snow_z [my, mx], coverage [my, mx]).

    snow_z = mean landing height per cell (the sparse z-average voxel map),
    coverage = ray count per cell (normalizable to snow depth)."""
    mx, my = world.mesh_x, world.mesh_y
    n_cells = mx * my
    zsum = jnp.zeros((n_cells + 1,))
    cnt = jnp.zeros((n_cells + 1,))
    wind = jnp.asarray(wind, jnp.float32)
    nb = -(-num_rays // batch)
    for i in range(nb):
        k = w3d_rng.key(seed, 0x5704, i)
        cell, z, ok = snow_batch(k, mesh, cobjs, wind, world, batch)
        zsum = zsum.at[cell].add(jnp.where(ok, z, 0.0))
        cnt = cnt.at[cell].add(ok.astype(jnp.float32))
    zsum = zsum[:-1].reshape(my, mx)
    cnt = cnt[:-1].reshape(my, mx)
    snow_z = jnp.where(cnt > 0, zsum / jnp.maximum(cnt, 1.0), jnp.asarray(mesh))
    return snow_z, cnt


def save_snow_map(path: str, snow_z, coverage):
    np.savez_compressed(path, snow_z=np.asarray(snow_z),
                        coverage=np.asarray(coverage))


def load_snow_map(path: str):
    z = np.load(path)
    return jnp.asarray(z["snow_z"]), jnp.asarray(z["coverage"])
