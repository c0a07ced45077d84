"""Spray paint tool (spray_paint.cpp).

The reference sprays color decals along the camera view ray onto the
mesh / flat cobjs (and can add/remove voxel volume).  Here: cast the
view ray with the exact DDA mesh intersect (falling back to the cobj
ray), and record the splat as a decal in the decal pool + a paint
stamp on a per-scene paint grid (the landscape-texture modification
analog).  Voxel mode routes to the voxel brush.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst, DEFAULT_WORLD
from ..ops.ray import ray_heightfield_dda, ray_cobjs_nearest
from ..physics import particles as PT

PAINT_COLORS = (
    (1.0, 0.0, 0.0), (0.0, 0.6, 0.0), (0.1, 0.3, 1.0), (1.0, 1.0, 0.0),
    (1.0, 0.5, 0.0), (0.6, 0.0, 0.8), (1.0, 1.0, 1.0), (0.1, 0.1, 0.1),
)


def make_paint_grid(world: WorldConst = DEFAULT_WORLD):
    """[my, mx, 4] RGBA paint overlay (alpha 0 = unpainted)."""
    return jnp.zeros((world.mesh_y, world.mesh_x, 4), jnp.float32)


def spray_paint(paint_grid, decals, mesh, cobjs, cam_pos, view_dir,
                color_ix: int = 0, radius: float = 0.06,
                world: WorldConst = DEFAULT_WORLD, max_range: float = 8.0):
    """One spray: returns (paint_grid, decals, hit: bool).

    Mesh hits stamp the paint grid AND spawn a decal; cobj hits spawn
    a decal on the surface with its contact normal."""
    o = jnp.asarray(cam_pos, jnp.float32)
    d = jnp.asarray(view_dir, jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
    one = lambda v: jnp.asarray([v], jnp.float32)
    tmax = one(max_range)
    mhit, mt = ray_heightfield_dda(one(o[0]), one(o[1]), one(o[2]),
                                   one(d[0]), one(d[1]), one(d[2]),
                                   tmax, mesh, world, max_cells=128)
    chit, ct, cnx, cny, cnz, coh = ray_cobjs_nearest(
        one(o[0]), one(o[1]), one(o[2]), one(d[0]), one(d[1]), one(d[2]),
        tmax, cobjs)
    use_mesh = mhit & (~chit | (mt < ct))
    hit = bool((mhit | chit)[0])
    if not hit:
        return paint_grid, decals, False
    t = float(jnp.where(use_mesh, mt, ct)[0])
    p = o + t * d
    r, g, b = PAINT_COLORS[color_ix % len(PAINT_COLORS)]
    if bool(use_mesh[0]):
        my, mx = mesh.shape
        gx = jnp.clip((p[0] * world.dx_inv + mx // 2).astype(jnp.int32),
                      0, mx - 1)
        gy = jnp.clip((p[1] * world.dy_inv + my // 2).astype(jnp.int32),
                      0, my - 1)
        paint_grid = paint_grid.at[gy, gx].set(
            jnp.asarray([r, g, b, 1.0], jnp.float32))
        nx, ny, nz = 0.0, 0.0, 1.0
        cid = -1
    else:
        nx, ny, nz = float(cnx[0]), float(cny[0]), float(cnz[0])
        cid = int(jnp.argmax(coh[0]))   # the cobj the ray actually hit
    decals = PT.spawn_decals(
        decals, one(float(p[0])), one(float(p[1])), one(float(p[2])),
        one(nx), one(ny), one(nz), one(radius), one(1.0),
        jnp.asarray([cid], jnp.int32), jnp.asarray([100000], jnp.int32))
    return paint_grid, decals, True
