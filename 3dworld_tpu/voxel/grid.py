"""Voxel density grids: procedural generation + boundary post-processing.

Re-expresses `voxel_manager` generation (voxels.cpp:278-470, voxels.h:14-37)
TPU-first: the density field is one [nz, ny, nx] array produced by a single
jitted program (separable 3D sine contraction on the MXU, or 3D simplex
fBm), followed by fused edge attenuation / z-gradient, and iterative
flood-fill classification expressed as max-pool label propagation.

The reference's GPU compute-shader path + OMP loops collapse into the same
single kernel here — on TPU there is no separate "GPU path".
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import noise as N
from ..utils.constants import WorldConst, DEFAULT_WORLD

# atten_at_edges modes (voxels.h:23)
ATTEN_NONE = 0
ATTEN_TOP = 1
ATTEN_EDGES = 2       # all 5 edges excluding bottom
ATTEN_SPHERE_OUTER = 3
ATTEN_SPHERE_INNER_OUTER = 4


class VoxelParams(NamedTuple):
    """Generation parameters (voxel_params_t, voxels.h:14-37). Hashable."""

    xsize: int = 64
    ysize: int = 64
    zsize: int = 32
    num_blocks: int = 12
    isolevel: float = 0.0
    elasticity: float = 0.5
    mag: float = 1.0
    freq: float = 1.0
    atten_thresh: float = 1.0
    z_gradient: float = 0.0
    radius_val: float = 0.5
    invert: bool = False
    normalize_to_1: bool = True
    make_closed_surface: bool = True
    remove_unconnected: int = 1
    atten_at_edges: int = 0
    atten_top_mode: int = 0
    geom_rseed: int = 123
    gen_mode: int = N.MGEN_SINE
    mesh_freq_filter: int = 2


class VoxelGrid(NamedTuple):
    """Density field + geometry mapping (voxel_grid, voxels.h:106-153)."""

    values: jax.Array    # [nz, ny, nx] density
    lo_pos: tuple        # world position of voxel (0,0,0)
    vsz: tuple           # voxel cell size (x, y, z)

    @property
    def shape(self):
        return self.values.shape


def default_grid_geometry(params: VoxelParams, world: WorldConst = DEFAULT_WORLD):
    """Scene-box voxel geometry (gen_voxels_from_params / voxel init)."""
    nx, ny, nz = params.xsize, params.ysize, params.zsize
    vsz = (2.0 * world.x_scene / nx, 2.0 * world.y_scene / ny,
           2.0 * world.z_scene / nz)
    lo = (-world.x_scene, -world.y_scene, -world.z_scene * 0.5)
    return lo, vsz


@functools.partial(jax.jit, static_argnames=("params",))
def create_procedural(params: VoxelParams, lo_pos, vsz,
                      offset=(0.0, 0.0, 0.0)) -> jax.Array:
    """voxel_manager::create_procedural (voxels.cpp:278-346) -> [nz,ny,nx].

    MGEN_SINE: separable 60-term sine contraction (one MXU matmul).
    Other modes: 3D simplex/perlin fBm, octaves = MAX_FREQ_BINS -
    mesh_freq_filter, freq scaled by 0.25 (voxels.cpp:355-365).
    """
    nx, ny, nz = params.xsize, params.ysize, params.zsize
    if params.gen_mode == N.MGEN_SINE:
        table = N.gen_sine_table_3d(params.mag, params.freq,
                                    params.geom_rseed, 12345)
        start = tuple(lo_pos[d] + offset[d] for d in range(3))
        val = N.eval_sine3d_grid(table, start, vsz, nx, ny, nz)
    else:
        rx, ry = N.gen_rx_ry(params.geom_rseed, 0, params.gen_mode)
        xi = lo_pos[0] + offset[0] + vsz[0] * jnp.arange(nx, dtype=jnp.float32)
        yi = lo_pos[1] + offset[1] + vsz[1] * jnp.arange(ny, dtype=jnp.float32)
        zi = lo_pos[2] + offset[2] + vsz[2] * jnp.arange(nz, dtype=jnp.float32)
        X = xi[None, None, :]
        Y = yi[None, :, None]
        Z = zi[:, None, None]
        octaves = max(1, N.MAX_FREQ_BINS - params.mesh_freq_filter)
        val = N.fbm3d(jnp.broadcast_to(X, (nz, ny, nx)),
                      jnp.broadcast_to(Y, (nz, ny, nx)),
                      jnp.broadcast_to(Z, (nz, ny, nx)),
                      rx, ry, octaves=octaves, mag=params.mag, freq=params.freq)
    # z gradient (voxels.cpp:284,340)
    zscale = (-1.0 if params.invert else 1.0) * params.z_gradient / max(nz - 1, 1)
    val = val + zscale * jnp.arange(nz, dtype=jnp.float32)[:, None, None]
    if params.normalize_to_1:
        val = jnp.clip(val, -1.0, 1.0)
    return val


def atten_edges(val: jax.Array, params: VoxelParams) -> jax.Array:
    """Edge attenuation (voxels.cpp:405-470): push density toward "air" at
    grid boundaries so the isosurface closes."""
    nz, ny, nx = val.shape
    a = params.atten_thresh
    if params.atten_at_edges == ATTEN_NONE:
        return val
    if params.atten_at_edges == ATTEN_TOP:
        # atten_at_top_only: attenuate in the top ATTEN_THRESH fraction
        zi = jnp.arange(nz, dtype=jnp.float32)[:, None, None]
        vz = (zi - 0.75 * nz) / (0.25 * nz)
        return val + jnp.maximum(vz, 0.0) * 2.0 * a
    if params.atten_at_edges == ATTEN_EDGES:
        # atten_at_edges: v = 0.25 - vx*vy*vz, add 8*a*v where v>0
        # (voxels.cpp:405-421); vx/vy/vz are 0 at edges, 1 at center
        xi = jnp.arange(nx, dtype=jnp.float32)[None, None, :]
        yi = jnp.arange(ny, dtype=jnp.float32)[None, :, None]
        zi = jnp.arange(nz, dtype=jnp.float32)[:, None, None]
        vx = 1.0 - 2.0 * jnp.abs(xi - 0.5 * nx) / nx
        vy = 1.0 - 2.0 * jnp.abs(yi - 0.5 * ny) / ny
        vz = 1.0 - 2.0 * jnp.abs(zi - 0.5 * nz) / nz
        v = 0.25 - vx * vy * vz
        return val + jnp.where(v > 0.0, 8.0 * a * v, 0.0)
    # spherical attenuation (outer / inner+outer): radial distance from the
    # grid center in normalized coords (atten_to_sphere, voxels.cpp)
    xi = (jnp.arange(nx, dtype=jnp.float32)[None, None, :] / nx - 0.5) * 2.0
    yi = (jnp.arange(ny, dtype=jnp.float32)[None, :, None] / ny - 0.5) * 2.0
    zi = (jnp.arange(nz, dtype=jnp.float32)[:, None, None] / nz - 0.5) * 2.0
    r = jnp.sqrt(xi * xi + yi * yi + zi * zi)
    outer = jnp.maximum(r - params.radius_val, 0.0)
    val = val + a * outer * 4.0
    if params.atten_at_edges == ATTEN_SPHERE_INNER_OUTER:
        inner = jnp.maximum(0.5 * params.radius_val - r, 0.0)
        val = val + a * inner * 4.0
    return val


def _dilate26(mask: jax.Array) -> jax.Array:
    """26-neighborhood binary dilation via three axis max-pools."""
    m = mask.astype(jnp.float32)
    for ax in range(3):
        m = jnp.maximum(m, jnp.maximum(
            jnp.roll(m, 1, ax).at[(slice(None),) * ax + (0,)].set(0.0),
            jnp.roll(m, -1, ax).at[(slice(None),) * ax + (-1,)].set(0.0)))
    return m > 0.0


def classify_outside(val: jax.Array, isolevel: float,
                     max_iters: int | None = None) -> jax.Array:
    """Flood-fill `outside` classification (voxels.cpp flood_fill_range /
    make_voxels_outside): air cells (val >= isolevel when not inverted are
    "solid"?  reference: below isolevel = inside surface for mag>0) reachable
    from the grid boundary.  Expressed as iterative dilation-limited label
    propagation: outside' = (outside dilated) & air, iterated to fixpoint.
    Returns bool [nz,ny,nx]: True = connected-to-boundary air.
    """
    air = val >= isolevel  # solid convention: val < isolevel is inside
    nz, ny, nx = val.shape
    if max_iters is None:
        max_iters = nx + ny + nz
    seed = jnp.zeros_like(air)
    for ax, idx in ((0, 0), (0, -1), (1, 0), (1, -1), (2, 0), (2, -1)):
        sl = [slice(None)] * 3
        sl[ax] = idx
        seed = seed.at[tuple(sl)].set(air[tuple(sl)])

    def body(state):
        outside, _ = state
        new = _dilate26(outside) & air | outside
        return new, jnp.any(new != outside)

    def cond(state):
        return state[1]

    outside, _ = jax.lax.while_loop(cond, body, (seed, jnp.bool_(True)))
    return outside


def remove_unconnected(val: jax.Array, isolevel: float, air_val: float = 1.0):
    """Remove solid blobs not connected to the grid bottom
    (voxels.h:201-210 remove_unconnected semantics): flood solid from z=0;
    unconnected solid cells become air (+air_val pushes them past the
    isolevel)."""
    solid = val < isolevel  # solid convention: below isolevel (mag>0 scenes)
    # anchor region: any solid in the bottom quarter of the grid (the
    # reference anchors to the terrain mesh inside the volume; edge
    # attenuation may open the z=0 layer itself, so a single-layer anchor
    # would wipe valid grounded terrain)
    nz = val.shape[0]
    anchor = max(1, nz // 4)
    seed = jnp.zeros_like(solid)
    seed = seed.at[:anchor].set(solid[:anchor])

    def body(state):
        conn, _ = state
        new = _dilate26(conn) & solid | conn
        return new, jnp.any(new != conn)

    conn, _ = jax.lax.while_loop(lambda s: s[1], body, (seed, jnp.bool_(True)))
    disconnected = solid & ~conn
    return jnp.where(disconnected, isolevel + air_val, val)


def make_voxel_grid(params: VoxelParams, world: WorldConst = DEFAULT_WORLD,
                    offset=(0.0, 0.0, 0.0)) -> VoxelGrid:
    """Full voxel generation pipeline: procedural field -> edge atten ->
    (optional) unconnected-region removal."""
    lo, vsz = default_grid_geometry(params, world)
    val = create_procedural(params, lo, vsz, offset)
    val = atten_edges(val, params)
    if params.remove_unconnected:
        val = remove_unconnected(val, params.isolevel)
    return VoxelGrid(values=val, lo_pos=lo, vsz=vsz)


def top_surface(grid: VoxelGrid, isolevel: float,
                out_shape: tuple | None = None) -> jax.Array:
    """Per-column top height of the solid region (solid = value <
    isolevel, the voxel convention — higher values are more open).

    Returns [ny, nx] world-z heights (-inf where a column has no solid
    voxel); with `out_shape` the surface is resampled to (my, mx) by
    nearest column — this is what fuses the voxel landscape into the
    physics heightfield (voxel terrain cobjs collapse to their top
    surface for the ball/mesh interaction path)."""
    val = grid.values
    nz = val.shape[0]
    solid = val < isolevel
    any_solid = jnp.any(solid, axis=0)
    # highest solid layer per column
    top_k = nz - 1 - jnp.argmax(solid[::-1], axis=0)
    h = grid.lo_pos[2] + (top_k.astype(jnp.float32) + 1.0) * grid.vsz[2]
    surf = jnp.where(any_solid, h, -jnp.inf)
    if out_shape is not None and out_shape != surf.shape:
        my, mx = out_shape
        ny, nx = surf.shape
        iy = jnp.clip(((jnp.arange(my) + 0.5) * ny / my - 0.5).astype(
            jnp.int32), 0, ny - 1)
        ix = jnp.clip(((jnp.arange(mx) + 0.5) * nx / mx - 0.5).astype(
            jnp.int32), 0, nx - 1)
        surf = surf[iy][:, ix]
    return surf
