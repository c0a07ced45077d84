"""Indirect-lighting volume (lmap).

The reference's `lmcell` grid stores {sky RGB + weight, global RGB +
weight, local RGB, smoke, flow} per (x, y, z) cell over
MESH_X x MESH_Y x MESH_SIZE[2] (lightmap.h:31-44), managed by
`lmap_manager_t` with file I/O (ray_trace.cpp:1120-1170).

TPU layout: one [nz, ny, nx] array per channel (component planes — never a
trailing small channel dim), bundled in a NamedTuple pytree.  World->cell
mapping mirrors the scene grid (dx, dy) with nz cells over [z0, z0+nz*dz].
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst, DEFAULT_WORLD

# lighting types (3DWorld.h LIGHTING_*)
LIGHTING_SKY = 0
LIGHTING_GLOBAL = 1
LIGHTING_LOCAL = 2
LIGHTING_COBJ_ACCUM = 3
LIGHTING_DYNAMIC = 4


class LightGrid(NamedTuple):
    """lmcell SoA: per-channel [nz, ny, nx] volumes."""

    sc_r: jax.Array
    sc_g: jax.Array
    sc_b: jax.Array
    sv: jax.Array       # sky weight
    gc_r: jax.Array
    gc_g: jax.Array
    gc_b: jax.Array
    gv: jax.Array       # global weight
    lc_r: jax.Array
    lc_g: jax.Array
    lc_b: jax.Array
    smoke: jax.Array
    z0: jax.Array       # scalar: world z of cell layer 0
    dz: jax.Array       # scalar: cell height

    @property
    def shape(self):
        return self.sc_r.shape


def make_light_grid(world: WorldConst = DEFAULT_WORLD, nz: int | None = None,
                    z0: float | None = None, dz: float | None = None) -> LightGrid:
    nz = nz if nz is not None else max(world.mesh_z, 1)
    z0 = z0 if z0 is not None else -world.z_scene
    dz = dz if dz is not None else (2.0 * world.z_scene) / nz
    sh = (nz, world.mesh_y, world.mesh_x)
    z = lambda: jnp.zeros(sh, jnp.float32)
    return LightGrid(sc_r=z(), sc_g=z(), sc_b=z(), sv=z(),
                     gc_r=z(), gc_g=z(), gc_b=z(), gv=z(),
                     lc_r=z(), lc_g=z(), lc_b=z(), smoke=z(),
                     z0=jnp.float32(z0), dz=jnp.float32(dz))


def cell_index(grid: LightGrid, x, y, z, world: WorldConst):
    """World position -> flat cell id (+validity mask)."""
    nz, ny, nx = grid.shape
    gx = jnp.floor(x * world.dx_inv + nx // 2).astype(jnp.int32)
    gy = jnp.floor(y * world.dy_inv + ny // 2).astype(jnp.int32)
    gz = jnp.floor((z - grid.z0) / grid.dz).astype(jnp.int32)
    ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny) & (gz >= 0) & (gz < nz)
    flat = (jnp.clip(gz, 0, nz - 1) * ny + jnp.clip(gy, 0, ny - 1)) * nx \
        + jnp.clip(gx, 0, nx - 1)
    return flat, ok


def accumulate(grid: LightGrid, ltype: int, flat_idx, ok, r, g, b, w,
               shards: int = 1, sorted_deposit: bool = False) -> LightGrid:
    """Scatter-add one batch of weighted color samples into the volume.

    Equivalent of `add_path_to_lmcs`'s per-cell accumulation
    (ray_trace.cpp:222-253): color*weight into the ltype's RGB channels,
    SIGNED weight into the weight channel (sky/global) — cobj-accum
    delta rays carry negative weight and must subtract from the weight
    channel exactly what the positive bake added.

    `shards` > 1 splits the sample stream into that many independent
    scatters into PRIVATE zero volumes, summed afterwards.  NOTE the
    round-5 re-measurement (docs/DESIGN.md "round 5b"): TPU has no
    inter-op parallelism, so independent scatters in one graph do NOT
    overlap — sharding only helps when the per-shard stream gets small
    enough to change the scatter's memory behavior, and an N-index
    4-channel deposit costs ~4x a 1-channel one.  Reduce CHANNELS (see
    trace._accumulate_segment_wonly), not chains.

    `sorted_deposit` co-sorts the sample stream by cell id with ONE
    variadic `lax.sort` shared across the channels, then scatters with
    `indices_are_sorted=True` so XLA can use the sorted-scatter path
    (duplicate cells become adjacent runs).  Exact same sums, possibly
    reordered within a cell (float add order)."""
    nz, ny, nx = grid.shape
    n_cells = nz * ny * nx
    idx = jnp.where(ok, flat_idx, n_cells)  # OOB -> dropped

    if sorted_deposit:
        if ltype == LIGHTING_SKY:
            vols = (grid.sc_r, grid.sc_g, grid.sc_b, grid.sv)
            vals = (r * w, g * w, b * w, w)
        elif ltype == LIGHTING_GLOBAL:
            vols = (grid.gc_r, grid.gc_g, grid.gc_b, grid.gv)
            vals = (r * w, g * w, b * w, w)
        else:
            vols = (grid.lc_r, grid.lc_g, grid.lc_b)
            vals = (r * w, g * w, b * w)
        srt = jax.lax.sort([idx] + list(vals), num_keys=1)
        si, svals = srt[0], srt[1:]
        outs = [vol.reshape(-1)
                .at[si].add(sv, mode="drop", indices_are_sorted=True)
                .reshape(vol.shape) for vol, sv in zip(vols, svals)]
        if ltype == LIGHTING_SKY:
            return grid._replace(sc_r=outs[0], sc_g=outs[1],
                                 sc_b=outs[2], sv=outs[3])
        if ltype == LIGHTING_GLOBAL:
            return grid._replace(gc_r=outs[0], gc_g=outs[1],
                                 gc_b=outs[2], gv=outs[3])
        return grid._replace(lc_r=outs[0], lc_g=outs[1], lc_b=outs[2])

    n = idx.shape[0]
    if shards > 1 and n % shards == 0:
        idx_s = idx.reshape(shards, -1)

        def sc(vol, vals):
            vals_s = vals.reshape(shards, -1)
            parts = [jnp.zeros((n_cells,), vol.dtype)
                     .at[idx_s[g]].add(vals_s[g], mode="drop")
                     for g in range(shards)]
            return (vol.reshape(-1) + sum(parts)).reshape(vol.shape)
    else:
        def sc(vol, vals):
            return vol.reshape(-1).at[idx].add(vals, mode="drop").reshape(vol.shape)

    if ltype == LIGHTING_SKY:
        return grid._replace(
            sc_r=sc(grid.sc_r, r * w), sc_g=sc(grid.sc_g, g * w),
            sc_b=sc(grid.sc_b, b * w), sv=sc(grid.sv, w))
    if ltype == LIGHTING_GLOBAL:
        return grid._replace(
            gc_r=sc(grid.gc_r, r * w), gc_g=sc(grid.gc_g, g * w),
            gc_b=sc(grid.gc_b, b * w), gv=sc(grid.gv, w))
    return grid._replace(
        lc_r=sc(grid.lc_r, r * w), lc_g=sc(grid.lc_g, g * w),
        lc_b=sc(grid.lc_b, b * w))


def normalize_sky(grid: LightGrid) -> LightGrid:
    """Convert accumulated sky sums to mean color (lmcell final combine)."""
    inv = 1.0 / jnp.maximum(grid.sv, 1e-6)
    return grid._replace(sc_r=grid.sc_r * inv, sc_g=grid.sc_g * inv,
                         sc_b=grid.sc_b * inv)


def final_color(grid: LightGrid, indir_scale: float = 1.0,
                sky_scale: float = 1.0, global_scale: float = 1.0,
                local_scale: float = 1.0, ambient=(1.0, 1.0, 1.0),
                diffuse=(1.0, 1.0, 1.0)):
    """lmcell::get_final_color (lightmap.cpp:181-193): brightness comes
    from the weight channel (sv/gv), hue from the max-normalized color.
    The hue ratio cr/max(cr,cg,cb) is scale-invariant, so this works on
    RAW accumulated sums (the grid's resting state — delta updates
    compose linearly on it) and on `normalize_sky` mean colors alike."""
    def term(cr, cg, cb, v, scale, mod):
        mx = jnp.maximum(jnp.maximum(cr, cg), cb)
        vs = jnp.where((mx > 0) & (v > 0), jnp.minimum(1.0, v * scale) / jnp.maximum(mx, 1e-9), 0.0)
        # hue-normalized color x brightness x ambient/diffuse modulation
        return vs * cr * mod[0], vs * cg * mod[1], vs * cb * mod[2]

    sr, sg, sb = term(grid.sc_r, grid.sc_g, grid.sc_b, grid.sv, sky_scale, ambient)
    gr, gg, gb = term(grid.gc_r, grid.gc_g, grid.gc_b, grid.gv, global_scale, diffuse)
    r = indir_scale * (sr + gr) + jnp.minimum(1.0, grid.lc_r * local_scale)
    g = indir_scale * (sg + gg) + jnp.minimum(1.0, grid.lc_g * local_scale)
    b = indir_scale * (sb + gb) + jnp.minimum(1.0, grid.lc_b * local_scale)
    return r, g, b


def save_npz(grid: LightGrid, path: str):
    """Lighting-file cache (~ ray_trace.cpp:1120-1170 read/write)."""
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in grid._asdict().items()})


def load_npz(path: str) -> LightGrid:
    z = np.load(path)
    return LightGrid(**{k: jnp.asarray(z[k]) for k in z.files})
