"""Infinite tiled-terrain streaming.

Re-expresses `tile_draw_t::update` + `tile_t` (tiled_mesh.cpp:142,
2311-2417, tiled_mesh.h:156,406): an unordered map of tiles keyed by
(tx, ty), created within CREATE_DIST of the camera and deleted beyond
DELETE_DIST; per tile: zvals generation -> erosion -> AO -> shadows ->
biome weights.

TPU design: where the reference generates <=16 tiles/frame across OMP
threads + an async GL compute shader with deferred readback
(tiled_mesh.cpp:2393-2406), here every update's *whole set* of new tiles
is one batched jitted call (padded to fixed batch shapes so XLA reuses the
compiled program), generating the AO-halo context directly — the device is
fast enough that the pipeline-across-frames machinery collapses into one
dispatch.  The host manager only tracks keys and owns the result arrays.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst, DEFAULT_WORLD
from ..ops import noise as N
from ..ops import erosion as E
from ..ops import ao as AO
from ..ops import shadows as SH
from . import mesh as TM
from . import biomes as B

CREATE_DIST_TILES = 1.5   # in tile units (~ get_tile_radius scaling)
DELETE_DIST_TILES = 2.0


@dataclass
class Tile:
    """One resident tile's generated data (host-side handles)."""

    tx: int
    ty: int
    zvals: jax.Array          # [stride, stride]
    ao: jax.Array             # [stride, stride]
    smask_sun: jax.Array      # [stride, stride] bool
    weights: jax.Array        # [5, stride, stride]


@dataclass
class TileManager:
    cfg: TM.TerrainConfig = TM.TerrainConfig()
    world: WorldConst = DEFAULT_WORLD
    tile_size: int = 128
    erosion_iters_tt: int = 0
    sun_dir: tuple = (0.4, 0.3, 0.8)
    tiles: dict = field(default_factory=dict)
    zmax_est: float = 10.0
    _batch_pad: int = 8
    _pending: tuple | None = None   # (keys, device arrays) in-flight batch

    def __post_init__(self):
        ts = TM.gen_terrain(self.cfg._replace(erosion_iters=0),
                            WorldConst(mesh_x=64, mesh_y=64,
                                       x_scene=self.world.x_scene,
                                       y_scene=self.world.y_scene,
                                       z_scene=self.world.z_scene))
        self.zmax_est = float(ts.zmax_est)
        self.water_plane_z = float(ts.water_plane_z)
        self.table = TM.gen_table_for(self.cfg, self.world) \
            if self.cfg.mode == N.MGEN_SINE else None

    # -- streaming bookkeeping (tile_draw_t::update) --

    def camera_tile(self, cam_x: float, cam_y: float):
        tw = self.tile_size * self.world.dx
        th = self.tile_size * self.world.dy
        return int(np.floor(cam_x / tw)), int(np.floor(cam_y / th))

    def wanted_tiles(self, cam_x: float, cam_y: float, radius: float = CREATE_DIST_TILES):
        ctx, cty = self.camera_tile(cam_x, cam_y)
        r = int(np.ceil(radius))
        out = []
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dx * dx + dy * dy <= radius * radius + 1e-6:
                    out.append((ctx + dx, cty + dy))
        return out

    def update(self, cam_x: float, cam_y: float,
               max_tiles_per_frame: int | None = None):
        """Create missing in-range tiles (one batched call), delete
        out-of-range ones.  Returns (created, deleted) key lists.

        The reference stages tile creation across frames with a priority
        queue and a per-frame budget, double-buffering GPU work
        (tile_draw_t::update, tiled_mesh.cpp:2349-2417,2393-2401).  Same
        policy here: missing tiles are created nearest-camera-first, at
        most `max_tiles_per_frame` per call (None = all); the generation
        dispatch is asynchronous (JAX), and results from the PREVIOUS
        call are adopted first — device compute of batch N overlaps the
        host bookkeeping of batch N+1."""
        # adopt last frame's async batch (its device work is done by now)
        if self._pending is not None:
            self._adopt_pending()
        want = self.wanted_tiles(cam_x, cam_y)
        ctx, cty = self.camera_tile(cam_x, cam_y)
        deleted = []
        for key in list(self.tiles):
            ddx = key[0] - ctx
            ddy = key[1] - cty
            if ddx * ddx + ddy * ddy > DELETE_DIST_TILES ** 2:
                del self.tiles[key]
                deleted.append(key)
        new = [k for k in want if k not in self.tiles]
        # nearest-first priority (the reference sorts by tile priority)
        new.sort(key=lambda k: (k[0] - ctx) ** 2 + (k[1] - cty) ** 2)
        if max_tiles_per_frame is not None:
            new = new[:max_tiles_per_frame]
            if new:
                self._generate(new, defer=True)   # async double-buffer
        elif new:
            self._generate(new)
        return new, deleted

    def _adopt_pending(self):
        keys, (zv, ao, sm, wts) = self._pending
        self._pending = None
        for i, k in enumerate(keys):
            self.tiles[k] = Tile(tx=k[0], ty=k[1], zvals=zv[i], ao=ao[i],
                                 smask_sun=sm[i], weights=wts[i])

    def flush(self):
        """Force-adopt any in-flight batch (end-of-frame sync point)."""
        if self._pending is not None:
            self._adopt_pending()

    # -- per-tile vegetation (grass_tile_manager_t, grass.cpp:58) --

    def grass_for_tile(self, key, blades_per_cell: int = 4):
        """Per-blade grass block for a resident tile, density-gated by
        its GRASS biome weight (the reference generates per-tile grass
        blocks on demand from the tile's weight texture)."""
        from ..veg import grass as VG
        from . import biomes as B
        t = self.tiles[key]
        seed = (t.tx * 73856093) ^ (t.ty * 19349663) ^ 0x9A55
        return VG.gen_grass_block(
            seed & 0x7FFFFFFF, float(t.tx * self.tile_size),
            float(t.ty * self.tile_size), t.zvals,
            t.weights[B.GRASS], self.world,
            blades_per_cell=blades_per_cell)

    def flowers_for_tile(self, key, flower_density: float = 1.0):
        """Per-tile flowers where the grass is dense
        (flower_tile_manager_t::gen_flowers, grass.cpp:859)."""
        from ..veg import grass as VG
        from . import biomes as B
        t = self.tiles[key]
        seed = (t.tx * 83492791) ^ (t.ty * 2654435761) ^ 0xF10E
        return VG.gen_flowers(
            seed & 0x7FFFFFFF, float(t.tx * self.tile_size),
            float(t.ty * self.tile_size), t.zvals,
            t.weights[B.GRASS], self.world,
            flower_density=flower_density)

    # -- batched generation --

    def _generate(self, keys, defer: bool = False):
        n = len(keys)
        pad = -(-n // self._batch_pad) * self._batch_pad
        txs = np.array([k[0] for k in keys] + [keys[-1][0]] * (pad - n), np.float32)
        tys = np.array([k[1] for k in keys] + [keys[-1][1]] * (pad - n), np.float32)
        out = _gen_tile_batch(
            tuple(self.table) if self.table is not None else None,
            jnp.asarray(txs), jnp.asarray(tys),
            jnp.float32(self.zmax_est), jnp.float32(self.water_plane_z),
            self.cfg, self.world, self.tile_size, self.erosion_iters_tt,
            self.sun_dir)
        if defer:   # async: adopt on the NEXT update (double-buffer)
            self._pending = (list(keys), out)
            return
        zv, ao, sm, wts = out
        for i, k in enumerate(keys):
            self.tiles[k] = Tile(tx=k[0], ty=k[1], zvals=zv[i], ao=ao[i],
                                 smask_sun=sm[i], weights=wts[i])


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "world", "tile_size", "erosion_iters", "sun_dir"))
def _gen_tile_batch(table_arrs, txs, tys, zmax_est, wpz,
                    cfg: TM.TerrainConfig, world: WorldConst,
                    tile_size: int, erosion_iters: int, sun_dir: tuple):
    """Generate a padded batch of tiles: context zvals (with AO halo) ->
    glaciate -> [erode interior] -> AO -> shadows -> biome weights."""
    stride = tile_size
    halo = AO.AO_RAY_LEN
    csz = stride + 2 * halo
    x0 = txs * stride - halo
    y0 = tys * stride - halo

    if cfg.mode == N.MGEN_SINE:
        table = N.SineTable(*table_arrs)
        start = N.start_eval_sin(cfg.mesh_scale, cfg.mesh_freq_filter)
        xt, yt = N.sine_term_tables(
            table, x0, y0, world.dx, world.dy, csz, csz, world=world,
            mesh_scale=cfg.mesh_scale, mesh_scale_z_inv=1.0 / cfg.mesh_scale_z,
            start_sin=start)
        ctx = N.eval_sine_grid(xt, yt)
        ctx = N.apply_noise_shape_final(ctx, cfg.shape)
        ctx = TM.postproc_noise_zval(ctx, cfg.hmap)
    else:
        xi = jnp.arange(csz, dtype=jnp.float32)[None, None, :] + x0[:, None, None]
        yi = jnp.arange(csz, dtype=jnp.float32)[None, :, None] + y0[:, None, None]
        T = txs.shape[0]
        ctx = N.noise_zval_grid(jnp.broadcast_to(xi, (T, csz, csz)),
                                jnp.broadcast_to(yi, (T, csz, csz)),
                                cfg.mode, shape=cfg.shape,
                                mesh_scale=cfg.mesh_scale,
                                mesh_seed=cfg.mesh_seed, world=world)
    ctx = TM.apply_glaciate(ctx, zmax_est, cfg)

    zv = ctx[:, halo:halo + stride, halo:halo + stride]
    if erosion_iters > 0:
        eparams = E.ErosionParams(
            erode_amount=cfg.erode_amount, water_plane_z=wpz,
            half_dxy=world.half_dxy, zmin=-zmax_est, zmax=zmax_est,
            rock_thresh=TM.clip_hd1(cfg), relh_adj_tex=cfg.relh_adj_tex)
        zmin_t = jnp.min(zv, axis=(-1, -2))
        if jax.default_backend() == "tpu":
            # fused VMEM walk (both paths apply min_zval as the same
            # FINAL clamp — erosion.cpp:158-162 — so clamping after the
            # batched kernel is exact)
            from ..ops.pallas.erosion_kernel import erode_tiles_pallas
            zv = erode_tiles_pallas(zv, erosion_iters, eparams,
                                    min_zval=-1.0e9, batch_size=256,
                                    max_steps=96)
            zv = jnp.maximum(zv, zmin_t[:, None, None])
        else:
            zv = jax.vmap(lambda h, mz: E.erode(h, erosion_iters, eparams,
                                                min_zval=mz, batch_size=256,
                                                max_steps=96))(zv, zmin_t)
        ctx = ctx.at[:, halo:halo + stride, halo:halo + stride].set(zv)

    ao = AO.tile_ao(ctx, stride, dz=0.5 * world.half_dxy)
    smask, _ = SH.mesh_shadows(zv, sun_dir, cell_w=world.dx)

    # normal z for slope-based texturing: centered differences from the
    # halo-padded context so borders use true neighbor heights (a
    # jnp.roll over the crop would wrap the OPPOSITE tile edge into the
    # border derivative -> spurious slope seams between tiles)
    ctx2 = ctx.at[:, halo:halo + stride, halo:halo + stride].set(zv)
    dzdx = (ctx2[:, halo:halo + stride, halo + 1:halo + stride + 1]
            - ctx2[:, halo:halo + stride, halo - 1:halo + stride - 1]) \
        * (0.5 * world.dx_inv)
    dzdy = (ctx2[:, halo + 1:halo + stride + 1, halo:halo + stride]
            - ctx2[:, halo - 1:halo + stride - 1, halo:halo + stride]) \
        * (0.5 * world.dy_inv)
    norm_z = jax.lax.rsqrt(dzdx ** 2 + dzdy ** 2 + 1.0)
    weights = B.biome_weights(zv, norm_z, -zmax_est, zmax_est, cfg)
    return zv, ao, smask, weights
