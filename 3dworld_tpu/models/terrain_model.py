"""Flagship "terrain tile" model: batched tile generation (noise -> glaciate
-> erosion) as one jitted step, plus a sharded multi-device variant.

This is the TPU re-expression of the tiled-terrain hot path
(`tile_t::create_zvals` + `apply_erosion`, tiled_mesh.cpp:467-546): instead
of generating <=16 tiles per frame across OMP threads + a GL compute shader,
a whole batch of tiles is one XLA computation — noise as a (T, n, 90) x
(90, n) einsum on the MXU, erosion as batched droplet walks — and the batch
axis shards over a `jax.sharding.Mesh` for multi-chip scale-out.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..utils.constants import WorldConst, DEFAULT_WORLD
from ..ops import noise as N
from ..ops import erosion as E
from ..terrain import mesh as TM


class TileModelConfig(NamedTuple):
    """Static config for the tile model (hashable -> jit static arg)."""

    tile_size: int = 128          # zvals per tile edge (get_tile_size, tiled_mesh.cpp:142)
    cfg: TM.TerrainConfig = TM.TerrainConfig()
    erosion_iters_tt: int = 0     # per-tile droplets (erosion_iters_tt config)
    erosion_batch: int = 256
    erosion_steps: int = 128
    # fused Pallas walk (ops/pallas/erosion_kernel): ~3.8x the XLA path on
    # TPU at production shapes; differs only in MXU accumulation order.
    # Requires erosion_batch % 128 == 0; leave False on CPU (tests).
    use_pallas_erosion: bool = False


def _tile_heights(table_arrs, x0, y0, mcfg: TileModelConfig, world: WorldConst,
                  zmax_est):
    """Raw+glaciated heights for a batch of tiles. x0,y0: [T] tile origins
    in grid units."""
    cfg = mcfg.cfg
    n = mcfg.tile_size
    if cfg.mode == N.MGEN_SINE:
        table = N.SineTable(*table_arrs)
        start = N.start_eval_sin(cfg.mesh_scale, cfg.mesh_freq_filter)
        xt, yt = N.sine_term_tables(
            table, x0, y0, world.dx, world.dy, n, n,
            world=world, mesh_scale=cfg.mesh_scale,
            mesh_scale_z_inv=1.0 / cfg.mesh_scale_z, start_sin=start,
        )
        z = N.eval_sine_grid(xt, yt)                      # [T, n, n]
        z = N.apply_noise_shape_final(z, cfg.shape)
        z = TM.postproc_noise_zval(z, cfg.hmap)
    else:
        xi = jnp.arange(n, dtype=jnp.float32)[None, None, :] + x0[:, None, None]
        yi = jnp.arange(n, dtype=jnp.float32)[None, :, None] + y0[:, None, None]
        xv = jnp.broadcast_to(xi, (x0.shape[0], n, n))
        yv = jnp.broadcast_to(yi, (x0.shape[0], n, n))
        z = N.noise_zval_grid(xv, yv, cfg.mode, shape=cfg.shape,
                              mesh_scale=cfg.mesh_scale, mesh_seed=cfg.mesh_seed,
                              world=world,
                              postproc=lambda v: TM.postproc_noise_zval(v, cfg.hmap))
    return TM.apply_glaciate(z, zmax_est, cfg)


@functools.partial(jax.jit, static_argnames=("mcfg", "world"))
def tile_batch_step(table_arrs, x0, y0, zmax_est, wpz,
                    mcfg: TileModelConfig = TileModelConfig(),
                    world: WorldConst = DEFAULT_WORLD):
    """Generate a batch of terrain tiles: [T] origins -> [T, n, n] heights."""
    z = _tile_heights(table_arrs, x0, y0, mcfg, world, zmax_est)
    if mcfg.erosion_iters_tt > 0:
        cfg = mcfg.cfg
        eparams = E.ErosionParams(
            erode_amount=cfg.erode_amount, water_plane_z=wpz,
            half_dxy=world.half_dxy, zmin=-zmax_est, zmax=zmax_est,
            rock_thresh=TM.clip_hd1(cfg), relh_adj_tex=cfg.relh_adj_tex,
        )
        if mcfg.use_pallas_erosion:
            from ..ops.pallas.erosion_kernel import erode_tiles_pallas
            z = erode_tiles_pallas(
                z, mcfg.erosion_iters_tt, eparams,
                min_zval=-1.0e9, batch_size=mcfg.erosion_batch,
                max_steps=mcfg.erosion_steps,
            )
        else:
            erode_one = lambda hm: E.erode(
                hm, mcfg.erosion_iters_tt, eparams,
                min_zval=-1.0e9, batch_size=mcfg.erosion_batch,
                max_steps=mcfg.erosion_steps,
            )
            z = jax.vmap(erode_one)(z)
    return z


def make_sharded_tile_step(mesh: Mesh, mcfg: TileModelConfig,
                           world: WorldConst = DEFAULT_WORLD):
    """Shard the tile batch over the mesh's 'tiles' axis (data-parallel over
    tiles; each tile's erosion droplet batch stays chip-local)."""
    tile_sharding = NamedSharding(mesh, P("tiles"))
    rep = NamedSharding(mesh, P())

    @functools.partial(jax.jit,
                       out_shardings=tile_sharding,
                       static_argnames=())
    def step(table_arrs, x0, y0, zmax_est, wpz):
        x0 = jax.lax.with_sharding_constraint(x0, tile_sharding)
        y0 = jax.lax.with_sharding_constraint(y0, tile_sharding)
        return tile_batch_step(table_arrs, x0, y0, zmax_est, wpz, mcfg, world)

    return step


def example_inputs(mcfg: TileModelConfig, world: WorldConst, num_tiles: int = 8):
    """(table_arrs, x0, y0, zmax_est, wpz) example pytree for the model."""
    cfg = mcfg.cfg
    table = TM.gen_table_for(cfg, world)
    x0 = jnp.arange(num_tiles, dtype=jnp.float32) * mcfg.tile_size
    y0 = jnp.zeros((num_tiles,), jnp.float32)
    zmax_est = jnp.float32(10.0)
    wpz = jnp.float32(-8.0)
    return tuple(table), x0, y0, zmax_est, wpz
