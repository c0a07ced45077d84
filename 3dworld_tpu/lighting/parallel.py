"""Multi-chip lighting bake: ray batches sharded over a device mesh.

The reference's one genuinely multi-worker offline workload is the
lighting precompute — N std::thread workers each trace a slice of the
ray budget into (a copy of) the lmap and the results merge on completion
(thread_manager_t, ray_trace.cpp:516-618; 20M-ray budget
scene_config/config_spheres.txt:43).

TPU form: the ray budget splits across the devices of a
`jax.sharding.Mesh`; every device traces its share with an independent
RNG stream into a zero-initialized local grid (the per-thread temp lmap
copy), and the grids merge with ONE `psum` over ICI — the collective IS
the "merge on completion".  Deposits are per-ray additive with constant
per-ray weight, so the sharded bake equals a single-device bake of the
same total ray count in expectation, and is bitwise deterministic for a
fixed (mesh, seed).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:                                    # jax >= 0.8 top-level API
    from jax import shard_map as _shard_map_raw
    _REP_KW = "check_vma"
except ImportError:                     # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_raw
    _REP_KW = "check_rep"


def shard_map(f, mesh, in_specs, out_specs):
    """shard_map with the replication/varying check OFF across jax
    versions (check_rep pre-0.8, check_vma after)."""
    return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, **{_REP_KW: False})

from ..utils.constants import WorldConst, DEFAULT_WORLD
from ..utils import rng as w3d_rng
from . import lmap as L
from . import trace as T

_ACCUM_FIELDS = ("sc_r", "sc_g", "sc_b", "sv", "gc_r", "gc_g", "gc_b",
                 "gv", "lc_r", "lc_g", "lc_b", "smoke")


def _psum_grid(grid: L.LightGrid, axis: str) -> L.LightGrid:
    """psum the accumulation channels; z0/dz are replicated metadata."""
    return grid._replace(**{f: jax.lax.psum(getattr(grid, f), axis)
                            for f in _ACCUM_FIELDS})


def _zero_like(grid: L.LightGrid) -> L.LightGrid:
    return grid._replace(**{f: jnp.zeros_like(getattr(grid, f))
                            for f in _ACCUM_FIELDS})


def _add(grid: L.LightGrid, delta: L.LightGrid) -> L.LightGrid:
    return grid._replace(**{f: getattr(grid, f) + getattr(delta, f)
                            for f in _ACCUM_FIELDS})


def compute_sky_lighting_sharded(
        dev_mesh: Mesh, grid: L.LightGrid, cobjs, mesh_hf,
        num_rays: int, seed: int = 0,
        params: T.TraceParams = T.TraceParams(),
        world: WorldConst = DEFAULT_WORLD,
        batch: int = 65536, land_color=None, snow_depth=None,
        sky_color=(0.7, 0.8, 1.0)) -> L.LightGrid:
    """Sky bake over every device of `dev_mesh`: each device traces
    ceil(num_rays / ndev) rays (total rounds up to a full device
    multiple), grids merge via psum.  Equivalent of
    compute_ray_trace_lighting(LIGHTING_SKY)'s threaded slice split."""
    return _sharded_bake(dev_mesh, grid, cobjs, mesh_hf, num_rays, seed,
                         params, world, batch, land_color, snow_depth,
                         kind="sky", extra=tuple(sky_color))


def compute_global_lighting_sharded(
        dev_mesh: Mesh, grid: L.LightGrid, cobjs, mesh_hf,
        num_rays: int, sun_dir, seed: int = 0,
        params: T.TraceParams = T.TraceParams(),
        world: WorldConst = DEFAULT_WORLD,
        batch: int = 65536, land_color=None, snow_depth=None,
        sun_color=(1.0, 0.95, 0.85)) -> L.LightGrid:
    """Directional sun/moon bake sharded over the mesh
    (trace_ray_block_global slice split)."""
    sd = tuple(float(v) for v in np.asarray(sun_dir, np.float32))
    return _sharded_bake(dev_mesh, grid, cobjs, mesh_hf, num_rays, seed,
                         params, world, batch, land_color, snow_depth,
                         kind="global", extra=(sd, tuple(sun_color)))


def _sharded_bake(dev_mesh, grid, cobjs, mesh_hf, num_rays, seed, params,
                  world, batch, land_color, snow_depth, kind, extra):
    params = T._auto_transmission(params, cobjs)
    axis = dev_mesh.axis_names[0]
    ndev = int(np.prod([dev_mesh.shape[a] for a in dev_mesh.axis_names]))
    per_dev = -(-num_rays // ndev)       # rounds UP to a device multiple
    nb = -(-per_dev // batch)
    # exact per-batch sizes (the final batch is the remainder, like
    # compute_sky_lighting): padding it to `batch` would trace up to
    # ndev*(batch-1) extra constant-weight rays and brighten the grid
    sizes = [min(batch, per_dev - i * batch) for i in range(nb)]
    ltype = L.LIGHTING_SKY if kind == "sky" else L.LIGHTING_GLOBAL
    seeds = (jnp.arange(ndev, dtype=jnp.uint32)
             + jnp.uint32((seed * 0x9E3779B1) & 0x7FFFFFFF))

    # replication check off (see shard_map wrapper): trace_batch's scan
    # carries start as replicated constants and become device-varying
    # after the first bounce, which the varying-manual-axes checker
    # rejects; the psum at the end is the explicit merge point
    @functools.partial(
        shard_map, mesh=dev_mesh,
        in_specs=(P(), P(axis)), out_specs=P())
    def bake(grid_in, seed_arr):
        local = _zero_like(grid_in)
        key0 = jax.random.key(seed_arr[0])
        for i, bsz in enumerate(sizes):
            k = jax.random.fold_in(key0, i)
            if kind == "sky":
                rays = T.sky_rays(jax.random.fold_in(k, 1), bsz, world,
                                  sky_color=extra,
                                  ray_weight=float(bsz))
            else:
                sd, sc = extra
                rays = T.global_rays(jax.random.fold_in(k, 1), bsz, sd,
                                     world, sun_color=sc,
                                     ray_weight=float(bsz))
            local = T.trace_batch(local, cobjs, mesh_hf, *rays,
                                  jax.random.fold_in(k, 2), ltype=ltype,
                                  params=params, world=world,
                                  land_color=land_color,
                                  snow_depth=snow_depth)
        return _psum_grid(local, axis)

    delta = jax.jit(bake)(grid, seeds)
    return _add(grid, delta)
