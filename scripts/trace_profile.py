"""Decompose the path tracer's per-ray cost on the real TPU.

Delta method per component: scan K reps of the op inside ONE jit with
varied inputs (so XLA can't CSE the reps), time K=1 vs K=1+R, divide the
difference by R.  This removes dispatch/relay RTT from every number.

Components timed at the production bench shapes (lighting_bench run_c:
batch 131072, compact, S0=8, S_later=4, 8 bounces, 61-cobj scene):
  - ray_cobjs_nearest      (N=131072, 61 cobjs)
  - ray_heightfield        (N=131072, 24 steps)
  - _accumulate_segment    (N=131072, S=8)
  - cosine_hemisphere_dirs (N=131072)
  - _compact_rays          (131072 -> 65536)
  - full bounce populations end-to-end (the real trace_batch)
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.lighting import lmap as L
from w3d.lighting import trace as T
from w3d.utils.constants import WorldConst
from w3d.scene import cobj as SC
from w3d.ops import ray as R

from lighting_bench import scene, _force  # noqa: E402

world = WorldConst()
co = scene()
mesh = jnp.full((world.mesh_y, world.mesh_x), -0.6, jnp.float32)
grid = L.make_light_grid(world)
N = 1 << 17


def timed(name, fn, *args, reps=8):
    """fn(key, *args) -> pytree; scan K reps inside one jit."""
    def many(k, key, *a):
        def body(c, i):
            kk = jax.random.fold_in(key, i)
            out = fn(kk, *a)
            # fold outputs into a scalar carry so no rep is dead code
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in
                    jax.tree_util.tree_leaves(out))
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return c

    j1 = jax.jit(functools.partial(many, 1))
    jR = jax.jit(functools.partial(many, 1 + reps))
    key = jax.random.key(0)
    _force(j1(key, *args)); _force(jR(key, *args))
    t0 = time.perf_counter(); _force(j1(jax.random.key(1), *args))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter(); _force(jR(jax.random.key(1), *args))
    dR = time.perf_counter() - t0
    per = (dR - d1) / reps
    print(f"{name:34s} {per*1e3:8.3f} ms  ({per/N*1e9:7.1f} ns/ray at N={N})")
    return per


def mk_rays(key, n):
    return T.sky_rays(key, n, world, ray_weight=float(n))


def main():
    print(f"device: {jax.devices()[0]}  cobjs={co.p1.shape[0]}  N={N}")
    rays = mk_rays(jax.random.key(9), N)
    ox, oy, oz, dx, dy, dz, w, cr, cg, cb = [jax.device_put(a) for a in rays]
    tmax = jnp.full((N,), 32.0)

    def isect(key, *_):
        o = ox + 1e-6 * jax.random.uniform(key, ())
        return R.ray_cobjs_nearest(o, oy, oz, dx, dy, dz, tmax, co,
                                   with_exit=True)[:3]
    timed("ray_cobjs_nearest(exit)", isect)

    def isect_ne(key, *_):
        o = ox + 1e-6 * jax.random.uniform(key, ())
        return R.ray_cobjs_nearest(o, oy, oz, dx, dy, dz, tmax, co,
                                   with_exit=False)[:3]
    timed("ray_cobjs_nearest(no exit)", isect_ne)

    def hfield(key, *_):
        o = ox + 1e-6 * jax.random.uniform(key, ())
        hit, t = R.ray_heightfield(o, oy, oz, dx, dy, dz, tmax, mesh, world,
                                   num_steps=24)
        return (t,)
    timed("ray_heightfield steps=24", hfield)

    def hfield12(key, *_):
        o = ox + 1e-6 * jax.random.uniform(key, ())
        hit, t = R.ray_heightfield(o, oy, oz, dx, dy, dz, tmax, mesh, world,
                                   num_steps=12)
        return (t,)
    timed("ray_heightfield steps=12", hfield12)

    def smesh(key, *_):
        from w3d.physics.step import sample_mesh
        o = ox + 1e-6 * jax.random.uniform(key, ())
        h, nx_, ny_, nz_ = sample_mesh(mesh, o, oy, world)
        return (h,)
    timed("sample_mesh x1", smesh)

    t_hit = jnp.full((N,), 8.0)
    alive = jnp.ones((N,), jnp.float32)

    def dep(key, *_):
        wj = w * (1.0 + 1e-6 * jax.random.uniform(key, ()))
        g2 = T._accumulate_segment(grid, L.LIGHTING_SKY, ox, oy, oz,
                                   dx, dy, dz, t_hit, wj, cr, cg, cb,
                                   alive, 8, world)
        return (g2.sv,)
    timed("_accumulate_segment S=8", dep)

    def hemi(key, *_):
        return R.cosine_hemisphere_dirs(key, dx, dy, dz, (N,))
    timed("cosine_hemisphere_dirs", hemi)

    def comp(key, *_):
        st = dict(ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz, w=w, w0=w,
                  r=cr, g=cg, b=cb, alive=oz > 0, grid=grid)
        out = T._compact_rays(st, key, N // 2)
        return (out["ox"], out["w"])
    timed("_compact_rays N->N/2", comp)

    # end-to-end production batch (single trace_batch call, compact)
    params = T.TraceParams(compact=True, samples_per_segment=8,
                           samples_later=4)
    params = T._auto_transmission(params, co)
    print(f"transmission after auto-gate: {params.transmission}")

    def full(seed):
        k = jax.random.key(seed)
        rr = mk_rays(k, N)
        return T.trace_batch(grid, co, mesh, *rr, jax.random.fold_in(k, 2),
                             ltype=L.LIGHTING_SKY, params=params, world=world)
    _force(full(1)); _force(full(2))
    reps = 4
    t0 = time.perf_counter()
    for r in range(reps):
        _force(full(10 + r))
    dt = (time.perf_counter() - t0) / reps
    print(f"{'trace_batch production e2e':34s} {dt*1e3:8.3f} ms  "
          f"({dt/N*1e9:7.1f} ns/ray -> {N/dt/1e6:.2f} M rays/s)")


if __name__ == "__main__":
    main()
