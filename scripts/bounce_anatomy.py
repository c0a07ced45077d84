"""Find the unaccounted in-graph bounce cost: time trace_batch marginal
bounce with pieces monkeypatched out.  Uses distinct mesh_steps values to
force separate jit cache entries per variant (params are static).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.lighting import lmap as L
from w3d.lighting import trace as T
from w3d.ops import ray as R
from w3d.utils.constants import WorldConst

from lighting_bench import scene, _force  # noqa: E402

world = WorldConst()
co = scene()
mesh = jnp.full((world.mesh_y, world.mesh_x), -0.6, jnp.float32)
grid = L.make_light_grid(world)
N = 1 << 16
rays = [jax.device_put(a)
        for a in T.sky_rays(jax.random.key(9), N, world, ray_weight=float(N))]

orig_acc = T._accumulate_segment
orig_isect = R.ray_cobjs_nearest
orig_hemi = R.cosine_hemisphere_dirs


def noop_acc(grid, ltype, ox, oy, oz, dx, dy, dz, t_hit, w, cr, cg, cb,
             alive, S, world, **kw):
    # keep a dependence so nothing upstream is dead-code-eliminated
    return grid._replace(sv=grid.sv + jnp.sum(w * t_hit) * 1e-20)


def noop_isect(ox, oy, oz, dx, dy, dz, tmax, c, with_exit=False, **kw):
    n = ox.shape[0]
    m = c.p1.shape[0]
    hit = (ox + oy) > 1e9
    t = tmax
    nx = jnp.zeros((n,))
    coh = jnp.zeros((n, m)).at[:, 0].set(1e-20 * ox)
    if with_exit:
        return hit, t, nx, nx, nx, coh, t
    return hit, t, nx, nx, nx, coh


def noop_hemi(key, nx, ny, nz, shape):
    u = jax.random.uniform(key, shape)
    return nx + 1e-6 * u, ny, nz


def marginal(tag, msteps, spec=True):
    ts = {}
    for nb in (4, 8):
        p = T.TraceParams(compact=False, samples_per_segment=4,
                          max_bounces=nb, transmission=False,
                          mesh_steps=msteps, specular_enabled=spec)
        p = T._auto_gates(p, co)._replace(specular_enabled=spec)

        def full(key):
            return T.trace_batch(grid, co, mesh, *rays, key,
                                 ltype=L.LIGHTING_SKY, params=p,
                                 world=world).sv
        jf = jax.jit(full)
        _force(jf(jax.random.key(0)))
        _force(jf(jax.random.key(1)))
        best = 1e9
        for r in range(3):
            t0 = time.perf_counter()
            _force(jf(jax.random.key(2 + r)))
            best = min(best, time.perf_counter() - t0)
        ts[nb] = best
    per = (ts[8] - ts[4]) / 4
    print(f"{tag:44s} bounce={per*1e3:7.3f} ms ({per/N*1e9:6.1f} ns/ray)")
    return per


def main():
    print(f"device: {jax.devices()[0]}  N={N}")
    base = marginal("full bounce", 24)
    T._accumulate_segment = noop_acc
    no_acc = marginal("  - accumulate", 23)
    R.ray_cobjs_nearest = noop_isect
    no_isect = marginal("  - accumulate - isect", 22)
    no_spec = marginal("  - acc - isect - specular", 21, spec=False)
    R.cosine_hemisphere_dirs = noop_hemi
    no_hemi = marginal("  - acc - isect - spec - hemisphere", 20, spec=False)
    resid = marginal("  - all of the above, mesh_steps=1", 1, spec=False)
    print(f"\naccumulate:  {(base-no_acc)*1e3:7.3f} ms")
    print(f"isect:       {(no_acc-no_isect)*1e3:7.3f} ms")
    print(f"specular:    {(no_isect-no_spec)*1e3:7.3f} ms")
    print(f"hemisphere:  {(no_spec-no_hemi)*1e3:7.3f} ms")
    print(f"heightfield: {(no_hemi-resid)*1e3:7.3f} ms")
    print(f"residual:    {resid*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
