"""Ablate the PRODUCTION compact trace_batch (N=131072, S0=8, S_later=4)
to find where its ~84 ms/batch goes (components only explain ~35 ms)."""
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
N = 1 << 17
rays = [jax.device_put(a)
        for a in T.sky_rays(jax.random.key(9), N, world, ray_weight=float(N))]

orig_acc = T._accumulate_segment
orig_isect = R.ray_cobjs_nearest
orig_compact = T._compact_rays


def noop_acc(grid, ltype, ox, oy, oz, dx, dy, dz, t_hit, w, cr, cg, cb,
             alive, S, world, **kw):
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


def noop_compact(st, key, keep):
    # slice instead of random-gather (keeps shapes identical)
    out = {k: (v if k == "grid" else v[:keep]) for k, v in st.items()}
    return out


def run(tag, msteps):
    p = T.TraceParams(compact=True, samples_per_segment=8, samples_later=4,
                      mesh_steps=msteps)
    p = T._auto_gates(p, co)

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
    print(f"{tag:40s} {best*1e3:8.2f} ms ({best/N*1e9:6.1f} ns/ray)")
    return best


def main():
    print(f"device: {jax.devices()[0]}  N={N} production compact schedule")
    base = run("full", 24)
    T._compact_rays = noop_compact
    no_cmp = run("  - compaction (slice)", 23)
    T._accumulate_segment = noop_acc
    no_acc = run("  - compaction - accumulate", 22)
    R.ray_cobjs_nearest = noop_isect
    no_is = run("  - cmp - acc - isect", 21)
    resid = run("  - cmp - acc - isect - hf(1 step)", 1)
    print(f"\ncompaction:  {(base-no_cmp)*1e3:7.2f} ms")
    print(f"accumulate:  {(no_cmp-no_acc)*1e3:7.2f} ms")
    print(f"isect:       {(no_acc-no_is)*1e3:7.2f} ms")
    print(f"heightfield: {(no_is-resid)*1e3:7.2f} ms")
    print(f"residual:    {resid*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
