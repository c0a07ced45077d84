"""Is the lax.scan-over-batches really 2x a single batch?  Compare:
A: one fused 8-batch scan (current production path)
B: 8 separate trace_batch dispatches, forced ONCE at the end (async
   pipelining hides per-dispatch RTT behind device compute)
C: one single batch, forced (RTT + 1 batch)
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
from w3d.utils import rng as w3d_rng
from w3d.utils.constants import WorldConst

from lighting_bench import scene, _force  # noqa: E402

world = WorldConst()
co = scene()
mesh = jnp.full((world.mesh_y, world.mesh_x), -0.6, jnp.float32)
grid = L.make_light_grid(world)
B = 1 << 17
params = T._auto_gates(T.TraceParams(compact=True, samples_per_segment=8,
                                     samples_later=4), co)


def pipelined(seed, nb=8):
    g = grid
    for i in range(nb):
        k = w3d_rng.key(seed, 0x5C1, i)
        rays = T.sky_rays(jax.random.fold_in(k, 1), B, world,
                          ray_weight=float(B))
        g = T.trace_batch(g, co, mesh, *rays, jax.random.fold_in(k, 2),
                          ltype=L.LIGHTING_SKY, params=params, world=world)
    return g


def fused(seed, nb=8):
    return T._trace_sky_batches(grid, co, mesh, jnp.int32(seed), nb, B,
                                params, world, None, None)


def main():
    print(f"device: {jax.devices()[0]}")
    _force(fused(1)); _force(fused(2))
    _force(pipelined(3)); _force(pipelined(4))
    for name, fn in (("fused scan x8", fused), ("pipelined x8", pipelined)):
        best = 1e9
        for r in range(3):
            t0 = time.perf_counter()
            _force(fn(10 + r))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:16s} {best*1e3:8.1f} ms -> "
              f"{8*B/best/1e6:.2f} M rays/s")
    # single batch
    def single(seed):
        return pipelined(seed, nb=1)
    _force(single(5)); _force(single(6))
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        _force(single(20 + r))
        best = min(best, time.perf_counter() - t0)
    print(f"{'single batch':16s} {best*1e3:8.1f} ms (incl RTT)")


if __name__ == "__main__":
    main()
