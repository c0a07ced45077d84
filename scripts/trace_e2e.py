"""End-to-end tracer throughput after each optimization round: the
production compute_sky_lighting path (fused batch scan, auto gates,
type-gated intersect, sharded deposits)."""
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
from w3d.utils.constants import WorldConst

from lighting_bench import scene, _force  # noqa: E402


def main():
    world = WorldConst()
    co = scene()
    mesh = jnp.full((world.mesh_y, world.mesh_x), -0.6, jnp.float32)
    grid = L.make_light_grid(world)
    n = 1 << 20
    params = T.TraceParams(compact=True, samples_per_segment=8,
                           samples_later=4)

    def run(seed):
        return T.compute_sky_lighting(grid, co, mesh, n, seed=seed,
                                      params=params, batch=131072)

    print(f"device: {jax.devices()[0]}")
    _force(run(1))
    _force(run(2))
    reps = 4
    t0 = time.perf_counter()
    for r in range(reps):
        _force(run(10 + r))
    dt = (time.perf_counter() - t0) / reps
    print(f"sky tracer e2e: {n/dt/1e6:.2f} M rays/s ({dt*1e3:.1f} ms for {n} rays)")


if __name__ == "__main__":
    main()
