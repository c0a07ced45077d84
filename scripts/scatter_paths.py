"""Does XLA:TPU have a faster scatter path? sorted/unique flags + batch
size scaling + e2e at batch 262144."""
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

from lighting_bench import scene, _force  # noqa: E402
from shard_bench import timed  # noqa: E402

world = WorldConst()
co = scene()
grid = L.make_light_grid(world)
C = int(np.prod(grid.shape))
NS = 1 << 20


def main():
    print(f"device: {jax.devices()[0]}")
    key = jax.random.key(7)
    idx_sorted = jnp.sort(jax.random.randint(key, (NS,), 0, C))
    v = jax.random.uniform(jax.random.fold_in(key, 1), (NS,))

    def plain(k, *_):
        i = jnp.minimum(idx_sorted + jax.random.randint(k, (), 0, 3), C - 1)
        return (jnp.zeros((C,)).at[i].add(v),)
    timed("scatter plain", plain)

    def sorted_flag(k, *_):
        i = jnp.minimum(idx_sorted + jax.random.randint(k, (), 0, 3), C - 1)
        return (jnp.zeros((C,)).at[i].add(v, indices_are_sorted=True),)
    timed("scatter indices_are_sorted", sorted_flag)

    def uniq(k, *_):
        i = jnp.minimum(idx_sorted + jax.random.randint(k, (), 0, 3), C - 1)
        return (jnp.zeros((C,)).at[i].add(v, indices_are_sorted=True,
                                          unique_indices=True),)
    timed("scatter sorted+unique (UNSAFE aliasing)", uniq)

    # segment-sum formulation on sorted indices (no scatter at all):
    # ones-hot matmul free; cumsum + boundary diff + scatter of runs
    def segsum(k, *_):
        i = jnp.minimum(idx_sorted + jax.random.randint(k, (), 0, 3), C - 1)
        s = jax.ops.segment_sum(v, i, num_segments=C,
                                indices_are_sorted=True)
        return (s,)
    timed("jax.ops.segment_sum sorted", segsum)

    # full sort included
    def sort_then_seg(k, *_):
        i = jax.random.randint(k, (NS,), 0, C)
        si = jnp.sort(i)
        s = jax.ops.segment_sum(v, si, num_segments=C,
                                indices_are_sorted=True)
        return (s,)
    timed("sort + segment_sum", sort_then_seg)

    # e2e with batch=262144
    params = T.TraceParams(compact=True, samples_per_segment=8,
                           samples_later=4)
    mesh = jnp.full((world.mesh_y, world.mesh_x), -0.6, jnp.float32)
    n = 1 << 20
    for batch in (1 << 17, 1 << 18):
        def run(seed):
            return T.compute_sky_lighting(grid, co, mesh, n, seed=seed,
                                          params=params, batch=batch)
        _force(run(1)); _force(run(2))
        t0 = time.perf_counter()
        for r in range(3):
            _force(run(10 + r))
        dt = (time.perf_counter() - t0) / 3
        print(f"e2e batch={batch}: {n/dt/1e6:.2f} M rays/s")


if __name__ == "__main__":
    main()
