"""Shard-count scaling for lmap.accumulate + type-gated intersect cost."""
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
from w3d.ops import ray as R
from w3d.utils.constants import WorldConst

from lighting_bench import scene, _force  # noqa: E402

world = WorldConst()
co = scene()
grid = L.make_light_grid(world)
N = 1 << 17
S = 8
NS = N * S
C = int(np.prod(grid.shape))


def timed(name, fn, *args, reps=8, denom=None):
    def many(k, key, *a):
        def body(c, i):
            kk = jax.random.fold_in(key, i)
            out = fn(kk, *a)
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
    d = denom or NS
    print(f"{name:44s} {per*1e3:8.3f} ms  ({per/d*1e9:7.2f} ns/elem)")
    return per


def main():
    print(f"device: {jax.devices()[0]}  C={C}  NS={NS}")
    key = jax.random.key(7)
    idx0 = jax.random.randint(key, (NS,), 0, C)
    vr = jax.random.uniform(jax.random.fold_in(key, 1), (NS,))
    vw = jnp.ones((NS,))
    ok = jnp.ones((NS,), bool)

    for G in (1, 2, 4, 8, 16, 32):
        def dep(k, *_):
            i = idx0 + jax.random.randint(k, (), 0, 7)
            return (L.accumulate(grid, L.LIGHTING_SKY, i, ok, vr, vr, vr,
                                 vw, shards=G).sv,)
        timed(f"accumulate shards={G}", dep)

    rays = T.sky_rays(jax.random.key(9), N, world, ray_weight=float(N))
    ox, oy, oz, dx, dy, dz, *_ = [jax.device_put(a) for a in rays]
    tmax = jnp.full((N,), 32.0)
    pres = R.present_types(co)
    print(f"present types: {pres}")

    def isect(k, *_):
        o = ox + 1e-6 * jax.random.uniform(k, ())
        return R.ray_cobjs_nearest(o, oy, oz, dx, dy, dz, tmax, co,
                                   with_exit=False, present=pres)[:3]
    timed("isect cube+sphere only", isect, denom=N)

    def isect_all(k, *_):
        o = ox + 1e-6 * jax.random.uniform(k, ())
        return R.ray_cobjs_nearest(
            o, oy, oz, dx, dy, dz, tmax, co, with_exit=False,
            present=(1, 2, 3, 4, 5, 6, 7))[:3]
    timed("isect all 7 families", isect_all, denom=N)


if __name__ == "__main__":
    main()
