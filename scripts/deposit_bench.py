"""Isolate the tracer's remaining walls on the real TPU.

1. Deposit strategy shootout at production shapes (NS = 131072*8 samples
   into a 524288-cell volume):
     A: current 4x independent channel scatter-adds (lmap.accumulate)
     B: one row-stacked [NS,4] scatter into a [C+1,4] buffer
     C: sort-by-cell + segment boundaries + row scatter of unique cells
2. Marginal in-graph bounce cost: compact=False trace_batch at fixed
   N=65536, S=4, bounces 4 vs 8 -> (t8-t4)/4 isolates one full bounce
   including everything the component profile misses.
3. Fully-fused throughput: ONE jit that scans K batches (in-graph
   sky_rays + trace loop) -- no per-batch host dispatch at all.
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

from lighting_bench import scene, _force  # noqa: E402

world = WorldConst()
co = scene()
mesh = jnp.full((world.mesh_y, world.mesh_x), -0.6, jnp.float32)
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
    print(f"{name:42s} {per*1e3:8.3f} ms  ({per/d*1e9:7.2f} ns/elem)")
    return per


def main():
    print(f"device: {jax.devices()[0]}  C={C}  NS={NS}")
    key = jax.random.key(7)
    idx0 = jax.random.randint(key, (NS,), 0, C)
    vr = jax.random.uniform(jax.random.fold_in(key, 1), (NS,))
    vg = vr * 0.9
    vb = vr * 0.8
    vw = jnp.ones((NS,))
    ok = jnp.ones((NS,), bool)

    # A: current accumulate (4 channel scatters)
    def dep_a(k, *_):
        i = idx0 + jax.random.randint(k, (), 0, 7)
        return (L.accumulate(grid, L.LIGHTING_SKY, i, ok, vr, vg, vb, vw).sv,)
    timed("A: 4-channel accumulate", dep_a)

    # B: row-stacked scatter into [C+1, 4]
    def dep_b(k, *_):
        i = jnp.minimum(idx0 + jax.random.randint(k, (), 0, 7), C)
        rows = jnp.stack([vr * vw, vg * vw, vb * vw, vw], axis=1)  # [NS,4]
        buf = jnp.zeros((C + 1, 4), jnp.float32)
        buf = buf.at[i].add(rows, mode="drop")
        return (buf[:, 3],)
    timed("B: row-stacked [NS,4] scatter", dep_b)

    # B8: row-stacked with 8-wide rows (pad) -- does width matter?
    def dep_b8(k, *_):
        i = jnp.minimum(idx0 + jax.random.randint(k, (), 0, 7), C)
        rows = jnp.stack([vr, vg, vb, vw, vr, vg, vb, vw], axis=1)
        buf = jnp.zeros((C + 1, 8), jnp.float32)
        buf = buf.at[i].add(rows, mode="drop")
        return (buf[:, 3],)
    timed("B8: row-stacked [NS,8] scatter", dep_b8)

    # B1: single channel scatter (baseline per-row cost)
    def dep_b1(k, *_):
        i = jnp.minimum(idx0 + jax.random.randint(k, (), 0, 7), C)
        buf = jnp.zeros((C + 1,), jnp.float32)
        buf = buf.at[i].add(vw, mode="drop")
        return (buf,)
    timed("B1: single-channel [NS] scatter", dep_b1)

    # C: sort + segment-sum + scatter unique rows
    def dep_c(k, *_):
        i = jnp.minimum(idx0 + jax.random.randint(k, (), 0, 7), C)
        rows = jnp.stack([vr * vw, vg * vw, vb * vw, vw], axis=1)
        si = jnp.argsort(i)
        i_s = i[si]
        rows_s = rows[si]
        csum = jnp.cumsum(rows_s, axis=0)
        # last position of each run
        last = jnp.concatenate([i_s[1:] != i_s[:-1],
                                jnp.ones((1,), bool)])
        run_tot = jnp.where(last[:, None],
                            csum - jnp.concatenate(
                                [jnp.zeros((1, 4)),
                                 jnp.where(last[:-1, None], csum[:-1], 0)]).cumsum(0) * 0,
                            0.0)  # placeholder; cheaper: diff of csum at lasts
        buf = jnp.zeros((C + 1, 4), jnp.float32)
        buf = buf.at[jnp.where(last, i_s, C)].add(
            jnp.where(last[:, None], csum, 0.0), mode="drop")
        # NOTE: this scatters csum (prefix sums), so result != A numerically;
        # it's a TIMING proxy only (same op mix as the real segsum variant).
        return (buf[:, 3],)
    timed("C: sort+segsum+scatter (timing proxy)", dep_c)

    # D: how does duplication factor change scatter speed? same NS, C/64
    def dep_d(k, *_):
        i = jnp.minimum((idx0 % (C // 64)) + jax.random.randint(k, (), 0, 7), C)
        rows = jnp.stack([vr * vw, vg * vg, vb, vw], axis=1)
        buf = jnp.zeros((C + 1, 4), jnp.float32)
        buf = buf.at[i].add(rows, mode="drop")
        return (buf[:, 3],)
    timed("D: row scatter, 64x duplication", dep_d)

    # ---- 2. marginal in-graph bounce cost --------------------------------
    n2 = 1 << 16
    rays = T.sky_rays(jax.random.key(9), n2, world, ray_weight=float(n2))
    rays = [jax.device_put(a) for a in rays]

    for nb in (4, 8):
        p = T.TraceParams(compact=False, samples_per_segment=4,
                          max_bounces=nb, transmission=False)

        def full(k, *_):
            return (T.trace_batch(grid, co, mesh, *rays,
                                  k, ltype=L.LIGHTING_SKY, params=p,
                                  world=world).sv,)
        globals()[f"_t{nb}"] = timed(
            f"trace_batch N=65536 S=4 bounces={nb}", full, reps=4,
            denom=n2 * nb)
    per_bounce = (globals()["_t8"] - globals()["_t4"]) / 4
    print(f"  -> marginal in-graph bounce: {per_bounce*1e3:.3f} ms "
          f"({per_bounce/n2*1e9:.1f} ns/ray-bounce)")

    # ---- 3. fully-fused batched throughput -------------------------------
    p = T.TraceParams(compact=True, samples_per_segment=8, samples_later=4,
                      transmission=False)
    K = 8

    @jax.jit
    def fused(g, key):
        def body(g, i):
            kk = jax.random.fold_in(key, i)
            rr = T.sky_rays(jax.random.fold_in(kk, 1), N, world,
                            ray_weight=float(N))
            g = T.trace_batch(g, co, mesh, *rr, jax.random.fold_in(kk, 2),
                              ltype=L.LIGHTING_SKY, params=p, world=world)
            return g, None
        g, _ = jax.lax.scan(body, g, jnp.arange(K))
        return g

    _force(fused(grid, jax.random.key(3)))
    t0 = time.perf_counter()
    _force(fused(grid, jax.random.key(4)))
    dt = time.perf_counter() - t0
    print(f"fused {K}x{N} rays: {dt*1e3:.1f} ms -> "
          f"{K*N/dt/1e6:.2f} M rays/s (all-in-graph)")


if __name__ == "__main__":
    main()
