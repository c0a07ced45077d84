"""Benchmark harness — prints ONE JSON line.

Combined metric (BASELINE.json): terrain tiles/sec (noise + erosion) and
physics steps/sec at 10K objects.  `value` is the combined speedup vs the
single-thread CPU baseline (geometric mean of the two ratios); the raw
numbers ride along as extra fields.

Baselines — two anchors, both recorded (BASELINE.md "Measured baselines"):
* conservative reference-derived estimate (used for `vs_baseline` so the
  headline is never inflated): 200 tiles/s, 40 phys fps — what a good
  single-thread C++ implementation plausibly sustains (the reference
  budgets <=3 CPU tiles per ~17ms frame, tiled_mesh.cpp:2314-2316;
  process_groups with LG_STEPS_PER_FRAME=10, build_world.cpp:310-600).
* measured same-program single-core CPU (XLA:CPU backend, nproc=1, this
  machine, 2026-08-16): 5.29 tiles/s, 0.44 phys fps @10K — reported in the
  `measured_cpu_*` / `vs_measured_cpu` fields.

Note: each timed rep uses different inputs — the axon TPU relay memoizes
identical (executable, input) pairs; results are forced with a host read
(`block_until_ready` alone has been observed to return early here).

Each metric is the MEDIAN of 5 timed groups after 2 warmups, with the
relative spread reported (`terrain_spread`/`physics_spread`) and a
`steady_state_ok` flag (spreads < 15%) so a contended run is visible in
the output instead of silently swinging the headline.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE_TILES_PER_SEC = 200.0       # conservative C++-estimate anchor
BASE_PHYS_FPS = 40.0
MEASURED_CPU_TILES_PER_SEC = 5.29  # same programs, XLA:CPU, 1 core
MEASURED_CPU_PHYS_FPS = 0.44
NUM_TILES = 256
NUM_OBJS = 10000
PHYS_SUBSTEPS = 10
# Pair-collision cadence: the REFERENCE resolves object-object contacts
# at FRAME granularity (each large object re-registers as a dynamic
# sphere cobj once per frame, with defer-if-unmoved,
# build_world.cpp:397-404,526-543).  Running the EXACT banded pass every
# 5th substep (2x per frame) exceeds that cadence and leaves zero
# residual penetration in the settled-pile fidelity test
# (tests/test_physics.py::test_pair_cadence_fidelity); every-substep
# costs 2.6x more pair work for no measurable fidelity gain.
PHYS_PAIR_EVERY = 5


def _median_spread(rates):
    """(median, relative spread) of a list of per-group rates.  Spread =
    (max-min)/median — the steady-state check: >15% means the machine
    was contended and the number should not be trusted as a regression
    signal."""
    s = sorted(rates)
    med = s[len(s) // 2]
    spread = (s[-1] - s[0]) / max(med, 1e-9)
    return med, spread


def bench_terrain(jax):
    from w3d.models import terrain_model as TMOD
    from w3d.utils.constants import WorldConst

    world = WorldConst()
    mcfg = TMOD.TileModelConfig(
        tile_size=128, erosion_iters_tt=512, erosion_batch=512, erosion_steps=64,
        # fused Pallas erosion walk: ~3.8x the XLA path on v5e (66ms vs
        # 251ms for the 256-tile walk); native Mosaic only, so TPU-gated
        use_pallas_erosion=(jax.default_backend() == "tpu"),
    )
    table, x0, y0, ze, wpz = TMOD.example_inputs(mcfg, world, num_tiles=NUM_TILES)
    # batches chained on-device (lax.scan with per-iteration tile offsets)
    # so the measurement is sustained generation rate, not per-dispatch
    # relay/host round-trip latency (~28 ms each on this tunnel)
    reps = 5

    def run(a0):
        def body(acc, i):
            z = TMOD.tile_batch_step(table, a0 + i * NUM_TILES, y0, ze, wpz,
                                     mcfg, world)
            return acc + z.sum(), None
        acc, _ = jax.lax.scan(body, 0.0, jax.numpy.arange(reps, dtype=jax.numpy.float32))
        return acc
    jfn = jax.jit(run)
    # two warmups with distinct inputs: the relay's result force can
    # return before the device fully drains, so the first post-compile
    # execution may still overlap warmup work (measured 2.7x slow)
    float(jfn(x0))
    float(jfn(x0 + 3.0 * NUM_TILES))
    # median-of-5 timed groups (VERDICT r4 weak-1: single-shot numbers
    # swung +-15% with host contention); each group uses distinct inputs
    rates = []
    for g in range(5):
        t0 = time.perf_counter()
        float(jfn(x0 + (7.0 + g) * NUM_TILES))
        dt = (time.perf_counter() - t0) / reps
        rates.append(NUM_TILES / dt)
    return _median_spread(rates)


def bench_scatter_probe(jax):
    """Measured scatter-add cost (ns/index) on this relay RIGHT NOW.

    The physics narrow-phase and the lighting deposit are scatter-bound;
    the relay's per-index scatter cost has been observed to move 4-5x
    between days (7 ns/idx when the round-5 tracer numbers were taken,
    32 ns/idx one day later) while MXU-bound terrain was unaffected.
    Reporting it makes an environmentally slow run self-diagnosing:
    if physics fps is low AND this probe is high, the chip is slow at
    scatters today — not a code regression."""
    import jax.numpy as jnp
    C = N = 1 << 20
    key = jax.random.PRNGKey(7)
    f = jax.jit(lambda idx, v: jnp.zeros((C,), jnp.float32).at[idx].add(v))
    ts = []
    for i in range(5):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        idx = jax.random.randint(k1, (N,), 0, C, jnp.int32)
        v = jax.random.uniform(k2, (N,), jnp.float32)
        t0 = time.perf_counter()
        float(f(idx, v).sum())
        if i >= 2:              # 2 warmups
            ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / N * 1e9


def bench_physics(jax, pair_every: int = PHYS_PAIR_EVERY):
    from w3d.models import physics_model as PM
    from w3d.utils.constants import WorldConst

    world = WorldConst()
    sw = PM.build_spheres_world(num_objects=NUM_OBJS, world=world)
    # frames are chained on-device (lax.scan) so the measurement is the
    # sustained game-loop rate, not per-dispatch relay/host latency.
    # Only ObjectState rides the scan carry: the scene (mesh, cobjs, type
    # table) is closed over so XLA treats it as loop-invariant — carrying
    # it through the scan measured 2.7x slower (per-iteration re-derivation
    # of what it otherwise folds at compile time).
    # frames=5 per dispatch: longer frame scans (25) crash the TPU worker
    # on this libtpu ("kernel fault"); 4 chained un-forced dispatches
    # pipeline, so the relay RTT still amortizes away.
    frames = 5

    def run(st):
        def body(x, _):
            w2 = sw._replace(state=x)
            # water=False: config_spheres declares disable_water, so the
            # water/ice block compiles out (the reference skips its water
            # checks the same way when water is disabled)
            return PM.frame_step(w2, substeps=PHYS_SUBSTEPS, world=world,
                                 obj_collisions=True,
                                 pair_every=pair_every,
                                 water=False).state, None
        s2, _ = jax.lax.scan(body, st, None, length=frames)
        return s2
    f = jax.jit(run)
    cur = f(sw.state)
    float(cur.px.sum())
    cur = f(cur)
    float(cur.px.sum())   # second warmup: drain any overlapped work
    # median-of-5 groups of 4 pipelined dispatches each (the 4 un-forced
    # dispatches amortize the relay RTT exactly as before; grouping +
    # median makes the official number contention-robust)
    rates = []
    for _g in range(5):
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            cur = f(cur)
        float(cur.px.sum())
        dt = (time.perf_counter() - t0) / (reps * frames)
        rates.append(1.0 / dt)
    return _median_spread(rates)


def bench_live_tiled(jax, chunk: int = 32, chunks: int = 6):
    """Steady live tiled-city frame time (the app's own loop: tile
    streaming + fused chained city dispatch + host reroute) — the
    reference's city frame is 10 ms serial / 4.65 ms 3-thread
    (display_world.cpp:1295-1309)."""
    import numpy as np
    from w3d.models.world import make_tiled_world
    from w3d.terrain.tiles import TileManager
    from w3d.terrain.mesh import TerrainConfig
    from w3d.utils.constants import WorldConst
    from w3d.city import assemble as CA
    from w3d.city import floorplan as CF
    from w3d.city import room_content as CRC

    tm = TileManager(cfg=TerrainConfig(mesh_seed=1),
                     world=WorldConst(mesh_x=64, mesh_y=64), tile_size=64)
    cw = CA.build_city(np.zeros((128, 128), np.float32), num_cities=1,
                       num_cars=64, num_peds=128, seed=1)
    interior = CF.gen_interior((0.0, 0.0, 0.0, 1.2, 0.9, 0.4), 3, 0.08,
                               seed=1)
    objs = CRC.furnish_rooms(interior, 0.08, seed=1)
    w = make_tiled_world(tm, cw, builders=[(interior, 48, objs)], seed=1,
                         chunk=chunk, num_birds=8, num_trains=2)
    cam = 0.0
    times = []
    for i in range(chunks):
        t0 = time.perf_counter()
        w.step_chunk(cam, 0.0, frames=chunk)
        cam += 0.8 * chunk
        times.append((time.perf_counter() - t0) / chunk)
    times = sorted(times[2:])               # drop compile chunks
    return times[len(times) // 2] * 1e3     # median ms/frame


def _preflight(attempts: int = 6, per_wait: int = 300) -> bool:
    """The axon relay can wedge remotely (observed: a killed mid-compile
    client left the pool claim stuck for hours).  Probe with a tiny
    dispatch in a subprocess (the hang is unkillable in-process) and
    retry before running the real benchmark."""
    import subprocess
    attempts = int(os.environ.get("BENCH_PREFLIGHT_ATTEMPTS", attempts))
    probe = ("import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((8,8))*2).sum()))")
    for k in range(attempts):
        t0 = time.perf_counter()
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=per_wait, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"# bench preflight: device not responding "
              f"(attempt {k + 1}/{attempts})", file=sys.stderr)
        # a fast-failing probe (refused connection) must not burn the
        # retry budget in seconds — wedges recover on minute scales
        if k + 1 < attempts:
            time.sleep(max(0.0, per_wait - (time.perf_counter() - t0)))
    return False


def main():
    import jax
    import w3d  # noqa: F401

    if not _preflight():
        print(json.dumps({
            "metric": "terrain_tiles_and_physics_speedup",
            "value": 0.0, "vs_baseline": 0.0,
            "unit": "geomean speedup vs conservative 1-core CPU estimate",
            "error": "tpu relay unresponsive after preflight retries; "
                     "see BENCH history for last good numbers",
        }))
        return

    tiles, tiles_spread = bench_terrain(jax)
    try:
        scatter_ns = round(bench_scatter_probe(jax), 1)
    except Exception:
        scatter_ns = None
    phys, phys_spread = bench_physics(jax)
    # conservative every-substep cadence reported alongside (VERDICT r3
    # item 8: keep exactness-vs-throughput visible)
    phys_every, _ = bench_physics(jax, pair_every=1)
    try:
        live_tiled = round(bench_live_tiled(jax), 2)
    except Exception:
        live_tiled = None
    r_t = tiles / BASE_TILES_PER_SEC
    r_p = phys / BASE_PHYS_FPS
    combined = (r_t * r_p) ** 0.5
    m_t = tiles / MEASURED_CPU_TILES_PER_SEC
    m_p = phys / MEASURED_CPU_PHYS_FPS
    print(json.dumps({
        "metric": "terrain_tiles_and_physics_speedup",
        "value": round(combined, 2),
        "unit": "geomean speedup vs conservative 1-core CPU estimate "
                "(tiles/s/200, phys_fps/40)",
        "vs_baseline": round(combined, 2),
        "terrain_tiles_per_sec": round(tiles, 1),
        "physics_frames_per_sec_10k": round(phys, 1),
        "physics_fps_pair_every_1": round(phys_every, 1),
        "terrain_spread": round(tiles_spread, 3),
        "physics_spread": round(phys_spread, 3),
        "steady_state_ok": bool(tiles_spread < 0.15 and phys_spread < 0.15),
        "scatter_ns_per_index": scatter_ns,
        "live_tiled_city_ms_per_frame": live_tiled,
        "pair_cadence": f"exact banded pass every {PHYS_PAIR_EVERY} of "
                        f"{PHYS_SUBSTEPS} substeps (reference: once/frame)",
        "measured_cpu_tiles_per_sec": MEASURED_CPU_TILES_PER_SEC,
        "measured_cpu_phys_fps": MEASURED_CPU_PHYS_FPS,
        "vs_measured_cpu": round((m_t * m_p) ** 0.5, 1),
    }))


if __name__ == "__main__":
    main()
