"""City frame time on the TPU, reference-comparable.

The reference's next_city_frame runs cars+peds+birds on 3 OMP threads in
4.65 ms/frame (10 ms serial) at its default city config
(display_world.cpp:1295-1309).  Here one frame = stoplights + cars +
peds + helis as jitted dispatches; cost is measured by the delta method
(scan K frames inside one jit; (t_hi - t_lo)/(K_hi - K_lo)) with varied
inputs per rep (the axon relay memoizes identical calls).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.city import plots as CP, roads as CR, traffic as CT
from w3d.city import floorplan as CF, people as CPE

NUM_CARS = 256
NUM_PEDS = 512
NUM_BLDG_PEOPLE = 256


def main():
    hm = np.zeros((192, 192), np.float32)
    _, plots = CP.gen_cities(hm, -0.5, num_cities=3, seed=0)
    net = CR.gen_city_roads(plots)
    graph = CT.build_road_graph(net)
    sl0 = CT.build_stoplights(net, seed=0)
    spots = CT.gen_parking_spots(net.blocks)
    nav = CT.build_ped_nav(net)
    # building AI rides in the SAME measured step (the reference's
    # 4.65 ms covers cars+peds+building-AI together,
    # display_world.cpp:1295-1309): per-frame ai movement of
    # NUM_BLDG_PEOPLE across a few interiors (goal re-routing is the
    # amortized host side, as in the reference)
    interior = CF.gen_interior((0.0, 0.0, 0.0, 1.2, 0.9, 0.4), 3, 0.08,
                               seed=5)
    pgraph = CPE.build_nav_graph(interior)
    bpeople0 = CPE.make_people(pgraph, NUM_BLDG_PEOPLE, seed=2)
    elev_z = jnp.zeros((max(len(interior.elevators), 1),), jnp.float32)
    print(f"city: {len(net.segs)} segs, {len(net.isecs)} isecs, "
          f"{len(net.blocks)} blocks, {NUM_CARS} cars, {NUM_PEDS} peds, "
          f"{NUM_BLDG_PEOPLE} building people")

    def frame(carry, _):
        sl, cars, peds, bp, k = carry
        k, k1, k2 = jax.random.split(k, 3)
        sl = CT.step_stoplights(sl)
        cars = CT.step_cars(cars, graph, k1, stoplights=sl)
        peds = CT.step_peds(peds, k2, nav=nav, stoplights=sl)
        bp = CPE.step_people(bp, elev_z)
        return (sl, cars, peds, bp, k), None

    def runner(kframes):
        @jax.jit
        def run(carry):
            out, _ = jax.lax.scan(frame, carry, None, length=kframes)
            sl, cars, peds, bp, _ = out
            return cars.t.sum() + peds.x.sum() + sl.ticks.sum() + bp.x.sum()
        return run

    def timed(fn, reps=6):
        outs = []
        for r in range(reps + 2):
            cars = CT.make_cars(NUM_CARS, graph, seed=r, spots=spots,
                                parked_frac=0.3)
            peds = CT.make_peds(NUM_PEDS, net.blocks, seed=r + 50)
            carry = (sl0, cars, peds, bpeople0, jax.random.PRNGKey(r))
            t0 = time.perf_counter()
            float(fn(carry))
            if r >= 2:          # two warmups with distinct inputs
                outs.append(time.perf_counter() - t0)
        return sum(outs) / len(outs)

    lo, hi = 5, 105
    t_lo = timed(runner(lo))
    t_hi = timed(runner(hi))
    per = (t_hi - t_lo) / (hi - lo) * 1e3
    print(f"city frame: {per:.3f} ms  (reference: 4.65 ms 3-thread / "
          f"10 ms serial, display_world.cpp:1295)")
    print(f"vs_serial_ref: {10.0 / per:.1f}x   vs_3thread_ref: {4.65 / per:.1f}x")


if __name__ == "__main__":
    main()
