"""Compare pair-pass implementations on the real chip at the bench shape
(10K objects, pile-like density).  Timing per the relay rules: inputs vary
every rep (the axon relay memoizes identical calls), two warmups, reps
chained on-device in one scan.

Usage: python scripts/pair_bench.py [n]
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import w3d  # noqa: F401
from w3d.physics import step as PS


def make_cols(n, seed=0):
    rng = np.random.default_rng(seed)
    # pile-like: objects settled on a plane, x-slab occupancy near the
    # audited 247 bound
    px = np.sort(rng.uniform(-3.0, 3.0, n)).astype(np.float32)
    py = rng.uniform(-3.0, 3.0, n).astype(np.float32)
    pz = np.abs(rng.normal(0.0, 0.08, n)).astype(np.float32)
    vx, vy, vz = (rng.normal(0, 0.5, n).astype(np.float32) for _ in range(3))
    rad = np.full(n, 0.04, np.float32)
    mass = np.ones(n, np.float32)
    elas = np.full(n, 0.85, np.float32)
    act = np.ones(n, bool)
    return tuple(jnp.asarray(a) for a in
                 (px, py, pz, vx, vy, vz, rad, mass, elas, act))


def time_method(name, fn, cols, reps=50):
    """Chain reps on-device: each rep perturbs pz so inputs differ."""

    def run(eps):
        def body(acc, i):
            c = list(cols)
            c[2] = c[2] + eps * (i + 1)
            out = fn(*c)
            return acc + out[0].sum() + out[3].sum(), None
        acc, _ = jax.lax.scan(body, 0.0,
                              jnp.arange(reps, dtype=jnp.float32))
        return acc

    jf = jax.jit(run)
    float(jf(jnp.float32(1e-6)))
    float(jf(jnp.float32(2e-6)))
    t0 = time.perf_counter()
    float(jf(jnp.float32(3e-6)))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e6:9.1f} us/substep")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    cols = make_cols(n)
    print(f"backend={jax.default_backend()} n={n}")

    from w3d.ops.pallas.pairs_kernel import banded_pairs_pallas
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        time_method("banded_pallas(288)",
                    lambda *c: banded_pairs_pallas(*c, window=288), cols)
    time_method("rowblock(q<=2)",
                lambda *c: PS.rowblock_pair_collisions(*c), cols)
    time_method("block_xla(384)",
                lambda *c: PS.block_pair_collisions(*c, block=384), cols)


if __name__ == "__main__":
    main()
