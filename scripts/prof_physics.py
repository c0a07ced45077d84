"""Delta-method cost breakdown of the 10K physics frame on the TPU.

Each timed program scans its op K times inside one jit; cost/op =
(t(K_hi) - t(K_lo)) / (K_hi - K_lo).  Inputs vary per rep (the axon relay
memoizes identical calls) and results are forced with a host read.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.physics import types as PT, step as PS
from w3d.utils.constants import WorldConst

TABLE = PT.make_type_table()
BALL = PT.type_id("BALL")
WORLD = WorldConst()
N = 10000

rng = np.random.default_rng(0)


def make_state(seed):
    r = np.random.default_rng(seed)
    pos = np.stack([r.uniform(-2, 2, N), r.uniform(-2, 2, N),
                    r.uniform(-0.7, -0.5, N)], 1).astype(np.float32)
    vel = r.normal(0, 0.5, (N, 3)).astype(np.float32)
    return PS.make_state(pos, vel, np.full(N, BALL), TABLE)


def timed(fn, states, reps=8):
    # two warmups with distinct inputs
    for s in states[:2]:
        float(np.asarray(fn(s)).sum())
    t0 = time.perf_counter()
    for s in states[2:2 + reps]:
        float(np.asarray(fn(s)).sum())
    return (time.perf_counter() - t0) / reps


def scanner(op, k):
    @jax.jit
    def run(st):
        def body(s, _):
            return op(s), None
        s, _ = jax.lax.scan(body, st, None, length=k)
        return s.px.sum() + s.pz.sum() + s.vx.sum()
    return run


def scanner6(op, k):
    """For ops returning the 6 delta arrays: fold them back into px."""
    @jax.jit
    def run(st):
        def body(s, _):
            d = op(s)
            return s._replace(px=s.px + 0.001 * d[0], py=s.py + 0.001 * d[1],
                              pz=s.pz + 0.001 * d[2]), None
        s, _ = jax.lax.scan(body, st, None, length=k)
        return s.px.sum() + s.pz.sum()
    return run


def delta(name, mk, lo=2, hi=12):
    states = [make_state(1000 + i) for i in range(12)]
    t_lo = timed(mk(lo), states)
    t_hi = timed(mk(hi), states)
    per = (t_hi - t_lo) / (hi - lo) * 1e3
    print(f"{name:40s} {per:8.3f} ms/op   (lo {t_lo*1e3:7.2f} hi {t_hi*1e3:7.2f})")
    return per


def main():
    mesh = jnp.full((WORLD.mesh_y, WORLD.mesh_x), -0.8, jnp.float32)
    env = PS.PhysicsEnv(mesh_height=mesh, water_plane_z=jnp.float32(-100.0),
                        wind=jnp.zeros(3), temperature=jnp.float32(20.0),
                        base_gravity=jnp.float32(1.0),
                        zmin=jnp.float32(-WORLD.z_scene))
    rad = jnp.asarray(TABLE.radius)[jnp.full(N, BALL)]
    mass = jnp.asarray(TABLE.mass)[jnp.full(N, BALL)]
    elas = jnp.asarray(TABLE.elasticity)[jnp.full(N, BALL)]

    print(f"devices: {jax.devices()}")

    # full frame (sort + 10 substeps)
    delta("frame (sort + 10 substeps + pairs)",
          lambda k: scanner(lambda s: PS.step_objects(
              s, env, None, TABLE, substeps=10, world=WORLD,
              obj_collisions=True), k), lo=1, hi=4)

    # frame without pair collisions
    delta("frame (10 substeps, no pairs)",
          lambda k: scanner(lambda s: PS.step_objects(
              s, env, None, TABLE, substeps=10, world=WORLD,
              obj_collisions=False), k), lo=1, hi=4)

    # sort alone
    delta("spatial_sort x (12-col lax.sort)",
          lambda k: scanner(lambda s: PS.spatial_sort(s, WORLD), k))

    # block pair pass alone
    def pairs_block(s):
        act = (s.status > 0)
        return PS.block_pair_collisions(s.px, s.py, s.pz, s.vx, s.vy, s.vz,
                                        rad, mass, elas, act,
                                        block=PS.PAIR_WINDOW)
    delta("block_pair_collisions B=384", lambda k: scanner6(pairs_block, k))

    def pairs_block256(s):
        act = (s.status > 0)
        return PS.block_pair_collisions(s.px, s.py, s.pz, s.vx, s.vy, s.vz,
                                        rad, mass, elas, act, block=256)
    delta("block_pair_collisions B=256", lambda k: scanner6(pairs_block256, k))

    # one substep without pairs
    def sub(s):
        return PS._substep(s, env, None, TABLE,
                           jnp.float32(PT.DEF_TIMESTEP / 10), WORLD, False)
    delta("single _substep (no pairs)", lambda k: scanner(sub, k))


if __name__ == "__main__":
    main()


def main2():
    mesh = jnp.full((WORLD.mesh_y, WORLD.mesh_x), -0.8, jnp.float32)
    env = PS.PhysicsEnv(mesh_height=mesh, water_plane_z=jnp.float32(-100.0),
                        wind=jnp.zeros(3), temperature=jnp.float32(20.0),
                        base_gravity=jnp.float32(1.0),
                        zmin=jnp.float32(-WORLD.z_scene))
    rad = jnp.asarray(TABLE.radius)[jnp.full(N, BALL)]
    mass = jnp.asarray(TABLE.mass)[jnp.full(N, BALL)]
    elas = jnp.asarray(TABLE.elasticity)[jnp.full(N, BALL)]

    def pairs_full(s):
        act = (s.status > 0)
        d = PS.block_pair_collisions(s.px, s.py, s.pz, s.vx, s.vy, s.vz,
                                     rad, mass, elas, act,
                                     block=PS.PAIR_WINDOW)
        return s._replace(px=s.px + d[0], py=s.py + d[1], pz=s.pz + d[2],
                          vx=s.vx + d[3], vy=s.vy + d[4], vz=s.vz + d[5])
    delta("block pairs B=384 ALL 6 outputs", lambda k: scanner(pairs_full, k))

    def sub_pairs(s):
        return PS._substep(s, env, None, TABLE,
                           jnp.float32(PT.DEF_TIMESTEP / 10), WORLD, True)
    delta("single _substep WITH pairs", lambda k: scanner(sub_pairs, k))


if __name__ == "__main__":
    pass
