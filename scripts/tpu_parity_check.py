"""TPU-vs-CPU parity sweep for the hot compute paths.

Runs the same jitted programs on both backends and reports max abs
difference — catches fastmath/layout surprises that the CPU-pinned
golden tests can't see.  Run on a machine with a TPU attached:

    python scripts/tpu_parity_check.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def run_on(backend, fn, *args):
    dev = jax.devices(backend)[0]
    moved = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, dev) if hasattr(a, "shape") else a, args)
    with jax.default_device(dev):
        out = fn(*moved)
    return jax.tree_util.tree_map(np.asarray, out)


def report(name, a, b, tol):
    d = max(float(np.abs(np.asarray(x) - np.asarray(y)).max())
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b)))
    status = "OK " if d <= tol else "DIFF"
    print(f"{status} {name}: max|Δ| = {d:.3g} (tol {tol:g})")
    return d <= tol


def main():
    import w3d
    from w3d.models import terrain_model as TMOD
    from w3d.models import physics_model as PM
    from w3d.utils.constants import WorldConst

    backends = {d.platform for d in jax.devices()}
    if "cpu" not in backends:
        # CPU is always constructible
        pass
    world = WorldConst()
    ok = True

    # terrain tiles (noise + glaciate, XLA path)
    mcfg = TMOD.TileModelConfig(tile_size=64)
    table, x0, y0, ze, wpz = TMOD.example_inputs(mcfg, world, num_tiles=8)
    f = lambda *a: TMOD.tile_batch_step(*a, mcfg, world)
    t_tpu = run_on("tpu", f, table, x0, y0, ze, wpz)
    t_cpu = run_on("cpu", f, table, x0, y0, ze, wpz)
    # TPU evaluates sin() with hardware range reduction that loses
    # precision at the large phase arguments the 90-term sine tables
    # produce — measured ~0.3% of the height range vs CPU libm; this is
    # backend transcendental precision, not an algorithm difference
    # (the physics path below, with no transcendentals on large args,
    # matches to 1e-4).
    ok &= report("terrain tiles", t_tpu, t_cpu, 0.05)

    # physics frame
    sw = PM.build_spheres_world(num_objects=1000, world=world)
    g = lambda s: PM.frame_step(sw._replace(state=s), substeps=4,
                                world=world).state
    p_tpu = run_on("tpu", g, sw.state)
    p_cpu = run_on("cpu", g, sw.state)
    ok &= report("physics frame (pos)",
                 (p_tpu.px, p_tpu.py, p_tpu.pz),
                 (p_cpu.px, p_cpu.py, p_cpu.pz), 1e-3)

    print("PARITY" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
