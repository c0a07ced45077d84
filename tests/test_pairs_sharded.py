"""Multi-chip EXACT pair pass (parallel/pairs.py): the sharded halo
decomposition must reproduce the single-device banded pass — same pairs,
same responses — across the 8-device virtual mesh.

Reference semantics target: the pair-collision hot loop of
build_world.cpp:310-600 at pod scale.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

import w3d  # noqa: F401
from w3d.physics import step as PS
from w3d.physics import types as T
from w3d.models import physics_model as PM
from w3d.parallel.pairs import make_halo_pair_fn, make_step_objects_sharded
from w3d.utils.constants import WorldConst


def _mesh(axis="objs"):
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, axis_names=(axis,))


def _rand_cols(n, seed=0, dense=True):
    """x-sorted random population with plenty of contacts."""
    rng = np.random.default_rng(seed)
    scale = 0.35 if dense else 2.0
    px = np.sort(rng.uniform(-scale, scale, n)).astype(np.float32)
    py = rng.uniform(-scale, scale, n).astype(np.float32)
    pz = rng.uniform(0.0, 0.3, n).astype(np.float32)
    vx, vy, vz = (rng.normal(0, 0.5, n).astype(np.float32) for _ in range(3))
    rad = rng.uniform(0.02, 0.04, n).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    elas = rng.uniform(0.3, 0.9, n).astype(np.float32)
    act = rng.uniform(0, 1, n) > 0.05
    return tuple(jnp.asarray(a) for a in (px, py, pz, vx, vy, vz,
                                          rad, mass, elas)) + (jnp.asarray(act),)


def test_halo_pair_fn_matches_single_device():
    n, window = 1024, 64
    cols = _rand_cols(n)
    ref = PS.banded_pair_collisions(*cols, window=window)

    mesh = _mesh()
    nd = mesh.devices.size
    pair_fn = make_halo_pair_fn("objs", nd, window=window, method="banded")
    sh = NamedSharding(mesh, P("objs"))

    @jax.jit
    def run(*cs):
        cs = [jax.lax.with_sharding_constraint(c, sh) for c in cs]
        return shard_map(pair_fn, mesh=mesh, in_specs=P("objs"),
                         out_specs=P("objs"), check_vma=False)(*cs)

    out = run(*cols)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=1e-5, atol=1e-6)


def test_halo_pair_fn_cross_boundary_pairs_exist():
    """The dense population must actually exercise cross-device pairs —
    otherwise the equivalence test proves nothing."""
    n, window = 1024, 64
    cols = _rand_cols(n)
    nd = 8
    nl = n // nd
    px, py, pz = (np.asarray(c) for c in cols[:3])
    rad = np.asarray(cols[6])
    act = np.asarray(cols[9])
    crossing = 0
    for b in range(1, nd):
        lo = b * nl
        for i in range(max(0, lo - window), lo):
            for j in range(lo, min(n, i + window + 1)):
                if not (act[i] and act[j]):
                    continue
                d = np.sqrt((px[i] - px[j]) ** 2 + (py[i] - py[j]) ** 2
                            + (pz[i] - pz[j]) ** 2)
                if d < rad[i] + rad[j]:
                    crossing += 1
    assert crossing > 10, f"only {crossing} cross-boundary contacts"


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """Full frame step, collisions ON, 8-device mesh vs single device."""
    world = WorldConst()
    n, window = 1024, 64
    sw = PM.build_spheres_world(num_objects=n, world=world, seed=3)
    mesh = _mesh()
    step = make_step_objects_sharded(mesh, substeps=4, world=world,
                                     window=window, method="banded")

    st_ref = sw.state
    st_shd = sw.state
    with mesh:
        for _ in range(3):
            st_ref = PS.step_objects(st_ref, sw.env, sw.cobjs, sw.table,
                                     substeps=4, world=world,
                                     obj_collisions=True,
                                     pair_method="banded", pair_window=window)
            st_shd = step(st_shd, sw.env, sw.cobjs, sw.table)

    assert int(jnp.sum(st_ref.status > 0)) > 0
    np.testing.assert_array_equal(np.asarray(st_ref.status),
                                  np.asarray(st_shd.status))
    for f in ("px", "py", "pz", "vx", "vy", "vz"):
        np.testing.assert_allclose(np.asarray(getattr(st_ref, f)),
                                   np.asarray(getattr(st_shd, f)),
                                   rtol=2e-4, atol=2e-5, err_msg=f)


@pytest.mark.slow
def test_sharded_step_runs_10k_pair_window():
    """The production config — PAIR_WINDOW band, 10K objects — compiles
    and runs on the 8-device mesh (slab 1280 > window 288)."""
    world = WorldConst()
    sw = PM.build_spheres_world(num_objects=10240, world=world, seed=5)
    mesh = _mesh()
    step = make_step_objects_sharded(mesh, substeps=2, world=world,
                                     method="banded")
    with mesh:
        st = step(sw.state, sw.env, sw.cobjs, sw.table)
        st.px.block_until_ready()
    assert bool(jnp.isfinite(st.pz).all())
    assert int(jnp.sum(st.status > 0)) > 9000
