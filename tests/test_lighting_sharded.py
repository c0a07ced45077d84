"""Multi-chip lighting bake (lighting/parallel.py) on the virtual
8-device CPU mesh: psum merge, determinism, statistical equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import w3d
from w3d.lighting import lmap as L
from w3d.lighting import trace as T
from w3d.lighting import parallel as LP
from w3d.parallel.mesh import make_mesh
from w3d.utils.constants import WorldConst
from w3d.scene import cobj as SC

W = WorldConst(mesh_x=32, mesh_y=32, mesh_z=16)
MESH = jnp.full((W.mesh_y, W.mesh_x), -0.6, jnp.float32)
# small trace graph for the quick tier: compile time dominates these
# tests (the 8-bounce default unrolls a graph ~3x this size); behavior
# under test (psum merge, determinism, energy parity) is bounce-agnostic
P3 = T.TraceParams(max_bounces=3, samples_per_segment=6, mesh_steps=12)


def floor_scene():
    sp = SC.SceneParse()
    lay = SC.CobjLayer(elasticity=0.5, color=(0.7, 0.6, 0.5, 1.0))
    sp.cobjs.append(SC.RawCobj(SC.COLL_CUBE, (-2, -2, -0.8), (2, 2, -0.55),
                               layer=lay))
    sp.cobjs.append(SC.RawCobj(SC.COLL_SPHERE, (0.3, 0.0, 0.0), r1=0.4,
                               layer=lay))
    return SC.pack_cobjs(sp)


@pytest.fixture(scope="module")
def dev_mesh():
    assert len(jax.devices()) >= 8, "conftest forces an 8-device CPU mesh"
    return make_mesh(8, axis="rays")


def test_sharded_sky_bake_runs_and_merges(dev_mesh):
    co = floor_scene()
    grid = L.make_light_grid(W)
    out = LP.compute_sky_lighting_sharded(dev_mesh, grid, co, MESH,
                                          num_rays=8 * 2048, batch=2048,
                                          seed=1, world=W, params=P3)
    sv = np.asarray(out.sv)
    assert np.isfinite(sv).all()
    assert sv.sum() > 0
    # open cells above the floor received sky light
    assert sv[-1].mean() > 0


@pytest.mark.slow
def test_sharded_bake_deterministic(dev_mesh):
    co = floor_scene()
    grid = L.make_light_grid(W)
    a = LP.compute_sky_lighting_sharded(dev_mesh, grid, co, MESH,
                                        num_rays=8 * 1024, batch=1024,
                                        seed=7, world=W)
    b = LP.compute_sky_lighting_sharded(dev_mesh, grid, co, MESH,
                                        num_rays=8 * 1024, batch=1024,
                                        seed=7, world=W)
    np.testing.assert_array_equal(np.asarray(a.sv), np.asarray(b.sv))
    np.testing.assert_array_equal(np.asarray(a.sc_r), np.asarray(b.sc_r))


@pytest.mark.slow
def test_sharded_matches_single_device_statistically(dev_mesh):
    """8 devices x N rays == 1 device x 8N rays in expectation: total
    deposited sky energy within MC tolerance."""
    co = floor_scene()
    n = 8 * 2048
    sharded = LP.compute_sky_lighting_sharded(
        dev_mesh, L.make_light_grid(W), co, MESH, num_rays=n, batch=2048, params=P3,
        seed=3, world=W)
    single = T.compute_sky_lighting(
        L.make_light_grid(W), co, MESH, n, seed=3, world=W, batch=2048, params=P3)
    es = float(jnp.sum(sharded.sv))
    e1 = float(jnp.sum(single.sv))
    assert e1 > 0
    assert abs(es - e1) / e1 < 0.1, (es, e1)


def test_sharded_global_bake(dev_mesh):
    co = floor_scene()
    grid = L.make_light_grid(W)
    out = LP.compute_global_lighting_sharded(
        dev_mesh, grid, co, MESH, num_rays=8 * 1024, batch=1024,
        sun_dir=(0.3, 0.2, -0.9), seed=2, world=W, params=P3)
    gv = np.asarray(out.gv)
    assert np.isfinite(gv).all()
    assert gv.sum() > 0


@pytest.mark.slow
def test_sharded_bake_accumulates_onto_existing(dev_mesh):
    """Baking onto a non-zero grid adds the delta (the input contents
    must not be multiplied by the device count through the psum)."""
    co = floor_scene()
    base = LP.compute_sky_lighting_sharded(
        dev_mesh, L.make_light_grid(W), co, MESH, num_rays=8 * 512,
        batch=512, seed=4, world=W, params=P3)
    twice = LP.compute_sky_lighting_sharded(
        dev_mesh, base, co, MESH, num_rays=8 * 512, batch=512, seed=5,
        world=W, params=P3)
    d1 = float(jnp.sum(base.sv))
    d2 = float(jnp.sum(twice.sv))
    # second bake adds a comparable delta on top (not ndev x base)
    assert d2 > d1
    assert d2 < 3.0 * d1


def test_sharded_bake_nonmultiple_ray_count(dev_mesh):
    """A ray budget that is NOT a multiple of ndev*batch must not trace
    padded extra rays: energy stays comparable to the single-device bake
    of the same (rounded-up) count."""
    co = floor_scene()
    n = 8 * 1500                       # per-device 1500, batch 1024 -> 2 batches of 1024+476
    sharded = LP.compute_sky_lighting_sharded(
        dev_mesh, L.make_light_grid(W), co, MESH, num_rays=n, batch=1024,
        seed=9, world=W, params=P3)
    single = T.compute_sky_lighting(
        L.make_light_grid(W), co, MESH, n, seed=9, world=W, batch=1024, params=P3)
    es = float(jnp.sum(sharded.sv))
    e1 = float(jnp.sum(single.sv))
    assert abs(es - e1) / e1 < 0.12, (es, e1)
