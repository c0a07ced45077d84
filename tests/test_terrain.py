"""Terrain pipeline tests: determinism, jit stability, physical sanity."""
import numpy as np
import jax.numpy as jnp

import w3d
from w3d.terrain.mesh import (
    gen_terrain, TerrainConfig, clip_hd1, lttex_dirt_zvals, apply_glaciate,
)
from w3d.utils.constants import WorldConst
from w3d.ops import noise as N

W64 = WorldConst(mesh_x=64, mesh_y=64)


def test_gen_terrain_shape_and_determinism():
    ts1 = gen_terrain(TerrainConfig(mesh_seed=11), W64)
    ts2 = gen_terrain(TerrainConfig(mesh_seed=11), W64)
    assert ts1.mesh_height.shape == (64, 64)
    np.testing.assert_array_equal(np.asarray(ts1.mesh_height), np.asarray(ts2.mesh_height))
    ts3 = gen_terrain(TerrainConfig(mesh_seed=12), W64)
    assert not np.allclose(np.asarray(ts1.mesh_height), np.asarray(ts3.mesh_height))


def test_gen_terrain_zrange_consistency():
    ts = gen_terrain(TerrainConfig(mesh_seed=5), W64)
    hm = np.asarray(ts.mesh_height)
    assert float(ts.zbottom) <= hm.min() + 1e-5
    assert float(ts.ztop) >= hm.max() - 1e-5
    # glaciated heights stay within the estimated range
    assert hm.min() >= float(ts.zmin) - 1e-4
    assert hm.max() <= float(ts.zmax) + 1e-4
    # water plane inside the z range
    assert float(ts.zmin) < float(ts.water_plane_z) < float(ts.zmax)


def test_glaciate_monotonic():
    z = jnp.linspace(-2.0, 2.0, 101)
    cfg = TerrainConfig()
    g = np.asarray(apply_glaciate(z, jnp.float32(2.0), cfg))
    assert (np.diff(g) >= -1e-6).all()          # monotone
    assert abs(g[0] - (-2.0)) < 1e-5            # fixed endpoints
    assert abs(g[-1] - 2.0) < 1e-4


def test_glaciate_disabled():
    z = jnp.linspace(-1.0, 1.0, 11)
    cfg = TerrainConfig(glaciate=False)
    np.testing.assert_array_equal(np.asarray(apply_glaciate(z, jnp.float32(2.0), cfg)), np.asarray(z))


def test_clip_hd1_value():
    # default water level: sand 0.40 -> 0.40, dirt 0.44 -> 0.44..., cubed
    cfg = TerrainConfig()
    zv = lttex_dirt_zvals(cfg)
    assert abs(zv[0] - 0.40) < 1e-6
    assert abs(zv[4] - 1.0) < 1e-6
    c = clip_hd1(cfg)
    assert 0.0 < c < 0.2  # cubed relative heights are small


def test_terrain_with_erosion_changes_map():
    cfg0 = TerrainConfig(mesh_seed=21, erosion_iters=0)
    cfg1 = TerrainConfig(mesh_seed=21, erosion_iters=500)
    h0 = np.asarray(gen_terrain(cfg0, W64).mesh_height)
    h1 = np.asarray(gen_terrain(cfg1, W64).mesh_height)
    assert not np.allclose(h0, h1)
    # erosion never drops below the pre-erosion minimum (min_zval clamp)
    assert h1.min() >= h0.min() - 1e-5


def test_fbm_mode_terrain():
    cfg = TerrainConfig(mode=N.MGEN_SIMPLEX, mesh_seed=4)
    ts = gen_terrain(cfg, W64)
    hm = np.asarray(ts.mesh_height)
    assert np.isfinite(hm).all()
    assert hm.std() > 0.0
