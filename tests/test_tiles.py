"""Tiled terrain streaming, AO, shadows, biome weight tests."""
import numpy as np
import jax.numpy as jnp

import w3d
from w3d.terrain.tiles import TileManager
from w3d.terrain.mesh import TerrainConfig
from w3d.terrain import biomes as B
from w3d.ops import ao as AO, shadows as SH
from w3d.utils.constants import WorldConst

W = WorldConst()


def test_tile_streaming_create_delete():
    tm = TileManager(cfg=TerrainConfig(mesh_seed=5), world=W, tile_size=32)
    new, dele = tm.update(0.0, 0.0)
    assert len(new) == 9 and len(tm.tiles) == 9
    # no-op update: nothing changes
    new2, del2 = tm.update(0.1, 0.0)
    assert not new2 and not del2
    # move far: all old tiles deleted, new ones created
    far = 10 * 32 * W.dx
    new3, del3 = tm.update(far, 0.0)
    assert len(del3) == 9 and len(new3) == 9


def test_tile_regen_deterministic_and_continuous():
    tm = TileManager(cfg=TerrainConfig(mesh_seed=5), world=W, tile_size=32)
    tm.update(0.0, 0.0)
    a = np.asarray(tm.tiles[(0, 0)].zvals)
    b = np.asarray(tm.tiles[(1, 0)].zvals)
    # adjacent tiles are continuous (global noise field): seam step is
    # bounded by normal cell-to-cell variation
    interior_step = np.abs(np.diff(a, axis=1)).max()
    seam_step = np.abs(a[:, -1] - b[:, 0]).max()
    assert seam_step <= interior_step * 1.5
    z1 = a.copy()
    tm.tiles.clear()
    tm.update(0.0, 0.0)
    np.testing.assert_array_equal(z1, np.asarray(tm.tiles[(0, 0)].zvals))


def test_tile_products_sane():
    tm = TileManager(cfg=TerrainConfig(mesh_seed=7), world=W, tile_size=32,
                     erosion_iters_tt=32)
    tm.update(0.0, 0.0)
    t = tm.tiles[(0, 0)]
    ao = np.asarray(t.ao)
    assert (ao >= 0).all() and (ao <= 1).all()
    w = np.asarray(t.weights)
    assert w.shape[0] == 5
    np.testing.assert_allclose(w.sum(0), 1.0, atol=1e-3)
    assert np.asarray(t.smask_sun).dtype == bool


def test_ao_spike_occludes_neighbors():
    C = 32 + 2 * AO.AO_RAY_LEN
    z = np.zeros((C, C), np.float32)
    z[C // 2, C // 2] = 3.0
    ao = np.asarray(AO.tile_ao(jnp.asarray(z), 32, dz=0.015))
    cx = 16
    assert ao[cx, cx + 1] < 1.0        # adjacent cell sees the spike (offset 1)
    assert ao[2, 2] == 1.0             # far cell unoccluded
    # symmetric occlusion around the spike
    assert abs(ao[cx, cx + 1] - ao[cx, cx - 1]) < 1e-6


def test_shadows_directional():
    z = np.zeros((64, 64), np.float32)
    z[:, 20] = 2.0
    sh_px, _ = SH.mesh_shadows(jnp.asarray(z), (1.0, 0.0, 0.5), cell_w=W.dx)
    sh_px = np.asarray(sh_px)
    assert sh_px[32, 10:20].all()       # light from +x shadows the -x side
    assert not sh_px[32, 21:40].any()
    sh_nx, _ = SH.mesh_shadows(jnp.asarray(z), (-1.0, 0.0, 0.5), cell_w=W.dx)
    sh_nx = np.asarray(sh_nx)
    assert sh_nx[32, 21:31].all()
    assert not sh_nx[32, 10:20].any()


def test_shadows_diagonal_shear():
    z = np.zeros((64, 64), np.float32)
    z[32, 32] = 2.0
    sh, _ = SH.mesh_shadows(jnp.asarray(z), (1.0, 1.0, 0.4), cell_w=W.dx)
    ys, xs = np.where(np.asarray(sh))
    assert len(xs) > 5
    assert (xs - 32).mean() < -3 and (ys - 32).mean() < -3  # away from light


def test_shadows_straight_down_none():
    z = np.asarray(np.random.default_rng(0).normal(0, 1, (32, 32)), np.float32)
    sh, _ = SH.mesh_shadows(jnp.asarray(z), (0.0, 0.0, 1.0), cell_w=W.dx)
    assert not np.asarray(sh).any()


def test_biome_weights_bands():
    z = jnp.linspace(-10.0, 10.0, 64)[None, :].repeat(8, 0)  # ramp
    nz = jnp.ones_like(z)
    w = np.asarray(B.biome_weights(z, nz, -10.0, 10.0))
    # low altitude: sand dominant; high: snow dominant
    assert w[B.SAND, :, 0].mean() > 0.9
    assert w[B.SNOW, :, -1].mean() > 0.9
    # steep slope kills grass
    w2 = np.asarray(B.biome_weights(z, jnp.full_like(z, 0.3), -10.0, 10.0))
    assert w2[B.GRASS].max() < 1e-6


def test_tile_budget_priority_double_buffer():
    """tile_draw_t::update streaming policy: nearest-first priority,
    per-frame budget, async adopt-next-frame (tiled_mesh.cpp:2349-2417)."""
    from w3d.terrain.tiles import TileManager
    from w3d.terrain.mesh import TerrainConfig
    from w3d.utils.constants import WorldConst

    W = WorldConst(mesh_x=64, mesh_y=64)
    tm = TileManager(cfg=TerrainConfig(mesh_seed=5), world=W, tile_size=32)
    new1, _ = tm.update(0.0, 0.0, max_tiles_per_frame=3)
    assert len(new1) == 3
    assert len(tm.tiles) == 0          # in flight, not yet adopted
    ctx, cty = tm.camera_tile(0.0, 0.0)
    d0 = (new1[0][0] - ctx) ** 2 + (new1[0][1] - cty) ** 2
    d2 = (new1[2][0] - ctx) ** 2 + (new1[2][1] - cty) ** 2
    assert d0 <= d2                    # nearest-first
    new2, _ = tm.update(0.0, 0.0, max_tiles_per_frame=3)
    assert all(k in tm.tiles for k in new1)   # batch 1 adopted
    assert not (set(new1) & set(new2))        # no re-request
    tm.flush()
    assert all(k in tm.tiles for k in new2)
    # unbudgeted update fills the remainder synchronously
    rest, _ = tm.update(0.0, 0.0)
    assert all(k in tm.tiles for k in rest)


def test_per_tile_grass_and_flowers():
    """grass_tile_manager_t semantics: resident tiles generate per-blade
    grass + flowers from their own biome weights, deterministically per
    (tx, ty)."""
    import numpy as np
    from w3d.terrain.tiles import TileManager
    from w3d.terrain.mesh import TerrainConfig
    from w3d.utils.constants import WorldConst
    tm = TileManager(cfg=TerrainConfig(mesh_seed=3),
                     world=WorldConst(mesh_x=64, mesh_y=64), tile_size=64)
    tm.update(0.0, 0.0)
    tm.flush()
    key = next(iter(tm.tiles))
    g1 = tm.grass_for_tile(key)
    g2 = tm.grass_for_tile(key)
    np.testing.assert_array_equal(np.asarray(g1.x), np.asarray(g2.x))
    # blades only where grass weight allows; heights zero where culled
    h = np.asarray(g1.height)
    assert (h >= 0).all()
    f = tm.flowers_for_tile(key)
    alive = np.asarray(f.alive)
    # flowers are a subset phenomenon; count is bounded by the blades
    assert alive.sum() <= h.size
