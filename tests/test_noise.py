"""Noise generator tests: sine-table separability, fBm statistics, shapes."""
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.ops import noise as N
from w3d.utils.constants import WorldConst


def test_sine_table_deterministic():
    w = WorldConst()
    t1 = N.gen_sine_table(w, mesh_seed=7)
    t2 = N.gen_sine_table(w, mesh_seed=7)
    for a, b in zip(t1, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t3 = N.gen_sine_table(w, mesh_seed=8)
    assert not np.allclose(np.asarray(t1.mag), np.asarray(t3.mag))


def test_sine_table_shapes_and_ranges():
    t = N.gen_sine_table(WorldConst(), mesh_seed=1)
    assert t.mag.shape == (N.F_TABLE_SIZE,)
    assert (np.asarray(t.phase_x) >= 0).all() and (np.asarray(t.phase_x) <= 2 * np.pi).all()
    assert (np.asarray(t.mag) > 0).all()


def test_eval_sine_grid_matches_direct_sum():
    """The einsum form must equal the scalar eval_index double loop."""
    w = WorldConst(mesh_x=16, mesh_y=12)
    t = N.gen_sine_table(w, mesh_seed=3)
    xt, yt = N.sine_term_tables(t, 0.0, 0.0, w.dx, w.dy, 16, 12, world=w)
    grid = np.asarray(N.eval_sine_grid(xt, yt))
    xt_n, yt_n = np.asarray(xt), np.asarray(yt)
    for y in range(12):
        for x in range(16):
            direct = float((xt_n[x] * yt_n[y]).sum())
            assert abs(grid[y, x] - direct) < 1e-4


def test_sine_batched_tiles():
    """Batched x0/y0 leading dim builds per-tile tables in one call."""
    w = WorldConst(mesh_x=8, mesh_y=8)
    t = N.gen_sine_table(w, mesh_seed=3)
    x0 = jnp.asarray([0.0, 8.0, 16.0])
    y0 = jnp.asarray([0.0, 0.0, 8.0])
    xt, yt = N.sine_term_tables(t, x0, y0, w.dx, w.dy, 8, 8, world=w)
    assert xt.shape == (3, 8, N.F_TABLE_SIZE)
    g = N.eval_sine_grid(xt, yt)
    assert g.shape == (3, 8, 8)
    # tile 1 at x0=8 must equal single-tile eval at that offset
    xt1, yt1 = N.sine_term_tables(t, 8.0, 0.0, w.dx, w.dy, 8, 8, world=w)
    g1 = N.eval_sine_grid(xt1, yt1)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g1), rtol=1e-6)


def test_start_eval_sin():
    assert N.start_eval_sin(1.0) == N.N_RAND_SIN2 * 2  # iscale=0 + filter 2
    assert N.start_eval_sin(1.0, 0) == 0
    assert N.start_eval_sin(64.0) == N.N_RAND_SIN2 * (N.NUM_FREQ_COMP - N.MIN_FREQS)


def test_simplex_perlin_basic_stats():
    k = 128
    xs = jnp.linspace(0.0, 37.0, k)
    xv, yv = jnp.meshgrid(xs, xs)
    for fn in (N.simplex2d, N.perlin2d):
        v = np.asarray(fn(xv, yv))
        assert np.isfinite(v).all()
        assert abs(v.mean()) < 0.1
        assert 0.05 < v.std() < 1.0
        assert v.min() >= -1.8 and v.max() <= 1.8


def test_fbm_shapes_and_modes():
    xs = jnp.linspace(0.0, 11.0, 64)
    xv, yv = jnp.meshgrid(xs, xs)
    lin = np.asarray(N.fbm2d(xv, yv, 1.3, 1.7, shape=N.SHAPE_LINEAR))
    bil = np.asarray(N.fbm2d(xv, yv, 1.3, 1.7, shape=N.SHAPE_BILLOWY))
    rid = np.asarray(N.fbm2d(xv, yv, 1.3, 1.7, shape=N.SHAPE_RIDGED))
    assert np.isfinite(lin).all() and np.isfinite(bil).all() and np.isfinite(rid).all()
    assert not np.allclose(lin, bil) and not np.allclose(lin, rid)


def test_fbm_jit_bitwise_stable():
    xs = jnp.linspace(0.0, 5.0, 32)
    xv, yv = jnp.meshgrid(xs, xs)
    f = jax.jit(lambda a, b: N.fbm2d(a, b, 1.1, 1.9))
    v1 = np.asarray(f(xv, yv))
    v2 = np.asarray(f(xv, yv))
    np.testing.assert_array_equal(v1, v2)


def test_domain_warp_changes_field():
    xs = jnp.linspace(0.0, 9.0, 32)
    xv, yv = jnp.meshgrid(xs, xs)
    wx, wy = N.domain_warp2d(xv, yv, 1.2, 1.4)
    assert not np.allclose(np.asarray(wx), np.asarray(xv))
    z = N.fbm2d(wx, wy, 1.2, 1.4)
    assert np.isfinite(np.asarray(z)).all()
