"""Lighting precompute tests: tracer physicality, shadows, determinism."""
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.lighting import lmap as L, trace as T
from w3d.scene import cobj as SC
from w3d.physics.cobjs import COLL_CUBE, COLL_SPHERE
from w3d.utils.constants import WorldConst

W = WorldConst(mesh_x=32, mesh_y=32, mesh_z=16)
PARAMS = T.TraceParams(max_bounces=4, samples_per_segment=8, line_length=16.0)


def floor_scene():
    sp = SC.SceneParse()
    lay = SC.CobjLayer(color=(0.9, 0.9, 0.9, 1.0))
    sp.cobjs.append(SC.RawCobj(COLL_CUBE, (-4, -4, -0.6), (4, 4, -0.4), layer=lay))
    return SC.pack_cobjs(sp)


MESH = jnp.full((32, 32), -3.5, jnp.float32)


def test_sky_lighting_above_vs_below_floor():
    grid = L.make_light_grid(W)
    grid = T.compute_sky_lighting(grid, floor_scene(), MESH, 16384,
                                  params=PARAMS, world=W, batch=16384)
    # brightness lives in the weight channel (sv); hue in normalized sc
    sv = np.asarray(grid.sv)
    above = sv[8:12].mean()
    below = sv[2:6].mean()
    assert above > 3.0 * below, (above, below)
    # final combined color shows the same shadowing
    r, _, _ = L.final_color(grid, sky_scale=1.0)
    r = np.asarray(r)
    assert r[8:12].mean() > 2.0 * r[2:6].mean()


def test_local_light_falloff_and_shadow():
    sp = SC.SceneParse()
    lay = SC.CobjLayer(color=(0.8, 0.8, 0.8, 1.0))
    sp.cobjs.append(SC.RawCobj(COLL_CUBE, (-4, -4, -0.6), (4, 4, -0.4), layer=lay))
    # occluder sphere between the light (at origin-ish) and +x region
    sp.cobjs.append(SC.RawCobj(COLL_SPHERE, (1.5, 0.0, 0.5), r1=0.6, layer=lay))
    co = SC.pack_cobjs(sp)
    grid = L.make_light_grid(W)
    grid = T.compute_local_lighting(grid, co, MESH, [((0.0, 0.0, 0.5), (1.0, 1.0, 1.0))],
                                    16384, params=PARAMS, world=W)
    lc = np.asarray(grid.lc_r)
    # direct paths light the cells between light and occluder more than
    # the cells hidden behind the occluder at the same distance
    z = 9  # z=0.5 layer (z0=-4, dz=0.5)
    lit = lc[z, 16, 18:20].mean()      # toward the sphere (lit side)
    shadowed = lc[z, 16, 26:28].mean() # behind the sphere
    assert lit > 2.0 * shadowed, (lit, shadowed)


def test_trace_deterministic():
    grid1 = L.make_light_grid(W)
    grid1 = T.compute_sky_lighting(grid1, floor_scene(), MESH, 4096,
                                   params=PARAMS, world=W, batch=4096)
    grid2 = L.make_light_grid(W)
    grid2 = T.compute_sky_lighting(grid2, floor_scene(), MESH, 4096,
                                   params=PARAMS, world=W, batch=4096)
    np.testing.assert_array_equal(np.asarray(grid1.sc_r), np.asarray(grid2.sc_r))


def test_ray_cobjs_nearest_basics():
    from w3d.ops import ray as R
    sp = SC.SceneParse()
    sp.cobjs.append(SC.RawCobj(COLL_CUBE, (1.0, -1.0, -1.0), (2.0, 1.0, 1.0)))
    sp.cobjs.append(SC.RawCobj(COLL_SPHERE, (5.0, 0.0, 0.0), r1=0.5))
    co = SC.pack_cobjs(sp)
    ox = jnp.asarray([0.0, 0.0, 0.0])
    oy = jnp.asarray([0.0, 0.0, 3.0])
    oz = jnp.asarray([0.0, 0.0, 0.0])
    dx = jnp.asarray([1.0, 1.0, 1.0])
    dy = jnp.asarray([0.0, 0.0, 0.0])
    dz = jnp.asarray([0.0, 0.0, 0.0])
    tmax = jnp.full((3,), 100.0)
    hit, t, nx, ny, nz, oh = R.ray_cobjs_nearest(ox, oy, oz, dx, dy, dz, tmax, co)
    hit, t, nx = np.asarray(hit), np.asarray(t), np.asarray(nx)
    assert hit[0] and abs(t[0] - 1.0) < 1e-5       # hits cube face at x=1
    assert abs(nx[0] + 1.0) < 1e-5                 # entry normal -x
    assert not hit[2]                              # misses everything (y=3)
    # ray 1: cube at t=1 is closer than sphere at t=4.5
    assert abs(t[1] - 1.0) < 1e-5


def test_ray_heightfield():
    from w3d.ops import ray as R
    mesh = jnp.zeros((32, 32), jnp.float32)        # flat at z=0
    ox = jnp.asarray([0.0])
    oy = jnp.asarray([0.0])
    oz = jnp.asarray([2.0])
    d = np.array([1.0, 0.0, -1.0])
    d = d / np.linalg.norm(d)
    hit, t = R.ray_heightfield(ox, oy, oz, jnp.full((1,), d[0]), jnp.full((1,), d[1]),
                               jnp.full((1,), d[2]), jnp.full((1,), 10.0), mesh, W,
                               num_steps=128)
    assert bool(hit[0])
    # expected t: z=0 at t = 2/(1/sqrt2) = 2*sqrt2 ~ 2.83
    assert abs(float(t[0]) - 2.83) < 0.15


def test_lightgrid_io_roundtrip(tmp_path):
    grid = L.make_light_grid(W)
    grid = grid._replace(sc_r=grid.sc_r + 1.5)
    p = str(tmp_path / "light.npz")
    L.save_npz(grid, p)
    g2 = L.load_npz(p)
    np.testing.assert_array_equal(np.asarray(grid.sc_r), np.asarray(g2.sc_r))
    assert float(g2.dz) == float(grid.dz)


def test_dda_heightfield_exact():
    """mesh_intersector equivalent (mesh_intersect.cpp:248): the DDA
    cell walk matches a dense-sampling oracle exactly on hit masks and
    to sampling resolution on t; the fixed-step march misses thin
    features the DDA catches."""
    import numpy as np
    import jax.numpy as jnp
    from w3d.ops.ray import ray_heightfield, ray_heightfield_dda
    from w3d.utils.constants import WorldConst

    world = WorldConst(mesh_x=64, mesh_y=64)
    rng = np.random.default_rng(0)
    mesh_np = (0.3 * rng.standard_normal((64, 64))).astype(np.float32)
    mesh = jnp.asarray(mesh_np)

    def bilin(x, y):
        gx = np.clip(x * world.dx_inv + 32, 0, 62.999)
        gy = np.clip(y * world.dy_inv + 32, 0, 62.999)
        x0 = np.floor(gx).astype(int)
        y0 = np.floor(gy).astype(int)
        fx, fy = gx - x0, gy - y0
        return ((mesh_np[y0, x0] * (1 - fx) + mesh_np[y0, x0 + 1] * fx)
                * (1 - fy)
                + (mesh_np[y0 + 1, x0] * (1 - fx)
                   + mesh_np[y0 + 1, x0 + 1] * fx) * fy)

    N = 24
    o = np.stack([rng.uniform(-1.5, 1.5, N), rng.uniform(-1.5, 1.5, N),
                  rng.uniform(0.8, 1.5, N)], 1).astype(np.float32)
    d = np.stack([rng.uniform(-1, 1, N), rng.uniform(-1, 1, N),
                  rng.uniform(-1.0, -0.3, N)], 1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = jnp.full((N,), 4.0)
    hit, t = ray_heightfield_dda(
        *[jnp.asarray(o[:, i]) for i in range(3)],
        *[jnp.asarray(d[:, i]) for i in range(3)], tmax, mesh, world,
        max_cells=256)
    for i in range(N):
        ts = np.linspace(0, 4.0, 40000)[1:]
        p = o[i][None] + ts[:, None] * d[i][None]
        inb = (np.abs(p[:, 0]) < world.x_scene) \
            & (np.abs(p[:, 1]) < world.y_scene)
        below = (p[:, 2] < bilin(p[:, 0], p[:, 1])) & inb
        k = np.argmax(below)
        assert bool(below[k]) == bool(hit[i]), i
        if below[k]:
            assert abs(ts[k] - float(t[i])) < 2e-3, i
