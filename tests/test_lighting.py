"""Lighting precompute tests: tracer physicality, shadows, determinism."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.lighting import lmap as L, trace as T
from w3d.scene import cobj as SC
from w3d.physics.cobjs import COLL_CUBE, COLL_SPHERE
from w3d.utils.constants import WorldConst

W = WorldConst(mesh_x=32, mesh_y=32, mesh_z=16)
PARAMS = T.TraceParams(max_bounces=3, samples_per_segment=6, line_length=16.0,
                       mesh_steps=12)


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


# ---------------------------------------------------------------------------
# tracer parity round 2 (VERDICT task 6): transmission, ice/snow,
# landscape albedo, scene lights end-to-end
# ---------------------------------------------------------------------------

def _glass_wall_scene(alpha):
    """A floor plus a full-height wall at x~1 between the light at the
    origin and the +x half of the volume."""
    sp = SC.SceneParse()
    lay = SC.CobjLayer(color=(0.9, 0.9, 0.9, 1.0))
    sp.cobjs.append(SC.RawCobj(COLL_CUBE, (-4, -4, -0.6), (4, 4, -0.4), layer=lay))
    glass = SC.CobjLayer(color=(0.9, 0.9, 0.9, alpha), refract_ix=1.5,
                         light_atten=0.5)
    sp.cobjs.append(SC.RawCobj(COLL_CUBE, (0.8, -4, -0.4), (1.2, 4, 4),
                               layer=glass))
    return SC.pack_cobjs(sp)


@pytest.mark.slow
def test_transmission_through_glass():
    """Light passes through an alpha<1 wall into the far half of the
    volume (ray_trace.cpp:407-458); an opaque wall blocks it."""
    light = [((0.0, 0.0, 0.5), (1.0, 1.0, 1.0))]

    def run(alpha):
        grid = L.make_light_grid(W)
        grid = T.compute_local_lighting(grid, _glass_wall_scene(alpha), MESH,
                                        light, 16384, params=PARAMS, world=W)
        lc = np.asarray(grid.lc_r)
        z = 9   # z=0.5 layer
        behind = lc[z, 14:19, 22:28].mean()   # +x of the wall
        front = lc[z, 14:19, 10:15].mean()    # light side
        return behind, front

    b_glass, f_glass = run(0.3)
    b_opaque, f_opaque = run(1.0)
    assert f_glass > 0 and f_opaque > 0
    # glass: meaningful light behind; opaque: essentially none
    assert b_glass > 5.0 * max(b_opaque, 1e-9), (b_glass, b_opaque)
    # transmitted light is attenuated vs the light side
    assert b_glass < f_glass, (b_glass, f_glass)


@pytest.mark.slow
def test_ice_stops_rays_at_water_plane_when_frozen():
    """temperature <= W_FREEZE_POINT turns the water plane into an ice
    surface (ray_trace.cpp:296-303): cells below the plane stay dark."""
    co = floor_scene()
    wpz = -1.0

    def run(temp):
        params = T.TraceParams(max_bounces=3, samples_per_segment=6,
                               line_length=16.0, water_plane_z=wpz,
                               temperature=temp)
        grid = L.make_light_grid(W)
        grid = T.compute_sky_lighting(grid, co, MESH, 16384, params=params,
                                      world=W, batch=16384)
        return np.asarray(grid.sv)

    frozen = run(-5.0)
    warm = run(20.0)
    # z index of the layer just below the water plane: z0=-4, dz=0.5
    zb = int((wpz - (-4.0)) / 0.5) - 1
    below_frozen = frozen[zb - 2:zb + 1].mean()
    below_warm = warm[zb - 2:zb + 1].mean()
    assert below_warm > 2.0 * max(below_frozen, 1e-9), \
        (below_warm, below_frozen)


def test_landscape_albedo_tints_bounce_light():
    """Mesh hits modulate by the landscape color map (land_color), not a
    constant: a green-grass map tints the volume greener than a red one
    (get_landscape_texture_color, ray_trace.cpp:377-381)."""
    co = SC.pack_cobjs(SC.SceneParse())
    mesh = jnp.full((32, 32), -1.0, jnp.float32)

    def run(col):
        lc = jnp.broadcast_to(jnp.asarray(col, jnp.float32), (32, 32, 3))
        grid = L.make_light_grid(W)
        grid = T.compute_sky_lighting(grid, co, mesh, 16384, params=PARAMS,
                                      world=W, batch=16384, land_color=lc)
        return (np.asarray(grid.sc_r).mean(), np.asarray(grid.sc_g).mean())

    r_red, g_red = run((0.8, 0.1, 0.1))
    r_grn, g_grn = run((0.1, 0.8, 0.1))
    # direct sky deposits carry the sky hue; the bounce tint still must
    # shift the red/green balance measurably between the two maps
    assert r_red / max(g_red, 1e-9) > 1.15 * r_grn / max(g_grn, 1e-9), \
        ((r_red, g_red), (r_grn, g_grn))


def test_snow_cover_brightens_bounce():
    """Snow-covered mesh reflects SNOW_ALBEDO white: more bounced light
    than dark terrain (ray_trace.cpp:366-370).  A ceiling catches the
    bounced rays (un-hit rays deposit nothing, ray_trace.cpp:341), so the
    ground-to-ceiling volume shows the albedo difference."""
    sp = SC.SceneParse()
    lay = SC.CobjLayer(color=(0.3, 0.3, 0.3, 1.0))
    sp.cobjs.append(SC.RawCobj(COLL_CUBE, (-8, -8, 3.5), (8, 8, 3.7), layer=lay))
    co = SC.pack_cobjs(sp)
    mesh = jnp.full((32, 32), -1.0, jnp.float32)
    dark = jnp.broadcast_to(jnp.asarray((0.15, 0.1, 0.08), jnp.float32),
                            (32, 32, 3))

    def run(snow):
        grid = L.make_light_grid(W)
        grid = T.compute_sky_lighting(grid, co, mesh, 16384, params=PARAMS,
                                      world=W, batch=16384, land_color=dark,
                                      snow_depth=snow)
        return np.asarray(grid.sv)[10:14].mean()   # mid-air layers

    lit_snow = run(jnp.ones((32, 32), jnp.float32))
    lit_dark = run(None)
    assert lit_snow > 1.3 * lit_dark, (lit_snow, lit_dark)


def test_scene_lights_drive_local_lighting_end_to_end():
    """'L' scene-DSL lights reach the lighting volume via
    compute_scene_lighting (VERDICT missing #2/#6 wiring)."""
    import io
    txt = """l 0.5 0.9 0.9 0.9 1.0 -1
B -4 4 -4 4 -0.6 -0.4
L 0.0 0.1  0.0 0.0 0.5  1.0 0.9 0.8 1.0
"""
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cobjs.txt")
        with open(p, "w") as f:
            f.write(txt)
        sp = SC.parse_coll_obj_file(p)
    assert len(sp.lights) == 1
    co = SC.pack_cobjs(sp)
    grid = L.make_light_grid(W)
    grid = T.compute_scene_lighting(grid, co, MESH, sp.lights, 8192,
                                    params=PARAMS, world=W)
    lc = np.asarray(grid.lc_r)
    assert lc.max() > 0.0
    z = 9
    near = lc[z - 1:z + 2, 14:19, 14:19].mean()
    far = lc[z - 1:z + 2, 26:31, 26:31].mean()
    assert near > 2.0 * far, (near, far)


def test_landscape_color_map_shape():
    mesh = jnp.asarray(np.random.default_rng(0).uniform(-2, 1, (32, 32)),
                       jnp.float32)
    lc = T.landscape_color_map(mesh, W)
    assert lc.shape == (32, 32, 3)
    v = np.asarray(lc)
    assert (v >= 0).all() and (v <= 1.0).all()


def test_building_indir_room_occlusion():
    """Building-local indirect lighting (round-2 verdict weak 6): rays
    trace against the building's OWN wall segments into a building-local
    volume — the lit room is bright, a walled-off room stays dark except
    for leakage through the doorway (building_lighting.cpp:837-1110
    per-room-light batches into the building-local lmap)."""
    from w3d.city import floorplan as CF
    from w3d.lighting import building_indir as BI

    bbox = (0.0, 0.0, 0.0, 1.0, 0.6, 0.12)
    i = CF.gen_interior(bbox, 1, 0.12, seed=3)
    assert len(i.rooms) >= 2 and len(i.walls) >= 1

    # one light centered in room 0 only
    r0 = i.rooms[0]
    i.lights = [(0.5 * (r0.x1 + r0.x2), 0.5 * (r0.y1 + r0.y2),
                 i.z1 + 0.9 * i.floor_height, 0)]
    mgr = BI.BuildingIndirManager.for_building(i, bbox, res=32,
                                               rays_per_light=4096)
    assert mgr.pending == 1
    mgr.process_all(seed=1)
    grid = mgr.composite()
    lum = np.asarray(grid.lc_r) + np.asarray(grid.lc_g) \
        + np.asarray(grid.lc_b)                       # [nz, ny, nx]
    assert np.isfinite(lum).all() and lum.max() > 0

    lw, off = mgr.world, mgr.offset

    def cell_lum(x, y):
        gx = int(np.clip((x - off[0]) * lw.dx_inv + lw.mesh_x // 2,
                         0, lw.mesh_x - 1))
        gy = int(np.clip((y - off[1]) * lw.dy_inv + lw.mesh_y // 2,
                         0, lw.mesh_y - 1))
        return lum[:, gy, gx].sum()

    lit = cell_lum(0.5 * (r0.x1 + r0.x2), 0.5 * (r0.y1 + r0.y2))
    # the farthest room center on the same floor
    far = max(i.rooms[1:], key=lambda r: abs(0.5 * (r.x1 + r.x2)
                                             - 0.5 * (r0.x1 + r0.x2)))
    dark = cell_lum(0.5 * (far.x1 + far.x2), 0.5 * (far.y1 + far.y2))
    assert lit > 4.0 * max(dark, 1e-9), (lit, dark)


# ---------------------------------------------------------------------------
# dense directional-sweep sky lighting (lighting/sweep.py)
# ---------------------------------------------------------------------------

def _sweep_scene():
    sp = SC.SceneParse()
    lay = SC.CobjLayer(elasticity=0.5, color=(0.8, 0.3, 0.2, 1.0))
    sp.cobjs.append(SC.RawCobj(COLL_CUBE, (-4, -4, -3.95), (4, 4, -3.3),
                               layer=lay))
    sp.cobjs.append(SC.RawCobj(SC.COLL_SPHERE, (0.0, 0.0, -2.0), r1=0.8,
                               layer=lay))
    return SC.pack_cobjs(sp)


def test_sweep_empty_scene_is_sky():
    """With nothing in the scene, every cell sees the full sky: weight 1
    and exactly the sky color after normalization."""
    from w3d.lighting import sweep as SW
    grid = L.make_light_grid(W, nz=16)
    co = SC.pack_cobjs(SC.SceneParse())
    grid = SW.compute_sky_lighting_sweep(grid, co, None, ndirs=8,
                                         world=W, bounce=False)
    sv = np.asarray(grid.sv)
    assert float(np.abs(sv - 1.0).max()) < 1e-4
    grid = L.normalize_sky(grid)
    assert float(np.abs(np.asarray(grid.sc_b) - 1.0).max()) < 1e-3


def test_sweep_floor_and_sphere_shadowing():
    """Direct visibility: cells below the floor see nothing; the column
    under the sphere is darker than open air beside it."""
    from w3d.lighting import sweep as SW
    grid = L.make_light_grid(W, nz=16)
    grid = SW.compute_sky_lighting_sweep(grid, _sweep_scene(), None,
                                         ndirs=16, world=W, bounce=False)
    sv = np.asarray(grid.sv)
    nz, ny, nx = sv.shape
    # grid z0=-4, dz=0.5: floor slab covers layers 0-1 (centers -3.75,
    # -3.25); sphere at z=-2 covers layers 3-4; under-sphere air is
    # layer 2 at the center
    assert sv[0].max() < 0.05                       # inside the floor
    assert sv[nz - 1].min() > 0.9                   # top layer: open sky
    cy, cx = ny // 2, nx // 2
    under = sv[2, cy, cx]
    beside = sv[2, cy, cx + nx // 4]
    assert under < 0.6 * beside, (under, beside)


def test_sweep_tracks_mc_tracer():
    """The sweep's direct term reproduces the MC tracer's lateral shadow
    patterns.  The two estimate the same visibility integral but with
    different z-density profiles (the MC deposit spreads S samples per
    segment, so per-cell weight scales with 1/segment-length), so the
    comparable signal is each layer's normalized lateral pattern — the
    sphere's shadow column — not the raw volume."""
    from w3d.lighting import sweep as SW
    co = _sweep_scene()
    g1 = L.make_light_grid(W, nz=16)
    g1 = SW.compute_sky_lighting_sweep(g1, co, None, ndirs=16, world=W,
                                       bounce=False)
    g2 = L.make_light_grid(W, nz=16)
    g2 = T.compute_sky_lighting(g2, co, MESH * 0 - 100.0, 65536,
                                params=T.TraceParams(max_bounces=1),
                                world=W, batch=65536)
    a = np.asarray(g1.sv)
    b = np.asarray(g2.sv)

    def blur(p):                        # 3x3 box: cuts MC shot noise
        q = p
        for ax in (0, 1):
            q = (np.roll(q, 1, ax) + q + np.roll(q, -1, ax)) / 3.0
        return q

    corrs = []
    q = a.shape[1] // 4                 # interior crop: the sweep's
    # periodic shear and the MC's open-boundary ray escape differ at
    # the scene edge by construction
    for z in (2, 3):                    # the under-sphere shadow band
        al = blur(a[z])[q:-q, q:-q].ravel()
        bl = blur(b[z])[q:-q, q:-q].ravel()
        al = al - al.mean()
        bl = bl - bl.mean()
        corrs.append(float((al * bl).sum()
                     / np.sqrt((al * al).sum() * (bl * bl).sum() + 1e-12)))
    assert min(corrs) > 0.5, corrs
    # and the shadow depth agrees: center-of-shadow visibility is far
    # below the layer's open-air level in both fields
    cy = cx = a.shape[1] // 2
    for f in (a, b):
        lvl = np.median(f[2])
        assert f[2, cy, cx] < 0.35 * (lvl + 1e-9), (f[2, cy, cx], lvl)


def test_sweep_bounce_tints_shadowed_air():
    """One diffuse bounce: air next to the red sphere picks up red-tinted
    indirect light that the no-bounce solve lacks."""
    from w3d.lighting import sweep as SW
    co = _sweep_scene()
    g0 = L.make_light_grid(W, nz=16)
    g0 = SW.compute_sky_lighting_sweep(g0, co, None, ndirs=8, world=W,
                                       bounce=False)
    g1 = L.make_light_grid(W, nz=16)
    g1 = SW.compute_sky_lighting_sweep(g1, co, None, ndirs=8, world=W,
                                       bounce=True)
    extra_r = float((np.asarray(g1.sc_r) - np.asarray(g0.sc_r)).sum())
    extra_b = float((np.asarray(g1.sc_b) - np.asarray(g0.sc_b)).sum())
    assert extra_r > 0.0
    assert extra_r > 1.5 * extra_b      # red albedo dominates the bounce


def test_global_sweep_sun_shadow():
    """Global (sun) sweep: one exact directional transmittance replaces
    the reference's 1M-ray budget.  A tilted sun displaces the sphere's
    shadow column; cells under the floor see nothing."""
    from w3d.lighting import sweep as SW
    grid = L.make_light_grid(W, nz=16)
    grid = SW.compute_global_lighting_sweep(
        grid, _sweep_scene(), None, sun_dir=(0.4, 0.0, -1.0),
        world=W, bounce=False)
    gv = np.asarray(grid.gv)
    nz, ny, nx = gv.shape
    assert gv[0].max() < 0.05                   # inside the floor slab
    assert gv[nz - 1].min() > 0.9
    cy, cx = ny // 2, nx // 2
    # sun tilts toward +x looking down: the shadow at layer 2 lands at
    # x < center (displaced opposite the sun's horizontal direction)
    row = gv[2, cy]
    sh = int(np.argmin(row))
    assert sh < cx, (sh, cx)
    assert row[sh] < 0.3 * np.median(row)
    # bounce adds indirect light into the shadow
    g2 = L.make_light_grid(W, nz=16)
    g2 = SW.compute_global_lighting_sweep(
        g2, _sweep_scene(), None, sun_dir=(0.4, 0.0, -1.0),
        world=W, bounce=True)
    assert float(np.asarray(g2.gv)[2, cy, sh]) > float(gv[2, cy, sh])


@pytest.mark.slow
def test_compact_tracer_unbiased():
    """Russian-roulette population control (TraceParams.compact) keeps
    the deposited volume statistically equal to the full-population
    tracer: same total sky energy within MC tolerance, and bounce-0
    (deterministic, pre-compaction) deposits land in the same cells."""
    co = floor_scene()
    grid1 = L.make_light_grid(W)
    grid2 = L.make_light_grid(W)
    g_full = T.compute_sky_lighting(grid1, co, MESH, 16384, seed=3,
                                    params=T.TraceParams(max_bounces=4))
    g_comp = T.compute_sky_lighting(grid2, co, MESH, 16384, seed=3,
                                    params=T.TraceParams(max_bounces=4,
                                                          compact=True))
    e_full = float(jnp.sum(g_full.sv))
    e_comp = float(jnp.sum(g_comp.sv))
    assert e_full > 0
    # same estimator in expectation; 16K rays -> a few percent MC noise
    assert abs(e_comp - e_full) / e_full < 0.15, (e_full, e_comp)
    # color energy tracks too
    c_full = float(jnp.sum(g_full.sc_r + g_full.sc_g + g_full.sc_b))
    c_comp = float(jnp.sum(g_comp.sc_r + g_comp.sc_g + g_comp.sc_b))
    assert abs(c_comp - c_full) / max(c_full, 1e-9) < 0.15


def test_auto_transmission_gate_bitwise():
    """With no semi-transparent cobjs the transmission branch deposits
    exact zeros, so the auto-gate must be bitwise invisible."""
    co = floor_scene()           # all alpha == 1
    assert not bool((np.asarray(co.alpha) < 1.0).any())
    g1 = T.compute_sky_lighting(L.make_light_grid(W), co, MESH, 4096,
                                seed=5, params=T.TraceParams(
                                    max_bounces=3, samples_per_segment=6,
                                    transmission=True))
    g2 = T.compute_sky_lighting(L.make_light_grid(W), co, MESH, 4096,
                                seed=5, params=T.TraceParams(
                                    max_bounces=3, samples_per_segment=6,
                                    transmission=False))
    np.testing.assert_array_equal(np.asarray(g1.sv), np.asarray(g2.sv))
    np.testing.assert_array_equal(np.asarray(g1.sc_r), np.asarray(g2.sc_r))


@pytest.mark.slow
def test_indir_incremental_slices_match_single_shot():
    """Sliced background bakes (slice_rays) accumulate to the same
    expected volume as one full bake: the mean deposited energy per
    light matches within MC tolerance, and partial progress is visible
    between slices (incremental background merge,
    building_lighting.cpp:1040)."""
    from w3d.lighting import building_indir as BI
    from w3d.city import floorplan as CF
    interior = CF.gen_interior((0.0, 0.0, 0.0, 1.0, 0.8, 0.3), 3, 0.1,
                               seed=3)
    bbox = (0.0, 0.0, 0.0, 1.0, 0.8, 0.3)
    full = BI.BuildingIndirManager.for_building(interior, bbox, res=16,
                                                rays_per_light=2048)
    # keep only one light for a clean comparison
    keep = min(full.lights)
    for ix in [i for i in full.lights if i != keep]:
        full.lights.pop(ix)
    full.queue.clear()
    full.enqueue(keep)
    full.remaining[keep] = full.rays_per_light
    full.process_all(seed=1)
    e_full = float(jnp.sum(full.volumes[keep].lc_r))

    sliced = BI.BuildingIndirManager.for_building(interior, bbox, res=16,
                                                  rays_per_light=2048)
    sliced.slice_rays = 512
    for ix in [i for i in sliced.lights if i != keep]:
        sliced.lights.pop(ix)
    sliced.queue.clear()
    sliced.enqueue(keep)
    sliced.remaining[keep] = sliced.rays_per_light
    n1 = sliced.process_one(sliced.cobjs, sliced.mesh, seed=1)
    assert n1 == keep
    e_part = float(jnp.sum(sliced.volumes[keep].lc_r))
    assert sliced.pending == 1          # re-enqueued with budget left
    sliced.process_all(seed=1)
    e_sliced = float(jnp.sum(sliced.volumes[keep].lc_r))
    assert e_full > 0
    assert 0 < e_part < 0.6 * e_sliced         # partial progress visible
    assert abs(e_sliced - e_full) / e_full < 0.25, (e_sliced, e_full)


def test_indir_prioritize_fronts_queue():
    from w3d.lighting import building_indir as BI
    mgr = BI.BuildingIndirManager()
    for i in range(4):
        mgr.register_light(i, (0.0, 0.0, float(i)), (1, 1, 1))
    mgr.prioritize(3)
    assert mgr.queue[0] == 3


def test_sorted_deposit_matches_plain():
    """sorted_deposit co-sorts samples by cell and scatters with the
    sorted-indices fast path — same per-cell sums as the plain scatter
    (only the float add ORDER within a cell may differ)."""
    key = jax.random.PRNGKey(3)
    grid0 = L.make_light_grid(W)
    n_cells = int(np.prod(grid0.shape))
    n = 4096
    ks = jax.random.split(key, 6)
    idx = jax.random.randint(ks[0], (n,), 0, n_cells + 7, jnp.int32)
    ok = idx < n_cells
    r, g, b, w = (jax.random.uniform(k, (n,)) for k in ks[1:5])
    for ltype in (L.LIGHTING_SKY, L.LIGHTING_GLOBAL, L.LIGHTING_LOCAL):
        ga = L.accumulate(grid0, ltype, idx, ok, r, g, b, w)
        gb = L.accumulate(grid0, ltype, idx, ok, r, g, b, w,
                          sorted_deposit=True)
        for fa, fb in zip(ga[:-2], gb[:-2]):     # skip z0/dz scalars
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                       rtol=2e-5, atol=1e-6)


def test_sorted_deposit_tracer_end_to_end():
    """The full tracer with sorted_deposit on agrees with the default
    path (identical RNG streams; only scatter order differs)."""
    cobjs = floor_scene()
    grid0 = L.make_light_grid(W)
    pa = PARAMS
    pb = pa._replace(sorted_deposit=True)
    ga = T.compute_sky_lighting(grid0, cobjs, MESH, 8192, params=pa,
                                world=W, batch=8192)
    gb = T.compute_sky_lighting(grid0, cobjs, MESH, 8192, params=pb,
                                world=W, batch=8192)
    np.testing.assert_allclose(np.asarray(ga.sv), np.asarray(gb.sv),
                               rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga.sc_r), np.asarray(gb.sc_r),
                               rtol=3e-5, atol=1e-6)
