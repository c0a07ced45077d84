"""Voxel engine tests: 3D noise, grid pipeline, marching tets, brushes."""
import numpy as np
import pytest
import jax.numpy as jnp

import w3d
from w3d.ops import noise as N
from w3d.voxel import grid as VG, mc as MC, edit as VE
from w3d.utils.constants import WorldConst

W = WorldConst()


def test_sine3d_separable_matches_direct():
    t = N.gen_sine_table_3d(1.0, 1.0, 5, 7)
    grid = np.asarray(N.eval_sine3d_grid(t, (0.1, 0.2, 0.3), (0.5, 0.4, 0.3), 4, 5, 6))
    mag, fx, px, fy, py, fz, pz = (np.asarray(a) for a in t)
    for z in range(6):
        for y in range(5):
            for x in range(4):
                xv = 0.1 + 0.5 * x
                yv = 0.2 + 0.4 * y
                zv = 0.3 + 0.3 * z
                direct = np.sum(mag * np.sin(fx * xv + px) * np.sin(fy * yv + py)
                                * np.sin(fz * zv + pz))
                assert abs(grid[z, y, x] - direct) < 1e-3


def test_sine3d_table_reference_draw_order():
    """5 bins x 12 sines, mag halves and freq /0.4 per bin (upsurface.cpp:16)."""
    t = N.gen_sine_table_3d(2.0, 1.0, 3, 3)
    mag = np.asarray(t.mag)
    assert mag.shape == (60,)
    # bin mags: in [0.2,1]*2*(0.5^bin)
    for b in range(5):
        mb = mag[b * 12:(b + 1) * 12]
        hi = 2.0 * 0.5 ** b
        assert (mb <= hi + 1e-6).all() and (mb >= 0.2 * hi - 1e-6).all()


def test_simplex3d_stats():
    k = 32
    xs = jnp.linspace(0.0, 17.0, k)
    xv, yv, zv = jnp.meshgrid(xs, xs, xs)
    v = np.asarray(N.simplex3d(xv, yv, zv))
    assert np.isfinite(v).all()
    assert abs(v.mean()) < 0.1
    assert 0.05 < v.std() < 1.0
    assert v.min() >= -1.5 and v.max() <= 1.5


def test_voxel_grid_deterministic():
    p = VG.VoxelParams(xsize=16, ysize=16, zsize=8, remove_unconnected=0)
    a = np.asarray(VG.make_voxel_grid(p, W).values)
    b = np.asarray(VG.make_voxel_grid(p, W).values)
    np.testing.assert_array_equal(a, b)
    p2 = p._replace(geom_rseed=999)
    c = np.asarray(VG.make_voxel_grid(p2, W).values)
    assert not np.allclose(a, c)


def test_z_gradient():
    p = VG.VoxelParams(xsize=8, ysize=8, zsize=16, mag=1e-6, z_gradient=2.0,
                       normalize_to_1=False, remove_unconnected=0)
    v = np.asarray(VG.make_voxel_grid(p, W).values)
    col = v[:, 4, 4]
    assert (np.diff(col) > 0).all()  # monotonically increasing with z


def test_edge_attenuation_opens_borders():
    p = VG.VoxelParams(xsize=24, ysize=24, zsize=16, mag=2.0,
                       atten_at_edges=VG.ATTEN_EDGES, atten_thresh=2.0,
                       normalize_to_1=False, remove_unconnected=0)
    v = np.asarray(VG.make_voxel_grid(p, W).values)
    # border columns should be pushed toward air (values raised)
    p0 = p._replace(atten_at_edges=VG.ATTEN_NONE)
    v0 = np.asarray(VG.make_voxel_grid(p0, W).values)
    assert v[:, 0, :].mean() > v0[:, 0, :].mean()
    assert v[-1].mean() > v0[-1].mean()  # top attenuated
    # note: the reference formula (voxels.cpp:405-421) attenuates the bottom
    # face too despite the "5 edges" comment; we match the formula
    assert v[0].mean() > v0[0].mean()
    # center is untouched (v = 0.25 - vx*vy*vz <= 0 there)
    assert np.allclose(v[8, 12, 12], v0[8, 12, 12])


def test_classify_outside_simple_box():
    # a solid box in the middle of air
    v = np.ones((12, 12, 12), np.float32)      # air (>= iso)
    v[4:8, 4:8, 4:8] = -1.0                    # solid
    out = np.asarray(VG.classify_outside(jnp.asarray(v), 0.0))
    assert out[0, 0, 0]
    assert not out[5, 5, 5]
    assert out.sum() == 12 ** 3 - 4 ** 3


def test_classify_outside_enclosed_cavity():
    v = np.ones((12, 12, 12), np.float32)
    v[2:10, 2:10, 2:10] = -1.0                 # solid shell
    v[5:7, 5:7, 5:7] = 1.0                     # air cavity inside
    out = np.asarray(VG.classify_outside(jnp.asarray(v), 0.0))
    assert not out[5, 5, 5]                    # cavity is NOT outside


def test_remove_unconnected():
    v = np.ones((12, 12, 12), np.float32)
    v[0:4, 4:8, 4:8] = -1.0                    # grounded column
    v[8:10, 2:4, 2:4] = -1.0                   # floating blob
    out = np.asarray(VG.remove_unconnected(jnp.asarray(v), 0.0))
    assert (out[0:4, 4:8, 4:8] < 0).all()      # grounded stays
    assert (out[8:10, 2:4, 2:4] > 0).all()     # floater removed


def _sphere_field(n=20, r=0.6):
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    zv, yv, xv = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.sqrt(xv * xv + yv * yv + zv * zv) - r  # <0 inside


def test_marching_tets_sphere():
    f = _sphere_field()
    vsz = (2.0 / 19,) * 3
    vx, vy, vz, valid = MC.marching_tets(jnp.asarray(f), 0.0, (-1.0, -1.0, -1.0), vsz)
    tris = MC.compact_triangles(vx, vy, vz, valid)
    assert len(tris) > 500
    # every vertex lies near the sphere surface
    d = np.abs(np.linalg.norm(tris.reshape(-1, 3), axis=1) - 0.6)
    assert d.max() < 0.06, d.max()
    # watertight: every undirected edge is shared by exactly 2 triangles
    q = np.round(tris / 1e-5).astype(np.int64)
    edges = {}
    for t in q:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            key = (tuple(t[a]), tuple(t[b]))
            key = tuple(sorted(key))
            edges[key] = edges.get(key, 0) + 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).mean() > 0.99, (counts != 2).sum()


def test_brush_adds_and_journal_roundtrip(tmp_path):
    p = VG.VoxelParams(xsize=16, ysize=16, zsize=8, remove_unconnected=0)
    vg = VG.make_voxel_grid(p, W)
    j = VE.BrushJournal()
    j.add(VE.Brush((0.0, 0.0, 0.0), 1.0, 0.5, VE.VB_SHAPE_LINEAR))
    j.add(VE.Brush((1.0, 1.0, 0.0), 0.5, -0.3, VE.VB_SHAPE_QUADRATIC))
    v1 = np.asarray(j.replay(vg.values, vg.lo_pos, vg.vsz))
    path = str(tmp_path / "brushes.npy")
    j.save(path)
    j2 = VE.BrushJournal.load(path)
    v2 = np.asarray(j2.replay(vg.values, vg.lo_pos, vg.vsz))
    np.testing.assert_array_equal(v1, v2)
    # positive weight adds material (lowers density) at the brush center
    c = np.asarray(vg.values)[4, 8, 8]
    assert v1[4, 8, 8] < c + 1e-6


def test_brush_shapes_differ():
    v = jnp.zeros((8, 16, 16))
    lo, vsz = (-1.0, -1.0, -0.5), (0.125, 0.125, 0.125)
    outs = []
    for shape in (VE.VB_SHAPE_CUBE, VE.VB_SHAPE_CONSTANT, VE.VB_SHAPE_LINEAR,
                  VE.VB_SHAPE_QUADRATIC):
        outs.append(np.asarray(VE.apply_brush(v, lo, vsz, (0., 0., 0.), 0.4, 1.0, shape)))
    for i in range(len(outs)):
        for k in range(i + 1, len(outs)):
            assert not np.allclose(outs[i], outs[k])


def test_voxel_collision_paths():
    """Per-block voxel cobjs with dirty rebuilds + direct field sphere
    collision (voxels.cpp update_voxel_sphere_region block mapping)."""
    import numpy as np
    import jax.numpy as jnp
    from w3d.voxel import grid as VG, collide as VC

    nz, ny, nx = 24, 33, 33
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing='ij')
    field = (np.sqrt((xx - 16) ** 2 + (yy - 16) ** 2 + (zz - 12) ** 2)
             - 8.0).astype(np.float32)

    hit, pen, gx, gy, gz = VC.sphere_vs_field(
        jnp.asarray(field), (0., 0., 0.), 1.0, 0.0,
        jnp.asarray([16.0, 2.0]), jnp.asarray([16.0, 2.0]),
        jnp.asarray([12.0, 2.0]), jnp.asarray([0.5, 0.5]))
    assert bool(hit[0]) and not bool(hit[1])   # center solid, corner air
    assert float(pen[0]) > 5.0                 # deep inside the ball

    vc = VC.VoxelCollider(params=VG.VoxelParams(isolevel=0.0), block=8)
    vc.rebuild(field)
    n0 = vc.num_tris
    assert n0 > 1000
    empty_block = vc.tris[(0, 0)]
    assert len(empty_block) == 0               # corner block is all air
    field2 = field.copy()
    field2[:, 14:19, 14:19] += 5.0             # carve material out
    dirty = vc.dirty_blocks_for_edit(16.0, 16.0, 3.0)
    assert 0 < len(dirty) < len(vc.tris)       # only center blocks
    vc.rebuild(field2, dirty)
    assert vc.num_tris != n0                   # surface actually changed
    assert len(vc.to_cobjs().cobjs) == vc.num_tris


# ---------------------------------------------------------------------------
# falling / unsupported chunks (voxels.cpp:606-716)
# ---------------------------------------------------------------------------

def _tower_scene(nz=16, ny=8, nx=8):
    """Ground layer + pillar + a floating island above a gap."""
    v = jnp.ones((nz, ny, nx), jnp.float32)     # 1.0 = air (iso 0)
    v = v.at[0].set(-1.0)                       # ground layer solid
    v = v.at[0:4, 2, 2].set(-1.0)               # pillar, anchored
    v = v.at[8:10, 5:7, 5:7].set(-1.0)          # floating island (gap 1..7)
    return v


def test_falling_mask_finds_island():
    from w3d.voxel.edit import falling_mask
    v = _tower_scene()
    f = np.asarray(falling_mask(v, 0.0))
    assert f[8:10, 5:7, 5:7].all()          # island is unanchored
    assert not f[0].any()                   # ground anchored
    assert not f[0:4, 2, 2].any()           # pillar anchored


def test_island_falls_and_lands():
    from w3d.voxel.edit import settle_unanchored, falling_mask
    v = _tower_scene()
    v2, steps = settle_unanchored(v, 0.0)
    v2 = np.asarray(v2)
    assert int(steps) == 7                  # fell from z=8 to rest at z=1
    assert (v2[1:3, 5:7, 5:7] < 0).all()    # landed on the ground layer
    assert (v2[8:10, 5:7, 5:7] > 0).all()   # vacated origin
    assert not np.asarray(falling_mask(jnp.asarray(v2), 0.0)).any()
    # mass conserved: same number of solid cells
    assert (v2 < 0).sum() == (np.asarray(_tower_scene()) < 0).sum()


def test_carved_free_chunk_falls():
    """Carving the support out from a structure spawns a falling chunk
    (the voxels.cpp:2112 update path after a brush edit)."""
    from w3d.voxel.edit import falling_mask, drop_unanchored_step
    nz, ny, nx = 12, 6, 6
    v = jnp.ones((nz, ny, nx), jnp.float32)
    v = v.at[0].set(-1.0)
    v = v.at[0:8, 3, 3].set(-1.0)           # solid column
    assert not np.asarray(falling_mask(v, 0.0)).any()
    v = v.at[3:5, 3, 3].set(1.0)            # carve out the middle
    f = np.asarray(falling_mask(v, 0.0))
    assert f[5:8, 3, 3].all()               # top segment detached
    assert not f[0:3, 3, 3].any()
    v2, fell = drop_unanchored_step(v, 0.0)
    assert bool(fell)
    v2 = np.asarray(v2)
    assert (v2[4:7, 3, 3] < 0).all() and v2[7, 3, 3] > 0


def test_diagonal_contact_is_not_support():
    """Reference flood is 6-connected (FLOOD_FILL_INNER axis steps):
    diagonal-only contact does not anchor."""
    from w3d.voxel.edit import falling_mask
    v = jnp.ones((8, 6, 6), jnp.float32)
    v = v.at[0].set(-1.0)
    v = v.at[1, 2, 2].set(-1.0)             # grounded block
    v = v.at[2, 3, 3].set(-1.0)             # touches only diagonally
    f = np.asarray(falling_mask(v, 0.0))
    assert not f[1, 2, 2]
    assert f[2, 3, 3]


@pytest.mark.slow
def test_marching_tets_lod_levels():
    """LOD tri lists (voxels.h:188): strided extraction gives coarser,
    cheaper isosurfaces of the same field that still bound the solid."""
    from w3d.voxel.mc import marching_tets_lod, lod_triangle_counts
    n = 17
    zz, yy, xx = np.meshgrid(*(np.arange(n, dtype=np.float32),) * 3,
                             indexing="ij")
    # sphere of radius 5 at the center: field < 0 inside
    v = jnp.asarray(np.sqrt((xx - 8) ** 2 + (yy - 8) ** 2
                            + (zz - 8) ** 2) - 5.0)
    lods = marching_tets_lod(v, 0.0, levels=3)
    assert len(lods) == 3
    counts = lod_triangle_counts(lods)
    assert counts[0] > counts[1] > counts[2] > 0
    # every level's surface vertices stay near radius 5
    for (vx, vy, vz, valid) in lods:
        m = np.asarray(valid)
        r = np.sqrt((np.asarray(vx)[m] - 8) ** 2
                    + (np.asarray(vy)[m] - 8) ** 2
                    + (np.asarray(vz)[m] - 8) ** 2)
        assert abs(r.mean() - 5.0) < 0.6


@pytest.mark.slow
def test_voxel_landscape_scene_loads_and_steps():
    """config_voxels.txt (create_voxel_landscape): the voxel terrain
    generates from the `voxel` sub-config, its top surface fuses into
    the physics heightfield, and objects settle ON it."""
    import numpy as np
    from w3d.scene.loader import load_scene
    from w3d.models.world import ground_frame
    scene = load_scene("/root/reference/scene_config/config_voxels.txt",
                       num_objects=64)
    assert scene.voxel is not None
    nz, ny, nx = scene.voxel.shape
    assert (nx, ny, nz) == (512, 512, 64)      # shipped sub-config sizes
    # the fused heightfield rises above the base terrain somewhere
    hm = np.asarray(scene.terrain.mesh_height)
    assert np.isfinite(hm).all()
    for _ in range(12):
        scene = ground_frame(scene, substeps=2, obj_collisions=False)
    pz = np.asarray(scene.objects.pz)
    st = np.asarray(scene.objects.status)
    live = st > 0
    assert live.any()
    # nothing sinks below the voxel surface floor
    from w3d.physics.step import sample_mesh
    import jax.numpy as jnp
    h, _, _, _ = sample_mesh(scene.terrain.mesh_height,
                             jnp.asarray(scene.objects.px),
                             jnp.asarray(scene.objects.py), scene.world)
    rad = np.asarray(scene.table.radius)[np.asarray(scene.objects.otype)]
    assert (pz[live] >= np.asarray(h)[live] + 0.5 * rad[live] - 1e-3).all()
