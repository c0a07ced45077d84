"""Golden regression tests: bitwise stability of deterministic outputs.

SURVEY §4: the reference verifies via deterministic scene configs +
seeded RNG.  These tests pin exact values/checksums of seeded generation
so refactors can't silently change the produced worlds.  (The LCG values
are reference-faithful by construction — the Derenzo generator with the
reference's seeding — so those constants double as cross-implementation
anchors.)
"""
import hashlib

import pytest
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.utils.rng import RandGen
from w3d.ops import noise as N
from w3d.terrain.mesh import gen_terrain, TerrainConfig
from w3d.utils.constants import WorldConst


def _digest(arr) -> str:
    return hashlib.sha256(np.ascontiguousarray(np.asarray(arr)).tobytes()).hexdigest()[:16]


def test_lcg_reference_values():
    """First draws of the Derenzo LCG from known seeds (exact integers —
    any deviation breaks reference-compatible content)."""
    g = RandGen(1, 1)
    # hand-verifiable: step 1 = 40014 - 40692 + 2147483562 = 2147482884
    assert [g.rand() for _ in range(5)] == [
        2147482884, 2092764894, 1390461064, 715295839, 79337801]
    g2 = RandGen(11, 121)
    first = [g2.rand() for _ in range(3)]
    g3 = RandGen(11, 121)
    assert [g3.rand() for _ in range(3)] == first


def test_sine_table_pinned():
    """Pinned magnitudes + independently-evaluated table sums (golden
    arrays, not run1==run2 hashing): these fail if the draw order or the
    sine-sum semantics drift even while staying deterministic."""
    t = N.gen_sine_table(WorldConst(), mesh_seed=7)
    mag = np.asarray(t.mag)
    # exact first magnitudes (pinned 2026-08, derived from the LCG draw
    # order of mesh_gen.cpp:gen_sine_table)
    np.testing.assert_allclose(
        mag[:4], [0.00650374, 0.00642388, 0.00451547, 0.00405423],
        atol=1e-7)
    # exact first magnitude value from the LCG chain itself
    g = RandGen(7, 12345)
    expect0 = g.rand_uniform(0.2, 1.0) * 0.02 * (0.4 / np.sqrt(1.0))
    assert abs(float(mag[0]) - expect0) < 1e-6
    # independent NumPy evaluation of the table at sample points, pinned
    fx = np.asarray(t.freq_x)
    fy = np.asarray(t.freq_y)
    px = np.asarray(t.phase_x)
    py = np.asarray(t.phase_y)

    def eval_pt(x, y):
        return float(np.sum(mag * np.sin(fx * x + px) * np.sin(fy * y + py)))

    np.testing.assert_allclose(
        [eval_pt(0.0, 0.0), eval_pt(3.7, -2.1), eval_pt(10.5, 8.25)],
        [-0.2161367, -0.1365623, 0.2370257], atol=2e-6)


def test_erosion_oracle_pinned():
    """erode_reference (the line-faithful erosion.cpp transcription) on a
    fixed field produces these exact values (pinned 2026-08).  Any drift
    in the oracle — the anchor the production batched path is validated
    against — fails here."""
    from w3d.ops import erosion as E
    rng = np.random.default_rng(3)
    z = rng.uniform(-0.5, 0.5, (24, 24)).astype(np.float32)
    p = E.ErosionParams(erode_amount=1.0, water_plane_z=-0.4, half_dxy=0.05,
                        zmin=-0.6, zmax=0.6, rock_thresh=0.3,
                        relh_adj_tex=0.0)
    z2 = E.erode_reference(z.copy(), 400, p, min_zval=float(z.min()))
    assert not np.allclose(z2, z)              # erosion actually ran
    np.testing.assert_allclose(float(np.sum(z2)), -1.50359, atol=2e-4)
    np.testing.assert_allclose(
        [z2[0, 0], z2[5, 7], z2[12, 12], z2[20, 3]],
        [-0.425608, -0.165442, 0.047745, -0.236783], atol=1e-5)


def test_physics_oracle_trajectory_pinned():
    """The scalar advance_object transcription's ballistic trajectory is
    pinned (2026-08), and the batched production step must match it
    pre-contact — semantics drift in either path fails."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import oracle_physics as OP
    from w3d.physics import types as PT, step as PS

    W = WorldConst()
    table = PT.make_type_table()
    ball = PT.type_id("BALL")
    mesh = np.full((W.mesh_y, W.mesh_x), -1.0, np.float32)
    env_np = OP.OracleEnv(wind=np.array([0.3, -0.2, 0.0], np.float32),
                          water_plane_z=-100.0, zmin=-W.z_scene)
    o = OP.OracleObj(pos=np.array([0.25, -0.4, 1.2], np.float32),
                     vel=np.array([0.5, 0.2, 0.0], np.float32))
    tp = OP.TypeParams.from_table(table, ball)
    got = []
    for f in range(30):
        OP.advance_object(o, env_np, tp, mesh, W)
        if f % 10 == 9:
            got.append(list(o.pos))
    pinned = [[0.285, -0.386, 0.95745],
              [0.32, -0.372, 0.2739],
              [0.355, -0.358, -0.85065]]
    np.testing.assert_allclose(got, pinned, atol=1e-5)
    assert o.status == 1    # still airborne (pre-contact regime)

    # the batched step agrees with the pinned trajectory
    env = PS.PhysicsEnv(mesh_height=jnp.asarray(mesh),
                        water_plane_z=jnp.float32(-100.0),
                        wind=jnp.asarray([0.3, -0.2, 0.0], jnp.float32),
                        temperature=jnp.float32(20.0),
                        base_gravity=jnp.float32(1.0),
                        zmin=jnp.float32(-W.z_scene))
    st = PS.make_state(np.array([[0.25, -0.4, 1.2]], np.float32),
                       np.array([[0.5, 0.2, 0.0]], np.float32),
                       np.array([ball]), table)
    for f in range(30):
        st = PS.step_objects(st, env, None, table, substeps=1, world=W,
                             obj_collisions=False)
    np.testing.assert_allclose(
        [float(st.px[0]), float(st.py[0]), float(st.pz[0])],
        pinned[-1], atol=5e-4)


@pytest.mark.slow
def test_terrain_jit_bitwise_stable():
    cfg = TerrainConfig(mesh_seed=42, erosion_iters=100)
    w = WorldConst(mesh_x=64, mesh_y=64)
    h1 = np.asarray(gen_terrain(cfg, w).mesh_height)
    h2 = np.asarray(gen_terrain(cfg, w).mesh_height)
    assert _digest(h1) == _digest(h2)  # bitwise stable under jit re-execution


def test_voxel_grid_stable():
    from w3d.voxel import grid as VG
    p = VG.VoxelParams(xsize=24, ysize=24, zsize=12, remove_unconnected=1,
                       atten_at_edges=VG.ATTEN_EDGES)
    a = VG.make_voxel_grid(p, WorldConst())
    b = VG.make_voxel_grid(p, WorldConst())
    assert _digest(a.values) == _digest(b.values)


def test_universe_cell_content_pinned():
    from w3d.universe import gen as UG
    c1 = UG.gen_cell((3, -2, 5))
    c2 = UG.gen_cell((3, -2, 5))
    sig1 = [(len(g.systems), round(g.radius, 6)) for g in c1.galaxies]
    sig2 = [(len(g.systems), round(g.radius, 6)) for g in c2.galaxies]
    assert sig1 == sig2
    # seeds derive from position: both seed fns give positive ints
    assert UG.gen_rand_seed1(c1.pos) > 0 and UG.gen_rand_seed2(c1.pos) > 0


def test_3ds_roundtrip(tmp_path):
    from w3d.scene.read_3ds import load_3ds, write_3ds
    from w3d.scene.model3d import Model3d
    rng = np.random.default_rng(0)
    m = Model3d(
        positions=rng.normal(0, 1, (40, 3)).astype(np.float32),
        normals=np.zeros((0, 3), np.float32),
        uvs=np.zeros((0, 2), np.float32),
        faces=rng.integers(0, 40, (30, 3)).astype(np.int32),
        face_normals=-np.ones((30, 3), np.int32),
        face_uvs=-np.ones((30, 3), np.int32),
    )
    p = str(tmp_path / "m.3ds")
    write_3ds(p, m)
    back = load_3ds(p)
    np.testing.assert_allclose(back.positions, m.positions, atol=1e-6)
    np.testing.assert_array_equal(back.faces, m.faces)
