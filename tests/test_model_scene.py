"""Reference-shipped model scene end-to-end (round-2 verdict item 10):
coll_objs_museum.txt through the DSL -> model loader -> cobjs ->
physics -> lighting.

The reference repo ships the museum SCENE but not the museum MODEL
(../models/museum/museumhallRD.model3d is absent from the tree); missing
models are nonfatal in the reference ("nonfatal errors if the models
can't be found", README; build_world.cpp skip).  So: (1) the shipped
scene parses fully with the model gracefully skipped; (2) the same
scene with a stand-in hall .obj in the reference's directory layout
loads the model into COLL_POLYGON cobjs that objects collide with and
the path tracer shades.
"""

import os
import shutil

import numpy as np
import pytest
import jax.numpy as jnp

import w3d  # noqa: F401
from w3d.scene import cobj as SC

REF_SCENE = "/root/reference/coll_objs/coll_objs_museum.txt"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_SCENE),
                                reason="reference scene absent")


def test_shipped_museum_scene_parses_model_missing():
    sp = SC.parse_coll_obj_file(REF_SCENE)
    assert len(sp.lights) >= 6            # the six marble-hall lights
    shapes = [c.shape for c in sp.cobjs]
    assert shapes.count(SC.COLL_CUBE) >= 2   # the stair-hole marble fills
    assert len(sp.models) == 1
    assert not sp.models[0].loaded        # model file absent -> nonfatal
    assert sp.models[0].filename.endswith("museumhallRD.model3d")


def _hall_obj(path):
    """Museum-hall stand-in: a closed 4x2x1 box (12 triangles), so the
    scene's swap/mirror transform chain always leaves horizontal
    surfaces to collide with."""
    verts = [(-2, -1, 0), (2, -1, 0), (2, 1, 0), (-2, 1, 0),
             (-2, -1, 1), (2, -1, 1), (2, 1, 1), (-2, 1, 1)]
    quads = [(1, 2, 3, 4), (5, 6, 7, 8), (1, 2, 6, 5),
             (2, 3, 7, 6), (3, 4, 8, 7), (4, 1, 5, 8)]
    faces = []
    for a, b, c, d in quads:
        faces += [(a, b, c), (a, c, d)]
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces:
            f.write(f"f {a} {b} {c}\n")


@pytest.fixture()
def museum_dir(tmp_path):
    """Reference directory layout with a stand-in model present."""
    (tmp_path / "coll_objs").mkdir()
    (tmp_path / "models" / "museum").mkdir(parents=True)
    _hall_obj(tmp_path / "models" / "museum" / "museumhallRD.obj")
    text = open(REF_SCENE).read().replace("museumhallRD.model3d",
                                          "museumhallRD.obj")
    scene = tmp_path / "coll_objs" / "coll_objs_museum.txt"
    scene.write_text(text)
    return str(scene)


def test_museum_model_loads_into_cobjs(museum_dir):
    sp = SC.parse_coll_obj_file(museum_dir)
    assert len(sp.models) == 1 and sp.models[0].loaded
    polys = [c for c in sp.cobjs if c.shape == SC.COLL_POLYGON]
    assert len(polys) >= 8                # the hall triangles landed
    # the 't 1.2 0.6 0.5' translate before 'O' moved the model
    zs = [p.pts[0][2] for p in polys]
    assert min(zs) >= 0.4                 # floor lifted by +0.5 tz


@pytest.mark.slow
def test_museum_scene_collides_and_traces(museum_dir):
    from w3d.physics import step as PS, types as PT
    from w3d.utils.constants import WorldConst
    from w3d.lighting import lmap as L, trace as T

    world = WorldConst()
    sp = SC.parse_coll_obj_file(museum_dir)
    cobjs = SC.pack_cobjs(sp)
    table = PT.make_type_table(z_scene=world.z_scene)

    # drop balls over the hall floor; the scene's transform chain
    # (t 1.2 0.6 0.5; s 1 2; M 0; m 0.05) shrinks the 4-unit hall to a
    # ~0.2-wide plate at (1.2, 0.6, ~0.45-0.5)
    n = 64
    rng = np.random.default_rng(0)
    pos = np.stack([rng.uniform(-0.04, 0.04, n) + 1.2,
                    rng.uniform(0.61, 0.64, n),
                    np.full(n, 0.62)], -1).astype(np.float32)
    st = PS.make_state(pos, np.zeros((n, 3), np.float32),
                       np.full(n, PT.type_id("BALL")), table)
    env = PS.PhysicsEnv(
        mesh_height=jnp.full((world.mesh_y, world.mesh_x), -10.0),
        water_plane_z=jnp.float32(-100.0),
        wind=jnp.zeros(3), temperature=jnp.float32(20.0),
        base_gravity=jnp.float32(1.0), zmin=jnp.float32(-4.0))
    for _ in range(40):
        st = PS.step_objects(st, env, cobjs, table, substeps=4,
                             world=world, obj_collisions=False)
    live = np.asarray(st.status) > 0
    assert live.sum() > n // 2
    # settled ON the transformed box top (z ~ 0.55 + radius), not through
    zf = np.asarray(st.pz)[live]
    assert (zf > 0.5).mean() > 0.8, (zf.min(), zf.mean())

    # lighting: the scene's own 'L' lights illuminate cells near the
    # lamps more than far corners
    grid = L.make_light_grid(world)
    grid = T.compute_local_lighting(
        grid, cobjs, env.mesh_height,
        [(ls.pos, ls.color[:3]) for ls in sp.lights[:4]],
        rays_per_light=2048, world=world)
    lv = np.asarray(grid.lc_r) + np.asarray(grid.lc_g) + np.asarray(grid.lc_b)
    assert np.isfinite(lv).all() and lv.max() > 0
