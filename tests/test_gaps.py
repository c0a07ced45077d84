"""Tests for platforms/triggers, destruction, CSG, flocking, city objects,
teleporters, surface damage."""
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.physics import platforms as PP, destroy as PD, types as PT, step as PS
from w3d.scene import cobj as SC, csg as CSG
from w3d.veg import animals as VA
from w3d.city import plots as CP, roads as CR, buildings as CB, objects as CO
from w3d.gameplay import teleport as GT

TABLE = PT.make_type_table()


def _cube_scene():
    sp = SC.SceneParse()
    sp.cobjs.append(SC.RawCobj(SC.COLL_CUBE, (0, 0, 0), (1, 1, 0.2)))
    return SC.pack_cobjs(sp)


def test_platform_continuous_pingpong():
    co = _cube_scene()
    plat = PP.make_platforms([0], [[0.0, 0.0, 1.0]], 0.1)
    zs = []
    for _ in range(25):
        plat, mx, my, mz = PP.step_platforms(plat)
        co = PP.apply_platform_motion(co, plat, mx, my, mz)
        zs.append(float(co.p1[0, 2]))
    assert max(zs) > 0.9          # reached the top
    assert zs[-1] < max(zs)       # came back down (ping-pong)


def test_platform_trigger():
    plat = PP.make_platforms([0], [[0.0, 0.0, 1.0]], 0.1, mode=PP.P_TRIGGERED)
    tr = PP.TriggerSet(x=jnp.asarray([0.5]), y=jnp.asarray([0.5]),
                       z=jnp.asarray([0.0]), radius=jnp.asarray([1.0]),
                       platform=jnp.asarray([0]))
    # activator inside the trigger
    plat = PP.eval_triggers(tr, jnp.asarray([0.6]), jnp.asarray([0.6]),
                            jnp.asarray([0.0]), plat)
    assert bool(plat.active[0])
    plat2, _, _, mz = PP.step_platforms(plat)
    assert float(plat2.t[0]) > 0
    # activator away -> deactivates, platform returns
    plat3 = PP.eval_triggers(tr, jnp.asarray([9.0]), jnp.asarray([9.0]),
                             jnp.asarray([0.0]), plat2)
    assert not bool(plat3.active[0])
    plat4, _, _, _ = PP.step_platforms(plat3)
    assert float(plat4.t[0]) < float(plat3.t[0])


def test_platform_riders():
    co = _cube_scene()
    plat = PP.make_platforms([0], [[1.0, 0.0, 0.0]], 0.1)
    plat, mx, my, mz = PP.step_platforms(plat)
    rad = jnp.full((2,), 0.04)
    dx, dy, dz = PP.rider_deltas(
        jnp.asarray([0.5, 5.0]), jnp.asarray([0.5, 5.0]),
        jnp.asarray([0.24, 0.24]), jnp.asarray([4, 4]), co, plat, mx, my, mz, rad)
    assert float(dx[0]) > 0.0     # on the platform: inherits motion
    assert float(dx[1]) == 0.0    # elsewhere: untouched


def test_destroy_and_fragments():
    co = _cube_scene()
    ds = PD.make_destroy_state(co, jnp.full(co.size, PD.DESTROYABLE))
    co2, hit = PD.destroy_coll_objs(co, ds, 0.5, 0.5, 0.1, 1.0)
    assert int(hit.sum()) == 1
    assert int(co2.shape[0]) == 0  # slot nulled
    st = PS.make_state(np.zeros((16, 3)), np.zeros((16, 3)),
                       np.zeros(16, np.int32), TABLE)
    st = st._replace(status=st.status.at[:].set(0))
    st2 = PD.spawn_fragments(st, TABLE, [[0.5, 0.5, 0.1]])
    alive = np.asarray(st2.status) > 0
    assert alive.sum() == 8
    assert (np.asarray(st2.otype)[alive] == PT.type_id("FRAGMENT")).all()


def test_surface_damage_and_decals():
    sd = PD.make_surface_damage(16, 16, max_decals=4)
    sd = PD.add_surface_damage(sd, 5, 7, 2.0)
    assert float(sd.damage[7, 5]) == 2.0
    for i in range(6):  # ring wraps
        sd = PD.add_decal(sd, float(i), 0.0, 0.0)
    assert int(sd.head) == 6
    assert float(sd.decal_x[0]) == 4.0  # overwritten by wrap


def test_csg_merge_and_subtract():
    lay = SC.CobjLayer()
    a = SC.RawCobj(SC.COLL_CUBE, (0, 0, 0), (1, 1, 1), layer=lay)
    b = SC.RawCobj(SC.COLL_CUBE, (1, 0, 0), (2, 1, 1), layer=lay)
    m = CSG.merge_cubes([a, b])
    assert len(m) == 1
    assert m[0].p2[0] == 2
    # subtraction preserves volume
    pos = SC.RawCobj(SC.COLL_CUBE, (0, 0, 0), (2, 2, 2), layer=lay)
    neg = SC.RawCobj(SC.COLL_CUBE, (0.5, 0.5, 0.5), (1.5, 1.5, 1.5), layer=lay)
    pieces = CSG.subtract_cube(pos, neg)
    vol = sum((p.p2[0] - p.p1[0]) * (p.p2[1] - p.p1[1]) * (p.p2[2] - p.p1[2])
              for p in pieces)
    assert abs(vol - 7.0) < 1e-6
    # disjoint negative: unchanged
    far = SC.RawCobj(SC.COLL_CUBE, (5, 5, 5), (6, 6, 6), layer=lay)
    assert CSG.subtract_cube(pos, far) == [pos]


def test_flocking():
    k = jax.random.key(0)
    a = VA.make_animals(k, 64, VA.A_BIRD, center=(0, 0, 1.0), spread=1.5)
    for _ in range(150):
        a = VA.step_flock(a, 0.5, 2.0)
    # coherent flock: bounded spread, bounded speed, altitude respected
    assert float(jnp.std(a.px)) < 2.0
    sp = jnp.sqrt(a.vx ** 2 + a.vy ** 2 + a.vz ** 2)
    assert float(sp.max()) <= 0.02 + 1e-6
    assert bool(((a.pz >= 0.5) & (a.pz <= 2.0)).all())
    # no two animals collapse to the same point
    d_min = np.inf
    px, py = np.asarray(a.px), np.asarray(a.py)
    for i in range(8):
        d = np.sqrt((px - px[i]) ** 2 + (py - py[i]) ** 2)
        d[i] = np.inf
        d_min = min(d_min, d.min())
    assert d_min > 1e-4


def test_city_objects_placement():
    from w3d.terrain.mesh import gen_terrain, TerrainConfig
    from w3d.utils.constants import WorldConst
    ts = gen_terrain(TerrainConfig(mesh_seed=11), WorldConst())
    _, plots = CP.gen_cities(ts.mesh_height, ts.water_plane_z, num_cities=1,
                             city_size=24)
    net = CR.gen_city_roads(plots, block_size=8)
    blds = CB.place_buildings_in_blocks(net.blocks, lambda x, y: 0.0,
                                        CB.BuildingParams(), seed=2)
    objs = CO.place_city_objects(net, blds, seed=3)
    assert len(objs.x) > 20
    assert len(np.unique(objs.kind)) >= 5   # variety
    # deterministic
    objs2 = CO.place_city_objects(net, blds, seed=3)
    np.testing.assert_array_equal(objs.x, objs2.x)


def test_teleporters_and_jump_pads():
    tp = GT.make_teleporters([[0, 0, 0, 0.5, 5, 5, 5, 0],
                              [2, 2, 0, 0.5, 0, 0, 0, 1]])
    st = PS.make_state(np.array([[0.1, 0, 0], [2, 2, 0], [9, 9, 9]]),
                       np.zeros((3, 3)), np.zeros(3, np.int32), TABLE)
    st2 = GT.apply_teleporters(st, tp)
    assert float(st2.px[0]) == 5.0 and float(st2.pz[0]) == 5.0
    assert float(st2.vz[1]) == 4.0          # jump pad boost
    assert float(st2.px[2]) == 9.0          # out of range untouched
