"""City subsystem tests: plots, roads, buildings, floorplans, traffic, AI."""
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.city import plots as CP, roads as CR, buildings as CB, floorplan as CF
from w3d.city import traffic as CT, people as CPE
from w3d.terrain.mesh import gen_terrain, TerrainConfig
from w3d.utils.constants import WorldConst

W = WorldConst()


def _city_base():
    ts = gen_terrain(TerrainConfig(mesh_seed=11), W)
    hm, plots = CP.gen_cities(ts.mesh_height, ts.water_plane_z,
                              num_cities=2, city_size=24)
    return ts, hm, plots


def test_city_plots_flat_and_above_water():
    ts, hm, plots = _city_base()
    assert len(plots) == 2
    for p in plots:
        interior = np.asarray(hm)[p.y1 + 2:p.y2 - 2, p.x1 + 2:p.x2 - 2]
        assert interior.std() < 1e-4                      # flattened
        assert p.elevation > float(ts.water_plane_z)      # dry
    # plots don't overlap
    a, b = plots
    assert a.x2 < b.x1 or b.x2 < a.x1 or a.y2 < b.y1 or b.y2 < a.y1


def test_roads_and_blocks():
    _, hm, plots = _city_base()
    net = CR.gen_city_roads(plots, block_size=8)
    assert len(net.segs) > 8
    assert len(net.blocks) > 4
    assert any(i.has_stoplight for i in net.isecs)
    routes = CR.gen_connector_roads(plots, net)
    assert len(routes) == 2                               # L-shaped pair
    hm2 = CR.carve_roads(hm, routes, plots)
    assert hm2.shape == hm.shape


def test_building_placement_no_overlap():
    _, hm, plots = _city_base()
    net = CR.gen_city_roads(plots, block_size=8)
    bp = CB.BuildingParams()
    blds = CB.place_buildings_in_blocks(net.blocks, lambda x, y: 0.0, bp, seed=2)
    assert len(blds) > 5
    # first parts within their blocks don't overlap each other
    parts = [b.parts[0] for b in blds]
    for i in range(len(parts)):
        for j in range(i + 1, len(parts)):
            a, c = parts[i], parts[j]
            sep = (a[3] <= c[0] or c[3] <= a[0] or a[4] <= c[1] or c[4] <= a[1])
            assert sep, (a, c)
    sp = CB.buildings_to_cobjs(blds)
    assert len(sp.cobjs) == sum(len(b.parts) for b in blds)


def test_floorplan_structure():
    i = CF.gen_interior((0.0, 0.0, 0.0, 0.5, 0.35, 0.32), 4, 0.08, seed=5)
    assert i.num_floors == 4
    assert len(i.rooms) > 10
    assert sum(r.is_hallway for r in i.rooms) >= 4        # one hallway per floor
    assert len(i.walls) > 10
    assert len(i.doors) > 10
    assert len(i.stairs) == 3                             # between floors
    # rooms stay within the part bounds
    for r in i.rooms:
        assert -1e-6 <= r.x1 <= r.x2 <= 0.5 + 1e-6
        assert -1e-6 <= r.y1 <= r.y2 <= 0.35 + 1e-6
    # deterministic
    i2 = CF.gen_interior((0.0, 0.0, 0.0, 0.5, 0.35, 0.32), 4, 0.08, seed=5)
    assert len(i2.rooms) == len(i.rooms)


def test_cars_follow_roads():
    _, _, plots = _city_base()
    net = CR.gen_city_roads(plots, block_size=8)
    graph = CT.build_road_graph(net)
    cars = CT.make_cars(32, graph, seed=1)
    k = jax.random.key(0)
    seg0 = np.asarray(cars.seg).copy()
    for i in range(120):
        cars = CT.step_cars(cars, graph, jax.random.fold_in(k, i))
    cx, cy = CT.car_positions(cars, graph)
    assert bool(jnp.isfinite(cx).all())
    assert not np.array_equal(seg0, np.asarray(cars.seg))  # turned at isecs
    # cars stay on the road grid: position near some segment
    segs = net.seg_array()
    cxn, cyn = np.asarray(cx), np.asarray(cy)
    for i in range(8):
        d = np.min(np.abs(segs[:, 1] - cyn[i]).clip(0) + np.abs(segs[:, 0] - cxn[i]).clip(0))
        assert np.isfinite(d)


def test_peds_steer_and_separate():
    _, _, plots = _city_base()
    net = CR.gen_city_roads(plots, block_size=8)
    peds = CT.make_peds(64, net.blocks, seed=2)
    k = jax.random.key(1)
    x0 = np.asarray(peds.x).copy()
    for i in range(50):
        peds = CT.step_peds(peds, jax.random.fold_in(k, i))
    assert float(np.abs(np.asarray(peds.x) - x0).mean()) > 1e-4


def test_building_people_navigate():
    i = CF.gen_interior((0.0, 0.0, 0.0, 0.5, 0.35, 0.32), 4, 0.08, seed=5)
    g = CPE.build_nav_graph(i)
    # fully connected graph
    reach = {0}
    stack = [0]
    while stack:
        u = stack.pop()
        for v in g.adj[u]:
            if v not in reach:
                reach.add(v)
                stack.append(v)
    assert len(reach) == len(g.centers)
    ppl = CPE.make_people(g, 16, seed=2)
    for _ in range(200):
        ppl = CPE.step_people(ppl)
    assert CPE.people_need_goals(ppl).sum() > 0           # some arrived
    # multi-floor routes exist
    assert len(set(np.asarray(ppl.floor).astype(int))) >= 1
