"""City model instancing (city/model_instances.py): parse the SHIPPED
config_city.txt model rows, resolve meshes (procedural fallback for the
unshipped model files, like the reference's nonfatal skip), and drive
per-agent instance transforms from the live traffic sim."""

import os

import numpy as np
import jax
import pytest

import w3d
from w3d.city import model_instances as MI
from w3d.city import plots as CP, roads as CR, traffic as CT

CITY_CFG = "/root/reference/scene_config/config_city.txt"


@pytest.fixture(scope="module")
def specs():
    return MI.parse_city_models(CITY_CFG)


def test_parse_shipped_car_models(specs):
    cars = specs["car"]
    assert len(cars) >= 10, "config_city.txt ships 13+ car_model rows"
    sports = next(c for c in cars if "sportsCar" in c.fn)
    # city car_model ... 1 0 0  22 -1 90  1 1.0 1.0  20 22  (line 120)
    assert sports.recalc_normals == 1
    assert sports.two_sided is False
    assert sports.centered == 0
    assert sports.body_mat_id == 22
    assert sports.fixed_color_id == -1
    assert sports.xy_rot == 90.0
    assert sports.swap_yz is True and sports.swap_xz is False
    assert sports.scale == 1.0
    assert sports.shadow_mat_ids == [20, 22]


def test_parse_custom_color_row(specs):
    """speedCar uses fixed_color_id == -2 followed by inline RGBA
    (city_model.cpp:52)."""
    speed = next(c for c in specs["car"] if "speedCar" in c.fn)
    assert speed.fixed_color_id == -2
    np.testing.assert_allclose(speed.custom_color, (0.15, 0.3, 0.35, 1.0))
    assert speed.shadow_mat_ids == [4, 5]


def test_parse_helicopter_blade_mat(specs):
    helis = specs["helicopter"]
    assert len(helis) >= 3
    ka27 = next(h for h in helis if "ka27" in h.fn)
    assert ka27.blade_mat_id == 1       # blade material column
    assert ka27.centered == 5           # XZ centered bit mask
    assert ka27.scale == 2.5


def test_parse_keyword_rows(specs):
    """reverse_winding= keyword rows parse (ceiling fan, padlock)."""
    objs = specs["objects"]
    assert "ceiling_fan" in objs
    fan = objs["ceiling_fan"][0]
    assert fan.rev_winding_mask == 4
    assert "padlock" in objs
    assert objs["padlock"][0].rev_winding_mask == 8
    # a large object-model catalog comes along for the ride
    assert len(objs) >= 30


def test_fallback_mesh_when_file_missing(specs):
    """Model files aren't shipped -> procedural fallback, nonfatal
    (city_building_params.cpp:118)."""
    mesh = MI.resolve_mesh(specs["car"][0],
                           base_dir=os.path.dirname(CITY_CFG))
    assert mesh.num_verts > 0
    assert mesh.num_faces > 0
    lo, hi = mesh.bounds()
    assert (hi - lo).max() == pytest.approx(CT.CAR_LEN, rel=0.01)


def test_instances_driven_by_traffic_sim(specs):
    hm = np.zeros((96, 96), np.float32)
    _, plots = CP.gen_cities(hm, -0.5, num_cities=1, seed=2)
    net = CR.gen_city_roads(plots)
    graph = CT.build_road_graph(net)
    cars = CT.make_cars(24, graph, seed=2)
    peds = CT.make_peds(16, net.blocks, seed=3)
    sets = MI.city_instances(cars=cars, graph=graph, peds=peds,
                             specs=specs, seed=4)
    kinds = {s.kind for s in sets}
    assert "car" in kinds and "ped" in kinds
    ncar = sum(s.transforms.shape[0] for s in sets if s.kind == "car")
    assert ncar == 24
    # multiple distinct car models get instances (13 models, 24 cars)
    assert len([s for s in sets if s.kind == "car"]) >= 3
    for s in sets:
        assert s.transforms.shape[1:] == (4, 4)
        assert np.isfinite(s.transforms).all()
        # rigid transforms: rotation block orthonormal
        r = s.transforms[:, :3, :3]
        rtr = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape),
                                   atol=1e-5)

    # stepping the sim moves the instances
    sl = CT.build_stoplights(net, seed=2)
    c2 = cars
    for i in range(20):
        c2 = CT.step_cars(c2, graph, jax.random.fold_in(jax.random.key(0), i),
                          stoplights=sl)
    sets2 = MI.city_instances(cars=c2, graph=graph, specs=specs, seed=4)
    t1 = np.concatenate([s.transforms[:, :2, 3] for s in sets
                         if s.kind == "car"])
    t2 = np.concatenate([s.transforms[:, :2, 3] for s in sets2])
    assert not np.allclose(t1, t2), "car instances must move with the sim"


def test_tiled_world_instances_end_to_end():
    from w3d.models.world import make_tiled_world
    from w3d.terrain.tiles import TileManager
    from w3d.terrain.mesh import TerrainConfig
    from w3d.utils.constants import WorldConst
    from w3d.city import assemble as CA
    tm = TileManager(cfg=TerrainConfig(mesh_seed=2),
                     world=WorldConst(mesh_x=32, mesh_y=32), tile_size=32)
    cw = CA.build_city(np.zeros((96, 96), np.float32), num_cities=1,
                       num_cars=12, num_peds=8, seed=2)
    w = make_tiled_world(tm, cw, seed=2, chunk=4)
    w.step_chunk(0.0, 0.0)
    specs = MI.parse_city_models(CITY_CFG)
    sets = MI.tiled_world_instances(w, specs=specs,
                                    base_dir=os.path.dirname(CITY_CFG))
    assert sum(s.transforms.shape[0] for s in sets if s.kind == "car") == 12
    assert sum(s.transforms.shape[0] for s in sets if s.kind == "ped") == 8


def test_room_object_instances(specs):
    """Furnished room objects bind to the shipped object-model rows
    (building_obj_model_loader OBJ_MODEL_* path): toilets/sinks/stoves
    etc. export as per-model InstanceSets at their placed cubes."""
    from w3d.city import floorplan as CF, room_content as CRC
    from w3d.city import model_instances as MI2
    interior = CF.gen_interior((0.0, 0.0, 0.0, 0.6, 0.45, 0.4), 4, 0.08,
                               seed=3)
    objs = CRC.furnish_rooms(interior, 0.08, seed=3)
    sets = MI2.room_object_instances(objs, specs=specs,
                                     base_dir=os.path.dirname(CITY_CFG))
    assert sets, "a furnished house binds at least one object model"
    names = {s.kind for s in sets}
    # houses always have bathrooms + kitchen fixtures
    assert names & {"toilet", "sink", "stove", "fridge", "tub"}
    total = sum(s.transforms.shape[0] for s in sets)
    bound_kinds = set(MI2._room_model_names())
    expect = sum(1 for k in objs.kinds if k in bound_kinds
                 and MI2._room_model_names()[k] in specs["objects"])
    assert total == expect
    for s in sets:
        assert np.isfinite(s.transforms).all()
