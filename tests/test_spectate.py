"""Spectate mode (city_interact.cpp city_spectate_manager_t)."""
import numpy as np
import pytest

import w3d
from w3d.city import spectate as CSP


class _CW:
    def __init__(self, cars=None, peds=None, graph=None):
        self.cars = cars
        self.peds = peds
        self.graph = graph


def _demo_city():
    from w3d.city import roads as CR, traffic as CT
    from w3d.city.plots import CityPlot
    net = CR.gen_city_roads([CityPlot(0, 0, 16, 16, 0.0)], block_size=8)
    graph = CT.build_road_graph(net)
    cars = CT.make_cars(8, graph, seed=1)
    peds = CT.make_peds(8, net.blocks, seed=2)
    return _CW(cars=cars, peds=peds, graph=graph)


def test_toggle_follows_closest_and_untoggles():
    cw = _demo_city()
    from w3d.city import traffic as CT
    px = float(np.asarray(cw.peds.x)[0])
    py = float(np.asarray(cw.peds.y)[0])
    spec = CSP.toggle(CSP.Spectate(), px, py, cw, camera_radius=25.0)
    assert spec.mode in (CSP.SPEC_PED, CSP.SPEC_CAR)
    assert spec.ix >= 0
    # toggling again stops following (toggle_enabled clear path)
    spec2 = CSP.toggle(spec, px, py, cw)
    assert spec2.mode == CSP.SPEC_NONE and spec2.ix == -1


def test_toggle_out_of_range_stays_off():
    cw = _demo_city()
    spec = CSP.toggle(CSP.Spectate(), 1e6, 1e6, cw, camera_radius=0.05)
    assert spec.mode == CSP.SPEC_NONE


def test_building_people_take_precedence():
    cw = _demo_city()
    bx = np.array([0.1], np.float32)
    by = np.array([0.2], np.float32)
    spec = CSP.toggle(CSP.Spectate(), 0.1, 0.2, cw,
                      bldg_people_xy=(bx, by), camera_radius=25.0)
    assert spec.mode == CSP.SPEC_BAI and spec.ix == 0


def test_camera_follows_ped_eye_and_goal_dir():
    cw = _demo_city()
    px = np.asarray(cw.peds.x)
    spec = CSP.Spectate(CSP.SPEC_PED, 3)
    eye = CSP.camera_state(spec, cw, ped_height=0.04)
    assert eye is not None
    x, y, z_off, dx, dy = eye
    assert abs(x - float(px[3])) < 1e-6
    assert abs(z_off - CSP.PED_EYE_F * 0.04) < 1e-9
    assert abs(np.hypot(dx, dy) - 1.0) < 1e-5


def test_camera_follows_car_travel_direction():
    cw = _demo_city()
    from w3d.city import traffic as CT
    cx, cy = CT.car_positions(cw.cars, cw.graph)
    spec = CSP.Spectate(CSP.SPEC_CAR, 0)
    eye = CSP.camera_state(spec, cw)
    assert eye is not None
    x, y, z_off, dx, dy = eye
    assert abs(x - float(cx[0])) < 1e-5
    assert abs(y - float(cy[0])) < 1e-5
    # axis-aligned unit direction along the car's segment
    assert {abs(dx), abs(dy)} == {0.0, 1.0}


def test_camera_none_when_not_spectating():
    cw = _demo_city()
    assert CSP.camera_state(CSP.Spectate(), cw) is None


@pytest.mark.slow
def test_run_tiled_spectate_session():
    from w3d import app
    w = app.run_tiled(frames=8, seed=3, chunk=4, spectate=True)
    assert len(w.frame_hashes) == 2
