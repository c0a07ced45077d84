"""City structures spanning plots (VERDICT r4 item 9): skyways,
power poles + catenary wires, underground parking elevators — placed,
collision-exported, and visible in the overhead map overlay
(city_obj_placer.cpp / city_objects.cpp skyway/power/ug_elevator)."""

import numpy as np
import pytest

from w3d.city import structures as CS
from w3d.physics.cobjs import COLL_CUBE, COLL_CYLINDER, COLL_NULL


class _FakeB:
    def __init__(self, part):
        self.parts = [part]


class _Seg:
    def __init__(self, x1, y1, x2, y2, dim, width=0.2):
        self.x1, self.y1, self.x2, self.y2 = x1, y1, x2, y2
        self.dim, self.width = dim, width


class _Net:
    def __init__(self, segs, blocks):
        self.segs, self.blocks = segs, blocks


def test_skyways_bridge_facing_towers():
    towers = [_FakeB((0.0, 0.0, 0.0, 1.0, 1.0, 2.0)),
              _FakeB((1.8, 0.1, 0.0, 2.8, 0.9, 1.6)),   # faces in x
              _FakeB((8.0, 8.0, 0.0, 9.0, 9.0, 0.2))]   # too short
    sw = CS.place_skyways(towers, max_dist=1.2)
    assert len(sw) == 1
    s = sw[0]
    assert s.x1 == pytest.approx(1.0) and s.x2 == pytest.approx(1.8)
    # deck at ~2/3 of the SHORTER tower
    assert 0.9 < s.z_bot < 1.2
    far = CS.place_skyways(towers, max_dist=0.5)
    assert far == []                      # gap too wide


def test_power_lines_sag_between_regular_poles():
    net = _Net([_Seg(0.0, 0.0, 20.0, 0.0, dim=0)], [])
    pl = CS.place_power_lines(net, spacing=4.0, conductors=3, sag=0.1)
    assert pl.poles.shape[0] == 6         # 20/4 spans -> 6 poles
    assert pl.wires.shape == (15, 3, 3)   # 5 spans x 3 conductors
    for w in pl.wires:
        span = np.hypot(*(w[2, :2] - w[0, :2]))
        assert w[1, 2] == pytest.approx(w[0, 2] - 0.1 * span, abs=1e-5)
        assert w[0, 2] == pytest.approx(w[2, 2])   # level endpoints


def test_ug_elevators_and_platforms():
    blocks = [(0.0, 0.0, 4.0, 4.0, 0), (6.0, 0.0, 10.0, 4.0, 0),
              (0.0, 6.0, 4.0, 10.0, 0), (6.0, 6.0, 10.0, 10.0, 0)]
    ues = CS.place_ug_elevators(blocks, seed=2, frac=0.9)
    assert len(ues) >= 2
    cobjs, plats = CS.structures_to_cobjs(elevators=ues)
    shapes = np.asarray(cobjs.shape)
    assert (shapes == COLL_CUBE).sum() == 5 * len(ues)  # 4 walls + cab
    assert plats is not None and plats.size == len(ues)
    # cab platform travels the shaft depth downward
    assert float(np.asarray(plats.dz)[0]) < 0.0
    # shaft extends below ground
    lo = np.minimum(np.asarray(cobjs.p1), np.asarray(cobjs.p2))
    assert lo[:, 2].min() == pytest.approx(-ues[0].depth)


def test_collision_export_and_overlay():
    towers = [_FakeB((0.0, 0.0, 0.0, 1.0, 1.0, 2.0)),
              _FakeB((1.8, 0.1, 0.0, 2.8, 0.9, 1.6))]
    net = _Net([_Seg(0.0, 0.0, 8.0, 0.0, dim=0)],
               [(0.0, 0.0, 4.0, 4.0, 0)])
    sw = CS.place_skyways(towers)
    pl = CS.place_power_lines(net)
    ue = CS.place_ug_elevators(net.blocks, seed=1, frac=1.0)
    cobjs, _ = CS.structures_to_cobjs(sw, pl, ue)
    shapes = np.asarray(cobjs.shape)
    live = shapes != COLL_NULL
    assert (shapes[live] == COLL_CYLINDER).sum() == pl.poles.shape[0]
    assert (shapes[live] == COLL_CUBE).sum() >= 1 + 5 * len(ue)

    img = np.zeros((64, 64, 3), np.uint8)
    out = CS.overlay_structures(img, sw, pl, ue)
    assert (out == (0, 255, 255)).all(-1).any(), "skyway drawn"
    assert (out == (255, 255, 0)).all(-1).any(), "poles drawn"
    assert (out == (255, 0, 255)).all(-1).any(), "elevators drawn"


def test_build_city_includes_structures():
    from w3d.city import assemble as CA
    cw = CA.build_city(np.zeros((128, 128), np.float32), num_cities=1,
                       num_cars=8, num_peds=8, seed=1)
    assert cw.power is not None and cw.power.poles.shape[0] > 0
    assert cw.power.wires.shape[0] > 0
    assert isinstance(cw.skyways, list)
    assert isinstance(cw.ug_elevators, list) and len(cw.ug_elevators) >= 1
