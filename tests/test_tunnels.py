"""Basement tunnel networks (building_tunnels.cpp equivalents)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import w3d
from w3d.city import tunnels as TN, buildings as CB, floorplan as CF


def _building_with_basement(x=0.0, y=0.0, w=1.0, h=0.6, fh=0.12, seed=7):
    """One building whose interior has a basement room (floor=-1)."""
    params = CB.BuildingParams(floor_height=fh)
    for s in range(seed, seed + 200):
        bl = CB.place_buildings_in_blocks(
            [(x, y, x + 4.0, y + 4.0, 0)], lambda a, b: 0.0, params, seed=s)
        CF.gen_building_interiors(bl, params, seed=s)
        for b in bl:
            inter = getattr(b, "interior", None)
            if inter is not None and any(r.floor < 0 for r in inter.rooms):
                return b, bl, params
    raise RuntimeError("no basement building found")


def test_gen_tunnels_deterministic_and_placed():
    b, bl, params = _building_with_basement()
    segs = TN.gen_tunnels(b, bl, params.floor_height, seed=3)
    segs2 = TN.gen_tunnels(b, bl, params.floor_height, seed=3)
    assert len(segs) >= 3  # center + two runs at minimum
    assert [(s.p0, s.p1, s.has_gate, s.gate_pos) for s in segs] == \
           [(s.p0, s.p1, s.has_gate, s.gate_pos) for s in segs2]
    center = segs[0]
    assert center.room_conn and not center.closed_lo and not center.closed_hi
    # exactly two runs attach to the center; all carry its water level
    runs = [s for s in segs[1:] if s.parent_ix == 0]
    assert len(runs) == 2
    for s in segs[1:]:
        assert s.water_level == center.water_level


def test_tunnels_below_ground_and_clear_of_basements():
    b, bl, params = _building_with_basement()
    fh = params.floor_height
    segs = TN.gen_tunnels(b, bl, fh, seed=3)
    inter = b.interior
    ground_z = inter.z1 - 0.01 * fh
    base = b.parts[0]
    base_cube = (base[0], base[1], inter.z1 - fh, base[3], base[4], inter.z1)
    for s in segs:
        bc = s.bcube()
        assert bc[5] < ground_z + 1e-9
        # no bore inside the basement room itself
        assert not TN._cubes_intersect(bc, base_cube)


def test_gates_sit_inside_their_segment_near_closed_end():
    b, bl, params = _building_with_basement()
    segs = TN.gen_tunnels(b, bl, params.floor_height, seed=3)
    gate_dist = TN.GATE_DIST_F * params.floor_height
    for s in segs:
        if not s.has_gate:
            continue
        assert s.p0[s.dim] < s.gate_pos < s.p1[s.dim]
        d_lo = s.gate_pos - s.p0[s.dim]
        d_hi = s.p1[s.dim] - s.gate_pos
        if s.closed_hi:
            assert abs(d_hi - gate_dist) < 1e-6
        else:
            assert abs(d_lo - gate_dist) < 1e-6


def test_bends_alternate_axis_and_open_the_parent_end():
    b, bl, params = _building_with_basement()
    found_bend = False
    for seed in range(20):
        segs = TN.gen_tunnels(b, bl, params.floor_height, seed=seed)
        for s in segs:
            if s.parent_ix > 0:  # a bend (child of a run)
                parent = segs[s.parent_ix]
                assert s.dim == 1 - parent.dim
                assert not parent.has_gate
                assert not (parent.closed_lo and parent.closed_hi)
                found_bend = True
    assert found_bend


def test_add_tunnel_objects_shaft_manhole_and_guards():
    b, bl, params = _building_with_basement()
    segs = TN.gen_tunnels(b, bl, params.floor_height, seed=3)
    p0 = b.parts[0]
    fp = (p0[0], p0[1], p0[3], p0[4])
    objs, manholes = TN.add_tunnel_objects(segs, fp, seed=5, ground_z=p0[2])
    # kinds restricted to the catalog; gate objs appear for gated segs
    kinds = {k for k, _ in objs}
    assert kinds <= {"pipe", "web", "gate"}
    n_gates = sum(1 for s in segs if s.has_gate and not s.room_conn)
    assert sum(1 for k, _ in objs if k == "gate") == n_gates
    # manholes sit outside the building footprint, over some segment
    for (mx, my, mr) in manholes:
        assert not (fp[0] <= mx <= fp[2] and fp[1] <= my <= fp[3])
        assert mr > 0
    # second call must not double-add conns (conns_added one-shot)
    n_conns = sum(len(s.conns) for s in segs)
    TN.add_tunnel_objects(segs, fp, seed=5, ground_z=p0[2])
    assert sum(len(s.conns) for s in segs) == n_conns


def test_walk_area_clamp_center_strip_ends_and_gate():
    fh = 0.12
    r = TN.RADIUS_F * fh
    seg = TN.TunnelSeg((0.0, 0.0, -0.1), (2.0, 0.0, -0.1), r, 0,
                       has_gate=True, gate_pos=1.5)
    packed = TN.pack_tunnels([seg])
    ur = 0.02
    pts = jnp.asarray([
        [1.0, 0.03, -0.1],    # inside, off-center -> clamp to strip
        [0.001, 0.0, -0.1],   # at the closed low end -> pull in
        [1.4, 0.0, -0.1],     # below the gate -> clamp short of it
        [1.6, 0.0, -0.1],     # above the gate -> clamped above it
        [5.0, 5.0, 0.0],      # outside any tunnel -> unchanged
    ], dtype=jnp.float32)
    out = np.asarray(jax.jit(
        lambda p: TN.clamp_to_walk_area(p, ur, packed))(pts))
    walk_w = 0.1 * r
    assert abs(out[0, 1]) <= walk_w + 1e-6
    assert out[1, 0] >= ur - 1e-6
    assert out[2, 0] <= 1.5 - ur + 1e-6
    assert out[3, 0] >= 1.5 + ur - 1e-6
    np.testing.assert_allclose(out[4], pts[4])


def test_pack_respects_cap_and_zero_rows_never_match():
    seg = TN.TunnelSeg((0.0, 0.0, -0.1), (2.0, 0.0, -0.1), 0.05, 0)
    packed = TN.pack_tunnels([seg], cap=4)
    assert packed["radius"].shape == (4,)
    # a point that would sit inside a zero-radius row's degenerate cube
    pts = jnp.asarray([[0.0, 0.0, 0.0]], dtype=jnp.float32)
    out = TN.clamp_to_walk_area(pts, 0.02, TN.pack_tunnels([], cap=4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts))


def test_tunnels_to_cobjs_exports_floor_and_walls():
    seg = TN.TunnelSeg((0.0, 0.0, -0.1), (2.0, 0.0, -0.1), 0.05, 0)
    cobjs = TN.tunnels_to_cobjs([seg])
    from w3d.physics.cobjs import COLL_NULL
    assert int((np.asarray(cobjs.shape) != COLL_NULL).sum()) == 3  # floor + 2 walls


def test_build_city_grows_tunnels_with_interiors():
    from w3d.city import assemble as AS
    hm = np.zeros((96, 96), np.float32)
    cw = AS.build_city(hm, num_cities=1, num_cars=8, num_peds=8,
                       num_helis=0, seed=2, interiors=True)
    # tunnels only under buildings that actually have basements
    base_ixs = {bi for bi, b in enumerate(cw.buildings)
                if getattr(b, "interior", None) is not None
                and any(r.floor < 0 for r in b.interior.rooms)}
    for bi, segs in cw.tunnels:
        assert bi in base_ixs
        assert len(segs) >= 1
