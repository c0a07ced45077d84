"""Building clocks (building_clocks.cpp equivalents)."""
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.city import clocks as CK
from w3d.utils.rng import RandGen


def test_clock_time_12h_wrap():
    # midnight -> 12, noon -> 12, 13:05:09 -> 1:05:09
    h, m, s = CK.clock_time(0)
    assert (int(h), int(m), int(s)) == (12, 0, 0)
    h, m, s = CK.clock_time(12 * 3600)
    assert int(h) == 12
    h, m, s = CK.clock_time(13 * 3600 + 5 * 60 + 9)
    assert (int(h), int(m), int(s)) == (1, 5, 9)
    h24, _, _ = CK.clock_time(13 * 3600, use_12h=False)
    assert int(h24) == 13


def test_hand_fracs_reference_formula():
    # 3:00:00 -> hour hand at 0.25, minute/second at 0
    hp, mp, sp = CK.hand_fracs(3, 0, 0)
    assert abs(float(hp) - 0.25) < 1e-6
    assert float(mp) == 0.0 and float(sp) == 0.0
    # 6:30:30 -> second 30/60, minute (30+0.5)/60, hour (6+mp)/12
    hp, mp, sp = CK.hand_fracs(6, 30, 30)
    assert abs(float(sp) - 0.5) < 1e-6
    assert abs(float(mp) - 30.5 / 60) < 1e-6
    assert abs(float(hp) - (6 + 30.5 / 60) / 12) < 1e-6


def test_display_masks_and_leading_zero_blank():
    # 9:05 -> hours tens blank, '9', '0', '5'
    masks, colon = CK.display_state(9 * 3600 + 5 * 60)
    m = np.asarray(masks)
    assert m[0] == 0x00            # blanked leading zero
    assert m[1] == CK.SEG_MASKS[9]
    assert m[2] == CK.SEG_MASKS[0]
    assert m[3] == CK.SEG_MASKS[5]
    assert m[4] == 0x00 and m[5] == 0x00  # no seconds
    assert bool(colon)             # steady colon without seconds
    # 12:34 keeps both hour digits
    masks, _ = CK.display_state(12 * 3600 + 34 * 60)
    m = np.asarray(masks)
    assert m[0] == CK.SEG_MASKS[1] and m[1] == CK.SEG_MASKS[2]


def test_colon_blinks_with_seconds_parity():
    _, c0 = CK.display_state(10, show_seconds=True)   # even second
    _, c1 = CK.display_state(11, show_seconds=True)   # odd second
    assert not bool(c0) and bool(c1)
    masks, _ = CK.display_state(3600 + 23, show_seconds=True)
    m = np.asarray(masks)
    assert m[4] == CK.SEG_MASKS[2] and m[5] == CK.SEG_MASKS[3]


def test_display_state_vectorizes_under_jit():
    secs = jnp.arange(0, 600, 37)
    masks, colon = jax.jit(lambda s: CK.display_state(s, True))(secs)
    assert masks.shape == (secs.shape[0], 6)
    assert colon.shape == (secs.shape[0],)


def test_elevator_floor_digits():
    assert CK.elevator_floor_digits("G") == (CK.IDX_BLANK, 0)
    assert CK.elevator_floor_digits("7") == (CK.IDX_BLANK, 7)
    assert CK.elevator_floor_digits("12") == (1, 2)
    assert CK.elevator_floor_digits("B3") == (CK.IDX_B, 3)
    assert CK.elevator_floor_digits("P2") == (CK.IDX_P, 2)
    assert CK.elevator_floor_digits(" 4") == (CK.IDX_BLANK, 4)


def test_wall_clock_cube_proportions():
    fh = 0.1
    d = CK.wall_clock_cube(1.0, 0.5, 0.0, fh, dim=0, dirn=1, digital=True)
    # digital: 0.08*fh tall, 4:1 wide, depth 0.08*width, bottom 0.6*fh
    assert abs(d[2] - 0.06) < 1e-9
    assert abs((d[5] - d[2]) - 0.008) < 1e-9
    assert abs((d[4] - d[1]) - 0.032) < 1e-9
    assert abs((d[3] - d[0]) - 0.00256) < 1e-9
    assert abs(d[0] - 1.0) < 1e-9          # mounted on the wall plane
    a = CK.wall_clock_cube(1.0, 0.5, 0.0, fh, dim=1, dirn=0, digital=False)
    assert abs((a[5] - a[2]) - 0.025) < 1e-9
    assert abs((a[3] - a[0]) - 0.025) < 1e-9   # square face
    assert abs(a[4] - 1.0) < 1e-9          # extends to -y from the wall


def test_nightstand_clock_faces_bed_and_fits():
    fh = 0.12
    ns = (0.0, 0.0, 0.0, 0.08, 0.08, 0.1)
    rg = RandGen(3, 5)
    cube, dim, dirn = CK.nightstand_clock_cube(ns, (0.5, 0.04), fh, rg)
    assert (dim, dirn) == (0, 1)           # bed toward +x
    assert cube[2] == 0.1                  # sits on the top surface
    w = cube[4] - cube[1]
    assert w <= 0.8 * 0.08 + 1e-9
    assert abs((cube[5] - cube[2]) - 0.42 * w) < 1e-9


def test_room_content_places_clocks():
    from w3d.city import room_content as RC
    from w3d.city import floorplan as CF, buildings as CB
    params = CB.BuildingParams(floor_height=0.12)
    found = 0
    for s in range(30):
        bl = CB.place_buildings_in_blocks(
            [(0.0, 0.0, 4.0, 4.0, 0)], lambda a, b: 0.0, params, seed=s)
        CF.gen_building_interiors(bl, params, seed=s)
        for objs in RC.furnish_buildings(bl, params, seed=s):
            if objs is not None:
                found += sum(1 for k in objs.kinds if k == RC.F_CLOCK)
        if found:
            break
    assert found > 0
