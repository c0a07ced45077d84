"""Building interaction surface (city/bldg_interact.py) vs
building_interact.cpp: light switches drive room lighting, openable
storage gates loot, powered objects emit light, blinds scale daylight."""
import numpy as np
import jax.numpy as jnp

import w3d
from w3d.city import floorplan as CF
from w3d.city import room_content as RC
from w3d.city import bldg_interact as BX
from w3d.lighting import building_indir as BI


def _furnished(seed=5):
    i = CF.gen_interior((0.0, 0.0, 0.0, 0.6, 0.45, 0.4), 4, 0.08, seed=seed)
    ro = RC.furnish_rooms(i, 0.08, seed)
    return i, ro


def test_switches_placed_by_doors():
    i, ro = _furnished()
    kinds = np.asarray(ro.kinds)
    n_sw = int((kinds == RC.F_LIGHT_SWITCH).sum())
    assert n_sw > 0
    # switches sit at hand height on walls, one per door (max 2/room)
    c = np.asarray(ro.cubes, np.float32).reshape(-1, 6)
    sw = c[kinds == RC.F_LIGHT_SWITCH]
    heights = sw[:, 2] - 0.0
    assert ((heights % 0.08) > 0.02).all()     # above each floor base


def test_switch_toggles_room_light_and_indir():
    i, ro = _furnished()
    st = BX.make_interact_state(ro, len(i.rooms))
    kinds = np.asarray(ro.kinds)
    si = int(np.where(kinds == RC.F_LIGHT_SWITCH)[0][0])
    ri = int(ro.rooms[si])
    cx, cy, cz = BX._centers(ro)[si]
    assert bool(st.room_light_on[ri])
    hit = BX.interact_at(ro, st, cx, cy, cz, reach=0.05)
    assert hit == si
    assert not bool(st.room_light_on[ri])

    # the room's ceiling light drops out of the indir composite
    mgr = BI.BuildingIndirManager()
    li = int(np.where((kinds == RC.F_CEIL_LIGHT)
                      & (np.asarray(ro.rooms) == ri))[0][0])
    c = np.asarray(ro.cubes, np.float32).reshape(-1, 6)[li]
    mgr.register_light(li, tuple(0.5 * (c[:3] + c[3:])), (1.0, 1.0, 1.0))
    assert mgr.enabled.get(li, True)
    changed = BX.apply_room_lights(mgr, ro, st)
    assert changed == 1
    assert mgr.enabled[li] is False
    # toggle back on: re-applied
    BX.interact_at(ro, st, cx, cy, cz, reach=0.05)
    assert BX.apply_room_lights(mgr, ro, st) == 1
    assert mgr.enabled[li] is True


def test_powered_objects_emit_light():
    ro = RC.RoomObjects()
    ro.add(0, RC.F_TV, 0, 0, 0, 0.1, 0.1, 0.1)
    ro.add(0, RC.F_LAMP, 1, 0, 0, 1.1, 0.1, 0.1)
    ro.add(0, RC.F_TABLE, 2, 0, 0, 2.1, 0.1, 0.1)
    st = BX.make_interact_state(ro, 1)
    pos, col = BX.active_object_lights(ro, st)
    assert len(pos) == 0
    BX.interact_at(ro, st, 0.05, 0.05, 0.05, reach=0.2)   # TV on
    pos, col = BX.active_object_lights(ro, st)
    assert len(pos) == 1
    assert col[0][2] > col[0][0]     # TV glow is blue-ish
    # stove on -> heat source
    ro.add(0, RC.F_STOVE, 3, 0, 0, 3.1, 0.1, 0.1)
    st = BX.make_interact_state(ro, 1)
    BX.interact_at(ro, st, 3.05, 0.05, 0.05, reach=0.2)
    assert len(BX.stove_heat_sources(ro, st)) == 1


def test_closed_container_gates_loot():
    ro = RC.RoomObjects()
    ci = ro.add(0, RC.F_CABINET, 0, 0, 0, 0.3, 0.3, 0.3)
    bi = ro.add(0, RC.F_BOTTLE, 0.1, 0.1, 0.1, 0.15, 0.15, 0.2, parent=ci)
    st = BX.make_interact_state(ro, 1)
    assert not BX.lootable_mask(ro, st)[bi]      # cabinet closed
    BX.interact_at(ro, st, 0.15, 0.15, 0.15, reach=0.3)   # open it
    assert st.obj_on[ci]
    assert BX.lootable_mask(ro, st)[bi]


def test_blinds_scale_window_light():
    ro = RC.RoomObjects()
    wi = ro.add(0, RC.F_BLINDS, 0, 0, 0, 0.02, 0.3, 0.5)
    st = BX.make_interact_state(ro, 2)
    s = BX.window_light_scale(ro, st, 2)
    assert s[0] < 1.0 and s[1] == 1.0            # closed blinds darken
    BX.interact_at(ro, st, 0.01, 0.15, 0.25, reach=0.3)   # open blinds
    s = BX.window_light_scale(ro, st, 2)
    assert s[0] == 1.0


def test_nothing_in_reach_is_noop():
    ro = RC.RoomObjects()
    ro.add(0, RC.F_TV, 0, 0, 0, 0.1, 0.1, 0.1)
    st = BX.make_interact_state(ro, 1)
    assert BX.interact_at(ro, st, 5, 5, 5, reach=0.2) == -1
    assert st.toggles == 0
