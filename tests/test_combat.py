"""Universe combat driven by the FULL parsed weapon tables: projectile
travel/seek, beams, point defense, fighter bays, boarding capture
(u_ship.cpp fire_weapon/ai_action/board_ship; us_weapon ship.h:562).

The assertions here are exactly the VERDICT r4 "done" criterion: per-class
outcomes must depend on weapon fields BEYOND range/damage/cooldown —
travel time (speed), interception (proj armor vs PD damage), bay spawns
(is_fighter + ammo_type), capture (for_boarding/can_board/ncrew)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from w3d.universe import ship_config as SC
from w3d.universe import ships as USH
from w3d.universe import combat as CB

DEFS_PATH = SC.shipped_defs_path("ship_defs.txt")
pytestmark = pytest.mark.skipif(
    not os.path.exists(DEFS_PATH), reason="reference ship defs not present")

# enum ids (SC.SHIP_IDS / SC.WEAP_IDS order)
FRIGATE, DESTROYER, CARRIER, ARMAGEDDON = 2, 3, 8, 9
BSHUTTLE, ANTI_MISS, FIGHTER = 17, 28, 0
W_TORPEDO, W_PT_DEF, W_EBEAM, W_FIGHTER, W_ROCKET = 15, 17, 6, 20, 13


@pytest.fixture(scope="module")
def defs():
    return SC.parse_ship_defs(DEFS_PATH)


@pytest.fixture(scope="module")
def ct(defs):
    return CB.build_combat_tables(defs)


def _mk(defs, rows, pad=0):
    """rows = [(cls, align, (x, y, z)), ...] -> FleetState at rest."""
    cls = np.array([r[0] for r in rows], np.int32)
    al = np.array([r[1] for r in rows], np.int32)
    pos = np.array([r[2] for r in rows], np.float32)
    tbl = SC.ship_class_table(defs)
    n = len(rows)
    z = np.zeros(n, np.float32)
    f = USH.FleetState(
        px=pos[:, 0], py=pos[:, 1], pz=pos[:, 2],
        vx=z.copy(), vy=z.copy(), vz=z.copy(), cls=cls, align=al,
        armor=tbl[cls, 2], shields=tbl[cls, 3], cooldown=z.copy(),
        alive=np.ones(n, bool),
        ai=np.full(n, USH.AI_ATT_ENEMY, np.int32),
        attacked=np.zeros(n, bool),
        dx=np.ones(n, np.float32), dy=z.copy(), dz=z.copy(),
        state_val=z.copy())
    if pad:
        f = CB.pad_fleet(f, n + pad)
    return f


def _only(ct, cls_id, wid):
    """Restrict one class's loadout to a single weapon id (table edit —
    the combat step is a pure function of the tables)."""
    sw = np.array(ct.slot_wid)
    sw[cls_id] = np.where(sw[cls_id] == wid, sw[cls_id], 0)
    return ct._replace(slot_wid=sw)


def _run(cs, ct, frames, key=0):
    k = jax.random.key(key)
    for i in range(frames):
        cs = CB.step_combat(cs, jax.random.fold_in(k, i), ct)
    return cs


def test_weapon_table_fields(ct):
    w = np.asarray(ct.w_tbl)
    # torpedo: travels, seeks, interceptable (2 PD hits: armor 25 vs 15)
    assert w[W_TORPEDO, CB.WF_SPEED] > 0
    assert w[W_TORPEDO, CB.WF_SEEK_DIST] > 0
    assert w[W_TORPEDO, CB.WF_PROJ_ARMOR] > w[W_PT_DEF, CB.WF_DAMAGE]
    assert w[W_TORPEDO, CB.WF_PROJ_ARMOR] < 2 * w[W_PT_DEF, CB.WF_DAMAGE]
    # point defense: hitscan with the point_def flag
    assert w[W_PT_DEF, CB.WF_SPEED] == 0 and w[W_PT_DEF, CB.WF_PT_DEF] == 1
    # fighter bay: spawns USC_FIGHTER ships
    assert w[W_FIGHTER, CB.WF_IS_FIGHTER] == 1
    assert int(w[W_FIGHTER, CB.WF_AMMO_CLASS]) == FIGHTER


def test_projectile_travel_time_vs_beam(defs, ct):
    """Torpedoes take d/speed frames to arrive; beams hit the same
    frame (the 9-column hitscan model could not distinguish these)."""
    w = np.asarray(ct.w_tbl)
    d0 = 0.05
    speed = w[W_TORPEDO, CB.WF_SPEED]
    # torpedo duel: attacker armed with only torpedoes
    ct_t = _only(ct, ARMAGEDDON, W_TORPEDO)
    f = _mk(defs, [(ARMAGEDDON, 0, (0, 0, 0)), (FRIGATE, 1, (d0, 0, 0))])
    f = f._replace(ai=np.array([USH.AI_ATT_ENEMY, USH.AI_NONE], np.int32))
    sh0 = float(np.asarray(f.shields)[1])
    cs = CB.make_combat_state(f, ct_t, pool_size=64)
    early = _run(cs, ct_t, 3)
    assert float(np.asarray(early.fleet.shields)[1]) == pytest.approx(sh0), \
        "projectile damage must NOT arrive before travel time"
    assert int(np.asarray(early.proj.alive).sum()) >= 1
    late = _run(early, ct_t, int(d0 / speed) + 30, key=1)
    assert float(np.asarray(late.fleet.shields)[1]) < sh0

    # beam duel at the same distance: damage lands frame 1
    ct_b = _only(ct, DESTROYER, W_EBEAM)
    rng_b = w[W_EBEAM, CB.WF_RANGE]
    db = min(d0, 0.8 * rng_b)
    fb = _mk(defs, [(DESTROYER, 0, (0, 0, 0)), (FRIGATE, 1, (db, 0, 0))])
    fb = fb._replace(ai=np.array([USH.AI_ATT_ENEMY, USH.AI_NONE], np.int32))
    sb0 = float(np.asarray(fb.shields)[1])
    csb = CB.make_combat_state(fb, ct_b, pool_size=64)
    one = _run(csb, ct_b, 1)
    assert float(np.asarray(one.fleet.shields)[1]) < sb0, \
        "beam damage must land the same frame"
    assert int(np.asarray(one.proj.alive).sum()) == 0


def test_point_defense_intercepts_torpedoes(defs, ct):
    """An anti-missile escort (UWEAP_PT_DEF) shoots torpedoes down:
    the protected target takes measurably less damage."""
    ct_t = _only(_only(ct, ARMAGEDDON, W_TORPEDO), ANTI_MISS, W_PT_DEF)
    d0 = 0.04
    base = [(ARMAGEDDON, 0, (0, 0, 0)), (FRIGATE, 1, (d0, 0, 0))]
    escorts = [(ANTI_MISS, 1, (d0 + 0.004 * k, 0.004, 0)) for k in range(4)]

    def total_damage(rows, frames=120):
        f = _mk(defs, rows)
        cs = CB.make_combat_state(f, ct_t, pool_size=64)
        out = _run(cs, ct_t, frames)
        sh = np.asarray(out.fleet.shields)
        ar = np.asarray(out.fleet.armor)
        sh1, ar1 = np.asarray(f.shields), np.asarray(f.armor)
        return float((sh1[1] - sh[1]) + (ar1[1] - ar[1]))

    unprotected = total_damage(base)
    protected = total_damage(base + escorts)
    assert unprotected > 0
    assert protected < 0.7 * unprotected, \
        f"PD escort must intercept: {protected} vs {unprotected}"


def test_fighter_bay_spawns_children(defs, ct):
    """Carrier bays launch USC_FIGHTER children into reserve fleet
    slots, consuming bay ammo (is_fighter + ammo_type=USC_FIGHTER)."""
    ct_b = _only(ct, CARRIER, W_FIGHTER)
    f = _mk(defs, [(CARRIER, 0, (0, 0, 0)), (FRIGATE, 1, (0.3, 0, 0))],
            pad=16)
    cs = CB.make_combat_state(f, ct_b, pool_size=64)
    n_alive0 = int(np.asarray(f.alive).sum())
    bay_slot = list(np.asarray(ct_b.slot_wid)[CARRIER]).index(W_FIGHTER)
    ammo0 = float(np.asarray(cs.ammo)[0, bay_slot])
    out = _run(cs, ct_b, 80)
    alive = np.asarray(out.fleet.alive)
    cls = np.asarray(out.fleet.cls)
    al = np.asarray(out.fleet.align)
    spawned = alive & (np.arange(len(alive)) >= 2)
    assert spawned.sum() >= 2, "bay must launch fighters"
    assert (cls[spawned] == FIGHTER).all()
    assert (al[spawned] == 0).all(), "children fight for the parent team"
    ammo1 = float(np.asarray(out.ammo)[0, bay_slot])
    assert ammo1 <= ammo0 - spawned.sum() + 1e-3


def test_boarding_capture_flips_alignment(defs, ct):
    """A boarding shuttle adjacent to a shields-down, heavily damaged
    can_board enemy captures it: alignment flips to the boarder's team
    (board_ship/capture_ship u_ship.cpp:2081-2117)."""
    tbl = SC.ship_class_table(defs)
    rad_s, rad_f = tbl[BSHUTTLE, 7], tbl[FRIGATE, 7]
    gap = 0.8 * CB.BOARD_REACH * (rad_s + rad_f)
    f = _mk(defs, [(BSHUTTLE, 0, (0, 0, 0)), (FRIGATE, 1, (gap, 0, 0))])
    # disable the target: shields down, armor at 20% (damage 0.8 >= 0.25)
    f = f._replace(shields=np.array([tbl[BSHUTTLE, 3], 0.0], np.float32),
                   armor=np.array([tbl[BSHUTTLE, 2],
                                   0.2 * tbl[FRIGATE, 2]], np.float32))
    cs = CB.make_combat_state(f, ct, pool_size=64)
    out = _run(cs, ct, 10)
    al = np.asarray(out.fleet.align)
    cap = np.asarray(out.captured)
    assert al[1] == 0 and cap[1], "disabled enemy must be captured"
    assert float(np.asarray(out.crew)[0]) < float(np.asarray(cs.crew)[0]), \
        "boarding costs the shuttle half its crew"


def test_no_capture_with_shields_up(defs, ct):
    tbl = SC.ship_class_table(defs)
    gap = 0.8 * CB.BOARD_REACH * (tbl[BSHUTTLE, 7] + tbl[FRIGATE, 7])
    f = _mk(defs, [(BSHUTTLE, 0, (0, 0, 0)), (FRIGATE, 1, (gap, 0, 0))])
    cs = CB.make_combat_state(f, ct, pool_size=64)
    out = _run(cs, ct, 5)
    assert np.asarray(out.fleet.align)[1] == 1
    assert not np.asarray(out.captured)[1]


def test_chained_matches_loop(defs, ct):
    f = _mk(defs, [(DESTROYER, 0, (0, 0, 0)), (FRIGATE, 1, (0.02, 0, 0)),
                   (DESTROYER, 1, (0.0, 0.02, 0))])
    cs0 = CB.make_combat_state(f, ct, pool_size=64)
    cs0 = jax.tree.map(jnp.asarray, cs0)
    key = jax.random.key(7)
    chained = CB.combat_frames_chained(cs0, key, 12, ct)
    loop = cs0
    for k in jax.random.split(key, 12):
        loop = CB.step_combat(loop, k, ct)
    for a, b in zip(jax.tree.leaves(chained), jax.tree.leaves(loop)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_full_defs_battle_runs(defs, ct):
    """A ship_defs-driven battle (fleet_from_defs when $FLEETs exist,
    else a hand mix of classes) stays finite and produces casualties."""
    rows = [(ARMAGEDDON, 0, (0, 0, 0)), (CARRIER, 0, (0.01, 0, 0)),
            (DESTROYER, 0, (0, 0.01, 0)), (FRIGATE, 0, (0.01, 0.01, 0)),
            (ARMAGEDDON, 1, (0.08, 0, 0)), (ANTI_MISS, 1, (0.09, 0, 0)),
            (DESTROYER, 1, (0.08, 0.01, 0)), (FRIGATE, 1, (0.09, 0.01, 0))]
    f = _mk(defs, rows, pad=24)
    cs = CB.make_combat_state(f, ct, pool_size=256)
    cs = jax.tree.map(jnp.asarray, cs)
    out = CB.combat_frames_chained(cs, jax.random.key(3), 64, ct)
    for leaf in jax.tree.leaves(out):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            assert np.isfinite(arr[np.abs(arr) < 1e17]).all()
    sh0 = np.asarray(cs.fleet.shields)
    sh1 = np.asarray(out.fleet.shields)
    assert (sh1[:8] < sh0[:8]).any(), "someone must take damage"
