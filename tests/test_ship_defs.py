"""The reference ship-definition config surface (ship_config.cpp): all
shipped `universe/ship_defs*.txt` files parse, unit conversions match the
reference, and the parsed classes drive the fleet sim."""

import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import w3d  # noqa: F401
from w3d.universe import ship_config as SC
from w3d.universe import ships as USH

REF_DIR = "/root/reference/universe"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference universe configs absent")

ALL_FILES = sorted(glob.glob(os.path.join(REF_DIR, "ship_defs*.txt")))


@pytest.mark.parametrize("path", ALL_FILES, ids=os.path.basename)
def test_all_shipped_files_parse(path):
    d = SC.parse_ship_defs(path)
    assert len(d.sclasses) == SC.NUM_US_CLASS     # all 40 USC_* defined
    assert len(d.weapons) == len(SC.WEAP_IDS)     # all 42 UWEAP_*
    # every class got a weapon loadout or is explicitly unarmed
    armed = sum(1 for c in d.sclasses.values() if c.weapons)
    assert armed >= 30


def test_unit_conversions_match_reference():
    """USC_FIGHTER line of ship_defs_base.txt (radius 0.40, accel 0.45,
    max_speed 24.0, shield_re 0.5 ...) through the reference's unit
    conversions (ship_config.cpp:869-882)."""
    d = SC.parse_ship_defs(os.path.join(REF_DIR, "ship_defs_base.txt"))
    f = d.sclasses[0]                      # USC_FIGHTER
    assert f.name == "Fighter"
    np.testing.assert_allclose(f.fields["radius"], 0.40 / 1000.0)
    np.testing.assert_allclose(f.fields["accel"], 0.45 / 1000.0)
    np.testing.assert_allclose(f.fields["max_speed"], 24.0 / 1000.0)
    np.testing.assert_allclose(f.fields["shield_re"], 0.5 / 40.0)
    np.testing.assert_allclose(f.fields["max_shields"], 100.0)
    assert f.fields["cost"] == 1000.0
    assert f.base_color == SC.COLORS["LT_GRAY"]
    assert f.exp_type == SC.EXP_IDS.index("ETYPE_PART_CLOUD")
    # weapon conversion: UWEAP_ROCKET fire_delay seconds -> ticks
    rocket = d.weapons[SC.WEAP_IDS.index("UWEAP_ROCKET")]
    assert rocket.fields["fire_delay"] > 1.0     # ticks, not seconds
    # fighter bay weapons carry a SHIP class as ammo
    fighter_bay = d.weapons[SC.WEAP_IDS.index("UWEAP_FIGHTER")]
    assert fighter_bay.fields["is_fighter"] == 1.0
    assert SC.SHIP_IDS[fighter_bay.ammo_type].startswith("USC_")


def test_loadouts_and_weap_pts():
    d = SC.parse_ship_defs(os.path.join(REF_DIR, "ship_defs_base.txt"))
    fighter = d.sclasses[0]
    wids = [w[0] for w in fighter.weapons]
    assert SC.WEAP_IDS.index("UWEAP_ROCKET") in wids
    # some class carries explicit firing points
    has_pts = any(w[3] for c in d.sclasses.values() for w in c.weapons)
    assert has_pts


def test_cobj_geometry_parsed():
    d = SC.parse_ship_defs(os.path.join(REF_DIR, "ship_defs_base.txt"))
    kinds = {g[0] for c in d.sclasses.values() for g in c.cobjs}
    assert {"cylinder", "cube", "sphere"} <= kinds
    offs, nparts = SC.ship_part_geometry(d)
    assert (nparts > 1).sum() >= 10   # many multi-part classes


def test_player_and_globals():
    d = SC.parse_ship_defs(os.path.join(REF_DIR, "ship_defs.txt"))
    assert d.player == (SC.SHIP_IDS.index("USC_X1EXTREME"),
                        SC.ALIGN_IDS.index("PLAYER"))
    assert len(d.player_weapons) >= 20
    assert d.globals["hyperspeed"] == 100.0
    assert d.globals["start_pos"] == (-0.0694, 0.2117, -0.8114)
    assert d.team_credits[SC.ALIGN_IDS.index("PIRATE")] == 5000


def test_fleet_sim_from_shipped_defs():
    """ship_defs_assault.txt fleets drive step_fleet end-to-end with the
    full 40-class table."""
    d = SC.parse_ship_defs(os.path.join(REF_DIR, "ship_defs_assault.txt"))
    st, tbl, offs, nparts = USH.fleet_from_defs(d, jax.random.key(0))
    assert st.px.shape[0] == 156          # 55 defenders + 101 attackers
    aligns = set(map(int, st.align))
    assert len(aligns) == 2               # RED vs BLUE
    s = st
    for i in range(5):
        s = USH.step_fleet(s, jax.random.key(i), tbl=jnp.asarray(tbl),
                           abomin_id=USH.USC_ABOMIN_ID,
                           reaper_id=USH.USC_REAPER_ID)
    assert bool(jnp.isfinite(s.px).all())
    # fleets close on each other (reference speeds are ~0.02/frame, so
    # combat itself needs ~100 frames; assert the approach instead)
    def gap(f):
        red = np.asarray(f.align) == int(np.asarray(st.align).min())
        cx = lambda v, m: float(np.asarray(v)[m].mean())
        return np.hypot(np.hypot(cx(f.px, red) - cx(f.px, ~red),
                                 cx(f.py, red) - cx(f.py, ~red)),
                        cx(f.pz, red) - cx(f.pz, ~red))
    assert gap(s) < gap(st)
    assert float(jnp.max(jnp.abs(s.vx) + jnp.abs(s.vy) + jnp.abs(s.vz))) > 0


def test_fleet_ai_behaviors():
    """u_ship::ai_action behavior selection from the parsed ai_type:
    AI_IGNORE ships never engage, AI_ATT_WAIT engages only after taking
    damage, AI_RETREAT flees when shields drop low."""
    n = 4
    tbl = jnp.asarray(USH.SHIP_CLASSES)
    f = USH.make_fleet(jax.random.key(0), n, classes=[0, 0, 0, 0])
    # two teams facing each other at close range
    f = f._replace(
        px=jnp.asarray([0.0, 0.1, 0.0, 0.1]),
        py=jnp.asarray([0.0, 0.0, 1.0, 1.0]),
        pz=jnp.zeros(n), vx=jnp.zeros(n), vy=jnp.zeros(n),
        vz=jnp.zeros(n),
        align=jnp.asarray([0, 1, 0, 1]),
        ai=jnp.asarray([USH.AI_IGNORE, USH.AI_ATT_ENEMY,
                        USH.AI_ATT_WAIT, USH.AI_RETREAT], jnp.int32),
        attacked=jnp.zeros(n, bool),
        shields=jnp.asarray([50.0, 50.0, 50.0, 1.0]),  # ship 3 low
    )
    f2 = USH.step_fleet(f, jax.random.key(1))
    # AI_IGNORE (ship 0) did not move; ATT_ENEMY (ship 1) closed in
    assert float(jnp.abs(f2.vx[0]) + jnp.abs(f2.vy[0])) < 1e-8
    assert float(jnp.abs(f2.vx[1]) + jnp.abs(f2.vy[1])) > 0
    # ATT_WAIT (ship 2) holds until damaged
    assert float(jnp.abs(f2.vx[2]) + jnp.abs(f2.vy[2])) < 1e-8
    f3 = f._replace(attacked=jnp.asarray([False, False, True, False]))
    f4 = USH.step_fleet(f3, jax.random.key(2))
    assert float(jnp.abs(f4.vx[2]) + jnp.abs(f4.vy[2])) > 0
    # AI_RETREAT with low shields moves AWAY from its enemy (ship 2 at
    # the same y): velocity x-component points away from x=0.0
    assert float(f2.vx[3]) > 0


def test_weapon_firing_points():
    """$WEAP_PT firing points: the parsed muzzle offsets feed combat —
    a forward-mounted weapon fires at a range where a center-mounted
    one cannot reach."""
    d = SC.parse_ship_defs(os.path.join(REF_DIR, "ship_defs_base.txt"))
    fp = SC.primary_fire_points(d)
    assert fp.shape == (SC.NUM_US_CLASS, 3)
    assert (np.abs(fp).sum(1) > 0).any()     # some class has real points

    tbl = SC.ship_class_table(d).copy()
    cid = 0                                   # USC_FIGHTER
    tbl[cid, 7] = 0.5                         # exaggerate radius
    fp2 = np.zeros_like(fp)
    fp2[cid] = (1.0, 0.0, 0.0)                # muzzle one radius forward
    rng_ = tbl[cid, 4]
    n = 2
    f = USH.make_fleet(jax.random.key(0), n, classes=[cid, cid],
                       tbl=tbl)
    gap = rng_ + 0.3                          # beyond center-range
    f = f._replace(px=jnp.asarray([0.0, gap]), py=jnp.zeros(n),
                   pz=jnp.zeros(n), vx=jnp.zeros(n), vy=jnp.zeros(n),
                   vz=jnp.zeros(n), align=jnp.asarray([0, 1]),
                   dx=jnp.asarray([1.0, -1.0]), dy=jnp.zeros(n),
                   dz=jnp.zeros(n), cooldown=jnp.zeros(n))
    # center fire: out of range -> no damage
    a = USH.step_fleet(f, jax.random.key(1), tbl=jnp.asarray(tbl))
    assert float(jnp.sum(f.shields - a.shields)) == 0.0
    # muzzle 0.5 forward: in range -> damage lands
    b = USH.step_fleet(f, jax.random.key(1), tbl=jnp.asarray(tbl),
                       fire_pts=jnp.asarray(fp2))
    assert float(jnp.sum(f.shields - b.shields)) > 0.0


def test_ship_add_init_spawns():
    """$SHIP_ADD_INIT + $ALIGN rows (the fight/colonize population path,
    ship_config.cpp:525-560) build a fleet when no $FLEET is active —
    the shipped config_universe.txt points at ship_defs_fight.txt which
    populates this way (1500+ ships across alignments)."""
    d = SC.parse_ship_defs(os.path.join(REF_DIR, "ship_defs_fight.txt"))
    assert len(d.fleets) == 0 and len(d.rand_spawns) >= 8
    st, tbl, _o, _n = USH.fleet_from_defs(d, jax.random.key(0))
    assert st.px.shape[0] >= 1000
    aligns = set(map(int, st.align))
    assert len(aligns) >= 4
    s = USH.step_fleet(st, jax.random.key(1), tbl=jnp.asarray(tbl),
                       abomin_id=USH.USC_ABOMIN_ID,
                       reaper_id=USH.USC_REAPER_ID)
    assert bool(jnp.isfinite(s.px).all())
