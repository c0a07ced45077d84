"""Universe + gameplay tests."""
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.universe import gen as UG, surface as US, ships as USH
from w3d.gameplay import waypoints as GW, game as GG
from w3d.physics import types as PT, step as PS
from w3d.utils.constants import WorldConst


def test_cell_deterministic_and_position_seeded():
    a = UG.gen_cell((1, 2, 3))
    b = UG.gen_cell((1, 2, 3))
    assert len(a.galaxies) == len(b.galaxies)
    sa = [len(g.systems) for g in a.galaxies]
    sb = [len(g.systems) for g in b.galaxies]
    assert sa == sb
    c = UG.gen_cell((1, 2, 4))
    assert (len(c.galaxies) != len(a.galaxies)
            or [len(g.systems) for g in c.galaxies] != sa
            or c.galaxies[0].pos != a.galaxies[0].pos)


def test_universe_paging():
    u = UG.UniverseState()
    created, freed = u.update((0.0, 0.0, 0.0))
    assert len(created) == UG.U_BLOCKS ** 3
    assert u.num_systems() > 1000
    c2, f2 = u.update((2.5 * UG.CELL_SIZE, 0.0, 0.0))
    assert len(c2) == len(f2) > 0                  # window shifted
    c3, f3 = u.update((2.5 * UG.CELL_SIZE, 0.0, 0.0))
    assert not c3 and not f3                       # stable


def test_planet_properties_physical():
    cell = UG.gen_cell((0, 0, 0))
    planets = [p for g in cell.galaxies for s in g.systems for p in s.planets]
    assert len(planets) > 10
    # orbits increase within each system
    for g in cell.galaxies:
        for s in g.systems:
            orbits = [p.orbit_r for p in s.planets]
            assert orbits == sorted(orbits)
    # gas giants have no water
    assert all(not p.has_water for p in planets if p.is_gas_giant)
    # rings only on gas giants
    assert all(p.is_gas_giant for p in planets if p.has_rings)


def test_planet_surface():
    h, wm = US.gen_planet_surface(12345)
    assert h.shape == (64, 128)
    assert bool(jnp.isfinite(h).all())
    h2, _ = US.gen_planet_surface(12345)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h2))
    h3, _ = US.gen_planet_surface(999)
    assert not np.allclose(np.asarray(h), np.asarray(h3))
    rgb = US.surface_color(h, wm, 20.0)
    assert rgb.shape == (3, 64, 128)


def test_fleet_combat():
    k = jax.random.key(0)
    f = USH.make_fleet(k, 64)
    a0 = int(f.alive.sum())
    for i in range(300):
        f = USH.step_fleet(f, jax.random.fold_in(k, i))
    assert int(f.alive.sum()) < a0                 # combat kills ships
    assert bool(jnp.isfinite(f.px).all())
    # speeds bounded by class vmax
    sp = np.sqrt(np.asarray(f.vx) ** 2 + np.asarray(f.vy) ** 2 + np.asarray(f.vz) ** 2)
    vmax = USH.SHIP_CLASSES[np.asarray(f.cls), 1]
    assert (sp <= vmax + 1e-5).all()


def test_waypoints_astar():
    W = WorldConst(mesh_x=64, mesh_y=64)
    g = GW.build_waypoints(jnp.zeros((64, 64)), jnp.ones((64, 64)), -1.0, W,
                           max_points=64)
    assert len(g.x) == 64
    path = GW.run_a_star(g, 0, len(g.x) - 1)
    assert path[0] == 0 and path[-1] == len(g.x) - 1
    # path cost is no worse than any single-hop detour (sanity)
    assert len(path) >= 2
    # underwater cells get no waypoints
    g2 = GW.build_waypoints(jnp.full((64, 64), -2.0), jnp.ones((64, 64)), 0.0, W)
    assert len(g2.x) == 0


def test_blast_and_weapons():
    table = PT.make_type_table()
    st = PS.make_state(np.zeros((32, 3)), np.zeros((32, 3)),
                       np.full(32, PT.type_id("BALL")), table)
    st2 = GG.apply_blast(st, 0.0, 0.0, 0.0, 1.0, 50000.0)
    assert (np.asarray(st2.status) == 0).all()     # everything in range dies
    # out-of-range object untouched
    st3 = PS.make_state(np.array([[10.0, 0, 0]]), np.zeros((1, 3)),
                        np.full(1, PT.type_id("BALL")), table)
    st4 = GG.apply_blast(st3, 0.0, 0.0, 0.0, 1.0, 50000.0)
    assert int(st4.status[0]) == 1
    st5 = GG.fire_weapon(st, [5], 0, (0, 0, 1), (1, 0, 0), table)
    assert int(st5.otype[5]) == PT.type_id("ROCKET")
    assert float(st5.vx[5]) == 2.0


def test_smiley_ai_seek_and_flee():
    k = jax.random.key(3)
    sm = GG.make_smileys(k, 16)
    d0 = None
    fired_any = False
    for i in range(150):
        sm, fire = GG.step_smileys(sm, jax.random.fold_in(k, i))
        fired_any |= bool(fire.any())
        if i == 0:
            d0 = float(jnp.sqrt((sm.x - sm.tx) ** 2 + (sm.y - sm.ty) ** 2).mean())
    d1 = float(jnp.sqrt((sm.x - sm.tx) ** 2 + (sm.y - sm.ty) ** 2).mean())
    assert d1 < d0                                  # converged on targets
    assert fired_any
    # wounded smileys flee: distance to target grows
    sm2 = sm._replace(health=jnp.full((16,), 10.0))
    sm3, _ = GG.step_smileys(sm2, k)
    away = jnp.sqrt((sm3.x - sm3.tx) ** 2 + (sm3.y - sm3.ty) ** 2) >= \
        jnp.sqrt((sm2.x - sm2.tx) ** 2 + (sm2.y - sm2.ty) ** 2) - 1e-6
    assert bool(away.all())


def test_fleet_regen_explosions_orbit():
    """u_ship depth: shield regeneration (ship.h:507 shield_re), death
    explosions, and orbit-keeping around a body."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from w3d.universe import ships as SH

    key = jax.random.key(1)
    f = SH.make_fleet(key, 64, spread=0.5)
    prev, deaths = f, 0
    for i in range(300):
        prev = f
        f = SH.step_fleet(f, jax.random.fold_in(key, i))
        deaths += len(SH.fleet_explosions(prev, f))
    assert deaths == 64 - int(f.alive.sum())   # one explosion per death

    lone = SH.make_fleet(key, 4, num_teams=1, spread=5.0)
    lone = lone._replace(shields=lone.shields * 0.1)
    s0 = float(lone.shields[0])
    for i in range(50):
        lone = SH.step_fleet(lone, jax.random.fold_in(key, 999 + i))
    assert float(lone.shields[0]) > s0         # shields regenerate in peace

    orb = SH.make_fleet(key, 8, num_teams=1, spread=2.0)
    for _ in range(400):
        orb = SH.orbit_step(orb, jnp.asarray([0.0, 0.0, 0.0]),
                            jnp.float32(1.0))
    r = np.sqrt(np.asarray(orb.px) ** 2 + np.asarray(orb.py) ** 2)
    assert (np.abs(r - 1.0) < 0.25).all()      # settled on the orbit
