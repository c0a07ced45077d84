"""Fused city frame (city_step): chained scan == per-frame stepping,
device elevator bank == host ElevatorCar, mirror-based reroute."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import w3d
from w3d.city import plots as CP, roads as CR, traffic as CT
from w3d.city import floorplan as CF, people as CPE, room_content as CRC
from w3d.city import city_step as CS


@pytest.fixture(scope="module")
def small_city():
    hm = np.zeros((96, 96), np.float32)
    _, plots = CP.gen_cities(hm, -0.5, num_cities=1, seed=3)
    net = CR.gen_city_roads(plots)
    graph = CT.build_road_graph(net)
    sl = CT.build_stoplights(net, seed=3)
    nav = CT.build_ped_nav(net)
    cars = CT.make_cars(16, graph, seed=3)
    peds = CT.make_peds(24, net.blocks, seed=4)
    return graph, sl, nav, cars, peds


@pytest.fixture(scope="module")
def tower():
    interior = CF.gen_interior((0.0, 0.0, 0.0, 1.2, 0.9, 0.4), 3, 0.08,
                               seed=7)
    objs = CRC.furnish_rooms(interior, 0.08, seed=7)
    return interior, objs


def _mk_state(small_city, tower, n_people=12):
    graph, sl, nav, cars, peds = small_city
    interior, objs = tower
    bldg = CS.MergedBuildingPeople([(interior, n_people, objs)], seed=2)
    cs = CS.CityState(stoplights=sl, cars=cars, peds=peds,
                      people=bldg.people, elev=bldg.elev,
                      helis=None, birds=None, key=jax.random.key(5))
    return cs, bldg, graph, nav


@pytest.mark.slow
def test_chained_equals_per_frame(small_city, tower):
    """K chained frames == K single-frame dispatches (same RNG path)."""
    cs, _, graph, nav = _mk_state(small_city, tower)
    chained = CS.city_frames_chained(cs, graph, nav, None, None, 6)
    single = cs
    for _ in range(6):
        single = CS.city_frames_chained(single, graph, nav, None, None, 1)
    np.testing.assert_allclose(np.asarray(chained.cars.t),
                               np.asarray(single.cars.t), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(chained.stoplights.state),
                                  np.asarray(single.stoplights.state))
    np.testing.assert_allclose(np.asarray(chained.people.x),
                               np.asarray(single.people.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(chained.elev.z),
                               np.asarray(single.elev.z), atol=1e-6)


def test_elevator_bank_matches_host_car():
    """Device SoA bank replays floorplan.ElevatorCar exactly on a
    scripted call sequence."""
    car = CF.ElevatorCar()
    bank = CS.make_elevator_bank(1)
    calls = {3: 2.0, 60: 0.0, 150: 1.0}     # tick -> requested floor
    for t in range(240):
        want = calls.get(t)
        if want is not None:
            car.call(int(want))
        has = jnp.asarray([want is not None])
        cf = jnp.asarray([want if want is not None else 0.0], jnp.float32)
        bank = CS.step_elevator_bank(bank, cf, has)
        car.step()
        assert abs(float(bank.z[0]) - car.z) < 1e-5, f"tick {t}"
        assert int(bank.state[0]) == car.state, f"tick {t}"


def test_elevator_calls_device_matches_host(small_city, tower):
    """Device call extraction == host people.elevator_calls first pick."""
    cs, bldg, graph, nav = _mk_state(small_city, tower, n_people=24)
    # run until someone waits for an elevator (or give up)
    st = cs
    for _ in range(40):
        st = CS.city_frames_chained(st, graph, nav, None, None, 5)
        acts = np.asarray(st.people.activity)
        if (acts == CPE.ACT_WAIT_ELEVATOR).any() or \
                (acts == CPE.ACT_RIDE_ELEVATOR).any():
            break
        st = st._replace(people=bldg.reroute(st.people))
    cf, has = CS.elevator_calls_device(st.people, bldg.num_elevators)
    host = CPE.elevator_calls(st.people, bldg.num_elevators)
    for e in range(bldg.num_elevators):
        if host[e]:
            assert bool(has[e])
            assert int(round(float(cf[e]))) == host[e][0]
        else:
            assert not bool(has[e])


def test_reroute_assigns_new_paths(small_city, tower):
    """Walkers who reach their goal get fresh paths via the host mirror,
    and the device state matches the mirror afterwards."""
    cs, bldg, graph, nav = _mk_state(small_city, tower)
    st = cs
    rerouted = False
    for _ in range(60):
        st = CS.city_frames_chained(st, graph, nav, None, None, 10)
        before = np.asarray(st.people.path_len).copy()
        people = bldg.reroute(st.people)
        after = np.asarray(people.path_len)
        if (np.asarray(st.people.path_pos) > 0).any() and \
                not np.array_equal(before, after) or \
                (np.asarray(people.path_pos) <
                 np.asarray(st.people.path_pos)).any():
            rerouted = True
            st = st._replace(people=people)
            break
        st = st._replace(people=people)
    assert rerouted, "nobody ever finished a path in 600 frames"
    np.testing.assert_array_equal(np.asarray(st.people.path_len),
                                  bldg.m_plen)
    np.testing.assert_allclose(np.asarray(st.people.path_x), bldg.m_px,
                               atol=1e-6)


def test_people_probe_packs_dyn_fields(small_city, tower):
    cs, _, _, _ = _mk_state(small_city, tower)
    p = np.asarray(CS.people_probe(cs.people))
    np.testing.assert_allclose(p[:, 0], np.asarray(cs.people.x), atol=1e-6)
    np.testing.assert_array_equal(p[:, 3].astype(np.int32),
                                  np.asarray(cs.people.path_pos))
    np.testing.assert_array_equal(p[:, 4].astype(np.int32),
                                  np.asarray(cs.people.activity))
