"""Name generation: universe bodies, businesses, stores, people, books
(Universe_name.cpp, building_names_signs.cpp, pedestrians.cpp name gen)."""

import os

import pytest

import w3d  # noqa: F401
from w3d.utils import names as N
from w3d.utils.rng import RandGen

HAS_TEXT_DATA = os.path.isdir(N.TEXT_DATA_DIR)


def test_phoneme_gen_shape_and_determinism():
    """Universe_name.cpp gen_name: capitalized, bounded length, and
    deterministic for a given RNG state."""
    out = [N.gen_random_name(RandGen(7, i + 1), 0, True) for i in range(40)]
    assert out == [N.gen_random_name(RandGen(7, i + 1), 0, True)
                   for i in range(40)]
    for s in out:
        assert s[0].isupper() and 1 <= len(s) <= 14
    assert len(set(out)) > 20           # actually varied
    # min_len retry loop (gen_random_name:101-110)
    for i in range(20):
        assert len(N.gen_random_name(RandGen(3, i), 4)) >= 4


def test_business_and_company_names():
    rg = RandGen(11, 5)
    seen = {N.choose_business_name(RandGen(11, i), "office")
            for i in range(40)}
    assert len(seen) > 25
    assert N.choose_business_name(rg, "parking") == "Parking"
    hotel = N.choose_business_name(RandGen(2, 9), "hotel")
    assert hotel.endswith(" Hotel") and len(hotel) > len(" Hotel")
    c = N.gen_company_name(RandGen(1, 2))
    assert any(c.startswith(p) or c.endswith(s)
               for p in N._CO_PREFIX for s in N._CO_SUFFIX) or \
        any(n in c for n in N._CO_NAME)


@pytest.mark.skipif(not HAS_TEXT_DATA, reason="shipped text_data absent")
def test_store_names_from_shipped_file():
    """store_names.txt category file parse (building_names_signs:43-88)."""
    cats = N._store_categories()
    assert len([k for k, v in cats.items() if v]) >= 5
    assert "restaurant" in cats and cats["restaurant"]
    rg = RandGen(3, 4)
    name = N.choose_store_name("restaurant", rg)
    assert name in cats["restaurant"]


@pytest.mark.skipif(not HAS_TEXT_DATA, reason="shipped text_data absent")
def test_person_names_markov():
    """pedestrians.cpp person_name_gen_t: ssn-seeded, first+last, the
    Markov model trained on the shipped male/female name lists."""
    a = N.gen_person_name(1234, False)
    b = N.gen_person_name(1234, False)
    assert a == b and " " in a
    first, last = a.split(" ", 1)
    assert first[0].isupper() and last[0].isupper()
    assert len({N.gen_person_name(i, bool(i & 1)) for i in range(60)}) > 50
    # Markov gen alone produces novel names not in the training set
    male, _, mg, _ = N._person_gen()
    rg = RandGen(9, 9)
    novel = [mg.gen_name(rg) for _ in range(30)]
    assert sum(1 for n in novel if n not in set(male)) > 20


@pytest.mark.skipif(not HAS_TEXT_DATA, reason="shipped text_data absent")
def test_book_titles_shipped():
    titles = N.book_titles()
    assert len(titles) > 500
    assert N.choose_book_title(RandGen(5, 6)) in titles


def test_universe_body_names():
    """Bodies name deterministically from their own seeds (lazy paging
    safe: naming never perturbs the generation RNG stream)."""
    from w3d.universe import gen as G
    sy = G.gen_system(RandGen(3, 5), (1.0, 2.0, 3.0))
    sy2 = G.gen_system(RandGen(3, 5), (1.0, 2.0, 3.0))
    assert G.system_name(sy) == G.system_name(sy2)
    assert all(G.planet_name(p) == G.planet_name(q)
               for p, q in zip(sy.planets, sy2.planets))
    names = [G.planet_name(p) for p in sy.planets]
    assert all(n[0].isupper() for n in [G.system_name(sy)] + names)


def test_room_labels_and_building_names():
    """Door signs numbered per floor and book titles attached without
    perturbing placement (label_objects uses a separate RNG stream)."""
    from w3d.city import floorplan as CF, room_content as RC
    i = CF.gen_interior((0.0, 0.0, 0.0, 2.0, 1.6, 0.4), 4, 0.1, seed=5)
    objs = RC.furnish_rooms(i, 0.1, seed=9, btype=RC.BT_HOTEL)
    objs_ref = RC.furnish_rooms(i, 0.1, seed=9, btype=RC.BT_HOTEL)
    labels, signs = RC.label_objects(i, objs, seed=9)
    assert objs.cubes == objs_ref.cubes     # labeling didn't perturb
    hotel_signs = [s for ri, s in signs.items()
                   if objs.room_types[ri] == RC.R_HOTEL]
    assert hotel_signs and all(s.startswith("Room ") for s in hotel_signs)
    floors1 = [s for ri, s in signs.items()
               if objs.room_types[ri] == RC.R_HOTEL
               and i.rooms[ri].floor == 1]
    assert floors1 and all(s.split()[1].startswith("2") for s in floors1)
    # book titles on book objects only
    import numpy as np
    kinds = np.asarray(objs.kinds)
    for idx, title in labels.items():
        assert objs.kinds[idx] == RC.F_BOOK and title
    # building sign names per type
    assert RC.building_name(RC.BT_HOTEL, 4).count(" ") >= 1
    assert RC.building_name(RC.BT_HOUSE, 4).endswith(" Residence")
    assert RC.building_name(RC.BT_JAIL, 4).endswith(" Prison")


def test_mall_store_names():
    from w3d.city import mall_backrooms as MB
    i = MB.gen_mall((0.0, 0.0, 3.0, 1.5), 2, 0.12, seed=4)
    sn = MB.store_names(i, seed=4)
    stores = [s for s in sn if s is not None]
    assert len(stores) >= 6
    assert all(cat in MB.STORE_TYPES and name for (cat, name) in stores)
    assert sn == MB.store_names(i, seed=4)
