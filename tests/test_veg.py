"""Vegetation tests: trees, grass, scenery."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import w3d
from w3d.veg import trees as VT, grass as VG, scenery as VS
from w3d.terrain import biomes as B
from w3d.utils.constants import WorldConst

W = WorldConst()
ZV = jnp.zeros((64, 64))
NZ = jnp.ones((64, 64))
GRASSY = jnp.zeros((5, 64, 64)).at[B.GRASS].set(0.8).at[B.DIRT].set(0.2)
SANDY = jnp.zeros((5, 64, 64)).at[B.SAND].set(1.0)


def test_tree_placement_density_and_biome():
    _, _, _, _, v1 = VT.place_trees_on_tile(3, 0, 0, ZV, NZ, GRASSY, W, density=1.0)
    _, _, _, _, v2 = VT.place_trees_on_tile(3, 0, 0, ZV, NZ, SANDY, W, density=1.0)
    assert int(v1.sum()) > 100
    assert int(v2.sum()) == 0          # no trees on pure sand
    # steep slopes reject trees
    _, _, _, _, v3 = VT.place_trees_on_tile(3, 0, 0, ZV, jnp.full((64, 64), 0.3),
                                            GRASSY, W, density=1.0)
    assert int(v3.sum()) == 0


def test_tree_placement_deterministic():
    a = VT.place_trees_on_tile(3, 0, 0, ZV, NZ, GRASSY, W)
    b = VT.place_trees_on_tile(3, 0, 0, ZV, NZ, GRASSY, W)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = VT.place_trees_on_tile(4, 0, 0, ZV, NZ, GRASSY, W)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


@pytest.mark.slow
def test_gen_trees_geometry():
    k = jax.random.key(1)
    n = 16
    ts = VT.gen_trees(k, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                      jnp.arange(n) % VT.NUM_TREE_TYPES)
    assert ts.cyl_x1.shape == (n, VT.MAX_CYLINS)
    assert ts.leaf_x.shape == (n, VT.MAX_LEAVES)
    # trunk base at origin, radii taper along levels
    assert float(jnp.abs(ts.cyl_z1[:, 0]).max()) < 1e-5
    r = np.asarray(ts.cyl_r1)
    lvl = np.asarray(ts.cyl_level[0])
    assert r[:, lvl == 0].mean() > r[:, lvl == 1].mean() > r[:, lvl == 2].mean()
    # leaves above the ground
    assert float(ts.leaf_z.min()) > 0.0
    # branches connected: level-1 start points lie on the trunk axis region
    assert float(jnp.abs(ts.cyl_x1[:, VT.TRUNK_SEGS:VT.TRUNK_SEGS + VT.NUM_B1]).max()) < 1.0


def test_grass_density_and_ops():
    g = VG.gen_grass_block(1, 0, 0, ZV, GRASSY[B.GRASS], W, blades_per_cell=2)
    alive = (np.asarray(g.height) > 0)
    assert 0.6 < alive.mean() < 0.95   # ~0.8 density
    tx, ty, tz = VG.wind_sway(g, 0.4, 0.2, 1.0)
    assert bool(jnp.isfinite(tx).all())
    # stronger wind -> larger sway
    tx2, _, _ = VG.wind_sway(g, 4.0, 2.0, 1.0)
    d1 = np.abs(np.asarray(tx) - np.asarray(g.x))[alive].mean()
    d2 = np.abs(np.asarray(tx2) - np.asarray(g.x))[alive].mean()
    assert d2 > d1
    g2 = VG.burn_grass_at(g, 0.1, 0.1, 0.5)
    assert float(g2.burn.max()) > 0.5
    g3 = VG.cut_grass_at(g, 0.1, 0.1, 0.5, 0.25)
    assert float(g3.cut.min()) == 0.25


def test_scenery_and_voxel_rock():
    sc = VS.place_scenery(9, 0, 0, ZV, NZ, W, density=2.0)
    assert int(sc.valid.sum()) > 30
    kinds = np.unique(np.asarray(sc.kind)[np.asarray(sc.valid)])
    assert len(kinds) >= 4             # variety of scenery types
    rock = VS.voxel_rock_mesh(5, 0.1)
    assert len(rock) > 200
    assert np.abs(rock).max() <= 0.12  # within the requested size


def test_building_spiders_and_snakes():
    """building_animals.cpp update_spiders/update_snakes: wall-climbing
    spiders with squish, segment-chain snakes keeping gap spacing."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from w3d.veg import animals as A

    key = jax.random.key(0)
    b = (0.0, 0.0, 1.0, 1.0)
    sp = A.make_spiders(key, 16, b)
    for i in range(100):
        sp = A.step_spiders(sp, jax.random.fold_in(key, i), b)
    assert (np.asarray(sp.px) >= 0).all() and (np.asarray(sp.px) <= 1).all()
    assert float(sp.pz.max()) > 0.01           # someone climbed a wall
    sp2 = A.squish_spiders(sp._replace(pz=jnp.zeros_like(sp.pz)),
                           float(sp.px[0]), float(sp.py[0]), radius=0.05)
    assert int(sp2.squished.sum()) >= 1
    x0 = float(sp2.px[0])
    assert float(A.step_spiders(sp2, key, b).px[0]) == x0  # squished = frozen

    sn = A.make_snakes(key, 8, b, num_segs=12)
    for i in range(150):
        sn = A.step_snakes(sn, jax.random.fold_in(key, 1000 + i), b)
    gaps = np.sqrt(np.diff(np.asarray(sn.sx), axis=1) ** 2
                   + np.diff(np.asarray(sn.sy), axis=1) ** 2)
    assert gaps.max() < 0.03 and abs(gaps.mean() - 0.02) < 0.005


def test_ground_fire_spread():
    """enable_grass_fire: creeping grass fire — spreads downwind through
    fuel, stops at firebreaks, scorches blades from the field."""
    import numpy as np
    import jax.numpy as jnp
    from w3d.veg import grass as G
    from w3d.utils.constants import WorldConst

    fuel0 = np.ones((64, 64), np.float32)
    fuel0[:, 40:] = 0.0                   # firebreak
    gf = G.make_ground_fire(fuel0)
    gf = G.ignite_at(gf, 10, 32, 2.0)
    for _ in range(60):
        gf = G.step_ground_fire(gf, jnp.float32(1.5), jnp.float32(0.0))
    I = np.asarray(gf.intensity)
    consumed = fuel0 - np.asarray(gf.fuel)
    burned = consumed > 0.3
    assert burned.sum() > 50              # fire spread through fuel
    assert I[:, 41:].max() == 0.0         # firebreak holds
    bx = np.where(burned.any(0))[0]
    assert bx.max() - 10 > 10 - bx.min()  # downwind (+x) bias

    world = WorldConst(mesh_x=64, mesh_y=64)
    zv = jnp.zeros((16, 16))
    blk = G.gen_grass_block(3, -1.0, -1.0, zv, jnp.ones((16, 16)), world)
    # park one blade on a known burning cell and scorch from the field
    cy, cx = np.unravel_index(np.asarray(gf.intensity).argmax(),
                              gf.intensity.shape)
    wx = (cx - 32) / world.dx_inv
    wy = (cy - 32) / world.dy_inv
    blk = blk._replace(x=blk.x.at[0].set(wx), y=blk.y.at[0].set(wy))
    blk = G.scorch_grass(blk, gf, world)
    assert float(blk.burn[0]) > 0.0       # field-driven scorching applies


def test_flies_and_tank_fish():
    """building_animals.cpp flies (attractor swarms) + building_fish.cpp
    fish constrained to tank volumes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from w3d.veg import animals as A

    key = jax.random.key(0)
    flies = A.make_flies(key, 32, (1.0, 1.0, 0.5))
    for i in range(200):
        flies = A.step_flies(flies, jax.random.fold_in(key, i),
                             jnp.asarray([1.0, 1.0, 0.5]))
    d = np.sqrt((np.asarray(flies.px) - 1) ** 2
                + (np.asarray(flies.py) - 1) ** 2
                + (np.asarray(flies.pz) - 0.5) ** 2)
    assert d.max() < 0.4                   # swarm stays at the attractor
    assert d.std() > 1e-4                  # ...but buzzes, not frozen

    fish = A.make_animals(key, 16, A.A_FISH, center=(0.5, 0.5, 0.25),
                          spread=0.1)
    for _ in range(300):
        fish = A.step_tank_fish(fish, (0.0, 0.0, 0.0, 1.0, 1.0, 0.5))
    for arr, lo, hi in ((fish.px, 0, 1), (fish.py, 0, 1), (fish.pz, 0, 0.5)):
        a = np.asarray(arr)
        assert (a >= lo - 1e-6).all() and (a <= hi + 1e-6).all()


# ---------------------------------------------------------------------------
# leaf dynamics (Tree.cpp:588-830)
# ---------------------------------------------------------------------------

def _tree_fixture():
    import jax
    import jax.numpy as jnp
    from w3d.veg import trees as VT
    T = 4
    key = jax.random.PRNGKey(0)
    ts = VT.gen_trees(key, jnp.zeros(T), jnp.zeros(T), jnp.full(T, -1.0),
                      jnp.zeros(T, jnp.int32))
    ls = VT.init_leaves(jax.random.PRNGKey(1), jnp.zeros(T, jnp.int32))
    return VT, ts, ls


@pytest.mark.slow
def test_leaves_fall_over_time():
    """drop_leaves sheds an occasional leaf (reference temp0 quirk
    preserved: temperature does not modulate the rate); fully damaged
    trees stop dropping."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    VT, ts, ls = _tree_fixture()
    k = jax.random.PRNGKey(2)
    fell = 0
    for i in range(40):
        _, f = VT.drop_leaves(ls, jax.random.fold_in(k, i), fticks=2000.0)
        fell += int(np.asarray(f).sum())
    assert fell > 0
    dead = ls._replace(damage=jnp.ones_like(ls.damage))
    _, f = VT.drop_leaves(dead, k, fticks=2000.0)
    assert int(np.asarray(f).sum()) == 0


def test_burning_chars_and_damages():
    import numpy as np
    import jax
    VT, ts, ls = _tree_fixture()
    k = jax.random.PRNGKey(3)
    for i in range(200):
        ls, charred = VT.burn_leaves(ls, jax.random.fold_in(k, i),
                                     temperature=150.0)
    assert float(np.asarray(ls.damage).max()) > 0.05
    assert int((np.asarray(ls.lcolor) <= 0).sum()) > 0
    # cool temperature: nothing burns
    ls2 = _tree_fixture()[2]
    ls3, ch = VT.burn_leaves(ls2, k, temperature=20.0)
    assert int(np.asarray(ch).sum()) == 0
    np.testing.assert_array_equal(np.asarray(ls3.lcolor),
                                  np.asarray(ls2.lcolor))


def test_blast_destroys_nearby_leaves_some_fall():
    import numpy as np
    import jax
    VT, ts, ls = _tree_fixture()
    # blast at the first tree's canopy center
    bx = float(np.asarray(ts.leaf_x)[0].mean())
    by = float(np.asarray(ts.leaf_y)[0].mean())
    bz = float(np.asarray(ts.leaf_z)[0].mean())
    ls2, fell = VT.blast_damage_leaves(ls, ts, jax.random.PRNGKey(4),
                                       bx, by, bz, 0.3, 500.0)
    destroyed = (np.asarray(ls2.lcolor)[0] == -1000.0).sum()
    assert destroyed > 0
    assert float(np.asarray(ls2.damage)[0]) > 0
    # fallen leaves are a subset of destroyed ones (~25%)
    f = np.asarray(fell)[0]
    assert 0 <= f.sum() <= destroyed


def test_spraypaint_recolors_in_radius():
    import numpy as np
    import jax.numpy as jnp
    VT, ts, ls = _tree_fixture()
    px = float(np.asarray(ts.leaf_x)[0, 0])
    py = float(np.asarray(ts.leaf_y)[0, 0])
    pz = float(np.asarray(ts.leaf_z)[0, 0])
    ls2 = VT.spraypaint_leaves(ls, ts, px, py, pz, 0.05,
                               jnp.asarray([1.0, 0.1, 0.8]))
    r = np.asarray(ls2.r)
    assert abs(r[0, 0] - 1.0) < 1e-6
    # far leaves untouched
    assert abs(r[3].mean() - np.asarray(ls.r)[3].mean()) < 1e-6


def test_scenery_per_kind_geometry():
    """Scenery depth (scenery.cpp): terrain-following logs with two
    radii, plant leaf rings with per-type berries and underwater seaweed
    forcing, squashed rocks, typed collision export."""
    import numpy as np
    import jax.numpy as jnp
    from w3d.veg import scenery as VS
    from w3d.utils.constants import WorldConst

    W = WorldConst(mesh_x=32, mesh_y=32)
    rng = np.random.default_rng(2)
    zv = jnp.asarray(0.3 * rng.standard_normal((32, 32)).astype(np.float32))
    nz = jnp.ones((32, 32))
    s = VS.place_scenery(11, -16.0, -16.0, zv, nz, W, density=3.0)
    assert int(np.asarray(s.valid).sum()) > 20

    logs = VS.gen_logs(s, zv, W)
    lv = np.asarray(logs.valid)
    if lv.any():
        # endpoints follow the mesh independently (sloped logs)
        z1 = np.asarray(logs.z1)[lv]
        z2 = np.asarray(logs.z2)[lv]
        assert not np.allclose(z1, z2)
        assert (np.asarray(logs.r1)[lv] > 0).all()

    plants = VS.gen_plants(s, zv, W, water_z=0.0)
    pv = np.asarray(plants.valid)
    if pv.any():
        # underwater plants become seaweed (the last type)
        under = np.asarray(plants.z)[pv] < 0.0
        pts = np.asarray(plants.ptype)[pv]
        assert (pts[under] == VS.NUM_PLANT_TYPES - 1).all()
        assert (pts[~under] < VS.NUM_LAND_PLANT_TYPES).all()
        lx, ly, lz = VS.plant_leaf_points(plants)
        assert lx.shape[1] == 15       # 3 rings x 5 leaves
        # leaves sit above the plant base
        assert float((np.asarray(lz)[pv] - np.asarray(plants.z)[pv, None]).min()) > 0

    rocks = VS.gen_rocks(s, zv, W)
    rv = np.asarray(rocks.valid)
    if rv.any():
        sq = np.stack([np.asarray(rocks.sx), np.asarray(rocks.sy),
                       np.asarray(rocks.sz)], 1)[rv]
        assert (sq >= 0.7).all() and (sq <= 1.31).all()

    co = VS.scenery_cobjs(s, logs, plants, rocks)
    assert int((np.asarray(co.shape) >= 0).sum()) >= int(np.asarray(s.valid).sum())


# ---------------------------------------------------------------------------
# round-5 depth: flowers, reference bird/fish/butterfly behaviors
# ---------------------------------------------------------------------------

def test_flowers_only_in_dense_grass():
    """add_flowers (grass.cpp:813): cells below 0.5 grass density get no
    flowers; dense grass gets flower_density-scaled counts with valid
    colors/geometry."""
    gw_dense = jnp.full((16, 16), 0.9)
    gw_sparse = jnp.full((16, 16), 0.3)
    zv = jnp.zeros((16, 16))
    fd = VG.gen_flowers(3, 0.0, 0.0, zv, gw_dense, W, flower_density=1.0)
    fs = VG.gen_flowers(3, 0.0, 0.0, zv, gw_sparse, W, flower_density=1.0)
    n_dense = int(np.asarray(fd.alive).sum())
    n_sparse = int(np.asarray(fs.alive).sum())
    assert n_dense > 20
    assert n_sparse == 0
    a = np.asarray(fd.alive)
    col = np.asarray(fd.color)[a]
    assert col.min() >= 0.0 and col.max() <= 1.0
    # flowers sit above the mesh by their height
    z = np.asarray(fd.z)[a]
    h = np.asarray(fd.height)[a]
    assert np.allclose(z, h, atol=1e-6)
    # normals mostly up
    assert float(np.asarray(fd.nz)[a].min()) > 0.9
    # density scales the count
    f2 = VG.gen_flowers(3, 0.0, 0.0, zv, gw_dense, W, flower_density=2.0)
    assert int(np.asarray(f2.alive).sum()) > n_dense


def test_bird_flight_and_flocking():
    """bird_t::update + vect_bird_t::flock: constant speed preserved
    through turns; separated birds converge (cohesion) while close pairs
    spread (separation)."""
    from w3d.veg import animals as A
    k = jax.random.key(0)
    a = A.make_animals(k, 24, A.A_BIRD, center=(0, 0, 1.0), spread=0.3)
    sp0 = np.sqrt(np.asarray(a.vx) ** 2 + np.asarray(a.vy) ** 2
                  + np.asarray(a.vz) ** 2)
    b = a
    for i in range(20):
        b = A.step_birds(b, jax.random.fold_in(k, i))
    sp1 = np.sqrt(np.asarray(b.vx) ** 2 + np.asarray(b.vy) ** 2
                  + np.asarray(b.vz) ** 2)
    # const-velocity forces: speeds unchanged (apply_force_xy_const_vel)
    np.testing.assert_allclose(sp1, sp0, rtol=1e-4)
    # alignment: velocity directions become more similar
    def dir_spread(s):
        vx, vy = np.asarray(s.vx), np.asarray(s.vy)
        m = np.sqrt(vx**2 + vy**2) + 1e-12
        ux, uy = vx / m, vy / m
        return 1.0 - np.hypot(ux.mean(), uy.mean())
    assert dir_spread(b) < dir_spread(a)


def test_fish_scatter_from_player_and_shallow_revert():
    from w3d.veg import animals as A
    mesh = jnp.full((32, 32), -1.0)
    k = jax.random.key(1)
    f = A.gen_fish(k, 64, mesh, water_z=-0.2, world=W)
    alive = np.asarray(f.kind) >= 0
    assert alive.sum() > 32     # deep flat water: most spawn
    z = np.asarray(f.pz)[alive]
    assert (z > -1.0).all() and (z < -0.2).all()
    # player right at one fish: it swims away fast
    px0 = float(np.asarray(f.px)[alive][0])
    py0 = float(np.asarray(f.py)[alive][0])
    f2 = A.step_fish(f, jax.random.fold_in(k, 9), mesh, W,
                     (px0 + 0.01, py0, -0.5))
    i0 = np.where(alive)[0][0]
    vx = float(np.asarray(f2.vx)[i0])
    sp = abs(vx)
    assert sp > 5.0 * A.FISH_SPEED       # 10x scatter speed, away (-x)
    assert vx < 0.0
    # shallow mesh: moves revert (positions pinned)
    mesh_hi = jnp.full((32, 32), -0.21)  # water depth 0.01 everywhere
    f3 = A.step_fish(f, jax.random.fold_in(k, 10), mesh_hi, W,
                     (100.0, 100.0, 0.0))
    np.testing.assert_allclose(np.asarray(f3.px), np.asarray(f.px),
                               atol=1e-6)


def test_butterflies_band_and_rest():
    from w3d.veg import animals as A
    mesh = jnp.zeros((32, 32))
    k = jax.random.key(2)
    b = A.make_butterflies(k, 32, W)
    fx = jnp.asarray([0.5]); fy = jnp.asarray([0.5]); fz = jnp.asarray([0.1])
    for i in range(30):
        b = A.step_butterflies(b, jax.random.fold_in(k, i), mesh, W,
                               flowers_xyz=(fx, fy, fz))
    # altitude band respected: above terrain, below max altitude
    z = np.asarray(b.pz)
    zmin = 2.0 * A.BFLY_RADIUS
    zmax = zmin + 0.10 * (W.x_scene + W.y_scene) + 1e-5
    assert (z >= zmin - 1e-5).all() and (z <= zmax + 0.05).all()
    # accel walks stay clipped
    assert np.abs(np.asarray(b.rot_rate)).max() <= 1.0
    assert (np.asarray(b.speed_factor) >= 0.5).all()
    assert (np.asarray(b.speed_factor) <= 1.5).all()
    # a butterfly placed AT the flower with a valid dest starts resting
    b2 = b._replace(px=b.px.at[0].set(0.5), py=b.py.at[0].set(0.5),
                    dest_x=b.dest_x.at[0].set(0.5),
                    dest_y=b.dest_y.at[0].set(0.5),
                    dest_valid=b.dest_valid.at[0].set(True))
    b3 = A.step_butterflies(b2, jax.random.fold_in(k, 99), mesh, W,
                            flowers_xyz=(fx, fy, fz))
    assert float(b3.rest_time[0]) > 0.0
    assert not bool(b3.dest_valid[0])
