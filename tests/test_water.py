"""Water & weather tests: ripples, smoke diffusion, valley flooding."""
import pytest
import numpy as np
import jax.numpy as jnp

import w3d
from w3d.water import ripples as WR, smoke as WS, valleys as WV
from w3d.utils.constants import WorldConst

W64 = WorldConst(mesh_x=64, mesh_y=64)


def test_ripples_spread_and_decay():
    st = WR.make_ripples(64, 64)
    inside = jnp.ones((64, 64), bool)
    depth = jnp.full((64, 64), 0.5)
    st = WR.add_splash(st, 32, 32, 2, 1.0, 64, 64)
    zv5 = None
    for i in range(40):
        st, zv = WR.step_ripples(st, inside, depth)
        if i == 5:
            zv5 = np.abs(np.asarray(zv))
    assert zv5[32, 38] != 0 or zv5[32, 40] != 0     # wave propagated outward
    assert np.abs(np.asarray(st.rval)).sum() < 1.0  # and decayed


def test_ripples_respect_water_mask():
    st = WR.make_ripples(32, 32)
    inside = jnp.zeros((32, 32), bool).at[:, :16].set(True)  # water on left half
    depth = jnp.full((32, 32), 0.5)
    st = WR.add_splash(st, 8, 16, 2, 1.0, 32, 32)
    for _ in range(20):
        st, zv = WR.step_ripples(st, inside, depth)
    r = np.asarray(st.rval)
    assert np.abs(r[:, 16:]).max() == 0.0           # no ripples on land


def test_ripples_depth_clamp():
    st = WR.make_ripples(16, 16)
    inside = jnp.ones((16, 16), bool)
    depth = jnp.full((16, 16), 0.01)
    st = WR.add_splash(st, 8, 8, 3, 100.0, 16, 16)
    st, zv = WR.step_ripples(st, inside, depth)
    assert np.abs(np.asarray(zv)).max() <= 0.01 + 1e-6


def test_smoke_rises_and_leaks():
    s = jnp.zeros((16, 16, 16)).at[8, 8, 8].set(50.0)
    for _ in range(30):
        s = WS.diffuse_smoke(s)
    s = np.asarray(s)
    assert s.sum() < 50.0                           # edge sinks leak
    assert s[9:, 8, 8].sum() > 1.5 * s[:8, 8, 8].sum()  # rises (ZU > ZD)
    assert (s >= 0).all() and (s <= WS.SMOKE_MAX_VAL).all()


def test_smoke_flow_blocking():
    s = jnp.zeros((8, 8, 8)).at[2, 4, 4].set(10.0)
    fz = jnp.ones((8, 8, 8)).at[3].set(0.0)         # ceiling above layer 2
    for _ in range(20):
        s = WS.diffuse_smoke(s, flow_z=fz)
    s = np.asarray(s)
    assert s[4:, 4, 4].sum() < 1e-4                 # nothing got above the ceiling


def test_watershed_two_basins():
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    mesh = np.minimum(0.001 * ((xx - 20) ** 2 + (yy - 32) ** 2),
                      0.001 * ((xx - 44) ** 2 + (yy - 32) ** 2)).astype(np.float32)
    labels = np.asarray(WV.watershed_labels(jnp.asarray(mesh)))
    assert len(np.unique(labels)) == 2
    # cells near each minimum map to different basins
    assert labels[32 * 64 + 20] != labels[32 * 64 + 44]


def test_valley_fill_volume():
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    mesh = np.minimum(0.001 * ((xx - 20) ** 2 + (yy - 32) ** 2),
                      0.001 * ((xx - 44) ** 2 + (yy - 32) ** 2)).astype(np.float32)
    labels = np.asarray(WV.watershed_labels(jnp.asarray(mesh)))
    vol = jnp.zeros(64 * 64).at[labels[32 * 64 + 20]].set(0.05)
    _, zval, water, wet = WV.fill_valleys(jnp.asarray(mesh), vol, W64)
    wet = np.asarray(wet)
    assert wet[:, :32].sum() > 50                   # left bowl floods
    assert wet[:, 33:].sum() <= 2                   # right bowl stays dry
    # filled volume matches requested within bisection tolerance
    depth = np.maximum(np.asarray(water) - mesh, 0.0)
    got = depth[:, :32].sum() * W64.dxdy
    assert abs(got - 0.05) < 0.005


def test_rain_accumulation():
    mesh = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, (32, 32)).astype(np.float32))
    labels = WV.watershed_labels(mesh)
    vol = jnp.zeros(32 * 32)
    vol = WV.add_rain_volume(vol, labels, 32, 32, 0.01, WorldConst(mesh_x=32, mesh_y=32))
    total = float(vol.sum())
    expect = 0.01 * WorldConst(mesh_x=32, mesh_y=32).dxdy * 32 * 32
    assert abs(total - expect) < 1e-4


@pytest.mark.slow
def test_precipitation_accumulation():
    """precipitation.cpp + accumulation_matrix (mesh.h:113): spawned
    snow lands and piles up per cell, rain routes to water volume,
    accumulation melts above freezing only."""
    import jax
    import jax.numpy as jnp
    from w3d.models import physics_model as PM
    from w3d.physics import step as PS
    from w3d.water import precip as PR
    from w3d.utils.constants import WorldConst

    world = WorldConst()
    sw = PM.build_spheres_world(num_objects=2000, world=world,
                                group_shapes=False)
    st = sw.state._replace(status=jnp.zeros_like(sw.state.status))
    key = jax.random.key(0)
    st = PR.spawn_precip(st, key, 500, "SNOW", world, cloud_z=0.3)
    st = PR.spawn_precip(st, jax.random.fold_in(key, 1), 500, "RAIN",
                         world, cloud_z=0.3)
    assert int((st.status > 0).sum()) == 1000
    accum = jnp.zeros((world.mesh_y, world.mesh_x))
    total_rain = 0.0
    for _ in range(150):
        st = PS.step_objects(st, sw.env, sw.cobjs, sw.table, substeps=2,
                             world=world, obj_collisions=False)
        accum, rv, landed = PR.accumulate_landed(accum, st,
                                                 sw.env.mesh_height, world)
        total_rain += float(rv)
        st = PR.retire_landed(st, landed)
    assert float(accum.sum()) > 100        # snow piled up
    assert total_rain > 1.0                # rain became water volume
    a0 = float(accum.sum())
    accum = PR.melt_accumulation(accum, jnp.float32(20.0))
    assert float(accum.sum()) < a0         # melts when warm
    af = float(accum.sum())
    accum = PR.melt_accumulation(accum, jnp.float32(-5.0))
    assert float(accum.sum()) == af        # frozen: no melt


@pytest.mark.slow
def test_snow_deflects_off_steep_surfaces():
    """Deflection bounces (snow.cpp:484-540): flakes hitting a surface
    too steep to hold snow shed off and land on the ground below instead
    of recording the steep surface's height; a flat platform top catches
    them directly."""
    import numpy as np
    import jax.numpy as jnp
    from w3d.water import snow as WS
    from w3d.scene import cobj as SC
    from w3d.physics.cobjs import COLL_POLYGON, COLL_CUBE
    from w3d.utils.constants import WorldConst

    W = WorldConst(mesh_x=48, mesh_y=48)
    mesh = jnp.full((48, 48), -1.0, jnp.float32)

    def snow_for(cobjs):
        sz, ct = WS.create_snow_map(mesh, cobjs, 131072,
                                    wind=(0.0, 0.0, 0.0), world=W, seed=1,
                                    batch=65536)
        return np.asarray(sz), np.asarray(ct)

    lay = SC.CobjLayer()
    # steep ramp: a quad rising from z=-1 at x=0.2 to z=1.5 at x=0.9
    # (nz ~ 0.27, well under the shed threshold)
    ramp = SC.SceneParse()
    ramp.cobjs.append(SC.RawCobj(COLL_POLYGON, pts=(
        (0.2, -1.5, -1.0), (0.9, -1.5, 1.5), (0.9, 1.5, 1.5),
        (0.2, 1.5, -1.0)), r1=0.0, layer=lay))
    sz_r, _ = snow_for(SC.pack_cobjs(ramp))
    # flat platform of the same footprint and top height
    plat = SC.SceneParse()
    plat.cobjs.append(SC.RawCobj(COLL_CUBE, (0.2, -1.5, -1.0),
                                 (0.9, 1.5, 1.5), layer=lay))
    sz_p, _ = snow_for(SC.pack_cobjs(plat))

    # cells over the footprint: the platform top records ~1.5; the steep
    # ramp sheds flakes, so recorded heights stay near the ground
    gx1 = int(0.35 * W.dx_inv + 24)
    gx2 = int(0.75 * W.dx_inv + 24)
    over_r = sz_r[20:28, gx1:gx2].mean()
    over_p = sz_p[20:28, gx1:gx2].mean()
    assert over_p > 1.3, over_p
    assert over_r < over_p - 1.0, (over_r, over_p)
    # far-field ground records the mesh height in both
    assert abs(sz_r[5, 5] - (-1.0)) < 0.1


def test_float_downstream_drifts_toward_spill():
    """float_downstream (Water.cpp:1245-1260): floats in a spilling
    basin drift toward the basin's spill saddle; non-spilling basins
    don't drift."""
    import numpy as np
    import jax.numpy as jnp
    from w3d.water import valleys as WV
    from w3d.utils.constants import WorldConst

    W = WorldConst(mesh_x=32, mesh_y=32)
    # two clean valleys with minima at x=8 and x=24, saddle at x=16
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    m = (np.minimum(np.abs(xx - 8), np.abs(xx - 24)) * 0.1
         + 0.001 * np.abs(yy - 16)).astype(np.float32)
    mesh = jnp.asarray(m)
    labels = WV.watershed_labels(mesh)
    sx, sy, sz = WV.basin_spill_points(mesh, labels)
    lab0 = int(np.asarray(labels).reshape(32, 32)[16, 10])
    assert np.isfinite(sz[lab0])
    assert abs(sz[lab0] - 0.8) < 0.1       # the x=16 ridge
    # water above the saddle -> spilling
    water = jnp.full((32, 32), 0.9, jnp.float32)
    flow = np.zeros(len(sx), np.float32)
    flow[lab0] = 500.0
    px = jnp.asarray([(10 - 16) * W.dx])
    py = jnp.asarray([0.0])
    pz = jnp.asarray([0.88])
    rad = jnp.asarray([0.01])
    dx, dy = WV.float_downstream(px, py, pz, rad, labels, water, mesh,
                                 sx, sy, sz, jnp.asarray(flow), W)
    assert float(dx[0]) > 0.0          # drifts toward the +x saddle
    # no flow -> no drift
    dx2, _ = WV.float_downstream(px, py, pz, rad, labels, water, mesh,
                                 sx, sy, sz, jnp.zeros(len(sx)), W)
    assert float(dx2[0]) == 0.0


def test_ground_frame_diffuses_smoke():
    """The ground frame loop steps smoke diffusion over the lmcell grid
    each frame (distribute_smoke, smoke.cpp:184; display loop)."""
    from w3d.models.world import ground_frames_chained
    from w3d.gameplay import player as PL
    from w3d.models import physics_model as PM
    from w3d.utils.constants import WorldConst
    world = WorldConst(mesh_x=32, mesh_y=32, mesh_z=8)
    sw = PM.build_spheres_world(num_objects=32, world=world)
    from w3d.water import ripples as WRp
    rip = WRp.make_ripples(32, 32)
    ply = PL.make_player(0.0, 0.0, 1.0)
    smoke = jnp.zeros((8, 32, 32)).at[2, 16, 16].set(10.0)
    mv = jnp.zeros((4, 2))
    out = ground_frames_chained(sw.state, sw.env, sw.cobjs, sw.table, rip,
                                ply, mv, world, 4, substeps=1,
                                obj_collisions=False, smoke=smoke)
    st, rip2, ply2, live, smoke2 = out
    s2 = np.asarray(smoke2)
    assert s2[2, 16, 16] < 10.0                  # source diffused away
    assert (s2 > 0).sum() > 1                    # spread to neighbors
    assert s2.sum() <= 10.0 + 1e-3               # no creation
