"""Physics fidelity: the batched TPU step vs the scalar reference oracle
(tests/oracle_physics.py, transcribed from Physics.cpp:716-1409), plus the
banded broad-phase miss-rate audit (BASELINE.md fidelity clause: "object
trajectories comparable to the C++ reference within tolerance")."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.physics import types as PT, step as PS
from w3d.physics.cobjs import empty_cobjs
from w3d.utils.constants import WorldConst

import oracle_physics as OP

TABLE = PT.make_type_table()
BALL = PT.type_id("BALL")
WORLD = WorldConst()


def _wavy_mesh(world, amp=0.3, rough=2.0):
    my, mx = world.mesh_y, world.mesh_x
    yy, xx = np.meshgrid(np.arange(my), np.arange(mx), indexing="ij")
    z = (amp * np.sin(rough * 2 * np.pi * xx / mx)
         * np.cos(rough * 2 * np.pi * yy / my) - 0.5)
    return z.astype(np.float32)


def _env(mesh, wpz=-100.0, wind=(0.4, 0.2, 0.0)):
    return PS.PhysicsEnv(
        mesh_height=jnp.asarray(mesh), water_plane_z=jnp.float32(wpz),
        wind=jnp.asarray(wind, jnp.float32), temperature=jnp.float32(20.0),
        base_gravity=jnp.float32(1.0), zmin=jnp.float32(-WORLD.z_scene))


def _run_batched(pos, vel, env, frames, substeps=1):
    st = PS.make_state(pos, vel, np.full(len(pos), BALL), TABLE)
    for _ in range(frames):
        st = PS.step_objects(st, env, None, TABLE, substeps=substeps,
                             world=WORLD, obj_collisions=False)
    return st


def _run_oracle(pos, vel, env_np, mesh, frames):
    objs = [OP.OracleObj(pos=np.array(p, np.float32),
                         vel=np.array(v, np.float32)) for p, v in zip(pos, vel)]
    tp = OP.TypeParams.from_table(TABLE, BALL)
    for _ in range(frames):
        for o in objs:
            OP.advance_object(o, env_np, tp, mesh, WORLD)
    return objs


def test_ballistic_agreement_pre_contact():
    """Before any surface contact the batched integrator and the reference
    transcription agree to float32 roundoff."""
    mesh = np.full((WORLD.mesh_y, WORLD.mesh_x), -2.0, np.float32)
    rng = np.random.default_rng(3)
    n = 32
    pos = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                    rng.uniform(1.0, 2.0, n)], 1).astype(np.float32)
    vel = rng.normal(0, 0.8, (n, 3)).astype(np.float32)
    env = _env(mesh)
    env_np = OP.OracleEnv(wind=np.array([0.4, 0.2, 0.0], np.float32),
                          water_plane_z=-100.0, zmin=-WORLD.z_scene)
    frames = 12   # stays airborne (fall < 0.5 units)
    st = _run_batched(pos, vel, env, frames)
    objs = _run_oracle(pos, vel, env_np, mesh, frames)
    ref = np.array([o.pos for o in objs])
    got = np.stack([np.asarray(st.px), np.asarray(st.py), np.asarray(st.pz)], 1)
    assert all(o.status == 1 for o in objs)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)
    refv = np.array([o.vel for o in objs])
    gotv = np.stack([np.asarray(st.vx), np.asarray(st.vy), np.asarray(st.vz)], 1)
    np.testing.assert_allclose(gotv, refv, atol=5e-4, rtol=1e-4)


def test_bounce_heights_match_oracle():
    """A dropped ball's first bounce apexes match the transcription within
    2% (same LAND_ELASTICITY * type elasticity chain and BOUNCE_CUTOFF)."""
    mesh = np.full((WORLD.mesh_y, WORLD.mesh_x), -1.0, np.float32)
    pos = np.array([[0.1, 0.1, 1.5]], np.float32)
    vel = np.array([[0.0, 0.0, 0.0]], np.float32)
    env = _env(mesh, wind=(0.0, 0.0, 0.0))
    env_np = OP.OracleEnv(wind=np.zeros(3, np.float32), water_plane_z=-100.0,
                          zmin=-WORLD.z_scene)

    def apexes(zs):
        out = []
        for i in range(1, len(zs) - 1):
            if zs[i] > zs[i - 1] and zs[i] >= zs[i + 1]:
                out.append(zs[i])
        return out

    st = PS.make_state(pos, vel, np.array([BALL]), TABLE)
    zs_b = []
    for _ in range(500):
        st = PS.step_objects(st, env, None, TABLE, substeps=1,
                             world=WORLD, obj_collisions=False)
        zs_b.append(float(st.pz[0]))
    o = OP.OracleObj(pos=pos[0].copy(), vel=vel[0].copy())
    tp = OP.TypeParams.from_table(TABLE, BALL)
    zs_o = []
    for _ in range(500):
        OP.advance_object(o, env_np, tp, mesh, WORLD)
        zs_o.append(float(o.pos[2]))
    a_b, a_o = apexes(zs_b), apexes(zs_o)
    assert len(a_b) >= 2 and len(a_o) >= 2
    for hb, ho in zip(a_b[:3], a_o[:3]):
        np.testing.assert_allclose(hb, ho, rtol=0.02)
    # both end settled at the surface (mesh + radius)
    rad = float(np.asarray(TABLE.radius)[BALL])
    np.testing.assert_allclose(zs_b[-1], -1.0 + rad, atol=1e-3)
    np.testing.assert_allclose(zs_o[-1], -1.0 + rad, atol=1e-3)


def test_water_entry_matches_oracle():
    """Balls dropped into water: damped entry velocity and float/sink state
    match the check_water_collision transcription."""
    mesh = np.full((WORLD.mesh_y, WORLD.mesh_x), -2.0, np.float32)
    rng = np.random.default_rng(11)
    n = 16
    pos = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    np.full(n, 0.5)], 1).astype(np.float32)
    vel = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                    np.full(n, -3.0)], 1).astype(np.float32)
    env = _env(mesh, wpz=-0.5, wind=(0.0, 0.0, 0.0))
    env_np = OP.OracleEnv(wind=np.zeros(3, np.float32), water_plane_z=-0.5,
                          zmin=-WORLD.z_scene)
    frames = 40
    st = _run_batched(pos, vel, env, frames)
    objs = _run_oracle(pos, vel, env_np, mesh, frames)
    in_water_o = np.array([bool(o.flags & OP.FL_IN_WATER) for o in objs])
    in_water_b = (np.asarray(st.flags) & PT.FL_IN_WATER) != 0
    assert in_water_o.all()
    assert in_water_b.all()
    # final heights agree within a radius (both floating/sunk consistently)
    ref_z = np.array([o.pos[2] for o in objs])
    np.testing.assert_allclose(np.asarray(st.pz), ref_z, atol=0.06)


def test_deep_water_buoyancy_and_sinking_match_oracle():
    """Slow objects released deep underwater follow the reference's
    branch structure (Physics.cpp:774-785, 861-867, 1117-1151): a deep
    floater (BALL, density 0.7) rises in accelerating buoyant steps —
    the water branch sets Z_STOPPED but the no-cobj-collision clear
    (:861) and the water-handled flag reset (:865) release it every
    frame, so vz accumulates until the fast branch's float entry zeroes
    it and the cycle repeats.  NO one-tick teleport to the surface.  A
    sinker (ROCK) damps velocity by dens/(dens+WATER) per frame instead
    of teleporting to the lake bed."""
    mesh = np.full((WORLD.mesh_y, WORLD.mesh_x), -3.0, np.float32)
    wpz = 0.0
    env = _env(mesh, wpz=wpz, wind=(0.0, 0.0, 0.0))
    env_np = OP.OracleEnv(wind=np.zeros(3, np.float32), water_plane_z=wpz,
                          zmin=-WORLD.z_scene)
    rock = PT.type_id("ROCK")
    types = np.array([BALL, rock])
    pos = np.array([[0.0, 0.0, -2.0], [0.5, 0.5, -1.0]], np.float32)
    vel = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, -0.4]], np.float32)

    st = PS.make_state(pos, vel, types, TABLE)
    z_hist = []
    for _ in range(60):
        st = PS.step_objects(st, env, None, TABLE, substeps=1,
                             world=WORLD, obj_collisions=False)
        z_hist.append(np.asarray(st.pz).copy())
    z_hist = np.stack(z_hist)

    # oracle twins
    objs = []
    for p, v, t in zip(pos, vel, types):
        o = OP.OracleObj(pos=np.array(p, np.float32),
                         vel=np.array(v, np.float32))
        objs.append((o, OP.TypeParams.from_table(TABLE, int(t))))
    zo_hist = []
    for _ in range(60):
        for o, tp in objs:
            OP.advance_object(o, env_np, tp, mesh, WORLD)
        zo_hist.append([o.pos[2] for o, _ in objs])
    zo_hist = np.asarray(zo_hist)

    # floater: rises gradually; at least 5 frames strictly below the
    # final float height on BOTH paths (no one-tick teleport)
    rad = float(np.asarray(TABLE.radius)[BALL])
    float_z = wpz + rad * (1.0 - 2.0 * 0.7)
    assert (z_hist[:5, 0] < float_z - 0.1).all()
    assert (zo_hist[:5, 0] < float_z - 0.1).all()
    # deep floater: substantial gradual rise, no single-tick teleport
    assert z_hist[-1, 0] > z_hist[0, 0] + 0.1
    assert np.max(np.diff(z_hist[:, 0])) < 0.1      # no tick jumps > 0.1
    # kernel tracks the oracle through the whole staircase rise
    np.testing.assert_allclose(z_hist[:, 0], zo_hist[:, 0], atol=2e-3)
    np.testing.assert_allclose(float(np.asarray(st.vz)[0]),
                               objs[0][0].vel[2], atol=1e-4)
    # sinker: no teleport to the bottom; velocity-damped descent
    rock_ground = -3.0 + float(np.asarray(TABLE.radius)[rock])
    assert (z_hist[:5, 1] > rock_ground + 0.2).all()
    np.testing.assert_allclose(z_hist[:, 1], zo_hist[:, 1], atol=2e-2)


def test_settling_statistics_on_wavy_mesh():
    """After bounces (chaotic divergence), population statistics must still
    agree: settled fraction and mean resting height within tolerance."""
    mesh = _wavy_mesh(WORLD)
    rng = np.random.default_rng(7)
    n = 48
    pos = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                    rng.uniform(0.5, 1.5, n)], 1).astype(np.float32)
    vel = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    env = _env(mesh, wind=(0.0, 0.0, 0.0))
    env_np = OP.OracleEnv(wind=np.zeros(3, np.float32), water_plane_z=-100.0,
                          zmin=-WORLD.z_scene)
    frames = 400
    st = _run_batched(pos, vel, env, frames)
    objs = _run_oracle(pos, vel, env_np, mesh, frames)
    alive_o = np.array([o.status != 0 for o in objs])
    alive_b = np.asarray(st.status) != 0
    # similar survival (objects can roll off the mesh edge)
    assert abs(alive_o.mean() - alive_b.mean()) <= 0.15
    z_o = np.array([o.pos[2] for o in objs])[alive_o]
    z_b = np.asarray(st.pz)[alive_b]
    assert abs(z_o.mean() - z_b.mean()) < 0.1
    # settled objects rest ~radius above the surface in both
    done_o = np.array([o.status == 4 for o in objs])
    done_b = np.asarray(st.status) == 4
    assert abs(done_o.mean() - done_b.mean()) <= 0.25


@pytest.mark.slow
def test_block_pair_pass_is_exact_at_10k():
    """Broad-phase audit (VERDICT task 3): the PRODUCTION pair pass (block
    all-pairs over the x-sorted order) must match the exact all-pairs
    deltas at config_spheres density (< 0.1% missed contacts; measured 0
    — max x-sorted rank distance of a contact is 247 < PAIR_WINDOW=384)."""
    rng = np.random.default_rng(0)
    n = 10000
    rad = jnp.full(n, float(np.asarray(TABLE.radius)[BALL]))
    mass = jnp.ones(n)
    elas = jnp.full(n, 0.5)
    active = jnp.ones(n, bool)
    # settled-pile density: objects within a 4x4 area near the ground
    px = jnp.asarray(rng.uniform(-2, 2, n).astype(np.float32))
    py = jnp.asarray(rng.uniform(-2, 2, n).astype(np.float32))
    pz = jnp.asarray(rng.uniform(-0.7, -0.5, n).astype(np.float32))
    vx = jnp.asarray(rng.normal(0, 0.5, n).astype(np.float32))
    vy = jnp.asarray(rng.normal(0, 0.5, n).astype(np.float32))
    vz = jnp.asarray(rng.normal(0, 0.5, n).astype(np.float32))

    # the production pass assumes x-sorted order (spatial_sort key='x')
    order = np.argsort(np.asarray(px), kind="stable")
    px, py, pz = px[order], py[order], pz[order]
    vx, vy, vz = vx[order], vy[order], vz[order]

    exact = PS.sphere_pair_collisions(px, py, pz, vx, vy, vz, rad, mass,
                                      elas, active)
    # the scene is genuinely contact-dense
    n_contacts = int((np.asarray(exact[0]) != 0).sum())
    assert n_contacts > 2000

    # window audit: every contact's x-sorted rank distance < PAIR_WINDOW
    pxn = np.asarray(px)
    rsum = 2 * float(np.asarray(rad)[0])
    hi = np.searchsorted(pxn, pxn + rsum, side="right")
    max_span = int((hi - np.arange(n)).max())
    assert max_span < PS.PAIR_WINDOW, max_span

    def check(got, label, miss_cap=1e-3):
        for k in range(6):
            e = np.asarray(exact[k])
            g = np.asarray(got[k])
            # a genuinely missed contact changes the delta by a whole-
            # contact magnitude (~1e-2..1e-1); the all-pairs reference
            # itself carries ~1e-4 noise from its Gram-identity d2
            # (x2+x2-2G at |p|~2 against a 0.08 feature scale)
            missed = (np.abs(e - g) > 0.05 * np.abs(e) + 1e-4).sum()
            assert missed / n <= miss_cap, (label, k, missed, n)

    blockp = PS.block_pair_collisions(px, py, pz, vx, vy, vz, rad, mass,
                                      elas, active, block=PS.PAIR_WINDOW)
    check(blockp, "block")

    grid = PS.grid_pair_collisions(px, py, pz, vx, vy, vz, rad, mass, elas,
                                   active, cell=PS.PAIR_CELL,
                                   half_extent=2.0 * WORLD.x_scene)
    check(grid, "grid")
    # no grid bucket overflow: raising K must not change the result (up to
    # the f32 reduction-order noise of the wider candidate matrix)
    grid_k24 = PS.grid_pair_collisions(px, py, pz, vx, vy, vz, rad, mass,
                                       elas, active, cell=PS.PAIR_CELL,
                                       half_extent=2.0 * WORLD.x_scene, K=24)
    for k in range(6):
        np.testing.assert_allclose(np.asarray(grid[k]),
                                   np.asarray(grid_k24[k]), atol=1e-6)
