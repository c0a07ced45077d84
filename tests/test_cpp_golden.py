"""Cross-validation against the COMPILED C++ reference.

Closes the self-referential-goldens loop (round-2 verdict): the repo's
transcribed oracles are themselves validated here, bit-for-bit, against
the actual reference implementation compiled from /root/reference/src
(never copied into this repo — tests/cpp/erosion_harness.cpp is our own
driver that links the reference translation unit via stub GL headers).

erode_reference_strict reproduces erosion.cpp bitwise INCLUDING its NaN
defect chain (rock multiplier applied after the dh*0.99 clamp ->
sqrtf(negative) -> NaN droplet -> min_zval laundering); see its
docstring.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

import w3d  # noqa: F401
from w3d.ops.erosion import (erode_reference, erode_reference_strict,
                             ErosionParams)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
CPP_DIR = os.path.join(REPO, "tests", "cpp")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not os.path.isdir(REF_SRC),
    reason="g++ or reference tree unavailable")


@pytest.fixture(scope="session")
def harness(tmp_path_factory):
    out = tmp_path_factory.mktemp("cppbin") / "erosion_harness"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-ffp-contract=off",
         "-I", os.path.join(CPP_DIR, "glstub"), "-I", REF_SRC,
         os.path.join(CPP_DIR, "erosion_harness.cpp"),
         os.path.join(REF_SRC, "erosion.cpp"),
         "-o", str(out)],
        check=True, capture_output=True)
    return str(out)


def _terrain(xs=96, ys=96, seed=42):
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.linspace(-2, 2, xs), np.linspace(-2, 2, ys))
    return (0.4 * np.exp(-(x ** 2 + y ** 2) / 1.5)
            + 0.05 * np.sin(3 * x) * np.cos(2 * y)
            + 0.02 * rng.standard_normal((ys, xs))).astype(np.float32)


def _run_cpp(harness, hm, iters, min_z=-1.0, ea=1.0, wpz=-1e9, tmp="/tmp",
             **env_over):
    ys, xs = hm.shape
    fin = os.path.join(tmp, "eh_in.f32")
    fout = os.path.join(tmp, "eh_out.f32")
    hm.astype(np.float32).tofile(fin)
    env = dict(os.environ, **{k: str(v) for k, v in env_over.items()})
    subprocess.run([harness, fin, str(xs), str(ys), str(min_z), str(iters),
                    str(ea), str(wpz), fout], check=True, env=env)
    return np.fromfile(fout, np.float32).reshape(ys, xs)


def test_strict_oracle_bitwise(harness, tmp_path):
    """50 droplets, default params: bit-for-bit equality."""
    hm = _terrain()
    cpp = _run_cpp(harness, hm, 50, tmp=str(tmp_path))
    py = erode_reference_strict(hm.copy(), 50, ErosionParams(),
                                min_zval=-1.0)
    assert np.array_equal(cpp.view(np.int32), py.view(np.int32))


def test_strict_oracle_bitwise_rock_and_ocean(harness, tmp_path):
    """Rock-hardening + ocean-cutoff branches exercised, still bitwise."""
    hm = _terrain(seed=7)
    params = ErosionParams(water_plane_z=0.02, half_dxy=0.01,
                           zmin=float(hm.min()), zmax=float(hm.max()),
                           rock_thresh=0.6, relh_adj_tex=0.0)
    cpp = _run_cpp(harness, hm, 80, wpz=0.02, tmp=str(tmp_path),
                   EH_HALF_DXY=0.01, EH_ZMIN=params.zmin,
                   EH_ZMAX=params.zmax, EH_CLIP_HD1=0.6, EH_RELH_ADJ=0.0)
    py = erode_reference_strict(hm.copy(), 80, params, min_zval=-1.0)
    assert np.array_equal(cpp.view(np.int32), py.view(np.int32))


@pytest.mark.slow
def test_strict_oracle_bitwise_long(harness, tmp_path):
    """400 droplets — NaN droplets occur and are reproduced exactly."""
    hm = _terrain()
    cpp = _run_cpp(harness, hm, 400, tmp=str(tmp_path))
    py = erode_reference_strict(hm.copy(), 400, ErosionParams(),
                                min_zval=-1.0)
    assert np.array_equal(cpp.view(np.int32), py.view(np.int32))
    # the defect chain actually fired: some cells were NaN-laundered
    assert (cpp == np.float32(-1.0)).any()


def test_guarded_oracle_matches_cpp_before_nan(harness, tmp_path):
    """The float64 guarded oracle (used by kernel fidelity tests) tracks
    the C++ closely while no droplet has NaN'd (first divergence on this
    terrain is droplet 5; see erode_reference_strict docstring)."""
    hm = _terrain()
    cpp = _run_cpp(harness, hm, 5, tmp=str(tmp_path))
    py = erode_reference(hm.copy(), 5, ErosionParams(), min_zval=-1.0)
    np.testing.assert_allclose(cpp, py, atol=1e-5)


# ---------------------------------------------------------------------------
# physics: dwobject::advance_object vs tests/oracle_physics.py
# ---------------------------------------------------------------------------

# flag-bit mapping: reference physics_objects.h:492-505 -> physics/types.py
# (the repo renumbers flag bits; values are semantic, the numbering is not)
_REF2REPO_FLAGS = ((0x01, 8), (0x04, 4), (0x08, 32), (0x10, 64), (0x40, 16),
                   (0x0400, 2), (0x0800, 1))


def _map_ref_flags(f):
    f = f.astype(np.int64)
    out = np.zeros_like(f)
    for rb, pb in _REF2REPO_FLAGS:
        out |= np.where((f & rb) != 0, pb, 0)
    return out


@pytest.fixture(scope="session")
def phys_harness(tmp_path_factory):
    out = tmp_path_factory.mktemp("cppbin") / "physics_harness"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-ffp-contract=off",
         "-I", os.path.join(CPP_DIR, "glstub"), "-I", REF_SRC,
         os.path.join(CPP_DIR, "physics_harness.cpp"),
         os.path.join(REF_SRC, "Physics.cpp"),
         "-o", str(out)],
        check=True, capture_output=True)
    return str(out)


def _run_phys(harness, mesh, pos, vel, steps, tp, env_o, tstep, tmp):
    """Drive the compiled reference integrator; returns [steps, n, 8]
    (pos3, vel3, status, flags-mapped-to-repo-bits)."""
    import w3d  # noqa: F401
    from w3d.utils.constants import WorldConst
    world = WorldConst()
    ys, xs = mesh.shape
    n = pos.shape[0]
    fm = os.path.join(tmp, "ph_mesh.f32")
    fo = os.path.join(tmp, "ph_obj.f32")
    ft = os.path.join(tmp, "ph_traj.f32")
    mesh.astype(np.float32).tofile(fm)
    obj = np.zeros((n, 8), np.float32)
    obj[:, 0:3] = pos
    obj[:, 3:6] = vel
    obj[:, 6] = 1
    obj.tofile(fo)
    env = dict(os.environ,
               PH_TSTEP=str(tstep), PH_WPZ=str(env_o.water_plane_z),
               PH_ZMIN=str(env_o.zmin),
               PH_BASE_GRAVITY=str(env_o.base_gravity),
               PH_WIND_X=str(float(env_o.wind[0])),
               PH_WIND_Y=str(float(env_o.wind[1])),
               PH_WIND_Z=str(float(env_o.wind[2])),
               PH_RADIUS=str(tp.radius), PH_AIR=str(tp.air_factor),
               PH_FRICTION=str(tp.friction), PH_ELAS=str(tp.elasticity),
               PH_GRAV=str(tp.gravity), PH_DENS=str(tp.density),
               PH_TERMV=str(tp.terminal_vel), PH_LIFE=str(tp.lifetime),
               PH_XSS=str(world.x_scene), PH_YSS=str(world.y_scene))
    subprocess.run([harness, fm, str(xs), str(ys), str(steps), fo, str(n), ft],
                   check=True, env=env)
    out = np.fromfile(ft, np.float32).reshape(steps, n, 8)
    out[:, :, 7] = _map_ref_flags(out[:, :, 7]).astype(np.float32)
    return out


def _run_oracle(mesh, pos, vel, steps, tp, env_o, tstep):
    import oracle_physics as OP
    from w3d.utils.constants import WorldConst
    world = WorldConst()
    n = pos.shape[0]
    objs = [OP.OracleObj(pos=pos[i].copy(), vel=vel[i].copy(), status=1)
            for i in range(n)]
    out = np.zeros((steps, n, 8), np.float32)
    for s in range(steps):
        for i, o in enumerate(objs):
            if o.status != 0:
                OP.advance_object(o, env_o, tp, mesh, world, tstep=tstep)
            out[s, i, 0:3] = o.pos
            out[s, i, 3:6] = o.vel
            out[s, i, 6] = o.status
            out[s, i, 7] = o.flags
    return out


def _phys_setup(dens=0.6, elas=0.8, wpz=-10.0, seed=5, n=16):
    import oracle_physics as OP
    from w3d.physics import types as T
    tp = OP.TypeParams(radius=0.04, air_factor=0.05, friction=0.01,
                       gravity=1.0, elasticity=elas, density=dens,
                       terminal_vel=10.0, lifetime=1000000)
    env_o = OP.OracleEnv(wind=np.zeros(3, np.float32), water_plane_z=wpz,
                         base_gravity=1.0, zmin=-4.0)
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                    rng.uniform(0.6, 2.0, n)], 1).astype(np.float32)
    vel = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    return tp, env_o, pos, vel, float(T.DEF_TIMESTEP)


def test_physics_oracle_bitwise_dry(phys_harness, tmp_path):
    """Airborne fall -> mesh bounce -> damped settle on a flat mesh:
    bit-for-bit against the compiled reference integrator (200 steps x 16
    objects; the flat mesh removes the declared normal-model redesign, so
    every gravity/terminal/air/bounce/status transition must agree)."""
    from w3d.utils.constants import WorldConst
    world = WorldConst()
    mesh = np.zeros((world.mesh_y, world.mesh_x), np.float32)
    tp, env_o, pos, vel, ts = _phys_setup()
    cpp = _run_phys(phys_harness, mesh, pos, vel, 200, tp, env_o, ts,
                    str(tmp_path))
    py = _run_oracle(mesh, pos, vel, 200, tp, env_o, ts)
    assert np.array_equal(cpp.view(np.int32), py.view(np.int32))


@pytest.mark.parametrize("dens", [0.6, 1.0, 1.5])
def test_physics_oracle_bitwise_water(phys_harness, tmp_path, dens):
    """check_water_collision float/neutral/sink branches, flat mesh under
    a flat water plane at z=0.5: bit-for-bit (incl. Z_STOPPED under-surface
    gravity, FLOATING placement at zpos+SMALL_NUMBER, underwater ground
    stop, and the fast-entry damping/skip logic)."""
    from w3d.utils.constants import WorldConst
    world = WorldConst()
    mesh = np.zeros((world.mesh_y, world.mesh_x), np.float32)
    tp, env_o, pos, vel, ts = _phys_setup(dens=dens, wpz=0.5, seed=11, n=12)
    cpp = _run_phys(phys_harness, mesh, pos, vel, 300, tp, env_o, ts,
                    str(tmp_path))
    py = _run_oracle(mesh, pos, vel, 300, tp, env_o, ts)
    assert np.array_equal(cpp.view(np.int32), py.view(np.int32))


def test_physics_oracle_slope_rolling_tracks(phys_harness, tmp_path):
    """Rolling on a gaussian hill (elasticity 0, no bounces): the repo's
    interpolated central-difference normals are a declared redesign vs the
    reference's per-cell quad-blend normals (oracle_physics docstring), so
    trajectories drift smoothly instead of matching bitwise — assert
    bounded drift and an identical status machine."""
    from w3d.utils.constants import WorldConst
    world = WorldConst()
    xs, ys = world.mesh_x, world.mesh_y
    gx, gy = np.meshgrid(np.arange(xs), np.arange(ys))
    mesh = (0.3 * np.exp(-(((gx - xs / 2) * world.dx) ** 2
                           + ((gy - ys / 2) * world.dy) ** 2) / 1.2)
            ).astype(np.float32)
    tp, env_o, _, _, ts = _phys_setup(elas=0.0, seed=4, n=12)
    rng = np.random.default_rng(4)
    pos = np.stack([rng.uniform(-1, 1, 12), rng.uniform(-1, 1, 12),
                    rng.uniform(0.5, 0.8, 12)], 1).astype(np.float32)
    vel = np.zeros((12, 3), np.float32)
    cpp = _run_phys(phys_harness, mesh, pos, vel, 200, tp, env_o, ts,
                    str(tmp_path))
    py = _run_oracle(mesh, pos, vel, 200, tp, env_o, ts)
    assert np.array_equal(cpp[:, :, 6], py[:, :, 6])        # status machine
    err = np.abs(cpp[:, :, :3] - py[:, :, :3]).max(axis=(1, 2))
    assert float(err[49]) < 0.01                            # 50 steps
    assert float(err.max()) < 0.1                           # 200 steps


def test_ice_branch_kernel_vs_cpp(phys_harness, tmp_path):
    """Frozen water (the one water path outside the oracle's scope,
    Physics.cpp:1197-1218): the BATCHED KERNEL is compared directly to
    the compiled reference.  Low-elasticity objects must stick to the
    ice surface at wpz + radius + SMALL_NUMBER with status 4; final
    resting heights agree to 1e-4."""
    import jax.numpy as jnp
    import oracle_physics as OP
    from w3d.physics import step as PS, types as PT
    from w3d.utils.constants import WorldConst

    world = WorldConst()
    mesh = np.zeros((world.mesh_y, world.mesh_x), np.float32)
    wpz = 0.5
    n = 8
    rng = np.random.default_rng(3)
    pos = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                    rng.uniform(1.0, 1.5, n)], 1).astype(np.float32)
    vel = np.zeros((n, 3), np.float32)
    tp = OP.TypeParams(radius=0.04, air_factor=0.05, friction=0.01,
                       gravity=1.0, elasticity=0.2, density=0.6,
                       terminal_vel=10.0, lifetime=1000000)
    env_o = OP.OracleEnv(wind=np.zeros(3, np.float32), water_plane_z=wpz,
                         base_gravity=1.0, zmin=-4.0)
    steps = 250
    ts = float(PT.DEF_TIMESTEP)
    # compiled reference, temperature below freezing
    os.environ["PH_TEMP"] = "-5.0"
    try:
        cpp = _run_phys(phys_harness, mesh, pos, vel, steps, tp, env_o,
                        ts, str(tmp_path))
    finally:
        del os.environ["PH_TEMP"]
    # every object froze onto the ice surface
    assert (cpp[-1, :, 6] == 4).all()
    np.testing.assert_allclose(cpp[-1, :, 2], wpz + 0.04 + 0.001,
                               atol=1e-5)

    # batched kernel on the same scenario (temperature drives the ice
    # branch; one substep per reference frame)
    table = PT.make_type_table()
    # a low-elasticity type (< ICE_BOUNCE_ELAS) so the kernel's objects
    # stick rather than keep bouncing (BALL's 0.92 elasticity bounces on
    # ice in both implementations)
    el = np.asarray(table.elasticity)
    rad_t = np.asarray(table.radius)
    bid = int(np.argmax((el > 0) & (el < 0.35) & (rad_t > 0.01)))
    assert 0.0 < el[bid] < 0.4
    penv = PS.PhysicsEnv(
        mesh_height=jnp.asarray(mesh),
        water_plane_z=jnp.float32(wpz),
        wind=jnp.zeros(3, jnp.float32),
        temperature=jnp.float32(-5.0),
        base_gravity=jnp.float32(1.0),
        zmin=jnp.float32(-4.0))
    st = PS.make_state(pos.copy(), vel.copy(), np.full(n, bid), table)
    # BALL's table radius/elasticity differ from tp; override via arrays
    for _ in range(steps):
        st = PS.step_objects(st, penv, None, table, tstep=ts, substeps=1,
                             world=world, obj_collisions=False)
    kz = np.asarray(st.pz)
    ks = np.asarray(st.status)
    assert (ks == 4).all()
    rad_ball = float(np.asarray(table.radius)[bid])
    np.testing.assert_allclose(kz, wpz + rad_ball + 0.001, atol=1e-4)


# ---------------------------------------------------------------------------
# noise: sine-table generation + evaluation vs compiled mesh_gen.cpp
# ---------------------------------------------------------------------------

@pytest.fixture(scope="session")
def noise_harness(tmp_path_factory):
    out = tmp_path_factory.mktemp("cppbin") / "noise_harness"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-ffp-contract=off",
         "-I", os.path.join(CPP_DIR, "glstub"), "-I", REF_SRC,
         os.path.join(CPP_DIR, "noise_harness.cpp"),
         os.path.join(REF_SRC, "mesh_gen.cpp"),
         "-o", str(out)],
        check=True, capture_output=True)
    return str(out)


def _run_noise(harness, seed, nx, ny, tmp, mesh_height=0.10):
    from w3d.utils.constants import WorldConst
    world = WorldConst()
    ft = os.path.join(tmp, "nh_t.f32")
    fh = os.path.join(tmp, "nh_h.f32")
    env = dict(os.environ, NH_SEED=str(seed),
               NH_MESH_X=str(world.mesh_x), NH_MESH_Y=str(world.mesh_y),
               NH_XSS=str(world.x_scene), NH_YSS=str(world.y_scene),
               NH_MESH_HEIGHT=str(mesh_height))
    subprocess.run([harness, str(nx), str(ny), ft, fh], check=True, env=env)
    return (np.fromfile(ft, np.float32).reshape(90, 5),
            np.fromfile(fh, np.float32).reshape(ny, nx))


@pytest.mark.parametrize("seed", [3, 17])
def test_sine_table_bitwise(noise_harness, tmp_path, seed):
    """gen_rand_sine_table_entries (mesh_gen.cpp:219-254) bit-for-bit:
    the 450-draw LCG stream AND every f32 rounding step (rand_uniform's
    f32 lerp, iterated f32 mags/freqs, the f32 TWO_PI products)."""
    from w3d.ops import noise as N
    from w3d.utils.constants import WorldConst
    cpp_t, _ = _run_noise(noise_harness, seed, 8, 8, str(tmp_path))
    tab = N.gen_sine_table(WorldConst(), mesh_seed=seed, scaled_height=0.10)
    py_t = np.stack([np.asarray(tab.mag), np.asarray(tab.phase_y),
                     np.asarray(tab.phase_x), np.asarray(tab.freq_y),
                     np.asarray(tab.freq_x)], 1)
    assert np.array_equal(cpp_t.view(np.int32), py_t.view(np.int32))


def _sinf_approx_table():
    """The reference's quantized sin lookup (sinf.h:8-20 + mesh_gen.cpp
    create_sin_table): 32768 f32 entries, truncating index."""
    TSIZE = 1 << 15
    two_pi = np.float32(2.0 * np.pi)
    sscale = np.float32(TSIZE) / two_pi
    tab = np.sin((np.arange(TSIZE) / sscale).astype(np.float32)
                 ).astype(np.float32)
    return tab, sscale, TSIZE


def test_sine_heights_bitwise_vs_quantized_model(noise_harness, tmp_path):
    """gen_mesh_sine_table heights (build_arrays/eval_index,
    mesh_gen.cpp:588-660, 754-780) reproduced to 1-2 ulps by a numpy
    model of the same f32 chain INCLUDING the reference's quantized
    SINF lookup and the start_eval_sin octave filter (the only residual
    is glibc sinf vs numpy sin in the 32768-entry table, ~half the
    cells bit-exact); the repo's exact-sin evaluator then matches
    within the table's quantization bound."""
    import jax.numpy as jnp
    from w3d.ops import noise as N
    from w3d.utils.constants import WorldConst
    world = WorldConst()
    nx = ny = world.mesh_x
    cpp_t, cpp_h = _run_noise(noise_harness, 3, nx, ny, str(tmp_path))
    F = np.float32
    stab, sscale, TSIZE = _sinf_approx_table()

    def sinf_approx(v):
        idx = (np.int64(sscale * np.abs(v)) & (TSIZE - 1))
        return np.where(v < 0, -stab[idx], stab[idx]).astype(np.float32)

    # build_arrays f32 chain (x0 = -nx/2, y0 = -ny/2; dx/dy = DX/DY_VAL)
    x0, y0 = F(-(nx // 2)), F(-(ny // 2))
    dx, dy = F(world.dx), F(world.dy)
    mx0, my0 = dx * x0, dy * y0
    msx = F(1.0) * F(world.dx_inv)
    msy = F(1.0) * F(world.dy_inv)
    ms2 = F(0.5 * 1.0)
    # compute_scale: start_eval_sin = 20 at mesh_scale=1 (the low
    # octaves are filtered out, mesh_gen.cpp:544-548)
    start = N.start_eval_sin(1.0)
    assert start == 20
    xterms = np.zeros((nx, 90), np.float32)
    yterms = np.zeros((ny, 90), np.float32)
    for k in range(start, 90):
        mag, pyh, pxh, fy, fx = cpp_t[k]
        x_mult = msx * fx
        y_mult = msy * fy
        y_scale = F(1.0) * mag
        x_const = ms2 * fx + pxh + x_mult * mx0
        y_const = ms2 * fy + pyh + y_mult * my0
        i = np.arange(nx, dtype=np.float32)
        xterms[:, k] = sinf_approx((x_mult * dx) * i + x_const)
        j = np.arange(ny, dtype=np.float32)
        yterms[:, k] = y_scale * sinf_approx((y_mult * dy) * j + y_const)
    model_h = np.zeros((ny, nx), np.float32)
    for k in range(start, 90):  # ascending-k f32 accumulation (eval_index)
        model_h += xterms[None, :, k] * yterms[:, None, k]
    assert float(np.abs(model_h - cpp_h).max()) < 5e-7   # 1-2 ulps
    assert float((model_h == cpp_h).mean()) > 0.3        # largely bit-exact

    # repo evaluator (exact jnp.sin): within the quantization bound
    tab = N.gen_sine_table(world, mesh_seed=3, scaled_height=0.10)
    xt, yt = N.sine_term_tables(tab, jnp.float32(x0), jnp.float32(y0),
                                world.dx, world.dy, nx, ny, world,
                                start_sin=start)
    py_h = np.asarray(xt @ yt.T).T
    scale = np.abs(cpp_h).max()
    assert np.abs(py_h - cpp_h).max() < 0.02 * scale


@pytest.fixture(scope="session")
def upsurface_harness(tmp_path_factory):
    out = tmp_path_factory.mktemp("cppbin") / "upsurface_harness"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-ffp-contract=off",
         "-I", os.path.join(CPP_DIR, "glstub"), "-I", REF_SRC,
         os.path.join(CPP_DIR, "upsurface_harness.cpp"),
         os.path.join(REF_SRC, "upsurface.cpp"),
         "-o", str(out)],
        check=True, capture_output=True)
    return str(out)


@pytest.mark.parametrize("seeds,magfreq", [((7, 11), (1.0, 1.0)),
                                           ((123, 5), (0.7, 2.0))])
def test_sine3d_table_bitwise(upsurface_harness, tmp_path, seeds, magfreq):
    """noise_gen_3d::gen_sines (upsurface.cpp:16-38) — the 3D sine table
    behind voxel density fields, planet surfaces, and voxel rocks —
    bit-for-bit: 420-draw stream + every f32 rounding; grid evaluation
    then matches within the reference's quantized-SINF bound."""
    from w3d.ops import noise as N
    ft = os.path.join(str(tmp_path), "us_t.f32")
    fv = os.path.join(str(tmp_path), "us_v.f32")
    subprocess.run([upsurface_harness, str(seeds[0]), str(seeds[1]),
                    str(magfreq[0]), str(magfreq[1]), "12", "10", "8",
                    ft, fv], check=True)
    cpp_t = np.fromfile(ft, np.float32).reshape(60, 7)
    cpp_v = np.fromfile(fv, np.float32).reshape(8, 10, 12)
    tab = N.gen_sine_table_3d(magfreq[0], magfreq[1], seeds[0], seeds[1])
    py_t = np.stack([np.asarray(getattr(tab, f)) for f in
                     ("mag", "fx", "px", "fy", "py", "fz", "pz")], 1)
    assert np.array_equal(cpp_t.view(np.int32), py_t.view(np.int32))
    vals = np.asarray(N.eval_sine3d_grid(tab, (-1.0, -1.0, -1.0),
                                         (0.13, 0.17, 0.19), 12, 10, 8))
    scale = max(float(np.abs(cpp_v).max()), 1e-6)
    assert float(np.abs(vals - cpp_v).max()) < 2e-3 * scale


# ---------------------------------------------------------------------------
# heightfield ray intersection vs compiled mesh_intersect.cpp
# ---------------------------------------------------------------------------

@pytest.fixture(scope="session")
def mesh_intersect_harness(tmp_path_factory):
    out = tmp_path_factory.mktemp("cppbin") / "mesh_intersect_harness"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-ffp-contract=off",
         "-I", os.path.join(CPP_DIR, "glstub"), "-I", REF_SRC,
         os.path.join(CPP_DIR, "mesh_intersect_harness.cpp"),
         os.path.join(REF_SRC, "mesh_intersect.cpp"),
         os.path.join(REF_SRC, "Math3d.cpp"),
         os.path.join(REF_SRC, "intersect.cpp"),
         os.path.join(REF_SRC, "quartic.cpp"),
         "-o", str(out)],
        check=True, capture_output=True)
    return str(out)


def test_heightfield_intersect_vs_cpp(mesh_intersect_harness, tmp_path):
    """The DDA heightfield intersect (ops/ray.ray_heightfield_dda, cited
    against mesh_intersect.cpp:248-256) vs the compiled reference
    `mesh_intersector` with its BSP acceleration tree: hit/miss must
    agree on EVERY ray, and intersection heights agree within the
    triangulated-vs-bilinear surface difference (the reference
    intersects two triangles per quad; the repo intersects the bilinear
    patch — equal at cell edges, sub-mm apart inside curved cells)."""
    import jax.numpy as jnp
    from w3d.ops.ray import ray_heightfield_dda
    from w3d.utils.constants import WorldConst

    world = WorldConst()
    xs = ys = world.mesh_x
    rng = np.random.default_rng(2)
    gx, gy = np.meshgrid(np.arange(xs), np.arange(ys))
    hm = (0.5 * np.exp(-(((gx - 64) * world.dx) ** 2
                         + ((gy - 64) * world.dy) ** 2) / 2.0)
          + 0.05 * np.sin(0.3 * gx) * np.cos(0.25 * gy)
          - 0.6).astype(np.float32)
    N = 400
    o = np.stack([rng.uniform(-3, 3, N), rng.uniform(-3, 3, N),
                  rng.uniform(0.5, 1.5, N)], 1).astype(np.float32)
    d = np.stack([rng.uniform(-1, 1, N), rng.uniform(-1, 1, N),
                  rng.uniform(-1.2, -0.4, N)], 1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    L = 6.0
    fm = os.path.join(str(tmp_path), "mi_mesh.f32")
    fs = os.path.join(str(tmp_path), "mi_segs.f32")
    fo = os.path.join(str(tmp_path), "mi_out.f32")
    hm.tofile(fm)
    np.concatenate([o, o + L * d], 1).astype(np.float32).tofile(fs)
    subprocess.run([mesh_intersect_harness, fm, str(xs), str(ys), fs,
                    str(N), fo], check=True)
    cpp = np.fromfile(fo, np.float32).reshape(N, 4)

    hit, t = ray_heightfield_dda(
        *[jnp.asarray(o[:, i]) for i in range(3)],
        *[jnp.asarray(d[:, i]) for i in range(3)],
        jnp.full((N,), L), jnp.asarray(hm), world, max_cells=512)
    hit = np.asarray(hit)
    t = np.asarray(t)
    assert (hit == (cpp[:, 0] > 0.5)).all()
    both = hit & (cpp[:, 0] > 0.5)
    assert both.sum() > 0.8 * N          # the scene is actually hit
    z_repo = o[:, 2] + t * d[:, 2]
    assert float(np.abs(z_repo[both] - cpp[both, 3]).max()) < 2e-3
