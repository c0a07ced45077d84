"""Pallas kernel tests (interpret mode on CPU; native on TPU)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.ops import noise as N
from w3d.ops.pallas.noise_kernel import tile_noise_pallas
from w3d.ops.pallas.stencil_kernel import diffuse_smoke_pallas
from w3d.water.smoke import diffuse_smoke
from w3d.utils.constants import WorldConst

INTERP = jax.devices()[0].platform != "tpu"


def test_pallas_tile_noise_matches_xla():
    w = WorldConst()
    t = N.gen_sine_table(w, mesh_seed=3)
    x0 = jnp.asarray([0.0, 64.0, -32.0])
    y0 = jnp.asarray([0.0, 32.0, 16.0])
    out = tile_noise_pallas(t, x0, y0, 64, w.dx, w.dy, interpret=INTERP)
    xt, yt = N.sine_term_tables(t, x0, y0, w.dx, w.dy, 64, 64, world=w)
    ref = N.eval_sine_grid(xt, yt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_pallas_tile_noise_start_sin():
    w = WorldConst()
    t = N.gen_sine_table(w, mesh_seed=3)
    x0 = jnp.asarray([8.0])
    y0 = jnp.asarray([4.0])
    out = tile_noise_pallas(t, x0, y0, 32, w.dx, w.dy, start_sin=20,
                            interpret=INTERP)
    xt, yt = N.sine_term_tables(t, x0, y0, w.dx, w.dy, 32, 32, world=w,
                                start_sin=20)
    ref = N.eval_sine_grid(xt, yt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_pallas_smoke_diffusion_matches_xla():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.uniform(0, 5, (8, 16, 128)).astype(np.float32))
    out = diffuse_smoke_pallas(s, interpret=INTERP)
    ref = diffuse_smoke(s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_erosion_walk_matches_xla():
    """Fused erosion kernel (interpret mode) vs the XLA scan path.

    The kernel reproduces _walk_batch's math exactly (same angle draws via
    the precomputed table); on real TPU only MXU accumulation order
    differs.  erosion.cpp:14-165 semantics."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from w3d.ops import erosion as E
    from w3d.ops.pallas.erosion_kernel import erode_tiles_pallas

    T, n = 2, 32
    rng = np.random.default_rng(7)
    hms = jnp.asarray(rng.standard_normal((T, n, n)).astype(np.float32) * 0.5 + 1.0)
    p = E.ErosionParams(erode_amount=1.0, water_plane_z=0.0, half_dxy=0.06,
                        zmin=-2.0, zmax=2.0, rock_thresh=0.75)
    # pad=0 on both sides: the Pallas tile path drops the roam ring so
    # 128-wide maps stay MXU-aligned (border droplets die at the edge)
    ref = jax.vmap(lambda h: E.erode(h, 150, p, batch_size=128, max_steps=8,
                                     pad=0))(hms)
    out = erode_tiles_pallas(hms, 150, p, batch_size=128, max_steps=8,
                             interpret=True)
    assert jnp.allclose(ref, out, atol=1e-5), float(jnp.abs(ref - out).max())


def test_pallas_erosion_rejects_bad_batch():
    import numpy as np
    import jax.numpy as jnp
    import pytest
    from w3d.ops import erosion as E
    from w3d.ops.pallas.erosion_kernel import erode_tiles_pallas

    hms = jnp.zeros((1, 16, 16), jnp.float32)
    with pytest.raises(ValueError):
        erode_tiles_pallas(hms, 100, E.ErosionParams(), batch_size=100,
                           max_steps=4, interpret=True)


@pytest.mark.slow
def test_pallas_fused_substep_matches_xla():
    """Fused physics substep kernel (interpret) vs step_objects over a
    bumpy mesh + water so every branch (integrate, water, cobj, mesh
    bounce, pairs, kills) sees traffic.  Physics.cpp:725-1409 chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from w3d.models import physics_model as PM
    from w3d.physics import step as PS
    from w3d.utils.constants import WorldConst

    world = WorldConst()
    sw = PM.build_spheres_world(num_objects=300, world=world)
    rng = np.random.default_rng(3)
    mesh = jnp.asarray(rng.standard_normal((world.mesh_y, world.mesh_x))
                       .astype(np.float32) * 0.3 - 0.5)
    env = sw.env._replace(mesh_height=mesh, water_plane_z=jnp.float32(-0.3))
    ref = PS.step_objects(sw.state, env, sw.cobjs, sw.table,
                          substeps=3, world=world, obj_collisions=True)
    out = PS.step_objects_fused(sw.state, env, sw.cobjs, sw.table,
                                substeps=3, world=world, obj_collisions=True,
                                Nb=128, interpret=True)
    for name in ("px", "py", "pz", "vx", "vy", "vz"):
        a, b = getattr(ref, name), getattr(out, name)
        assert jnp.allclose(a, b, atol=1e-5), (name, float(jnp.abs(a - b).max()))
    for name in ("status", "flags", "time"):
        a, b = getattr(ref, name), getattr(out, name)
        assert int((a != b).sum()) == 0, name


def test_pallas_pairs_matches_xla():
    """Roll-shift banded pairs kernel (interpret mode) is bit-equal to
    the XLA fori_loop path on a sorted population."""
    import jax
    import jax.numpy as jnp
    from w3d.models import physics_model as PM
    from w3d.physics.step import banded_pair_collisions, spatial_sort
    from w3d.ops.pallas.pairs_kernel import banded_pairs_pallas
    from w3d.utils.constants import WorldConst

    world = WorldConst()
    sw = PM.build_spheres_world(num_objects=900, world=world,
                                group_shapes=False)
    st = spatial_sort(sw.state, world)
    rad = jnp.full_like(st.px, 0.04)
    mass = jnp.linspace(0.5, 2.0, 900)
    elas = jnp.full_like(st.px, 0.5)
    act = st.status > 0
    ref = banded_pair_collisions(st.px, st.py, st.pz, st.vx, st.vy, st.vz,
                                 rad, mass, elas, act, window=48)
    out = banded_pairs_pallas(st.px, st.py, st.pz, st.vx, st.vy, st.vz,
                              rad, mass, elas, act, window=48,
                              interpret=True)
    for a, b in zip(ref, out):
        assert float(jnp.abs(a - b).max()) < 1e-6
    # window > 128 exercises the generalized multi-sublane shift
    # (d = q*L + r decomposition) used by the production PAIR_WINDOW
    ref2 = banded_pair_collisions(st.px, st.py, st.pz, st.vx, st.vy, st.vz,
                                  rad, mass, elas, act, window=160)
    out2 = banded_pairs_pallas(st.px, st.py, st.pz, st.vx, st.vy, st.vz,
                               rad, mass, elas, act, window=160,
                               interpret=True)
    for a, b in zip(ref2, out2):
        assert float(jnp.abs(a - b).max()) < 1e-6


def test_pallas_sample_mesh_matches_xla():
    """VMEM sample kernel (interpret) vs step.sample_mesh: heights are
    bitwise equal (same weights, same y-first contraction order); the
    normals differ only by rsqrt reduction-tree ulps.  Covers interior,
    border-clamped, and off-mesh coordinates."""
    import numpy as np
    import jax.numpy as jnp
    from w3d.physics import step as PS
    from w3d.ops.pallas.sample_kernel import sample_mesh_pallas
    from w3d.utils.constants import WorldConst

    w = WorldConst()
    rng = np.random.default_rng(11)
    mesh = jnp.asarray(rng.standard_normal((w.mesh_y, w.mesh_x))
                       .astype(np.float32))
    n = 1500
    x = jnp.asarray(rng.uniform(-1.4 * w.x_scene, 1.4 * w.x_scene, n)
                    .astype(np.float32))
    y = jnp.asarray(rng.uniform(-1.4 * w.y_scene, 1.4 * w.y_scene, n)
                    .astype(np.float32))
    ref = PS.sample_mesh(mesh, x, y, w)
    out = sample_mesh_pallas(mesh, x, y, w.dx_inv, w.dy_inv, interpret=True)
    assert jnp.array_equal(ref[0], out[0])          # heights bitwise
    for a, b in zip(ref[1:], out[1:]):              # normals to ulps
        assert float(jnp.abs(a - b).max()) < 1e-6


@pytest.mark.slow
def test_spatial_sort_repair_matches_full_sort():
    """Comb repair == full sort on (a) a random population (cond
    fallback) and (b) a slightly-drifted sorted one (repair path); the
    result key order is globally sorted either way — the banded pair
    pass's EXACT window bound depends on it."""
    import numpy as np
    import jax.numpy as jnp
    from w3d.models import physics_model as PM
    from w3d.physics import step as PS
    from w3d.utils.constants import WorldConst

    w = WorldConst()
    sw = PM.build_spheres_world(num_objects=1200, world=w)

    def same(a, b):
        return all(bool(jnp.array_equal(getattr(a, f), getattr(b, f)))
                   for f in a._fields)

    assert same(PS.spatial_sort(sw.state, w),
                PS.spatial_sort_repair(sw.state, w))
    srt = PS.spatial_sort(sw.state, w)
    drift = jnp.asarray(np.random.default_rng(5)
                        .uniform(-2e-3, 2e-3, 1200).astype(np.float32))
    pert = srt._replace(px=srt.px + drift)
    rep = PS.spatial_sort_repair(pert, w)
    assert same(PS.spatial_sort(pert, w), rep)
    k = jnp.where(rep.status > 0, rep.px, jnp.inf)
    assert bool(jnp.all(k[:-1] <= k[1:]))


@pytest.mark.slow
def test_pallas_narrow_phase_matches_xla():
    """VMEM grouped narrow-phase kernel (interpret) vs
    cobjs.deepest_hits_grouped: bitwise on pen and winner fields
    (same formulas elementwise, exact first-index argmax).  Scene mixes
    all 7 shape groups plus dead padding slots."""
    import numpy as np
    import jax.numpy as jnp
    from w3d.physics import cobjs as C
    from w3d.ops.pallas.narrow_kernel import deepest_hits_pallas, supported
    from w3d.scene import cobj as SC

    sp = SC.SceneParse()
    lay = SC.CobjLayer(elasticity=0.8, friction=0.6)
    rg = np.random.default_rng(3)
    for _ in range(17):
        p = rg.uniform(-2, 2, 3)
        sp.cobjs.append(SC.RawCobj(SC.COLL_SPHERE, tuple(p),
                                   r1=float(rg.uniform(0.1, 0.5)), layer=lay))
    for _ in range(11):
        p = rg.uniform(-2, 2, 3)
        q = p + rg.uniform(0.2, 1.0, 3)
        sp.cobjs.append(SC.RawCobj(SC.COLL_CUBE, tuple(p), tuple(q),
                                   layer=lay))
    for shp, n in ((SC.COLL_CYLINDER, 7), (SC.COLL_CAPSULE, 6),
                   (SC.COLL_CYLINDER_ROT, 5), (SC.COLL_TORUS, 4)):
        for _ in range(n):
            p = rg.uniform(-2, 2, 3)
            q = p + rg.uniform(-0.8, 0.8, 3)
            if shp == SC.COLL_CYLINDER:
                q[0], q[1] = p[0], p[1]
            if shp == SC.COLL_TORUS:
                q = np.asarray([0.0, 0.0, 1.0])
            sp.cobjs.append(SC.RawCobj(shp, tuple(p), tuple(q),
                                       r1=float(rg.uniform(0.1, 0.4)),
                                       r2=float(rg.uniform(0.1, 0.4)),
                                       layer=lay))
    for _ in range(5):
        a = rg.uniform(-2, 2, 3)
        b = a + [1.0, 0.0, 0.0]
        c = a + [1.0, 1.0, 0.0]
        d = a + [0.0, 1.0, 0.0]
        sp.cobjs.append(SC.RawCobj(SC.COLL_POLYGON,
                                   pts=(tuple(a), tuple(b), tuple(c),
                                        tuple(d)),
                                   r1=0.05, layer=lay))
    g = C.group_cobjs(SC.pack_cobjs(sp))
    n = 2048
    px = jnp.asarray(rg.uniform(-2.5, 2.5, n).astype(np.float32))
    py = jnp.asarray(rg.uniform(-2.5, 2.5, n).astype(np.float32))
    pz = jnp.asarray(rg.uniform(-2.5, 2.5, n).astype(np.float32))
    rad = jnp.asarray(rg.uniform(0.02, 0.2, n).astype(np.float32))
    assert supported(g, n)
    ref = C.deepest_hits_grouped(px, py, pz, rad, g)
    out = deepest_hits_pallas(px, py, pz, rad, g, interpret=True)
    # On TPU hardware the kernel matches the XLA path bitwise on
    # hit/pen/elas/fric and on every HIT lane's normal (verified live;
    # non-hit lanes carry unused garbage normals in both paths); under
    # CPU interpret mode the two differently-fused graphs disagree by
    # single ulps, so compare to tolerance and gate the winner-field
    # check on lanes whose argmax margin exceeds ulp noise.
    assert bool(jnp.array_equal(ref[0], out[0]))       # hit mask
    assert float(jnp.abs(ref[1] - out[1]).max()) < 1e-5
    pen_all, _, _, _ = C.sphere_cobj_test_grouped(px, py, pz, rad, g)
    top2 = jax.lax.top_k(pen_all, 2)[0]
    robust = ref[0] & ((top2[:, 0] - top2[:, 1]) > 1e-4)
    for a, b in zip(ref[2:], out[2:]):                 # winner fields
        d = jnp.abs(jnp.where(robust, a - b, 0.0))
        assert float(d.max()) < 1e-5


@pytest.mark.slow
def test_pallas_erosion_unclamped_stability_interpret():
    """The deleted 5% delta clamp must stay unnecessary on the PALLAS
    path too (the live-read stability argument): a long unclamped run in
    interpret mode stays inside the original relief with no NaNs.  (The
    XLA path's 100K-droplet stability test is in test_erosion.py; this
    covers the kernel's own accumulation order at a count well past the
    old divergence onset.)"""
    import numpy as np
    import jax.numpy as jnp
    from w3d.ops.erosion import ErosionParams
    from w3d.ops.pallas.erosion_kernel import erode_tiles_pallas

    rng = np.random.default_rng(5)
    x, y = np.meshgrid(np.linspace(-2, 2, 128), np.linspace(-2, 2, 128))
    hm = (0.5 * np.exp(-(x**2 + y**2) / 1.5)
          + 0.02 * rng.standard_normal((128, 128))).astype(np.float32)
    z = jnp.asarray(hm)[None]
    out = erode_tiles_pallas(z, 4096, ErosionParams(), min_zval=-1.0e9,
                             batch_size=256, max_steps=64, interpret=True)
    out = np.asarray(out)[0]
    assert np.isfinite(out).all()
    relief = hm.max() - hm.min()
    assert out.min() > hm.min() - 1.5 * relief
    assert out.max() < hm.max() + 0.5 * relief
