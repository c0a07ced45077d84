"""Pallas kernel tests (interpret mode on CPU; native on TPU)."""
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
