"""Procedural noise for terrain / voxels, TPU-first.

Re-expresses the reference's five heightmap generator modes
(MGEN_SINE / SIMPLEX / PERLIN / SIMPLEX_GPU / DWARP_GPU, 3DWorld.h:1399;
mesh_gen.cpp:706-760) as batched JAX array programs:

* **Sine-table mode** (default): 9 frequency octaves x 10 random 2D sine
  products (mesh_gen.cpp:219-254).  The evaluation is separable
  (mesh_gen.cpp:604-626, :754): per-axis term tables X[nx,90], Y[ny,90] and
  height(x,y) = sum_k X[x,k]*Y[y,k] — i.e. a (nx,90)@(90,ny) matmul that maps
  straight onto the MXU.  A whole batch of terrain tiles is one einsum.

* **fBm simplex/perlin**: 9 octaves, lacunarity 1.92, gain 0.5, per-octave
  offset drift x1.5, shapes linear/billowy/ridged, 2-level domain warp with
  fixed offsets (5.2,1.3)/(1.7,9.2)/(8.3,2.8), scale 0.2
  (mesh_gen.cpp:706-760; shaders/simplex_noise.part).  Gradient hashing uses
  our own counter-based integer hash, so values differ from glm's
  implementation bit-for-bit but match its statistics and spectral shape.

The reference evaluates GPU noise in a GL compute shader with async readback
(mesh_gen.cpp:652-695); here the accelerator *is* the default execution target
so every mode is simply a jitted function — batching and sharding replace the
readback machinery.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.rng import RandGen, xxhash_u32
from ..utils.constants import WorldConst, DEFAULT_WORLD

# mesh_gen.cpp:14-34
NUM_FREQ_COMP = 9
N_RAND_SIN2 = 10
F_TABLE_SIZE = NUM_FREQ_COMP * N_RAND_SIN2
FREQ_FILTER = 2
MIN_FREQS = 3
HEIGHT_SCALE = 0.01
MESH_SCALE_FACTOR = 0.0007
DEF_GLACIATE_EXP = 3.0
TWO_PI = 2.0 * np.pi

# Generator modes (3DWorld.h:1399). GPU variants collapse onto their device-
# agnostic equivalents — on TPU there is no separate "GPU path".
MGEN_SINE = 0
MGEN_SIMPLEX = 1
MGEN_PERLIN = 2
MGEN_SIMPLEX_GPU = 3
MGEN_DWARP_GPU = 4

SHAPE_LINEAR = 0
SHAPE_BILLOWY = 1
SHAPE_RIDGED = 2


class SineTable(NamedTuple):
    """The 90-entry random sine table (mesh_gen.cpp sinTable[90][5])."""

    mag: jax.Array      # [F] magnitude
    phase_y: jax.Array  # [F] y phase
    phase_x: jax.Array  # [F] x phase
    freq_y: jax.Array   # [F] y frequency
    freq_x: jax.Array   # [F] x frequency


def gen_sine_table(
    world: WorldConst = DEFAULT_WORLD,
    mesh_seed: int = 0,
    scaled_height: float | None = None,
    rgen: RandGen | None = None,
) -> SineTable:
    """Generate the random sine table (mesh_gen.cpp:219-254).

    Draw sequence matches `gen_rand_sine_table_entries` exactly (5 draws per
    entry, octave-major), so a given `mesh_seed` produces the same terrain
    family as the reference.  Host-side: 450 sequential LCG draws.
    """
    if scaled_height is None:
        scaled_height = world.mesh_height  # MESH_HEIGHT * mesh_height_scale(=1)
    if rgen is None:
        rgen = RandGen()
        if mesh_seed != 0:
            rgen.set_state(mesh_seed, 12345)  # apply_mesh_rand_seed (mesh_gen.cpp:213-216)

    # float32 arithmetic in the reference's exact op order (pinned
    # BITWISE against the compiled mesh_gen.cpp in test_cpp_golden):
    # rand_uniform narrows randd to f32 BEFORE the lerp (rand_gen.h:90),
    # mags/freqs iterate in f32, TWO_PI is the f32 constant, and every
    # product chain rounds per-multiply in f32
    F = np.float32
    xf_scale = F(world.mesh_y) / F(world.mesh_x)
    yf_scale = F(1.0) / xf_scale
    if world.x_scene > world.y_scene:
        yf_scale = F(yf_scale * (F(world.y_scene) / F(world.x_scene)))
    if world.y_scene > world.x_scene:
        xf_scale = F(xf_scale * (F(world.x_scene) / F(world.y_scene)))

    mags = np.empty(NUM_FREQ_COMP, np.float32)
    freqs = np.empty(NUM_FREQ_COMP, np.float32)
    mags[0] = F(0.02)            # MESH_START_MAG
    freqs[0] = F(240.0)          # MESH_START_FREQ
    for i in range(1, NUM_FREQ_COMP):
        freqs[i] = freqs[i - 1] * F(0.5)   # MESH_FREQ_MULT
        mags[i] = mags[i - 1] * F(2.0)     # MESH_MAG_MULT
    mesh_h = F(scaled_height / np.sqrt(0.1 * N_RAND_SIN2))
    two_pi_f = F(TWO_PI)

    def ru(lo, hi):              # rand_uniform (rand_gen.h:90), f32 lerp
        return F(lo) + F(hi - lo) * F(rgen.randd())

    out = np.zeros((F_TABLE_SIZE, 5), dtype=np.float32)
    for l in range(NUM_FREQ_COMP):
        x_freq = freqs[l] / F(world.mesh_x)
        y_freq = freqs[l] / F(world.mesh_y)
        mheight = mags[l] * mesh_h
        for i in range(N_RAND_SIN2):
            idx = l * N_RAND_SIN2 + i
            out[idx, 0] = ru(0.2, 1.0) * mheight
            out[idx, 1] = F(rgen.rand_float()) * two_pi_f
            out[idx, 2] = F(rgen.rand_float()) * two_pi_f
            out[idx, 3] = ru(0.1, 1.0) * x_freq * yf_scale
            out[idx, 4] = ru(0.1, 1.0) * y_freq * xf_scale
    return SineTable(
        mag=jnp.asarray(out[:, 0]),
        phase_y=jnp.asarray(out[:, 1]),
        phase_x=jnp.asarray(out[:, 2]),
        freq_y=jnp.asarray(out[:, 3]),
        freq_x=jnp.asarray(out[:, 4]),
    )


def start_eval_sin(mesh_scale: float, mesh_freq_filter: int = FREQ_FILTER) -> int:
    """compute_scale() (mesh_gen.cpp:543-546): drop high-freq octaves when
    zoomed out.  Static Python int — selects a constant term mask under jit."""
    iscale = int(np.log2(mesh_scale)) if mesh_scale > 0 else 0
    return N_RAND_SIN2 * max(0, min(NUM_FREQ_COMP - MIN_FREQS, iscale + mesh_freq_filter))


def sine_term_tables(
    table: SineTable,
    x0: jax.Array,
    y0: jax.Array,
    dx: float,
    dy: float,
    nx: int,
    ny: int,
    world: WorldConst = DEFAULT_WORLD,
    mesh_scale: float = 1.0,
    mesh_scale_z_inv: float = 1.0,
    start_sin: int = 0,
):
    """Build per-axis sine term tables (mesh_xy_grid_cache_t::build_arrays,
    mesh_gen.cpp:604-626).

    Returns (xterms[..., nx, F], yterms[..., ny, F]); `x0`, `y0` may be
    batched (leading dims broadcast) so one call builds tables for a whole
    batch of tiles.
    """
    msx = mesh_scale * world.dx_inv
    msy = mesh_scale * world.dy_inv
    ms2 = 0.5 * mesh_scale
    x0 = jnp.asarray(x0, jnp.float32)[..., None]  # [..., 1]
    y0 = jnp.asarray(y0, jnp.float32)[..., None]
    mx0 = dx * x0
    my0 = dy * y0

    x_mult = msx * table.freq_x  # [F]
    y_mult = msy * table.freq_y
    y_scale = mesh_scale_z_inv * table.mag
    x_const = ms2 * table.freq_x + table.phase_x + x_mult * mx0  # [..., F]
    y_const = ms2 * table.freq_y + table.phase_y + y_mult * my0

    xi = jnp.arange(nx, dtype=jnp.float32)[:, None]  # [nx, 1]
    yi = jnp.arange(ny, dtype=jnp.float32)[:, None]
    xterms = jnp.sin(x_mult * dx * xi + x_const[..., None, :])      # [..., nx, F]
    yterms = y_scale * jnp.sin(y_mult * dy * yi + y_const[..., None, :])
    if start_sin > 0:
        mask = (jnp.arange(F_TABLE_SIZE) >= start_sin).astype(xterms.dtype)
        xterms = xterms * mask
    return xterms, yterms


def eval_sine_grid(xterms: jax.Array, yterms: jax.Array) -> jax.Array:
    """height[..., y, x] = sum_k X[x,k] * Y[y,k] — one MXU matmul per tile
    (the performance-critical loop of mesh_gen.cpp:754-770)."""
    return jnp.einsum(
        "...xk,...yk->...yx", xterms, yterms, preferred_element_type=jnp.float32
    )


def apply_noise_shape_final(z: jax.Array, shape: int) -> jax.Array:
    """Shapes for sine mode (mesh_gen.cpp:564-571)."""
    if shape == SHAPE_BILLOWY:
        return jnp.abs(z) - 2.0
    if shape == SHAPE_RIDGED:
        return 3.5 - jnp.abs(z)
    return z


# ---------------------------------------------------------------------------
# Gradient noise: simplex + perlin, hash-based (stateless, vectorizes freely)
# ---------------------------------------------------------------------------

# 3D separable sine noise (noise_gen_3d, upsurface.cpp:16-72): used for
# voxel density fields, planet surfaces, voxel rocks.
SINES_PER_FREQ = 12
MAX_FREQ_BINS = 5
TOT_NUM_SINES = SINES_PER_FREQ * MAX_FREQ_BINS
M_ATTEN_FACTOR = 0.5
F_ATTEN_FACTOR = 0.4


class SineTable3D(NamedTuple):
    mag: jax.Array  # [K]
    fx: jax.Array
    px: jax.Array
    fy: jax.Array
    py: jax.Array
    fz: jax.Array
    pz: jax.Array


def gen_sine_table_3d(mag: float = 1.0, freq: float = 1.0,
                      rseed1: int = 1, rseed2: int = 1) -> SineTable3D:
    """noise_gen_3d::gen_sines (upsurface.cpp:16-38): 5 frequency bins x 12
    sines; per bin mag *= 0.5, freq /= 0.4; draw order matches exactly."""
    rg = RandGen(rseed1, rseed2)
    out = np.zeros((TOT_NUM_SINES, 7), np.float32)
    # float32 arithmetic in the reference's op order (rand_uniform's f32
    # lerp, f32 mag/freq iteration, phases as double randd * f32 TWO_PI
    # narrowed on store) — pinned bitwise vs the compiled upsurface.cpp
    # in test_cpp_golden
    F = np.float32
    two_pi_f = F(TWO_PI)

    def ru(lo, hi):
        return F(lo) + F(hi - lo) * F(rg.randd())

    m, f = F(mag), F(freq)
    for i in range(MAX_FREQ_BINS):
        for j in range(SINES_PER_FREQ):
            k = SINES_PER_FREQ * i + j
            out[k, 0] = ru(0.2, 1.0) * m
            out[k, 1] = ru(0.1, 1.0) * f
            out[k, 2] = F(rg.randd() * np.float64(two_pi_f))
            out[k, 3] = ru(0.1, 1.0) * f
            out[k, 4] = F(rg.randd() * np.float64(two_pi_f))
            out[k, 5] = ru(0.1, 1.0) * f
            out[k, 6] = F(rg.randd() * np.float64(two_pi_f))
        m = m * F(M_ATTEN_FACTOR)
        f = f / F(F_ATTEN_FACTOR)
    return SineTable3D(*(jnp.asarray(out[:, i]) for i in range(7)))


def eval_sine3d_grid(table: SineTable3D, start, step, nx: int, ny: int, nz: int,
                     num_sines: int | None = None) -> jax.Array:
    """Separable 3D sine eval on a regular grid -> [nz, ny, nx].

    gen_xyz_vals + get_val (upsurface.cpp:41-72): per-axis term tables,
    val = sum_k mag_k * sin_x * sin_y * sin_z.  On TPU: the (z,y) pair
    table contracts against the x table as one (nz*ny, K)@(K, nx) matmul.
    """
    sx, sy, sz = start
    dx, dy, dz = step
    xi = sx + dx * jnp.arange(nx, dtype=jnp.float32)
    yi = sy + dy * jnp.arange(ny, dtype=jnp.float32)
    zi = sz + dz * jnp.arange(nz, dtype=jnp.float32)
    mask = 1.0
    if num_sines is not None and num_sines < TOT_NUM_SINES:
        mask = (jnp.arange(TOT_NUM_SINES) < num_sines).astype(jnp.float32)
    xv = jnp.sin(table.fx[None, :] * xi[:, None] + table.px[None, :]) * (table.mag * mask)[None, :]
    yv = jnp.sin(table.fy[None, :] * yi[:, None] + table.py[None, :])  # [ny,K]
    zv = jnp.sin(table.fz[None, :] * zi[:, None] + table.pz[None, :])  # [nz,K]
    zy = zv[:, None, :] * yv[None, :, :]                               # [nz,ny,K]
    return jnp.einsum("zyk,xk->zyx", zy, xv, preferred_element_type=jnp.float32)


_F2 = 0.5 * (np.sqrt(3.0) - 1.0)
_G2 = (3.0 - np.sqrt(3.0)) / 6.0


def _grad_hash(ix: jax.Array, iy: jax.Array, seed: int) -> jax.Array:
    """Hash integer lattice point -> uint32 (xxHash chain, rand_gen.h:127)."""
    return xxhash_u32(ix.astype(jnp.uint32) ^ (iy.astype(jnp.uint32) * jnp.uint32(2654435761)), seed)


def _grad_dot(h: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Dot with one of 8 unit-ish gradients selected by hash bits."""
    ang = (h & jnp.uint32(7)).astype(jnp.float32) * (TWO_PI / 8.0)
    return jnp.cos(ang) * x + jnp.sin(ang) * y


def simplex2d(x: jax.Array, y: jax.Array, seed: int = 0) -> jax.Array:
    """2D simplex noise in approx [-1, 1] (Gustavson's construction)."""
    s = (x + y) * _F2
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    t = (i + j) * _G2
    x0 = x - (i - t)
    y0 = y - (j - t)
    gt = x0 > y0
    i1 = jnp.where(gt, 1.0, 0.0)
    j1 = jnp.where(gt, 0.0, 1.0)
    x1 = x0 - i1 + _G2
    y1 = y0 - j1 + _G2
    x2 = x0 - 1.0 + 2.0 * _G2
    y2 = y0 - 1.0 + 2.0 * _G2
    ii = i.astype(jnp.int32)
    jj = j.astype(jnp.int32)

    def corner(cx, cy, ci, cj):
        t_ = 0.5 - cx * cx - cy * cy
        t_ = jnp.maximum(t_, 0.0)
        t2 = t_ * t_
        g = _grad_dot(_grad_hash(ci, cj, seed), cx, cy)
        return t2 * t2 * g

    n = (
        corner(x0, y0, ii, jj)
        + corner(x1, y1, ii + i1.astype(jnp.int32), jj + j1.astype(jnp.int32))
        + corner(x2, y2, ii + 1, jj + 1)
    )
    return 70.0 * n


_F3 = 1.0 / 3.0
_G3 = 1.0 / 6.0


def _grad_hash3(ix, iy, iz, seed: int):
    h = ix.astype(jnp.uint32) ^ (iy.astype(jnp.uint32) * jnp.uint32(2654435761)) \
        ^ (iz.astype(jnp.uint32) * jnp.uint32(0x9E3779B1))
    return xxhash_u32(h, seed)


def _grad_dot3(h, x, y, z):
    """Dot with one of 12 edge-vector gradients selected by hash bits."""
    hb = h & jnp.uint32(15)
    u = jnp.where(hb < 8, x, y)
    v = jnp.where(hb < 4, y, jnp.where((hb == 12) | (hb == 14), x, z))
    return jnp.where((hb & 1) == 0, u, -u) + jnp.where((hb & 2) == 0, v, -v)


def simplex3d(x: jax.Array, y: jax.Array, z: jax.Array, seed: int = 0) -> jax.Array:
    """3D simplex noise in approx [-1, 1] (Gustavson's construction;
    the reference evaluates glm::simplex / gen_voxel_weights.comp)."""
    s = (x + y + z) * _F3
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    k = jnp.floor(z + s)
    t = (i + j + k) * _G3
    x0 = x - (i - t)
    y0 = y - (j - t)
    z0 = z - (k - t)
    # simplex traversal order from the component ranking (branchless form of
    # the standard 6-case decision tree); c1=x>=y, c2=y>=z, c3=x>=z
    c1 = x0 >= y0
    c2 = y0 >= z0
    c3 = x0 >= z0
    f = lambda b: b.astype(jnp.float32)
    i1 = f(c1 & (c2 | c3))
    j1 = f(~c1 & c2)
    k1 = 1.0 - i1 - j1
    i2 = f(c1 | (c2 & c3))
    j2 = f(~c1 | c2)
    k2 = f(~c2 | (~c1 & ~c3))
    x1 = x0 - i1 + _G3
    y1 = y0 - j1 + _G3
    z1 = z0 - k1 + _G3
    x2 = x0 - i2 + 2.0 * _G3
    y2 = y0 - j2 + 2.0 * _G3
    z2 = z0 - k2 + 2.0 * _G3
    x3 = x0 - 1.0 + 3.0 * _G3
    y3 = y0 - 1.0 + 3.0 * _G3
    z3 = z0 - 1.0 + 3.0 * _G3
    ii = i.astype(jnp.int32)
    jj = j.astype(jnp.int32)
    kk = k.astype(jnp.int32)

    def corner(cx, cy, cz, di, dj, dk):
        t_ = jnp.maximum(0.6 - cx * cx - cy * cy - cz * cz, 0.0)
        t2 = t_ * t_
        g = _grad_dot3(_grad_hash3(ii + di, jj + dj, kk + dk, seed), cx, cy, cz)
        return t2 * t2 * g

    n = (corner(x0, y0, z0, 0, 0, 0)
         + corner(x1, y1, z1, i1.astype(jnp.int32), j1.astype(jnp.int32), k1.astype(jnp.int32))
         + corner(x2, y2, z2, i2.astype(jnp.int32), j2.astype(jnp.int32), k2.astype(jnp.int32))
         + corner(x3, y3, z3, 1, 1, 1))
    return 32.0 * n


def fbm3d(x, y, z, rx: float, ry: float, octaves: int = 5, mag: float = 1.0,
          freq: float = 1.0, mode: int = MGEN_SIMPLEX, seed: int = 0):
    """3D fBm (voxels.cpp:355-365 / gen_voxel_weights.comp): lacunarity
    1.92, gain 0.5, fixed offset (rx, ry, rx-ry)."""
    lacunarity, gain = 1.92, 0.5
    val = jnp.zeros_like(x)
    m, f = mag, 0.25 * freq
    for _ in range(octaves):
        val = val + m * simplex3d(f * x + rx, f * y + ry, f * z + (rx - ry), seed)
        m *= gain
        f *= lacunarity
    return val


def _fade(t: jax.Array) -> jax.Array:
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin2d(x: jax.Array, y: jax.Array, seed: int = 0) -> jax.Array:
    """Classic 2D Perlin noise in approx [-1, 1]."""
    xi = jnp.floor(x)
    yi = jnp.floor(y)
    xf = x - xi
    yf = y - yi
    ii = xi.astype(jnp.int32)
    jj = yi.astype(jnp.int32)
    u = _fade(xf)
    v = _fade(yf)

    def g(di, dj, dx_, dy_):
        return _grad_dot(_grad_hash(ii + di, jj + dj, seed), dx_, dy_)

    n00 = g(0, 0, xf, yf)
    n10 = g(1, 0, xf - 1.0, yf)
    n01 = g(0, 1, xf, yf - 1.0)
    n11 = g(1, 1, xf - 1.0, yf - 1.0)
    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    return (nx0 + v * (nx1 - nx0)) * 1.4142135


def fbm2d(
    x: jax.Array,
    y: jax.Array,
    rx: float,
    ry: float,
    mode: int = MGEN_SIMPLEX,
    shape: int = SHAPE_LINEAR,
    octaves: int = NUM_FREQ_COMP,
    seed: int = 0,
) -> jax.Array:
    """fBm over simplex/perlin (gen_noise, mesh_gen.cpp:706-728).

    lacunarity=1.92, gain=0.5, per-octave offset drift x1.5.  The octave loop
    unrolls at trace time (static count) so XLA fuses the whole stack into
    one elementwise program.
    """
    lacunarity, gain = 1.92, 0.5
    zval = jnp.zeros_like(x)
    mag, freq = 1.0, 1.0
    crx, cry = rx, ry
    use_simplex = mode in (MGEN_SIMPLEX, MGEN_SIMPLEX_GPU, MGEN_DWARP_GPU)
    for i in range(octaves):
        px = freq * x + crx
        py = freq * y + cry
        n = simplex2d(px, py, seed) if use_simplex else perlin2d(px, py, seed)
        if shape == SHAPE_BILLOWY:
            n = jnp.abs(n) - 0.40
        elif shape == SHAPE_RIDGED:
            n = 0.45 - jnp.abs(n)
        zval = zval + mag * n
        mag *= gain
        freq *= lacunarity
        crx *= 1.5
        cry *= 1.5
    return zval


def domain_warp2d(
    x: jax.Array,
    y: jax.Array,
    rx: float,
    ry: float,
    shape: int = SHAPE_LINEAR,
    octaves: int = NUM_FREQ_COMP,
    seed: int = 0,
):
    """2-level domain warp (get_noise_zval, mesh_gen.cpp:736-747): scale 0.2,
    fixed offsets (5.2,1.3), (1.7,9.2), (8.3,2.8)."""
    scale = 0.2
    kw = dict(mode=MGEN_SIMPLEX, shape=shape, octaves=octaves, seed=seed)
    dx1 = fbm2d(x, y, rx, ry, **kw)
    dy1 = fbm2d(x + 5.2, y + 1.3, rx, ry, **kw)
    dx2 = fbm2d(x + scale * dx1 + 1.7, y + scale * dy1 + 9.2, rx, ry, **kw)
    dy2 = fbm2d(x + scale * dx1 + 8.3, y + scale * dy1 + 2.8, rx, ry, **kw)
    return x + scale * dx2, y + scale * dy2


def gen_rx_ry(mesh_seed: int = 0, mesh_rgen_index: int = 0, mode: int = MGEN_SIMPLEX):
    """Random fBm offsets in [1, 2) (gen_rx_ry, mesh_gen.cpp:581-587)."""
    rgen = RandGen()
    if mesh_seed != 0:
        rgen.set_state(mesh_seed, 12345)
    elif mode != MGEN_SINE:
        rgen.set_state(mesh_rgen_index + 1, 12345)
    return rgen.rand_float() + 1.0, rgen.rand_float() + 1.0


def get_hmap_scale(mode: int, mesh_height: float, mesh_height_scale: float = 1.0,
                   mesh_scale_z_inv: float = 1.0) -> float:
    """mesh_gen.cpp:550-553: simplex 16x vs perlin 32x height scale."""
    scale = 16.0 if mode in (MGEN_SIMPLEX, MGEN_SIMPLEX_GPU, MGEN_DWARP_GPU) else 32.0
    return scale * mesh_height * mesh_height_scale * mesh_scale_z_inv


def noise_zval_grid(
    xval: jax.Array,
    yval: jax.Array,
    mode: int,
    shape: int = SHAPE_LINEAR,
    mesh_scale: float = 1.0,
    mesh_seed: int = 0,
    mesh_rgen_index: int = 0,
    world: WorldConst = DEFAULT_WORLD,
    octaves: int | None = None,
    seed: int = 0,
    postproc=None,
) -> jax.Array:
    """get_noise_zval (mesh_gen.cpp:733-751) on a whole grid of mesh coords.

    `xval`/`yval` are in mesh-index units (world-x / DX_VAL); any shape.
    `postproc`, if given, is applied to the raw fBm value *before* the
    height scale (matching mesh_gen.cpp:749-750).
    """
    if octaves is None:
        octaves = NUM_FREQ_COMP - start_eval_sin(mesh_scale) // N_RAND_SIN2
    xy_scale = MESH_SCALE_FACTOR * mesh_scale
    xv = xy_scale * xval
    yv = xy_scale * yval
    rx, ry = gen_rx_ry(mesh_seed, mesh_rgen_index, mode)
    if mode == MGEN_DWARP_GPU:
        xv, yv = domain_warp2d(xv, yv, rx, ry, shape=shape, octaves=octaves, seed=seed)
    z = fbm2d(xv, yv, rx, ry, mode=mode, shape=shape, octaves=octaves, seed=seed)
    if postproc is not None:
        z = postproc(z)
    return z * get_hmap_scale(mode, world.mesh_height)
