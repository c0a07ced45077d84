"""Hydraulic (droplet) erosion, TPU-first.

The reference implements ranmantaru's droplet erosion (erosion.cpp:14-165):
each droplet starts at an LCG-seeded cell, walks downhill with direction
inertia, picks up sediment proportional to carry capacity, deposits in pits,
and dies at the ocean; droplets run racily in parallel over OpenMP threads,
all mutating the shared heightmap.

TPU design — *batched droplets in lockstep*:

* A batch of B droplets advances together under one `lax.scan` over a fixed
  step budget.  All map reads are gathers from a **frozen snapshot** of the
  heightmap; each droplet carries a local cache of its current height `h`
  and the 4 cell-corner heights, updated by its own deposits/erosion exactly
  as the reference's local variable caching does (erosion.cpp:73,107,152) —
  so self-feedback (pit filling, channel deepening along its own path) is
  exact, while cross-droplet feedback within a batch is deferred to the
  batch boundary.  The reference's OpenMP version reads racily-updated
  memory, so within-batch ordering is already undefined there; deferred
  application is a *deterministic* re-expression of the same approximation.

* Each droplet-step produces a compact record (cell, deposit, erode, frac);
  records for the whole batch are expanded to (T*B*20) index/value pairs and
  applied in a **single scatter-add** per batch — one large fused scatter
  instead of thousands of tiny ones.

* Batches run sequentially (`lax.scan` over batches), so large-scale
  channel formation (later droplets following earlier channels) is kept.

* Droplet start cells reproduce the reference's per-iteration seeding
  rgen.set_state(iter+11, 79*iter+121); xi=rand()%xs, zi=rand()%ys
  (erosion.cpp:68-71) via the vectorized Schrage LCG, so the *set* of
  droplet start points matches the reference exactly.

Constants Kq=10, Kw=0.001, Kr=0.9, Kd=0.02, Ki=0.1, minSlope=0.05, g=20
(erosion.cpp:24); 4x4 erosion stencil with weights
w = max(0, 1-(dx^2+dz^2)/4) / (2*pi) (erosion.cpp:134-144); rock (relative
height above `rock_thresh`) erodes 0.5x, dirt 2x (erosion.cpp:132,
Textures.cpp:1284-1287).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import rng as w3d_rng

# erosion.cpp:24
KQ = 10.0
KW = 0.001
KR = 0.9
KD = 0.02
KI = 0.1
MIN_SLOPE = 0.05
GRAV = 20.0
KG = 2.0 * GRAV
PAD = 4
ERODE_STENCIL_NORM = 0.1591549430918953  # 1/(2*pi), erosion.cpp:141
FLT_EPSILON = np.float32(1.1920929e-07)


class ErosionParams(NamedTuple):
    erode_amount: float = 1.0
    water_plane_z: float = -1.0e9   # ocean cutoff (disabled by default)
    half_dxy: float = 0.0           # river-depth offset (erosion.cpp:98)
    zmin: float = 0.0               # for relative-height rock test
    zmax: float = 1.0
    rock_thresh: float = 2.0        # clip_hd1; >1 disables rock hardening
    relh_adj_tex: float = 0.0


def droplet_starts(num_iters: int, xsize: int, ysize: int, pad: int = PAD):
    """Vectorized reference seeding (erosion.cpp:68-71) -> padded (xi, zi)."""
    it = jnp.arange(num_iters, dtype=jnp.int32)
    state = w3d_rng.lcg_init(it + 11, 79 * it + 121, xp=jnp)
    state, r1 = w3d_rng.lcg_next(state, xp=jnp)
    state, r2 = w3d_rng.lcg_next(state, xp=jnp)
    return pad + r1 % xsize, pad + r2 % ysize


def _gather4(hm_flat: jax.Array, nx: int, ny: int, xi: jax.Array, zi: jax.Array):
    """Clamped corner gathers (HMAP macro, erosion.cpp:39-40)."""
    xc0 = jnp.clip(xi, 0, nx - 1)
    xc1 = jnp.clip(xi + 1, 0, nx - 1)
    zc0 = jnp.clip(zi, 0, ny - 1)
    zc1 = jnp.clip(zi + 1, 0, ny - 1)
    h00 = hm_flat[zc0 * nx + xc0]
    h10 = hm_flat[zc0 * nx + xc1]
    h01 = hm_flat[zc1 * nx + xc0]
    h11 = hm_flat[zc1 * nx + xc1]
    return h00, h10, h01, h11


def _onehot(idx: jax.Array, n: int) -> jax.Array:
    """[D] int32 -> [D, n] f32 one-hot; out-of-range rows are all-zero
    (which implements the reference's OOB-deposit drop for free)."""
    return (idx[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]).astype(jnp.float32)


def _gather4_mm(hm: jax.Array, nx: int, ny: int, xi: jax.Array, zi: jax.Array):
    """Corner gathers as one-hot matmuls — XLA gather is slow on TPU; two
    (D,ny)@(ny,nx) matmuls + cheap masked reductions ride the MXU instead."""
    z0 = _onehot(jnp.clip(zi, 0, ny - 1), ny)
    z1 = _onehot(jnp.clip(zi + 1, 0, ny - 1), ny)
    x0 = _onehot(jnp.clip(xi, 0, nx - 1), nx)
    x1 = _onehot(jnp.clip(xi + 1, 0, nx - 1), nx)
    v0 = jnp.einsum("dz,zx->dx", z0, hm, preferred_element_type=jnp.float32)
    v1 = jnp.einsum("dz,zx->dx", z1, hm, preferred_element_type=jnp.float32)
    h00 = jnp.sum(v0 * x0, axis=-1)
    h10 = jnp.sum(v0 * x1, axis=-1)
    h01 = jnp.sum(v1 * x0, axis=-1)
    h11 = jnp.sum(v1 * x1, axis=-1)
    return h00, h10, h01, h11


def _erode_stencil_weights(xf: jax.Array, zf: jax.Array):
    """4x4 stencil weights around the droplet (erosion.cpp:134-144).

    Offsets are k - frac for k in {-1,0,1,2} on each axis (cell-corner frame:
    x - xp = (xi + k) - (xi + xf) = k - xf).  Returns [..., 16].
    """
    k = jnp.arange(-1.0, 3.0, dtype=jnp.float32)
    xo = k[None, :] - xf[..., None]          # [..., 4]
    zo = k[None, :] - zf[..., None]
    w = 1.0 - (xo[..., None, :] ** 2 + zo[..., :, None] ** 2) * 0.25  # [...,4z,4x]
    w = jnp.maximum(w, 0.0) * ERODE_STENCIL_NORM
    return w.reshape(*w.shape[:-2], 16)


def _bilinear_weights(xf: jax.Array, zf: jax.Array):
    """Deposit corner weights (DEPOSIT macro, erosion.cpp:49-54): [..., 4]."""
    return jnp.stack(
        [(1 - xf) * (1 - zf), xf * (1 - zf), (1 - xf) * zf, xf * zf], axis=-1
    )


def _walk_batch(
    hm: jax.Array,
    nx: int,
    ny: int,
    xi0: jax.Array,
    zi0: jax.Array,
    rand_key: jax.Array,
    params: ErosionParams,
    max_steps: int,
):
    """Advance one batch of droplets on a frozen [ny, nx] map snapshot.

    Returns the accumulated height-delta map [ny, nx].  All map access is
    expressed as one-hot matmuls (MXU) instead of gather/scatter:

    * corner reads: 2 one-hot matmuls + masked reductions (`_gather4_mm`)
    * bilinear deposit: rank-1 outer product Z^T (dep) X per droplet,
      summed over the batch as a (ny,D)@(D,nx) matmul
    * 4x4 erosion stencil: contraction einsum(Zo[daz], W[dab], Xo[dbx])
      — the stencil weight tensor is applied between row/col one-hots.
    """
    B = xi0.shape[0]
    f32 = functools.partial(jnp.full, (B,), dtype=jnp.float32)
    h00, h10, h01, h11 = _gather4_mm(hm, nx, ny, xi0, zi0)
    carry = dict(
        xi=xi0, zi=zi0,
        xp=xi0.astype(jnp.float32), zp=zi0.astype(jnp.float32),
        xf=f32(0.0), zf=f32(0.0),
        dx=f32(0.0), dz=f32(0.0),
        s=f32(0.0), v=f32(0.0), w=f32(1.0),
        h=h00, h00=h00, h10=h10, h01=h01, h11=h11,
        alive=jnp.ones((B,), dtype=bool),
        delta=jnp.zeros((ny, nx), jnp.float32),
    )
    zrange_inv = 1.0 / jnp.maximum(jnp.asarray(params.zmax, jnp.float32) - params.zmin, 1e-12)
    ea = jnp.asarray(params.erode_amount, jnp.float32)

    def step(c, key_t):
        alive = c["alive"]
        # gradient from carried corners (erosion.cpp:78)
        gx = c["h00"] + c["h01"] - c["h10"] - c["h11"]
        gz = c["h00"] + c["h10"] - c["h01"] - c["h11"]
        dx = (c["dx"] - gx) * KI + gx
        dz = (c["dz"] - gz) * KI + gz
        dl = jnp.sqrt(dx * dx + dz * dz)
        ang = jax.random.uniform(key_t, (B,), jnp.float32, 0.0, 2.0 * np.pi)
        small = dl <= FLT_EPSILON
        inv = jnp.where(small, 1.0, 1.0 / jnp.maximum(dl, FLT_EPSILON))
        dx = jnp.where(small, jnp.cos(ang), dx * inv)
        dz = jnp.where(small, jnp.sin(ang), dz * inv)
        nxp = c["xp"] + dx
        nzp = c["zp"] + dz
        nxi = jnp.floor(nxp).astype(jnp.int32)
        nzi = jnp.floor(nzp).astype(jnp.int32)
        nxf = nxp - nxi.astype(jnp.float32)
        nzf = nzp - nzi.astype(jnp.float32)
        # LIVE map read: base snapshot + the batch's accumulated delta, so
        # every droplet sees all concurrent droplets' (and its own) writes
        # up to the previous step — the sequential reference's in-place
        # mh_padded semantics (erosion.cpp:95 reads after :100-147 writes
        # of earlier droplets), deterministic-lockstep instead of OMP-racy.
        # This is what keeps the dh -> v -> capacity feedback bounded:
        # once a channel is carved, later concurrent droplets see the
        # carved height and deposit instead of re-eroding the snapshot.
        nh00, nh10, nh01, nh11 = _gather4_mm(hm + c["delta"], nx, ny,
                                             nxi, nzi)
        nh = (nh00 * (1 - nxf) + nh10 * nxf) * (1 - nzf) + (nh01 * (1 - nxf) + nh11 * nxf) * nzf
        # ocean cutoff (erosion.cpp:98): die, drop sediment
        nmax = jnp.maximum(jnp.maximum(nh00, nh10), jnp.maximum(nh01, nh11))
        ocean = nmax < (params.water_plane_z - params.half_dxy)

        outside = (c["xi"] < 0) | (c["zi"] < 0) | (c["xi"] >= nx) | (c["zi"] >= ny)
        h = c["h"]
        s = c["s"]
        # pit / uphill handling (erosion.cpp:100-114)
        uphill = (nh >= h) | outside
        ds_fill = (nh - h) + 0.001
        full = (ds_fill >= s) | outside
        dep_pit = jnp.where(uphill, jnp.where(full, s, ds_fill), 0.0)
        die_pit = uphill & full
        s = s - dep_pit
        h = h + jnp.where(uphill & ~full, ds_fill, 0.0)
        v = jnp.where(uphill & ~full, 0.0, c["v"])

        # transport capacity (erosion.cpp:116-119); dh uses updated h
        dh = h - nh
        q = jnp.maximum(dh, MIN_SLOPE) * v * c["w"] * KQ
        ds2 = s - q
        go_on = alive & ~ocean & ~die_pit  # still flowing this step
        deposit_branch = ds2 >= 0
        dep_cap = jnp.where(go_on & deposit_branch, ds2 * KD, 0.0)
        s = s - dep_cap
        dh = dh + dep_cap
        # erosion branch (erosion.cpp:129-147)
        relh = params.relh_adj_tex + (nh - params.zmin) * zrange_inv
        rockf = jnp.where(relh > params.rock_thresh, 0.5, 2.0)
        e_amt = jnp.minimum(-KR * ds2, dh * 0.99) * rockf
        e_amt = jnp.where(go_on & ~deposit_branch, e_amt, 0.0)
        dh = dh - e_amt
        s = s + e_amt

        # --- apply writes to the carried delta map (one-hot matmuls) ---
        dep_total = jnp.where(alive & ~ocean, dep_pit + dep_cap, 0.0)
        depv = dep_total * ea
        ev = jnp.where(go_on & ~deposit_branch, e_amt, 0.0) * ea
        xi_c, zi_c, xf_c, zf_c = c["xi"], c["zi"], c["xf"], c["zf"]
        # bilinear deposit as a rank-1 outer product per droplet; OOB corner
        # rows are all-zero one-hots = the DEPOSIT_AT outside check
        Zd = _onehot(zi_c, ny) * (1 - zf_c)[:, None] + _onehot(zi_c + 1, ny) * zf_c[:, None]
        Xd = _onehot(xi_c, nx) * (1 - xf_c)[:, None] + _onehot(xi_c + 1, nx) * xf_c[:, None]
        dmap = jnp.einsum("dz,dx->zx", Zd * depv[:, None], Xd,
                          preferred_element_type=jnp.float32)
        # 4x4 erosion stencil with clamped indices (HMAP_INDEX)
        W = _erode_stencil_weights(xf_c, zf_c).reshape(B, 4, 4)  # [d, z(a), x(b)]
        offs = jnp.arange(-1, 3, dtype=jnp.int32)
        Zo = jnp.stack([_onehot(jnp.clip(zi_c + o, 0, ny - 1), ny) for o in offs], axis=1)  # [d,4,ny]
        Xo = jnp.stack([_onehot(jnp.clip(xi_c + o, 0, nx - 1), nx) for o in offs], axis=1)  # [d,4,nx]
        U = jnp.einsum("daz,dab->dbz", Zo, W * ev[:, None, None],
                       preferred_element_type=jnp.float32)
        emap = jnp.einsum("dbz,dbx->zx", U, Xo, preferred_element_type=jnp.float32)
        delta = c["delta"] + dmap - emap

        # velocity update (erosion.cpp:149; sqrt guarded — see
        # erode_reference_strict for the reference's unguarded NaN defect)
        v = jnp.sqrt(jnp.maximum(v * v + KG * dh, 0.0))
        w = c["w"] * (1.0 - KW)
        new_alive = go_on
        keep = ~new_alive

        def sel(new, old):
            return jnp.where(keep, old, new)

        new_c = dict(
            xi=sel(nxi, c["xi"]), zi=sel(nzi, c["zi"]),
            xp=sel(nxp, c["xp"]), zp=sel(nzp, c["zp"]),
            xf=sel(nxf, c["xf"]), zf=sel(nzf, c["zf"]),
            dx=sel(dx, c["dx"]), dz=sel(dz, c["dz"]),
            s=sel(s, c["s"]), v=sel(v, c["v"]), w=sel(w, c["w"]),
            h=sel(nh, c["h"]),
            h00=sel(nh00, c["h00"]), h10=sel(nh10, c["h10"]),
            h01=sel(nh01, c["h01"]), h11=sel(nh11, c["h11"]),
            alive=new_alive,
            delta=delta,
        )
        return new_c, None

    keys = jax.random.split(rand_key, max_steps)
    final, _ = jax.lax.scan(step, carry, keys)
    # droplets still alive at the step cap deposit their carried
    # sediment where they stand (the reference walks to natural death;
    # discarding capped sediment inflated net erosion ~2x on smooth
    # terrain where paths outlive the cap — mass conservation restored)
    depv = jnp.where(final["alive"], final["s"], 0.0) * \
        jnp.asarray(params.erode_amount, jnp.float32)
    Zd = _onehot(final["zi"], ny) * (1 - final["zf"])[:, None] \
        + _onehot(final["zi"] + 1, ny) * final["zf"][:, None]
    Xd = _onehot(final["xi"], nx) * (1 - final["xf"])[:, None] \
        + _onehot(final["xi"] + 1, nx) * final["xf"][:, None]
    dmap = jnp.einsum("dz,dx->zx", Zd * depv[:, None], Xd,
                      preferred_element_type=jnp.float32)
    return final["delta"] + dmap


@functools.partial(
    jax.jit,
    static_argnames=("num_iters", "batch_size", "max_steps", "seed", "pad"),
)
def erode(
    heightmap: jax.Array,
    num_iters: int,
    params: ErosionParams = ErosionParams(),
    min_zval: float | jax.Array = -1.0e9,
    batch_size: int = 1024,
    max_steps: int = 256,
    seed: int = 0,
    pad: int = PAD,
) -> jax.Array:
    """apply_erosion equivalent (erosion.cpp:14-165).

    heightmap: [ys, xs] float32.  Returns the eroded [ys, xs] map, clamped
    below by `min_zval` (erosion.cpp:158-162).  `pad` is the roam ring
    beyond the map border (the reference's mh_padded); pad=0 kills
    droplets at the border instead — used by the MXU-aligned Pallas tile
    path, where 128 + 2*PAD maps would pad to 256-wide matmuls.
    """
    ys, xs = heightmap.shape
    nx, ny = xs + 2 * pad, ys + 2 * pad
    hm = jnp.pad(heightmap.astype(jnp.float32), pad, mode="edge") \
        if pad else heightmap.astype(jnp.float32)

    xi_all, zi_all = droplet_starts(num_iters, xs, ys, pad=pad)
    num_batches = -(-num_iters // batch_size)
    pad_n = num_batches * batch_size - num_iters
    if pad_n:  # dead padding droplets: start outside -> immediate die
        xi_all = jnp.concatenate([xi_all, jnp.full((pad_n,), -10, jnp.int32)])
        zi_all = jnp.concatenate([zi_all, jnp.full((pad_n,), -10, jnp.int32)])
    xi_all = xi_all.reshape(num_batches, batch_size)
    zi_all = zi_all.reshape(num_batches, batch_size)
    keys = jax.random.split(w3d_rng.key(seed, 0xE05), num_batches)

    # Stability comes from the LIVE in-batch map reads in _walk_batch
    # (hm + delta): concurrent droplets see each other's carving as the
    # sequential reference does (in-place mh_padded), so the
    # dh -> v -> capacity feedback self-limits and no per-batch delta
    # clamp is needed (the round-2 5% clamp is deleted; long-run
    # stability asserted unclamped in tests/test_erosion.py).

    def batch_step(h, inp):
        xi, zi, k = inp
        d = _walk_batch(h, nx, ny, xi, zi, k, params, max_steps)
        return h + d, None

    hm, _ = jax.lax.scan(batch_step, hm, (xi_all, zi_all, keys))
    out = hm[pad:pad + ys, pad:pad + xs]
    return jnp.maximum(out, min_zval)


# ---------------------------------------------------------------------------
# Scalar oracle (host) — direct transcription of the algorithm for testing
# ---------------------------------------------------------------------------

def erode_reference_strict(
    heightmap: np.ndarray,
    num_iters: int,
    params: ErosionParams = ErosionParams(),
    min_zval: float = -1.0e9,
) -> np.ndarray:
    """Bit-faithful scalar droplet erosion oracle: float32 arithmetic with
    C++ operator semantics, validated BITWISE against the compiled
    reference erosion.cpp in tests/test_cpp_golden.py.

    Semantics deliberately reproduced from the reference (erosion.cpp),
    including its NaN defect chain: the rock/dirt multiplier is applied
    AFTER the ``dh*0.99`` erosion clamp (erosion.cpp:131-132), so dh can
    go negative and ``sqrtf(v*v+Kg*dh)`` (erosion.cpp:149) NaN-poisons the
    droplet.  NaN then flows through C++ ``min``/``max`` ((b<a)?b:a — NaN
    comparisons false, first operand wins), ``(int)`` casts of NaN/huge
    floats (INT_MIN on x86-64), and the final ``max(min_zval, h)`` clamp
    which launders NaN cells to min_zval.  `erode_reference` (below) keeps
    a guarded sqrt and float64 state — use it when NaN-free behavior is
    wanted; use this when matching the compiled reference.
    """
    f32 = np.float32
    ys, xs = heightmap.shape
    nx, ny = xs + 2 * PAD, ys + 2 * PAD
    hm = np.pad(heightmap.astype(f32), PAD, mode="edge")
    ea = f32(params.erode_amount)
    wpz_cut = f32(f32(params.water_plane_z) - f32(params.half_dxy))
    zmin_r = f32(params.zmin)
    dz_range = f32(f32(params.zmax) - zmin_r)
    rock_thresh = f32(params.rock_thresh)
    relh_adj = f32(params.relh_adj_tex)
    two_pi = f32(np.float64(2.0) * f32(3.141592654))
    INT_MIN = -(2 ** 31)

    def cmax(a, b):      # C++ max(a,b) = (a<b) ? b : a  (NaN -> a)
        return b if a < b else a

    def cmin(a, b):      # C++ min(a,b) = (b<a) ? b : a  (NaN -> a)
        return b if b < a else a

    def cint(v):         # (int)float on x86-64: NaN/overflow -> INT_MIN
        if np.isnan(v) or v >= 2147483648.0 or v < -2147483648.0:
            return INT_MIN
        return int(np.floor(v))

    def hidx(x, z):
        return min(max(z, 0), ny - 1), min(max(x, 0), nx - 1)

    def deposit_at(x, z, wgt, ds):
        if not (x < 0 or z < 0 or x >= nx or z >= ny):
            zz, xx = hidx(x, z)
            hm[zz, xx] += f32(f32(ds * ea) * wgt)

    rg = w3d_rng.RandGen()
    with np.errstate(invalid="ignore", over="ignore"):
        for it in range(num_iters):
            rg.set_state(it + 11, 79 * it + 121)
            xi = PAD + rg.rand() % xs
            zi = PAD + rg.rand() % ys
            xp, zp = f32(xi), f32(zi)
            xf = zf = s = v = f32(0.0)
            w = f32(1.0)
            dx = dz = f32(0.0)
            h = hm[hidx(xi, zi)]
            h00 = h
            h10 = hm[hidx(xi + 1, zi)]
            h01 = hm[hidx(xi, zi + 1)]
            h11 = hm[hidx(xi + 1, zi + 1)]
            for _ in range(4 * nx * ny):
                # C++ left-assoc: ((h00+h01)-h10)-h11
                gx = f32(f32(f32(h00 + h01) - h10) - h11)
                gz = f32(f32(f32(h00 + h10) - h01) - h11)
                dx = f32(f32(f32(dx - gx) * f32(KI)) + gx)
                dz = f32(f32(f32(dz - gz) * f32(KI)) + gz)
                dl = np.sqrt(f32(f32(dx * dx) + f32(dz * dz)))
                if dl <= FLT_EPSILON:
                    # rand_float(): float(0.000001 * (rand()%1000000)),
                    # double product narrowed on return (rand_gen.h:86)
                    rf = f32(np.float64(1e-6) * np.float64(rg.rand() % 1000000))
                    a = f32(rf * two_pi)
                    # sinf/cosf via correctly-rounded f64 then narrow
                    dx = f32(np.cos(np.float64(a)))
                    dz = f32(np.sin(np.float64(a)))
                else:
                    dx, dz = f32(dx / dl), f32(dz / dl)
                nxp, nzp = f32(xp + dx), f32(zp + dz)
                nxi, nzi = cint(nxp), cint(nzp)
                nxf, nzf = f32(nxp - f32(nxi)), f32(nzp - f32(nzi))
                nh00 = hm[hidx(nxi, nzi)]
                nh10 = hm[hidx(nxi + 1, nzi)]
                nh01 = hm[hidx(nxi, nzi + 1)]
                nh11 = hm[hidx(nxi + 1, nzi + 1)]
                nh = f32(f32(f32(nh00 * f32(1 - nxf)) + f32(nh10 * nxf)) * f32(1 - nzf)
                         + f32(f32(nh01 * f32(1 - nxf)) + f32(nh11 * nxf)) * nzf)
                if cmax(cmax(nh00, nh10), cmax(nh01, nh11)) < wpz_cut:
                    break
                outside = xi < 0 or zi < 0 or xi >= nx or zi >= ny
                if nh >= h or outside:
                    ds = f32(f32(nh - h) + f32(0.001))
                    last = ds >= s or outside
                    if last:
                        ds = s
                    for cx, cz, wt in ((xi, zi, f32(f32(1 - xf) * f32(1 - zf))),
                                       (xi + 1, zi, f32(xf * f32(1 - zf))),
                                       (xi, zi + 1, f32(f32(1 - xf) * zf)),
                                       (xi + 1, zi + 1, f32(xf * zf))):
                        deposit_at(cx, cz, wt, ds)
                    h = f32(h + ds)
                    if last:
                        s = f32(0.0)
                        break
                    s = f32(s - ds)
                    v = f32(0.0)
                dh = f32(h - nh)
                q = f32(f32(f32(cmax(dh, f32(MIN_SLOPE)) * v) * w) * f32(KQ))
                ds = f32(s - q)
                if ds >= 0:
                    ds = f32(ds * f32(KD))
                    for cx, cz, wt in ((xi, zi, f32(f32(1 - xf) * f32(1 - zf))),
                                       (xi + 1, zi, f32(xf * f32(1 - zf))),
                                       (xi, zi + 1, f32(f32(1 - xf) * zf)),
                                       (xi + 1, zi + 1, f32(xf * zf))):
                        deposit_at(cx, cz, wt, ds)
                    dh = f32(dh + ds)
                    s = f32(s - ds)
                else:
                    ds = f32(ds * f32(-KR))
                    ds = cmin(ds, f32(dh * f32(0.99)))
                    relh = f32(relh_adj + f32(f32(nh - zmin_r) / dz_range))
                    ds = f32(ds * (f32(0.5) if relh > rock_thresh else f32(2.0)))
                    for z in range(zi - 1, zi + 3):
                        zo = f32(f32(z) - zp)
                        zo2 = f32(zo * zo)
                        for x in range(xi - 1, xi + 3):
                            xo = f32(f32(x) - xp)
                            wt = f32(f32(1) - f32(f32(xo * xo) + zo2) * f32(0.25))
                            if wt <= 0:
                                continue
                            wt = f32(wt * f32(ERODE_STENCIL_NORM))
                            zz, xx = hidx(x, z)
                            hm[zz, xx] -= f32(f32(ds * ea) * wt)
                    dh = f32(dh - ds)
                    s = f32(s + ds)
                v = np.sqrt(f32(f32(v * v) + f32(f32(KG) * dh)))
                w = f32(w * f32(f32(1) - f32(KW)))
                xp, zp, xi, zi, xf, zf = nxp, nzp, nxi, nzi, nxf, nzf
                h, h00, h10, h01, h11 = nh, nh00, nh10, nh01, nh11
    out = hm[PAD:PAD + ys, PAD:PAD + xs]
    res = np.empty_like(out)
    for j in range(ys):            # C++ max(min_zval, h): NaN -> min_zval
        for i in range(xs):
            res[j, i] = cmax(f32(min_zval), out[j, i])
    return res.astype(np.float32)


def erode_reference(
    heightmap: np.ndarray,
    num_iters: int,
    params: ErosionParams = ErosionParams(),
    min_zval: float = -1.0e9,
    rand_dir=None,
) -> np.ndarray:
    """Sequential scalar droplet erosion (validation oracle).

    Follows erosion.cpp:14-165 step-for-step (single-threaded, so exactly
    the reference's semantics with OMP disabled), except float64 state and
    a guarded sqrt (the reference NaN defect — see erode_reference_strict,
    which reproduces it bit-for-bit).  Slow — tests only.
    """
    ys, xs = heightmap.shape
    nx, ny = xs + 2 * PAD, ys + 2 * PAD
    hm = np.pad(heightmap.astype(np.float64), PAD, mode="edge")
    ea = params.erode_amount

    def hidx(x, z):
        return min(max(z, 0), ny - 1), min(max(x, 0), nx - 1)

    def deposit_at(x, z, wgt, ds):
        delta = ds * ea * wgt
        zz, xx = hidx(x, z)
        if not (x < 0 or z < 0 or x >= nx or z >= ny):
            hm[zz, xx] += delta

    rg = w3d_rng.RandGen()
    for it in range(num_iters):
        rg.set_state(it + 11, 79 * it + 121)
        xi = PAD + rg.rand() % xs
        zi = PAD + rg.rand() % ys
        xp, zp, xf, zf = float(xi), float(zi), 0.0, 0.0
        s = v = 0.0
        w = 1.0
        dx = dz = 0.0
        h = hm[hidx(xi, zi)]
        h00, h10, h01, h11 = h, hm[hidx(xi + 1, zi)], hm[hidx(xi, zi + 1)], hm[hidx(xi + 1, zi + 1)]
        for _ in range(4 * nx * ny):
            gx = h00 + h01 - h10 - h11
            gz = h00 + h10 - h01 - h11
            dx = (dx - gx) * KI + gx
            dz = (dz - gz) * KI + gz
            dl = np.sqrt(dx * dx + dz * dz)
            if dl <= FLT_EPSILON:
                a = (rand_dir(it) if rand_dir else rg.rand_float() * 2 * np.pi)
                dx, dz = np.cos(a), np.sin(a)
            else:
                dx, dz = dx / dl, dz / dl
            nxp, nzp = xp + dx, zp + dz
            nxi, nzi = int(np.floor(nxp)), int(np.floor(nzp))
            nxf, nzf = nxp - nxi, nzp - nzi
            nh00 = hm[hidx(nxi, nzi)]
            nh10 = hm[hidx(nxi + 1, nzi)]
            nh01 = hm[hidx(nxi, nzi + 1)]
            nh11 = hm[hidx(nxi + 1, nzi + 1)]
            nh = (nh00 * (1 - nxf) + nh10 * nxf) * (1 - nzf) + (nh01 * (1 - nxf) + nh11 * nxf) * nzf
            if max(nh00, nh10, nh01, nh11) < params.water_plane_z - params.half_dxy:
                break
            outside = xi < 0 or zi < 0 or xi >= nx or zi >= ny
            if nh >= h or outside:
                ds = (nh - h) + 0.001
                if ds >= s or outside:
                    ds = s
                    for cx, cz, wt in ((xi, zi, (1 - xf) * (1 - zf)), (xi + 1, zi, xf * (1 - zf)),
                                       (xi, zi + 1, (1 - xf) * zf), (xi + 1, zi + 1, xf * zf)):
                        deposit_at(cx, cz, wt, ds)
                    h += ds
                    s = 0.0
                    break
                for cx, cz, wt in ((xi, zi, (1 - xf) * (1 - zf)), (xi + 1, zi, xf * (1 - zf)),
                                   (xi, zi + 1, (1 - xf) * zf), (xi + 1, zi + 1, xf * zf)):
                    deposit_at(cx, cz, wt, ds)
                h += ds
                s -= ds
                v = 0.0
            dh = h - nh
            q = max(dh, MIN_SLOPE) * v * w * KQ
            ds = s - q
            if ds >= 0:
                ds *= KD
                for cx, cz, wt in ((xi, zi, (1 - xf) * (1 - zf)), (xi + 1, zi, xf * (1 - zf)),
                                   (xi, zi + 1, (1 - xf) * zf), (xi + 1, zi + 1, xf * zf)):
                    deposit_at(cx, cz, wt, ds)
                dh += ds
                s -= ds
            else:
                ds *= -KR
                ds = min(ds, dh * 0.99)
                relh = params.relh_adj_tex + (nh - params.zmin) / max(params.zmax - params.zmin, 1e-12)
                ds *= 0.5 if relh > params.rock_thresh else 2.0
                for z in range(zi - 1, zi + 3):
                    zo = z - zp
                    for x in range(xi - 1, xi + 3):
                        xo = x - xp
                        wt = 1 - (xo * xo + zo * zo) * 0.25
                        if wt <= 0:
                            continue
                        wt *= ERODE_STENCIL_NORM
                        zz, xx = hidx(x, z)
                        hm[zz, xx] -= ds * ea * wt
                dh -= ds
                s += ds
            v = np.sqrt(max(v * v + KG * dh, 0.0))
            w *= 1 - KW
            xp, zp, xi, zi, xf, zf = nxp, nzp, nxi, nzi, nxf, nzf
            h, h00, h10, h01, h11 = nh, nh00, nh10, nh01, nh11
    out = hm[PAD:PAD + ys, PAD:PAD + xs]
    return np.maximum(out, min_zval).astype(np.float32)
