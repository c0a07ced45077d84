"""Pallas TPU kernel: fully fused droplet-erosion batch walk.

The XLA formulation (ops/erosion.py `_walk_batch`) is HBM-bound: every
scan step materializes ~30 [B, n] intermediates (one-hots, gather
products, stencil tensors) in HBM — ~2 GB of traffic per step across a
256-tile batch.  This kernel runs the ENTIRE walk per tile inside one
program: the tile's padded heightmap (~74 KB), the droplet state and
every per-step one-hot/matmul live in VMEM; HBM sees only the input map,
the droplet seeds, and the output delta map.

Same math as `_walk_batch` (LIVE reads — snapshot + the batch's carried
delta map, so concurrent droplets see each other's carving like the
sequential reference's in-place updates — carried local height, bilinear
deposits, 4x4 stencil erosion, ocean/pit kills); the only behavioral
difference is the flat-spot random direction, which comes from a
precomputed [steps, B] angle table shared across tiles.

Mosaic layout rules encoded here (learned by crash):
* per-droplet state is [1, B] ROWS — B in the lane dim must be a
  multiple of 128; 1-D carries crash layout inference;
* one-hots are [n, B] (droplet lanes x grid sublanes), so gathers are
  (ny,nx)@(nx,B) matmuls and scatters (ny,B)@(B,nx);
* no dynamic lane slicing — the per-step angle row is selected with a
  value-dynamic one-hot matmul.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..erosion import (KQ, KW, KR, KD, KI, MIN_SLOPE, KG, FLT_EPSILON,
                       ERODE_STENCIL_NORM)


def _erosion_kernel(par_ref, hm_ref, xi_ref, zi_ref, ang_ref, out_ref, *,
                    B: int, ny: int, nx: int, steps: int):
    # runtime scalars from SMEM (traced under the outer jit)
    erode_amount = par_ref[0]
    water_cut = par_ref[1]
    zmin = par_ref[2]
    zrange_inv = par_ref[3]
    rock_thresh = par_ref[4]
    relh_adj = par_ref[5]
    hm = hm_ref[0, :, :]                       # [ny, nx] frozen snapshot
    xi0 = xi_ref[0, :, :].astype(jnp.float32)  # [1, B] cell coords as f32
    zi0 = zi_ref[0, :, :].astype(jnp.float32)
    # all loop-carried state is f32 (Mosaic fails to legalize scf.for with
    # int/bool vector carries); integer cell coords are exact in f32
    sub_x = jax.lax.broadcasted_iota(jnp.int32, (nx, B), 0).astype(jnp.float32)
    sub_y = jax.lax.broadcasted_iota(jnp.int32, (ny, B), 0).astype(jnp.float32)

    def onehot_x(idx):                         # [1,B] -> [nx,B]
        return (idx == sub_x).astype(jnp.float32)

    def onehot_y(idx):
        return (idx == sub_y).astype(jnp.float32)

    def gather4(xi, zi, cur=None):
        m = hm if cur is None else cur
        x0 = onehot_x(jnp.clip(xi, 0.0, nx - 1.0))
        x1 = onehot_x(jnp.clip(xi + 1.0, 0.0, nx - 1.0))
        z0 = onehot_y(jnp.clip(zi, 0.0, ny - 1.0))
        z1 = onehot_y(jnp.clip(zi + 1.0, 0.0, ny - 1.0))
        w0 = jax.lax.dot_general(m, x0, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [ny,B]
        w1 = jax.lax.dot_general(m, x1, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return (jnp.sum(w0 * z0, 0, keepdims=True),
                jnp.sum(w1 * z0, 0, keepdims=True),
                jnp.sum(w0 * z1, 0, keepdims=True),
                jnp.sum(w1 * z1, 0, keepdims=True))

    h00, h10, h01, h11 = gather4(xi0, zi0)
    f0 = jnp.zeros((1, B), jnp.float32)

    def step_fn(t, st):
        (xi, zi, xp, zp, xf, zf, dxv, dzv, s, v, w, h,
         h00, h10, h01, h11, alive, delta) = st
        gx = h00 + h01 - h10 - h11
        gz = h00 + h10 - h01 - h11
        dxv = (dxv - gx) * KI + gx
        dzv = (dzv - gz) * KI + gz
        dl = jnp.sqrt(dxv * dxv + dzv * dzv)
        # angle row t via value-dynamic one-hot matmul: [1,steps]@[steps,B]
        step_oh = (jax.lax.broadcasted_iota(jnp.int32, (1, steps), 1)
                   == t).astype(jnp.float32)
        ang = jax.lax.dot_general(step_oh, ang_ref[:, :],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        small = dl <= FLT_EPSILON
        inv = jnp.where(small, 1.0, 1.0 / jnp.maximum(dl, FLT_EPSILON))
        dxv = jnp.where(small, jnp.cos(ang), dxv * inv)
        dzv = jnp.where(small, jnp.sin(ang), dzv * inv)
        nxp = xp + dxv
        nzp = zp + dzv
        nxi = jnp.floor(nxp)                   # f32 integer-valued
        nzi = jnp.floor(nzp)
        nxf = nxp - nxi
        nzf = nzp - nzi
        # LIVE read: base + batch delta so far (matches _walk_batch —
        # concurrent droplets see each other's writes, which is the
        # stabilizing in-place semantics of the reference's mh_padded)
        nh00, nh10, nh01, nh11 = gather4(nxi, nzi, hm + delta)
        nh = (nh00 * (1 - nxf) + nh10 * nxf) * (1 - nzf) \
            + (nh01 * (1 - nxf) + nh11 * nxf) * nzf
        nmax = jnp.maximum(jnp.maximum(nh00, nh10), jnp.maximum(nh01, nh11))
        ocean = nmax < water_cut

        outside = (xi < 0.0) | (zi < 0.0) | (xi >= float(nx)) | (zi >= float(ny))
        uphill = (nh >= h) | outside
        ds_fill = (nh - h) + 0.001
        full = (ds_fill >= s) | outside
        dep_pit = jnp.where(uphill, jnp.where(full, s, ds_fill), 0.0)
        die_pit = uphill & full
        s = s - dep_pit
        h = h + jnp.where(uphill & ~full, ds_fill, 0.0)
        v = jnp.where(uphill & ~full, 0.0, v)

        dh = h - nh
        q = jnp.maximum(dh, MIN_SLOPE) * v * w * KQ
        ds2 = s - q
        alive_b = alive > 0.5
        go_on = alive_b & ~ocean & ~die_pit
        deposit_branch = ds2 >= 0
        dep_cap = jnp.where(go_on & deposit_branch, ds2 * KD, 0.0)
        s = s - dep_cap
        dh = dh + dep_cap
        relh = relh_adj + (nh - zmin) * zrange_inv
        rockf = jnp.where(relh > rock_thresh, 0.5, 2.0)
        e_amt = jnp.minimum(-KR * ds2, dh * 0.99) * rockf
        e_amt = jnp.where(go_on & ~deposit_branch, e_amt, 0.0)
        dh = dh - e_amt
        s = s + e_amt

        dep_total = jnp.where(alive_b & ~ocean, dep_pit + dep_cap, 0.0)
        depv = dep_total * erode_amount
        ev = e_amt * erode_amount

        # one-hot rows built ONCE per step and shared between the
        # deposit and the 4x4 stencil (was 24 builds/step, now 8 —
        # the one-hot construction dominates the VPU cost).  CLAMPED like
        # the reference's HMAP_INDEX: border taps land on the edge cells
        # (with pad=0 that edge is the real map border)
        ohx = [onehot_x(jnp.clip(xi + float(k), 0.0, nx - 1.0))
               for k in (-1, 0, 1, 2)]
        ohy = [onehot_y(jnp.clip(zi + float(k), 0.0, ny - 1.0))
               for k in (-1, 0, 1, 2)]
        # deposit: [ny,B] (rows weighted by depv) @ [B,nx] -> [ny,nx].
        # All four deposit one-hots are UNCLIPPED: the reference drops
        # out-of-bounds deposit writes (deposit_at's bounds check), and a
        # dying outside droplet can still deposit its sediment — clipping
        # would smear it onto the border row instead of dropping it.
        Zd = onehot_y(zi) * (1 - zf) + onehot_y(zi + 1.0) * zf
        Xd = onehot_x(xi) * (1 - xf) + onehot_x(xi + 1.0) * xf
        dmap = jax.lax.dot_general(Zd * depv, Xd, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        # erosion: 4 z-offset rows of x-weighted one-hots
        emap = jnp.zeros((ny, nx), jnp.float32)
        for iz, ko_z in enumerate((-1, 0, 1, 2)):
            zo = float(ko_z) - zf
            Xw = jnp.zeros((nx, B), jnp.float32)
            for ix, ko_x in enumerate((-1, 0, 1, 2)):
                xo = float(ko_x) - xf
                wgt = jnp.maximum(1.0 - (xo * xo + zo * zo) * 0.25, 0.0) \
                    * ERODE_STENCIL_NORM
                Xw = Xw + ohx[ix] * (wgt * ev)
            emap = emap + jax.lax.dot_general(
                ohy[iz], Xw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        delta = delta + dmap - emap

        v = jnp.sqrt(jnp.maximum(v * v + KG * dh, 0.0))
        w = w * (1.0 - KW)
        new_alive = go_on.astype(jnp.float32)
        keep = ~go_on
        sel = lambda new, old: jnp.where(keep, old, new)
        return (sel(nxi, xi), sel(nzi, zi), sel(nxp, xp), sel(nzp, zp),
                sel(nxf, xf), sel(nzf, zf), sel(dxv, dxv), sel(dzv, dzv),
                sel(s, s), sel(v, v), sel(w, w), sel(nh, h),
                sel(nh00, h00), sel(nh10, h10), sel(nh01, h01), sel(nh11, h11),
                new_alive, delta)

    init = (xi0, zi0, xi0, zi0,
            f0, f0, f0, f0, f0, f0, f0 + 1.0, h00,
            h00, h10, h01, h11, jnp.ones((1, B), jnp.float32),
            jnp.zeros((ny, nx), jnp.float32))
    final = jax.lax.fori_loop(0, steps, step_fn, init)
    # cap deposit: droplets alive at the step cap drop their carried
    # sediment where they stand (matches ops/erosion._walk_batch; the
    # reference walks to natural death, so discarding capped sediment
    # would inflate net erosion)
    (fxi, fzi, _fxp, _fzp, fxf, fzf, _fdx, _fdz, fs, _fv, _fw, _fh,
     _h00, _h10, _h01, _h11, falive, fdelta) = final
    fdep = jnp.where(falive > 0.5, fs, 0.0) * erode_amount
    Zf = onehot_y(fzi) * (1 - fzf) + onehot_y(fzi + 1.0) * fzf
    Xf = onehot_x(fxi) * (1 - fxf) + onehot_x(fxi + 1.0) * fxf
    fmap = jax.lax.dot_general(Zf * fdep, Xf, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    out_ref[0, :, :] = fdelta + fmap


@functools.partial(
    jax.jit,
    static_argnames=("steps", "interpret"))
def erosion_walk_pallas(hm, xi0, zi0, angles, params6, steps: int,
                        interpret: bool = False):
    """Fused walk for a batch of tiles.

    hm [T, ny, nx] height maps (read live: snapshot + carried batch
    delta); xi0/zi0 [T, B] droplet seeds
    (B must be a multiple of 128); angles [steps, B] flat-spot directions
    (shared across tiles); params6: [6] f32 runtime scalars (erode_amount,
    water_cut, zmin, zrange_inv, rock_thresh, relh_adj) — SMEM, so they
    may be traced values (wpz/zmax_est flow through tile_batch_step).
    Returns delta maps [T, ny, nx].
    """
    T, ny, nx = hm.shape
    B = xi0.shape[1]
    kern = functools.partial(_erosion_kernel, B=B, ny=ny, nx=nx, steps=steps)
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ny, nx), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ny, nx), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, ny, nx), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(params6, jnp.float32), hm,
      xi0[:, None, :], zi0[:, None, :], angles)

def _angle_table(rand_key, max_steps: int, B: int):
    """Reproduce _walk_batch's per-step flat-spot angle draws
    (ops/erosion.py scans over split keys, uniform [0, 2pi) per droplet)."""
    keys = jax.random.split(rand_key, max_steps)
    return jax.vmap(
        lambda k: jax.random.uniform(k, (B,), jnp.float32, 0.0, 2 * np.pi)
    )(keys)


@functools.partial(
    jax.jit,
    static_argnames=("num_iters", "batch_size", "max_steps", "seed",
                     "interpret"))
def erode_tiles_pallas(heightmaps, num_iters: int, params,
                       min_zval: float = -1.0e9, batch_size: int = 512,
                       max_steps: int = 64, seed: int = 0,
                       interpret: bool = False):
    """Fused-kernel equivalent of vmap(E.erode) over a tile batch.

    heightmaps: [T, ys, xs].  Same batching/seeding contract as
    ops/erosion.erode (apply_erosion, erosion.cpp:14-165): droplets are
    seeded by the reference LCG, walked batch_size at a time with LIVE
    in-batch map reads, and each batch's delta is applied before the
    next.
    batch_size must be a multiple of 128 (lane width).

    vs the XLA path this differs only in MXU f32 accumulation order;
    measured divergence at production shapes is ~100 cells of 4.7M
    (droplets whose branch flips on ~1e-7 rounding).
    """
    from ..erosion import droplet_starts
    from ...utils import rng as w3d_rng

    if batch_size % 128:
        raise ValueError("batch_size must be a multiple of 128")
    T, ys, xs = heightmaps.shape
    # NO pad ring: 128-tile maps stay exactly MXU-aligned (a 136-wide
    # map pads every gather/scatter matmul contraction to 256 lanes —
    # measured ~1.9x the MACs).  Border droplets die at the map edge
    # instead of roaming a cropped ring; in tiled mode tiles already
    # erode independently, so the ring never carried cross-tile truth.
    hm = heightmaps.astype(jnp.float32)

    xi_all, zi_all = droplet_starts(num_iters, xs, ys, pad=0)
    num_batches = -(-num_iters // batch_size)
    pad_n = num_batches * batch_size - num_iters
    if pad_n:  # dead droplets: start outside -> die step 1, deposit 0
        xi_all = jnp.concatenate([xi_all, jnp.full((pad_n,), -10, jnp.int32)])
        zi_all = jnp.concatenate([zi_all, jnp.full((pad_n,), -10, jnp.int32)])
    xi_all = xi_all.reshape(num_batches, batch_size)
    zi_all = zi_all.reshape(num_batches, batch_size)
    keys = jax.random.split(w3d_rng.key(seed, 0xE05), num_batches)

    wpz_adj = params.water_plane_z - params.half_dxy
    zr_inv = 1.0 / jnp.maximum(
        jnp.asarray(params.zmax, jnp.float32) - params.zmin, 1e-12)
    pt = jnp.stack([
        jnp.asarray(params.erode_amount, jnp.float32),
        jnp.asarray(wpz_adj, jnp.float32),
        jnp.asarray(params.zmin, jnp.float32),
        zr_inv,
        jnp.asarray(params.rock_thresh, jnp.float32),
        jnp.asarray(params.relh_adj_tex, jnp.float32)])

    # stability comes from the live in-batch reads above — no clamp
    # (matches ops/erosion.erode; round-2 5% limiter deleted)

    def batch_step(h, inp):
        xi, zi, k = inp
        ang = _angle_table(k, max_steps, batch_size)
        xiT = jnp.broadcast_to(xi, (T, batch_size))
        ziT = jnp.broadcast_to(zi, (T, batch_size))
        d = erosion_walk_pallas(h, xiT, ziT, ang, pt, max_steps,
                                interpret=interpret)
        return h + d, None

    hm, _ = jax.lax.scan(batch_step, hm, (xi_all, zi_all, keys))
    return jnp.maximum(hm, min_zval)
