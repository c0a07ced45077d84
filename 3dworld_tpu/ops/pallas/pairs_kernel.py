"""Pallas TPU kernel: sorted-order banded pair collisions.

The XLA block path (physics/step.py block_pair_collisions) evaluates
dense [B, B] pair matrices — N*B*1.5 pair slots for an exactness bound
of B ranks.  This kernel instead walks the sorted order by SHIFT
distance: for each d in 1..window it compares every object with its
d-th successor, so the pair count is N*window — ~3x less arithmetic
for the same rank-distance guarantee — and the whole loop stays
VMEM-resident (the block path's [G,B,B] intermediates live in HBM
whenever XLA's fusion gives up).

The population is an [S, 128] tile (row-major flattening of the
x-sorted order); the sorted-order shift i -> i+d decomposes as
d = q*L + r and becomes two composed native vector rotates:

    shifted[row, j] = x[row+q,   j+r]     if j < L-r   (lane roll L-r)
                    = x[row+q+1, j+r-L]   otherwise    (one more sublane)

Same math as the XLA paths; differences are only f32 op ordering.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128  # lane width


def _shift_neg(x, d):
    """shifted[k] = x[k+d] over the row-major flat order of [S, L], any
    0 < d < S*L.  pltpu.roll requires non-negative shifts: roll by -d ==
    roll by (size - d)."""
    S = x.shape[0]
    q, r = divmod(d, L)
    if r == 0:
        return pltpu.roll(x, S - q, 0)
    t1 = pltpu.roll(pltpu.roll(x, S - q, 0), L - r, 1)
    t2 = pltpu.roll(pltpu.roll(x, S - q - 1, 0), L - r, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < L - r, t1, t2)


def _shift_pos(x, d):
    """shifted[k] = x[k-d] (inverse of _shift_neg)."""
    S = x.shape[0]
    q, r = divmod(d, L)
    if r == 0:
        return pltpu.roll(x, q, 0)
    t1 = pltpu.roll(pltpu.roll(x, q, 0), r, 1)
    t2 = pltpu.roll(pltpu.roll(x, q + 1, 0), r, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= r, t1, t2)


def _pairs_kernel(px_ref, py_ref, pz_ref, vx_ref, vy_ref, vz_ref,
                  rad_ref, mass_ref, elas_ref, act_ref,
                  opx_ref, opy_ref, opz_ref, ovx_ref, ovy_ref, ovz_ref, *,
                  S: int, n: int, window: int, i_limit: int):
    """fori_loop over shift distance d = window..1 with ONLY unit shifts
    in the body (a static unroll of `window` distinct roll amounts blows
    the 16M scoped-VMEM stack at window ~300).

    * i-side: the forward-shifted input copies start pre-rolled by
      `window` (one static roll) and un-roll by 1 each iteration, so at
      iteration d they hold x[k+d].
    * j-side: contributions c_d land at position k+d.  Horner over the
      unit shift S (S a[k] = a[k-1]):  Q <- S Q + c_d for d descending
      gives Q = sum_e S^(e-1) c_e, so J = S Q — again only unit shifts.

    Every carry is an f32 vector (Mosaic cannot legalize int/bool vector
    carries in scf.for — see skills/verify)."""
    px = px_ref[:, :]
    py = py_ref[:, :]
    pz = pz_ref[:, :]
    vx = vx_ref[:, :]
    vy = vy_ref[:, :]
    vz = vz_ref[:, :]
    rad = rad_ref[:, :]
    mass = mass_ref[:, :]
    elas = elas_ref[:, :]
    act = act_ref[:, :]
    # Mosaic's tpu.iota is integer-only; convert to f32 afterward (flat
    # indices stay exact in f32 below 2^24)
    flatf = (jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) * L
             + jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
             ).astype(jnp.float32)

    z = jnp.zeros((S, L), jnp.float32)
    shw = lambda a: _shift_neg(a, window)
    carry = (shw(px), shw(py), shw(pz), shw(vx), shw(vy), shw(vz),
             shw(rad), shw(mass), shw(elas), shw(act),
             z, z, z, z, z, z,      # i-side accumulators
             z, z, z, z, z, z)      # j-side Horner Q

    def body(i, c):
        (spx, spy, spz, svx, svy, svz, srad, smass, selas, sact,
         dpx, dpy, dpz, dvx, dvy, dvz, qpx, qpy, qpz, qvx, qvy, qvz) = c
        d = (window - i).astype(jnp.float32)        # scalar f32
        ex = px - spx
        ey = py - spy
        ez = pz - spz
        d2 = jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-12)
        dist = jnp.sqrt(d2)
        rsum = rad + srad
        valid = (flatf < jnp.minimum(jnp.float32(i_limit), jnp.float32(n) - d)) \
            & (act > 0) & (sact > 0)
        hit = valid & (dist < rsum)
        pen = jnp.where(hit, rsum - dist, 0.0)
        msum = mass + smass
        mw_i = smass / msum
        mw_j = mass / msum
        push_i = pen * mw_i / dist
        push_j = pen * mw_j / dist
        relv = ((vx - svx) * ex + (vy - svy) * ey + (vz - svz) * ez) / d2
        eij = jnp.minimum(elas, selas)
        a = jnp.where(hit & (relv < 0), -(1.0 + eij) * relv, 0.0)
        ai = a * mw_i
        aj = a * mw_j
        s1 = lambda v: _shift_pos(v, 1)
        return (s1(spx), s1(spy), s1(spz), s1(svx), s1(svy), s1(svz),
                s1(srad), s1(smass), s1(selas), s1(sact),
                dpx + push_i * ex, dpy + push_i * ey, dpz + push_i * ez,
                dvx + ai * ex, dvy + ai * ey, dvz + ai * ez,
                s1(qpx) - push_j * ex, s1(qpy) - push_j * ey,
                s1(qpz) - push_j * ez,
                s1(qvx) - aj * ex, s1(qvy) - aj * ey, s1(qvz) - aj * ez)

    out = jax.lax.fori_loop(0, window, body, carry)
    (dpx, dpy, dpz, dvx, dvy, dvz,
     qpx, qpy, qpz, qvx, qvy, qvz) = out[10:]
    s1 = lambda v: _shift_pos(v, 1)
    opx_ref[:, :] = dpx + s1(qpx)
    opy_ref[:, :] = dpy + s1(qpy)
    opz_ref[:, :] = dpz + s1(qpz)
    ovx_ref[:, :] = dvx + s1(qvx)
    ovy_ref[:, :] = dvy + s1(qvy)
    ovz_ref[:, :] = dvz + s1(qvz)


@functools.partial(jax.jit, static_argnames=("window", "i_limit", "interpret"))
def banded_pairs_pallas(px, py, pz, vx, vy, vz, radius, mass, elas, active,
                        window: int = 64, i_limit: int | None = None,
                        interpret: bool = False):
    """Drop-in Pallas version of banded/block_pair_collisions (same
    outputs).  Exact for every pair within `window` ranks of the sorted
    order — with the x-sort key that means exact while no rsum-wide x
    slab holds more than `window` objects (audited in
    tests/test_physics_oracle.py).  `i_limit` as in
    banded_pair_collisions (sharded halo pass support)."""
    n = px.shape[0]
    S = -(-n // L)
    assert window < S * L
    npad = S * L
    padf = lambda a: jnp.pad(a.astype(jnp.float32), (0, npad - n)).reshape(S, L)
    args = [padf(a) for a in (px, py, pz, vx, vy, vz, radius)]
    args.append(jnp.pad(mass.astype(jnp.float32), (0, npad - n),
                        constant_values=1.0).reshape(S, L))
    args.append(padf(elas))
    args.append(padf(active.astype(jnp.float32)))
    kern = functools.partial(_pairs_kernel, S=S, n=n, window=window,
                             i_limit=n if i_limit is None else i_limit)
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((S, L), jnp.float32)] * 6,
        interpret=interpret,
    )(*args)
    return tuple(o.reshape(npad)[:n] for o in outs)
