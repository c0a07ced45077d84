"""Pallas TPU kernel: Morton-banded pair collisions.

The XLA path (physics/step.py banded_pair_collisions) runs a 64-step
`fori_loop`, each step ~25 elementwise ops over [N] rows with
`jnp.roll` shifts — it re-touches HBM-resident accumulators every
iteration.  This kernel keeps the whole population in VMEM as an
[S, 128] tile (row-major flattening of the Morton-sorted order) and
expresses the sorted-order shift i -> i+d as two composed rolls:

    shifted[r, j] = x[r, j+d]            (lane roll by -d)   if j+d < L
                  = x[r+1, j+d-L]        (sublane roll -1, lane roll)

valid for d < L = 128 >= window.  All shifts are `pltpu.roll` (native
vector rotates); the entire window loop runs register/VMEM-resident.

Same math as the XLA path; differences are only f32 op ordering.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128  # lane width; window must stay < L


def _shift_neg(x, d):
    """shifted[k] = x[k+d] over the row-major flat order of [S, L].
    pltpu.roll requires non-negative shifts: roll by -d == roll by
    (size - d)."""
    S = x.shape[0]
    t1 = pltpu.roll(x, L - d, 1)
    t2 = pltpu.roll(pltpu.roll(x, S - 1, 0), L - d, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < L - d, t1, t2)


def _shift_pos(x, d):
    """shifted[k] = x[k-d] (inverse of _shift_neg)."""
    t1 = pltpu.roll(x, d, 1)
    t2 = pltpu.roll(pltpu.roll(x, 1, 0), d, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= d, t1, t2)


def _pairs_kernel(px_ref, py_ref, pz_ref, vx_ref, vy_ref, vz_ref,
                  rad_ref, mass_ref, elas_ref, act_ref,
                  opx_ref, opy_ref, opz_ref, ovx_ref, ovy_ref, ovz_ref, *,
                  S: int, n: int, window: int):
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
    flat = (jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) * L
            + jax.lax.broadcasted_iota(jnp.int32, (S, L), 1))

    z = jnp.zeros((S, L), jnp.float32)
    dpx = dpy = dpz = dvx = dvy = dvz = z

    for d in range(1, window + 1):   # static unroll: d is a roll amount
        sh = lambda a: _shift_neg(a, d)
        ex = px - sh(px)
        ey = py - sh(py)
        ez = pz - sh(pz)
        d2 = jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-12)
        dist = jnp.sqrt(d2)
        rsum = rad + sh(rad)
        valid = (flat < n - d) & (act > 0) & (sh(act) > 0)
        hit = valid & (dist < rsum)
        pen = jnp.where(hit, rsum - dist, 0.0)
        m_i = mass
        m_j = sh(mass)
        msum = m_i + m_j
        mw_i = m_j / msum
        mw_j = m_i / msum
        push_i = pen * mw_i / dist
        push_j = pen * mw_j / dist
        relv = ((vx - sh(vx)) * ex + (vy - sh(vy)) * ey
                + (vz - sh(vz)) * ez) / d2
        eij = jnp.minimum(elas, sh(elas))
        a = jnp.where(hit & (relv < 0), -(1.0 + eij) * relv, 0.0)
        ai = a * mw_i
        aj = a * mw_j
        unsh = lambda v: _shift_pos(v, d)
        dpx = dpx + push_i * ex - unsh(push_j * ex)
        dpy = dpy + push_i * ey - unsh(push_j * ey)
        dpz = dpz + push_i * ez - unsh(push_j * ez)
        dvx = dvx + ai * ex - unsh(aj * ex)
        dvy = dvy + ai * ey - unsh(aj * ey)
        dvz = dvz + ai * ez - unsh(aj * ez)

    opx_ref[:, :] = dpx
    opy_ref[:, :] = dpy
    opz_ref[:, :] = dpz
    ovx_ref[:, :] = dvx
    ovy_ref[:, :] = dvy
    ovz_ref[:, :] = dvz


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def banded_pairs_pallas(px, py, pz, vx, vy, vz, radius, mass, elas, active,
                        window: int = 64, interpret: bool = False):
    """Drop-in Pallas version of banded_pair_collisions (same outputs)."""
    assert window < L
    n = px.shape[0]
    S = -(-n // L)
    npad = S * L
    padf = lambda a: jnp.pad(a.astype(jnp.float32), (0, npad - n)).reshape(S, L)
    args = [padf(a) for a in (px, py, pz, vx, vy, vz, radius)]
    args.append(jnp.pad(mass.astype(jnp.float32), (0, npad - n),
                        constant_values=1.0).reshape(S, L))
    args.append(padf(elas))
    args.append(padf(active.astype(jnp.float32)))
    kern = functools.partial(_pairs_kernel, S=S, n=n, window=window)
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((S, L), jnp.float32)] * 6,
        interpret=interpret,
    )(*args)
    return tuple(o.reshape(npad)[:n] for o in outs)
