"""Pallas TPU kernel: fused sine-table tile noise.

The XLA path (ops/noise.py) materializes per-tile term tables
X[n, 90] / Y[n, 90] in HBM before the einsum.  This kernel fuses the
whole tile evaluation in VMEM: build both term tables with the VPU
(iota + sin) and contract them on the MXU, writing only the [n, n]
heightmap block — per tile, HBM traffic drops from
(2*n*K + n^2) floats to n^2.

Grid: one program per tile; the 5 x K sine-table parameter rows and the
per-tile origins are broadcast inputs.  Falls back to interpret mode off
TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import noise as N


def _tile_noise_kernel(params_ref, origin_ref, out_ref, *, n: int, kpad: int,
                       dx: float, dy: float, msx: float, msy: float,
                       ms2: float, mszi: float):
    """params_ref: [8, kpad] rows = (mag, phase_y, phase_x, freq_y, freq_x,
    mask, 0, 0); origin_ref: [1, 2] (x0, y0); out_ref: [n, n]."""
    mag = params_ref[0, :]
    phase_y = params_ref[1, :]
    phase_x = params_ref[2, :]
    freq_y = params_ref[3, :]
    freq_x = params_ref[4, :]
    mask = params_ref[5, :]
    x0 = origin_ref[0, 0, 0]
    y0 = origin_ref[0, 0, 1]

    x_mult = msx * freq_x                    # [K]
    y_mult = msy * freq_y
    x_const = ms2 * freq_x + phase_x + x_mult * (dx * x0)
    y_const = ms2 * freq_y + phase_y + y_mult * (dy * y0)

    xi = jax.lax.broadcasted_iota(jnp.int32, (n, kpad), 0).astype(jnp.float32)
    xt = jnp.sin(x_mult[None, :] * dx * xi + x_const[None, :]) * mask[None, :]
    yt = (mszi * mag)[None, :] * jnp.sin(y_mult[None, :] * dy * xi + y_const[None, :])
    # height[y, x] = sum_k X[x,k] Y[y,k]  ->  yt @ xt^T on the MXU
    out_ref[0, :, :] = jax.lax.dot_general(
        yt, xt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n", "dx", "dy", "mesh_scale", "mesh_scale_z_inv",
                     "start_sin", "interpret"))
def tile_noise_pallas(table: N.SineTable, x0, y0, n: int, dx: float, dy: float,
                      mesh_scale: float = 1.0, mesh_scale_z_inv: float = 1.0,
                      start_sin: int = 0, interpret: bool = False):
    """Batched fused tile noise: x0/y0 [T] tile origins (grid units) ->
    [T, n, n] raw heights (sine mode)."""
    T = x0.shape[0]
    K = N.F_TABLE_SIZE
    kpad = 128  # lane-align the term axis
    pad = lambda a: jnp.pad(jnp.asarray(a, jnp.float32), (0, kpad - K))
    mask = (jnp.arange(kpad) < K) & (jnp.arange(kpad) >= start_sin)
    params = jnp.stack([
        pad(table.mag), pad(table.phase_y), pad(table.phase_x),
        pad(table.freq_y), pad(table.freq_x), mask.astype(jnp.float32),
        jnp.zeros(kpad), jnp.zeros(kpad)])
    origins = jnp.stack([x0.astype(jnp.float32), y0.astype(jnp.float32)],
                        axis=-1).reshape(T, 1, 2)

    msx = mesh_scale / dx
    msy = mesh_scale / dy
    kern = functools.partial(
        _tile_noise_kernel, n=n, kpad=kpad, dx=dx, dy=dy,
        msx=msx, msy=msy, ms2=0.5 * mesh_scale, mszi=mesh_scale_z_inv)
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, kpad), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, n), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, n, n), jnp.float32),
        interpret=interpret,
    )(params, origins)
