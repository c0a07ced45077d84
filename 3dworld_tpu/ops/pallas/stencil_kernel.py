"""Pallas TPU kernel: fused 3D smoke-diffusion stencil.

One program per z-layer; the layer plus its z-neighbors load into VMEM
and the full anisotropic exchange (xy at SMOKE_DIS_XY, z-up at ZU, z-down
at ZD, edge sinks, clamping) computes in one fused pass — the XLA path
(water/smoke.py) materializes ~12 intermediate [nz,ny,nx] arrays in HBM;
here each layer reads 3 slabs and writes 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...water.smoke import SMOKE_DIS_XY, SMOKE_DIS_ZU, SMOKE_DIS_ZD, SMOKE_MAX_VAL


def _diffuse_kernel(dn_ref, cur_ref, up_ref, out_ref, *, nz: int):
    z = pl.program_id(0)
    cur = cur_ref[0, :, :]

    def shift2(a, dy, dx):
        out = jnp.roll(a, (dy, dx), (0, 1))
        if dy == 1:
            out = out.at[0, :].set(0.0)
        elif dy == -1:
            out = out.at[-1, :].set(0.0)
        if dx == 1:
            out = out.at[:, 0].set(0.0)
        elif dx == -1:
            out = out.at[:, -1].set(0.0)
        return out

    delta = (shift2(cur, 0, 1) + shift2(cur, 0, -1)
             + shift2(cur, 1, 0) + shift2(cur, -1, 0) - 4.0 * cur) * SMOKE_DIS_XY

    up = up_ref[0, :, :]
    dn = dn_ref[0, :, :]
    up = jnp.where(z == nz - 1, 0.0, up)   # top edge: sink
    dn = jnp.where(z == 0, 0.0, dn)        # bottom edge: sink
    d_up = up - cur
    d_dn = dn - cur
    delta += jnp.where(d_up > 0, SMOKE_DIS_ZD, SMOKE_DIS_ZU) * d_up
    delta += jnp.where(d_dn > 0, SMOKE_DIS_ZU, SMOKE_DIS_ZD) * d_dn
    out_ref[0, :, :] = jnp.clip(cur + delta, 0.0, SMOKE_MAX_VAL)


@functools.partial(jax.jit, static_argnames=("interpret",))
def diffuse_smoke_pallas(smoke: jax.Array, interpret: bool = False) -> jax.Array:
    """One diffusion step on [nz, ny, nx] (open-boundary variant of
    water.smoke.diffuse_smoke; flow gating handled by the XLA path)."""
    nz, ny, nx = smoke.shape
    # pad z by 1 on both sides so each program reads (z-1, z, z+1)
    padded = jnp.pad(smoke, ((1, 1), (0, 0), (0, 0)))
    kern = functools.partial(_diffuse_kernel, nz=nz)
    layer = lambda off: pl.BlockSpec((1, ny, nx), lambda z, off=off: (z + off, 0, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(nz,),
        in_specs=[layer(0), layer(1), layer(2)],   # z-1, z, z+1 (padded)
        out_specs=pl.BlockSpec((1, ny, nx), lambda z: (z, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), smoke.dtype),
        interpret=interpret,
    )(padded, padded, padded)
