"""Pallas TPU kernel: batched bilinear mesh sampling (height + normal).

`physics/step.sample_mesh` — the TPU form of the reference's
interpolate_mesh_zval + surface-normal lookup (Physics.cpp:840,
mesh_intersect paths) — is the hot non-pair cost of the physics frame:
profiled at ~126 us per call at N=10K on v5e, ~90% of the integrate
substep.  The XLA formulation materializes the two [N, mx] one-hot
planes and the [N, 3*mx] matmul intermediate in HBM (~25 MB of traffic
per call).  Here each object block runs entirely in VMEM:

* the mesh + gradient maps ride as one resident [3*mx, my] stack
  (x-node-major, so the matmul contracts the Y axis FIRST — the same
  contraction order as the XLA einsum "dy,yx->dx", keeping f32 results
  aligned to the last ulp);
* bilinear weights use the single-plane hat form
  relu(1 - |g - iota|), which is exactly the clip-to-border bilinear
  weight of `_bilinear_onehots` for every g (border clamp included)
  but builds in one vector op chain instead of two one-hot planes;
* HBM sees only px/py in and the four result rows out (~0.6 MB).

Layout follows physics_kernel.py: object state as [1, Nb] lane rows,
map stack in sublanes; world constants are Python floats baked into the
kernel (WorldConst is a static jit arg throughout the engine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat_weights(g, n, nb):
    """[1, Nb] fractional coord -> [n, Nb] bilinear hat weights.

    relu(1 - |clip(g, 0, n-1) - k|) equals the border-clamped bilinear
    weight pair of `_bilinear_onehots` bitwise: interior g contributes
    (1-f) at floor(g) and f at floor(g)+1; out-of-range g saturates to
    weight 1 at the border node, matching the g0 clamp + f clip there.
    """
    sub = jax.lax.broadcasted_iota(jnp.int32, (n, nb), 0).astype(jnp.float32)
    gc = jnp.clip(g, 0.0, float(n - 1))
    return jnp.maximum(0.0, 1.0 - jnp.abs(gc - sub))


def _sample_kernel(mapsT_ref, px_ref, py_ref,
                   h_ref, nx_ref, ny_ref, nz_ref, *,
                   Nb: int, mx: int, my: int,
                   dx_inv: float, dy_inv: float):
    f32 = jnp.float32
    px = px_ref[0, :][None, :]
    py = py_ref[0, :][None, :]
    gx = px * f32(dx_inv) + f32(mx // 2)
    gy = py * f32(dy_inv) + f32(my // 2)
    XW = _hat_weights(gx, mx, Nb)                       # [mx, Nb]
    YW = _hat_weights(gy, my, Nb)                       # [my, Nb]
    # contract Y first (XLA einsum order): A[x-node rows of 3 maps, obj]
    A = jax.lax.dot_general(mapsT_ref[:, :], YW, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)  # [3*mx, Nb]
    h = jnp.sum(A[0:mx, :] * XW, axis=0, keepdims=True)
    sx = jnp.sum(A[mx:2 * mx, :] * XW, axis=0, keepdims=True)
    sy = jnp.sum(A[2 * mx:3 * mx, :] * XW, axis=0, keepdims=True)
    inv = jax.lax.rsqrt(sx * sx + sy * sy + 1.0)
    h_ref[0, :] = h[0, :]
    nx_ref[0, :] = (-sx * inv)[0, :]
    ny_ref[0, :] = (-sy * inv)[0, :]
    nz_ref[0, :] = inv[0, :]


def supported(mesh_shape, n: int) -> bool:
    """Native-layout constraints: maps stack [3*mx, my] needs my as a
    128-multiple lane dim and mx a multiple of 8 sublanes; tiny batches
    aren't worth the dispatch."""
    my, mx = mesh_shape
    return my % 128 == 0 and mx % 8 == 0 and (3 * mx) % 8 == 0 and n >= 2048


@functools.partial(jax.jit,
                   static_argnames=("dx_inv", "dy_inv", "Nb", "interpret"))
def sample_mesh_pallas(mesh: jax.Array, x: jax.Array, y: jax.Array,
                       dx_inv: float, dy_inv: float,
                       Nb: int = 512, interpret: bool = False):
    """Bilinear (height, normal-xyz) sample at world (x, y) for [N]
    batches; equals `physics/step.sample_mesh` to f32 reduction-tree
    noise (same contraction order; identical weights)."""
    my, mx = mesh.shape
    n = x.shape[0]
    # resident map stack, x-node-major: rows [mesh^T | dzdx^T | dzdy^T]
    dzdx = (jnp.roll(mesh, -1, 1) - jnp.roll(mesh, 1, 1)) * (0.5 * dx_inv)
    dzdy = (jnp.roll(mesh, -1, 0) - jnp.roll(mesh, 1, 0)) * (0.5 * dy_inv)
    mapsT = jnp.concatenate([mesh.T, dzdx.T, dzdy.T], axis=0)  # [3*mx, my]

    npad = -n % Nb
    xp = jnp.pad(x, (0, npad))[None, :]
    yp = jnp.pad(y, (0, npad))[None, :]
    grid = (xp.shape[1] // Nb,)
    kern = functools.partial(_sample_kernel, Nb=Nb, mx=mx, my=my,
                             dx_inv=dx_inv, dy_inv=dy_inv)
    row = pl.BlockSpec((1, Nb), lambda i: (0, i))
    out = pl.BlockSpec((1, Nb), lambda i: (0, i))
    shp = jax.ShapeDtypeStruct((1, xp.shape[1]), jnp.float32)
    h, nx, ny, nz = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((3 * mx, my), lambda i: (0, 0)), row, row],
        out_specs=[out, out, out, out],
        out_shape=[shp, shp, shp, shp],
        interpret=interpret,
    )(mapsT, xp, yp)
    return h[0, :n], nx[0, :n], ny[0, :n], nz[0, :n]
