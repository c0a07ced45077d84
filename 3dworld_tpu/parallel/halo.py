"""Cross-shard halo exchange: the reference's cross-tile chaining on ICI.

The reference chains terrain tiles through edge vectors — AO reads a
36-cell halo of neighbor zvals (tiled_mesh.cpp:475-487), and directional
shadows pass `sh_in`/`sh_out` edge vectors tile-to-tile via a BFS queue
(tiled_mesh.cpp:664-692).  When the tile axis shards over TPU devices,
those same edge vectors travel over ICI as `ppermute` ring shifts inside
`shard_map` — the one place the reference's design genuinely becomes
neighbor-collective communication.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import shadows as SH


def halo_shift(x: jax.Array, axis_name: str, shift: int = 1):
    """Ring-shift shards: each shard receives its neighbor's block
    (ppermute over the mesh axis).  x is the per-shard block inside
    shard_map."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def make_sharded_shadow_scan(mesh: Mesh, light_dir: tuple, cell_w: float,
                             axis: str = "tiles", mode: str = "exact"):
    """Directional mesh shadows over a row of tiles sharded on `axis`.

    Input: zvals [T, n, n] sharded on the leading (tile) axis, tiles laid
    out left-to-right along the light's major direction.

    mode="exact": each device runs its local prefix-max shadow scan,
    then edge potentials (`sh_out`) propagate downstream via ppermute and
    every round re-runs the local scan — D-1 rounds of full local work,
    bit-identical to the sequential tile chain (fine at D=8).

    mode="carry": pod-scale path — ONE local scan computes each shard's
    own output potential, the D-1 propagation rounds then move only the
    EDGE VECTORS (max + SH.carry_transform, the scan's pure-carry
    operator), and ONE final local scan applies the settled incoming
    carry: 2 local scans total instead of D.  Bit-identical to "exact"
    for axis-aligned lights (no lateral drift); with drift the edge
    interpolation runs on the max of carries instead of interleaved
    (bounded-difference, tested).
    """
    nd = mesh.devices.size
    lx, ly, lz = light_dir
    major = lx if abs(lx) >= abs(ly) else ly
    # light from +major => shadows propagate toward -major => process tiles
    # (and shards) in DECREASING index order
    reverse = major > 0

    def local(zv, sh_in):
        # zv: [t_local, n, n]; chain the per-tile scans INSIDE the local
        # block (scan over local tiles in the light's propagation order)
        def tile_step(carry, z):
            shadowed, sh_out = SH.mesh_shadows(z, light_dir, sh_in=carry,
                                               cell_w=cell_w)
            return sh_out, shadowed

        sh_out, shadowed = jax.lax.scan(tile_step, sh_in, zv, reverse=reverse)
        return shadowed, sh_out

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    def run_exact(zv_block, init_carry):
        shadowed, sh_out = local(zv_block, init_carry)
        # propagate carries downstream: nd-1 ring steps over ICI
        down = -1 if reverse else 1     # shard index of the receiver
        upstream_idx = nd - 1 if reverse else 0
        idx = jax.lax.axis_index(axis)
        for _ in range(nd - 1):
            incoming = halo_shift(sh_out, axis, shift=down)
            # the most-upstream shard keeps the open-boundary carry
            incoming = jnp.where(idx == upstream_idx, init_carry, incoming)
            shadowed, sh_out = local(zv_block, incoming)
        return shadowed

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    def run_carry(zv_block, init_carry):
        down = -1 if reverse else 1
        upstream_idx = nd - 1 if reverse else 0
        idx = jax.lax.axis_index(axis)
        t_local, _n, n = zv_block.shape
        total = t_local * n             # scan columns crossed per shard
        # pass 1: own output potential (open upstream boundary; the
        # caller's boundary carry applies only to the most-upstream
        # shard, folded in below)
        open_in = jnp.full_like(init_carry, SH.MESH_MIN_Z)
        _shadowed, a_out = local(zv_block,
                                 jnp.where(idx == upstream_idx,
                                           init_carry, open_in))
        # edge-only relaxation: out_k = max(A_k, T(in_k)) to fixpoint
        out_edge = a_out
        for _ in range(nd - 1):
            incoming = halo_shift(out_edge, axis, shift=down)
            incoming = jnp.where(idx == upstream_idx,
                                 jnp.full_like(incoming, SH.MESH_MIN_Z),
                                 incoming)
            carried = SH.carry_transform(incoming, total, light_dir, cell_w)
            out_edge = jnp.maximum(a_out, carried)
        # settled incoming carry for this shard = T(upstream out)
        incoming = halo_shift(out_edge, axis, shift=down)
        incoming = jnp.where(idx == upstream_idx,
                             jnp.full_like(incoming, SH.MESH_MIN_Z),
                             incoming)
        # pass 2: apply.  Upstream sh_out edges are already framed for
        # their downstream neighbor (mesh_shadows re-frames), so the
        # settled incoming edge feeds local() directly; the most-upstream
        # shard keeps the caller's boundary carry.
        sh_in = jnp.where(idx == upstream_idx, init_carry, incoming)
        shadowed, _ = local(zv_block, sh_in)
        return shadowed

    return run_carry if mode == "carry" else run_exact


def make_halo_context(mesh: Mesh, halo: int, axis: str = "tiles"):
    """AO-style halo assembly for a 1-D row of tiles sharded on `axis`:
    each shard's [t, n, n] block gains `halo` columns from its left/right
    neighbor shards' edge tiles (the 36-cell AO context of
    tiled_mesh.cpp:475)."""

    @functools.partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                       check_vma=False)
    def run(zv_block):
        # per-shard block [t, n, n]: pull the rightmost tile's right edge
        # from the left neighbor and vice versa
        left_edge = zv_block[-1:, :, -halo:]    # to send right
        right_edge = zv_block[:1, :, :halo]     # to send left
        from_left = halo_shift(left_edge, axis, shift=1)
        from_right = halo_shift(right_edge, axis, shift=-1)
        idx = jax.lax.axis_index(axis)
        n = jax.lax.axis_size(axis)
        # open boundaries: replicate own edges at the ends of the ring
        from_left = jnp.where(idx == 0, zv_block[:1, :, :halo], from_left)
        from_right = jnp.where(idx == n - 1, zv_block[-1:, :, -halo:], from_right)
        # assemble: every tile gets a left halo from its in-shard neighbor,
        # except tile 0 which uses the cross-shard edge
        left_halos = jnp.concatenate([from_left, zv_block[:-1, :, -halo:]], axis=0)
        right_halos = jnp.concatenate([zv_block[1:, :, :halo], from_right], axis=0)
        return jnp.concatenate([left_halos, zv_block, right_halos], axis=-1)

    return run
