"""Voxel collision: per-block surface cobjs + direct field tests.

The reference's voxel_model maintains per-block collision objects
rebuilt for dirty blocks after edits (voxels.cpp `update_voxel_sphere_region`
-> per-block `add_cobjs`/BVH rebuild).  TPU design:

* the *fast path* collides spheres directly against the density field —
  a trilinear sample + analytic gradient gives penetration depth and
  normal without any triangle geometry (one one-hot-matmul bilinear
  fetch per z-slab pair, fused under jit);
* the *export path* extracts each block's isosurface triangles
  (marching tets, mc.py) into fixed-capacity polygon cobjs, rebuilt
  only for blocks an edit touched — fixed shapes per block, batched
  over dirty blocks.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from . import mc as MC
from . import grid as VG


# ---------------------------------------------------------------------------
# direct field collision (fast path)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def sphere_vs_field(values, origin, spacing, isolevel, px, py, pz, rad):
    """Collide [N] spheres against the voxel density field.

    values [nz, ny, nx] (solid where value < isolevel, matching
    grid.classify_outside's `air = val >= isolevel`); returns
    (hit [N], pen [N], nx, ny, nz) with the normal along +gradient
    (toward air).  Penetration is estimated from the field value scaled
    by the local gradient magnitude (first-order distance)."""
    nz, ny, nx = values.shape
    gx = (px - origin[0]) / spacing
    gy = (py - origin[1]) / spacing
    gz = (pz - origin[2]) / spacing

    def tri_sample(v, gx, gy, gz):
        x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, nx - 2)
        y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, ny - 2)
        z0 = jnp.clip(jnp.floor(gz).astype(jnp.int32), 0, nz - 2)
        fx = jnp.clip(gx - x0, 0.0, 1.0)
        fy = jnp.clip(gy - y0, 0.0, 1.0)
        fz = jnp.clip(gz - z0, 0.0, 1.0)
        # gather the 8 corners via flat one-hot matmul-free indexing:
        # advanced indexing lowers to XLA gather — acceptable at [N]x8
        def at(dx, dy, dz):
            return v[z0 + dz, y0 + dy, x0 + dx]
        c000, c100 = at(0, 0, 0), at(1, 0, 0)
        c010, c110 = at(0, 1, 0), at(1, 1, 0)
        c001, c101 = at(0, 0, 1), at(1, 0, 1)
        c011, c111 = at(0, 1, 1), at(1, 1, 1)
        lo = (c000 * (1 - fx) + c100 * fx) * (1 - fy) \
            + (c010 * (1 - fx) + c110 * fx) * fy
        hi = (c001 * (1 - fx) + c101 * fx) * (1 - fy) \
            + (c011 * (1 - fx) + c111 * fx) * fy
        return lo * (1 - fz) + hi * fz

    val = tri_sample(values, gx, gy, gz)
    h = 0.5
    dvx = tri_sample(values, gx + h, gy, gz) - tri_sample(values, gx - h, gy, gz)
    dvy = tri_sample(values, gx, gy + h, gz) - tri_sample(values, gx, gy - h, gz)
    dvz = tri_sample(values, gx, gy, gz + h) - tri_sample(values, gx, gy, gz - h)
    gmag = jnp.sqrt(dvx * dvx + dvy * dvy + dvz * dvz) / spacing
    gmag = jnp.maximum(gmag, 1e-6)
    sdf = (val - isolevel) / gmag          # approx signed distance (air > 0)
    pen = rad - sdf
    hit = pen > 0.0
    inv = 1.0 / jnp.maximum(jnp.sqrt(dvx * dvx + dvy * dvy + dvz * dvz), 1e-12)
    return hit, pen, dvx * inv, dvy * inv, dvz * inv


# ---------------------------------------------------------------------------
# per-block triangle export (parity path)
# ---------------------------------------------------------------------------

@dataclass
class VoxelCollider:
    """Per-block isosurface triangle store with dirty-block rebuilds.

    Mirrors the reference's block-partitioned voxel cobjs: each edit
    marks the blocks it touches; only those re-extract triangles."""

    params: VG.VoxelParams
    spacing: float = 1.0
    origin: tuple = (0.0, 0.0, 0.0)
    block: int = 8                     # cells per block edge (xy)
    max_tris_per_block: int = 4096  # 8^3 cells * 6 tets * 2 can't exceed this
    tris: dict = field(default_factory=dict)     # (bx, by) -> [T, 3, 3]
    # "mc": true 256-case marching cubes (voxel.mc256, the reference's
    # topology, marching_cubes.h:9); "tets": marching-tetrahedra fallback
    method: str = "mc"

    def _extract_block(self, values, bx: int, by: int):
        b = self.block
        vs = values[:, by * b:(by + 1) * b + 1, bx * b:(bx + 1) * b + 1]
        if self.method == "mc":
            from . import mc256 as M256
            verts, valid = M256.marching_cubes(
                jnp.asarray(vs).transpose(2, 1, 0), self.params.isolevel)
            t = np.asarray(verts)[np.asarray(valid)]
            t = t[:self.max_tris_per_block]
        else:
            vx, vy, vz, valid = MC.marching_tets(jnp.asarray(vs),
                                                 self.params.isolevel)
            t = np.stack([np.asarray(vx), np.asarray(vy), np.asarray(vz)],
                         -1)
            t = t[np.asarray(valid)][:self.max_tris_per_block]  # [T, 3, 3]
        sp = self.spacing
        ox, oy, oz = self.origin
        out = np.empty_like(t)
        out[..., 0] = (t[..., 0] + bx * b) * sp + ox
        out[..., 1] = (t[..., 1] + by * b) * sp + oy
        out[..., 2] = t[..., 2] * sp + oz
        return out

    def rebuild(self, values, dirty=None):
        """Extract triangles for dirty blocks (None = all).  `dirty` is an
        iterable of (bx, by) block coords."""
        values = np.asarray(values)
        _nz, ny, nx = values.shape
        nbx = (nx - 1) // self.block
        nby = (ny - 1) // self.block
        if dirty is None:
            dirty = [(bx, by) for by in range(nby) for bx in range(nbx)]
        for (bx, by) in dirty:
            self.tris[(bx, by)] = self._extract_block(values, bx, by)
        return self

    def dirty_blocks_for_edit(self, cx, cy, radius):
        """Blocks intersecting an edit sphere (update_voxel_sphere_region's
        region->block mapping)."""
        sp = self.spacing
        ox, oy, _oz = self.origin
        b = self.block * sp
        lo_x = int((cx - radius - ox) // b)
        hi_x = int((cx + radius - ox) // b)
        lo_y = int((cy - radius - oy) // b)
        hi_y = int((cy + radius - oy) // b)
        return [(bx, by) for by in range(max(lo_y, 0), hi_y + 1)
                for bx in range(max(lo_x, 0), hi_x + 1)
                if (bx, by) in self.tris or not self.tris]

    def to_cobjs(self):
        """All blocks' triangles as thin polygon cobjs (SceneParse)."""
        from ..scene import cobj as SC
        sp = SC.SceneParse()
        lay = SC.CobjLayer(elasticity=0.2, color=(0.55, 0.5, 0.45, 1.0))
        thick = 0.5 * self.spacing
        for t in self.tris.values():
            for tri in t:
                pts = tuple(tuple(float(c) for c in p) for p in tri)
                sp.cobjs.append(SC.RawCobj(SC.COLL_POLYGON, pts[0], r1=thick,
                                           pts=pts, layer=lay))
        return sp

    @property
    def num_tris(self):
        return sum(len(t) for t in self.tris.values())
