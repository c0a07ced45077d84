"""Isosurface extraction: marching tetrahedra, fully vectorized.

The reference extracts isosurfaces with classic marching cubes using
Bourke's 256-entry edge/triangle lookup tables (marching_cubes.h:9+,
voxels.h:188 add_triangles_for_voxel).  Here each cell is decomposed into
6 tetrahedra and polygonised per-tet — the *same capability* (watertight
triangle mesh of the isosurface, per-block extraction, LOD by striding)
with a 16-case table small enough to derive in code, and a uniform
2-triangles-max output per tet that maps cleanly onto fixed-shape TPU
tensors (no 0-15-vertex variable cases).

Output is padded [T, 2, 3(vert), 3(xyz)] + validity mask; compaction (when
needed for export) happens host-side — extraction runs at edit/gen time,
not per frame, so the trailing-3 layout tax is acceptable here.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# cube corner offsets (x, y, z)
_CORNERS = np.array([
    (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
], np.int32)

# 6-tetrahedra decomposition around the 0-6 diagonal
_TETS = np.array([
    (0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
    (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6),
], np.int32)

# tet edges: endpoints (local tet vertex ids 0-3)
_EDGE_A = np.array([0, 0, 0, 1, 1, 2], np.int32)  # e01 e02 e03 e12 e13 e23
_EDGE_B = np.array([1, 2, 3, 2, 3, 3], np.int32)


def _build_tet_table() -> np.ndarray:
    """[16, 2, 3] triangle edge-index table, -1 = unused.

    Derived from first principles: for each inside-vertex bitmask, the
    crossed edges are those with exactly one endpoint inside; 1 or 2 inside
    vertices give a triangle or a quad (split into two triangles).
    """
    table = -np.ones((16, 2, 3), np.int32)
    edges = list(zip(_EDGE_A, _EDGE_B))

    def crossed(mask):
        return [e for e, (a, b) in enumerate(edges)
                if ((mask >> a) & 1) != ((mask >> b) & 1)]

    for mask in range(1, 15):
        ce = crossed(mask)
        if len(ce) == 3:
            table[mask, 0] = ce
        else:  # 4 crossed edges: order them around the quad
            assert len(ce) == 4
            # two edges sharing a tet vertex are adjacent in the quad;
            # find an ordering e0-e1-e2-e3 where consecutive edges share a vertex
            def shares(e1, e2):
                return bool(set(edges[e1]) & set(edges[e2]))
            e0 = ce[0]
            rest = ce[1:]
            e1 = next(e for e in rest if shares(e0, e))
            rest.remove(e1)
            e2 = next(e for e in rest if shares(e1, e))
            rest.remove(e2)
            e3 = rest[0]
            table[mask, 0] = (e0, e1, e2)
            table[mask, 1] = (e0, e2, e3)
    return table


_TET_TABLE = _build_tet_table()          # [16,2,3]
_TET_TABLE_F = _TET_TABLE.astype(np.float32)


@jax.jit
def marching_tets(values: jax.Array, isolevel: float | jax.Array = 0.0,
                  lo_pos=(0.0, 0.0, 0.0), vsz=(1.0, 1.0, 1.0)):
    """Extract the isosurface of a [nz, ny, nx] field.

    Returns (verts_x, verts_y, verts_z, valid):
      verts_* [C*6, 2, 3] — world-space triangle vertex coordinates per
      (cell, tet) with up to 2 triangles of 3 vertices each;
      valid [C*6, 2] bool.

    "Solid" is values < isolevel (the voxel-terrain convention; pass
    -values to flip).  No gathers: corner fields come from 8 shifted views
    of the grid; table lookups are one-hot matmuls over 16/6/4-wide
    constants.
    """
    nz, ny, nx = values.shape
    cz, cy, cx = nz - 1, ny - 1, nx - 1
    C = cz * cy * cx

    # corner values via shifted views [8, C]
    corner_vals = []
    for (ox, oy, oz) in _CORNERS:
        corner_vals.append(values[oz:oz + cz, oy:oy + cy, ox:ox + cx].reshape(C))
    corner_vals = jnp.stack(corner_vals)                    # [8, C]

    # cell base coordinates
    zi, yi, xi = jnp.meshgrid(jnp.arange(cz, dtype=jnp.float32),
                              jnp.arange(cy, dtype=jnp.float32),
                              jnp.arange(cx, dtype=jnp.float32), indexing="ij")
    bx = (lo_pos[0] + xi.reshape(C) * vsz[0])
    by = (lo_pos[1] + yi.reshape(C) * vsz[1])
    bz = (lo_pos[2] + zi.reshape(C) * vsz[2])

    iso = jnp.asarray(isolevel, jnp.float32)
    inside = corner_vals < iso                              # [8, C]

    out_x, out_y, out_z, out_valid = [], [], [], []
    tet_tab = jnp.asarray(_TET_TABLE_F.reshape(16, 6))      # [16, 2*3] edge ids
    for tet in _TETS:
        tv = [corner_vals[c] for c in tet]                  # 4 x [C]
        tin = [inside[c] for c in tet]
        case = (tin[0].astype(jnp.int32) + 2 * tin[1].astype(jnp.int32)
                + 4 * tin[2].astype(jnp.int32) + 8 * tin[3].astype(jnp.int32))
        oh_case = (case[:, None] == jnp.arange(16, dtype=jnp.int32)[None, :]
                   ).astype(jnp.float32)                    # [C,16]
        eidx = oh_case @ tet_tab                            # [C,6] float edge ids (-1 pad)
        valid = eidx[:, ::3] >= 0.0                         # [C,2] (first vert of each tri)

        # tet corner offsets/positions
        co = _CORNERS[tet]                                  # [4,3]
        cpx = jnp.stack([bx + co[i, 0] * vsz[0] for i in range(4)])  # [4,C]
        cpy = jnp.stack([by + co[i, 1] * vsz[1] for i in range(4)])
        cpz = jnp.stack([bz + co[i, 2] * vsz[2] for i in range(4)])
        tvs = jnp.stack(tv)                                 # [4,C]

        # for each of the 6 possible tet edges, the interpolated vertex
        ea, eb = _EDGE_A, _EDGE_B
        vxs, vys, vzs = [], [], []
        for e in range(6):
            va = tvs[ea[e]]
            vb = tvs[eb[e]]
            t = jnp.clip((iso - va) / jnp.where(jnp.abs(vb - va) < 1e-12, 1e-12, vb - va),
                         0.0, 1.0)
            vxs.append(cpx[ea[e]] + t * (cpx[eb[e]] - cpx[ea[e]]))
            vys.append(cpy[ea[e]] + t * (cpy[eb[e]] - cpy[ea[e]]))
            vzs.append(cpz[ea[e]] + t * (cpz[eb[e]] - cpz[ea[e]]))
        evx = jnp.stack(vxs)                                # [6, C]
        evy = jnp.stack(vys)
        evz = jnp.stack(vzs)

        # select per-triangle-vertex edge via one-hot over the 6 edges
        e_sel = jnp.clip(eidx, 0.0, 5.0)                    # [C,6(verts)]
        oh_e = (e_sel[:, :, None] == jnp.arange(6, dtype=jnp.float32)[None, None, :]
                ).astype(jnp.float32)                       # [C,6v,6e]
        # HIGHEST precision: these einsums carry ABSOLUTE world
        # coordinates (unlike the small-integer table lookups, which are
        # bf16-exact) — default precision would quantize vertices to the
        # bf16 grid, ~8 world units of snap at |coord| ~ 1000
        gx = jnp.einsum("cve,ec->cv", oh_e, evx,
                        precision=jax.lax.Precision.HIGHEST)  # [C,6v]
        gy = jnp.einsum("cve,ec->cv", oh_e, evy,
                        precision=jax.lax.Precision.HIGHEST)
        gz = jnp.einsum("cve,ec->cv", oh_e, evz,
                        precision=jax.lax.Precision.HIGHEST)
        out_x.append(gx.reshape(C, 2, 3))
        out_y.append(gy.reshape(C, 2, 3))
        out_z.append(gz.reshape(C, 2, 3))
        out_valid.append(valid)

    vx = jnp.concatenate(out_x)                             # [6C, 2, 3]
    vy = jnp.concatenate(out_y)
    vz = jnp.concatenate(out_z)
    valid = jnp.concatenate(out_valid)                      # [6C, 2]
    return vx, vy, vz, valid


def compact_triangles(vx, vy, vz, valid):
    """Host-side compaction to a dense [T, 3, 3] float32 triangle array."""
    vx, vy, vz, valid = (np.asarray(a) for a in (vx, vy, vz, valid))
    m = valid.reshape(-1)
    tris = np.stack([vx.reshape(-1, 3), vy.reshape(-1, 3), vz.reshape(-1, 3)],
                    axis=-1)  # [N, 3verts, 3xyz]
    return tris[m]


def triangle_count(valid) -> int:
    return int(np.asarray(valid).sum())


def marching_tets_lod(values: jax.Array, isolevel=0.0,
                      lo_pos=(0.0, 0.0, 0.0), vsz=(1.0, 1.0, 1.0),
                      levels: int = 3):
    """LOD triangle lists (voxels.h:188 per-block LOD tri lists): level k
    extracts the isosurface from the field SUBSAMPLED by stride 2^k —
    the reference's coarser-cell extraction for distant blocks.  Returns
    a list of (vx, vy, vz, valid) per level (level 0 = full res)."""
    out = []
    for k in range(levels):
        st = 1 << k
        sub = values[::st, ::st, ::st]
        if min(sub.shape) < 2:
            break
        svsz = (vsz[0] * st, vsz[1] * st, vsz[2] * st)
        out.append(marching_tets(sub, isolevel, lo_pos=lo_pos, vsz=svsz))
    return out


def lod_triangle_counts(lods) -> list:
    """Triangle count per LOD level (coarser levels must not exceed
    finer ones for well-formed fields)."""
    return [int(valid.sum()) for (_x, _y, _z, valid) in lods]
