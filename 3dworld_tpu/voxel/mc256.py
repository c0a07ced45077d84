"""True marching cubes: 256-case table + per-block LOD extraction.

The reference extracts voxel isosurfaces with classic marching cubes
(Bourke's 256-entry edge/tri tables, `marching_cubes.h:9+`) into
per-block triangle lists with LOD levels (`voxels.h:188`
add_triangles_for_voxel, block lists `voxels.h:106-153`).

This module does NOT transcribe the published table; it DERIVES the
256-case triangulation at import time by walking intersection loops on
the cube faces:

* each face is a 4-corner cycle (CCW seen from outside the cube); a
  maximal run of inside corners contributes one directed segment from
  its entering crossed edge to its leaving crossed edge — on ambiguous
  faces (two diagonal inside corners) this rule separates the inside
  corners, a fixed consistent resolution;
* directed segments chain into closed loops (every crossed edge has
  exactly one incoming and one outgoing segment); each loop is fanned
  into len-2 triangles;
* triangle winding is normalized at build time so normals point from
  the inside (value < isolevel) region outward.

The result matches classic MC topology everywhere except the ambiguous
configurations, where published MC itself is inconsistent (it can leave
cracks); the derived table is watertight by construction.  The
tests/cpp golden harness quantifies agreement against the reference's
own tables per cell.

Device extraction is fixed-shape: per-cell case ids -> prefix-sum slot
allocation -> scatter into a capped triangle buffer; the block variant
vmaps extraction over `num_blocks`² XY chunks with per-block caps and
stride-2^l LODs, mirroring the reference's per-block lists.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Bourke corner/edge numbering (marching_cubes.h conventions)
CORNERS = np.array([
    (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
], np.int32)
EDGE_ENDS = np.array([
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
], np.int32)
# faces as corner cycles, CCW seen from OUTSIDE the cube
_FACES = [
    (0, 3, 2, 1),   # z=0, -z out
    (4, 5, 6, 7),   # z=1, +z out
    (0, 1, 5, 4),   # y=0, -y out
    (2, 3, 7, 6),   # y=1, +y out
    (0, 4, 7, 3),   # x=0, -x out
    (1, 2, 6, 5),   # x=1, +x out
]
_E_OF = {tuple(sorted(e)): i for i, e in enumerate(EDGE_ENDS.tolist())}

MAX_TRIS = 5   # max triangles per cell (matches classic MC)


def _loops_for_config(config: int):
    """Directed intersection loops (lists of edge ids) for one 8-bit
    inside mask."""
    inside = [(config >> i) & 1 for i in range(8)]
    seg_next = {}
    for cyc in _FACES:
        ins = [inside[c] for c in cyc]
        if all(ins) or not any(ins):
            continue
        # maximal runs of inside corners along the 4-cycle
        for i in range(4):
            if ins[i] and not ins[i - 1]:          # run starts at i
                j = i
                while ins[(j + 1) % 4]:
                    j = (j + 1) % 4
                # entering edge: between corner i-1 (outside) and i;
                # leaving edge: between corner j and j+1 (outside)
                e_in = _E_OF[tuple(sorted((cyc[i - 1], cyc[i])))]
                e_out = _E_OF[tuple(sorted((cyc[j], cyc[(j + 1) % 4])))]
                seg_next[e_in] = e_out
    loops = []
    seen = set()
    for start in list(seg_next):
        if start in seen:
            continue
        loop, e = [], start
        while e not in seen:
            seen.add(e)
            loop.append(e)
            e = seg_next[e]
        loops.append(loop)
    return loops


def _edge_mid(e: int) -> np.ndarray:
    a, b = EDGE_ENDS[e]
    return (CORNERS[a] + CORNERS[b]) / 2.0


@functools.lru_cache(maxsize=1)
def build_tables():
    """(tri_table [256,16] int32 -1-padded, ntri [256] int32,
    ambiguous [256] bool).  `ambiguous` marks configs with at least one
    face whose diagonal corners are inside (the cases where published MC
    tables make an arbitrary-and-crack-prone choice)."""
    tri_table = np.full((256, 16), -1, np.int32)
    ntri = np.zeros(256, np.int32)
    ambig = np.zeros(256, bool)
    for cfg in range(256):
        inside = [(cfg >> i) & 1 for i in range(8)]
        for cyc in _FACES:
            ins = [inside[c] for c in cyc]
            if ins == [1, 0, 1, 0] or ins == [0, 1, 0, 1]:
                ambig[cfg] = True
        in_pts = [CORNERS[i] for i in range(8) if inside[i]]
        out_pts = [CORNERS[i] for i in range(8) if not inside[i]]
        if not in_pts or not out_pts:
            continue
        grad = (np.mean(out_pts, 0) - np.mean(in_pts, 0))
        tris = []
        for loop in _loops_for_config(cfg):
            pts = [_edge_mid(e) for e in loop]
            # Newell normal of the loop polygon
            nrm = np.zeros(3)
            for i in range(len(pts)):
                p, q = pts[i], pts[(i + 1) % len(pts)]
                nrm += np.cross(p, q)
            if np.dot(nrm, grad) < 0.0:
                loop = loop[::-1]
            for i in range(1, len(loop) - 1):
                tris.append((loop[0], loop[i], loop[i + 1]))
        assert len(tris) <= MAX_TRIS, (cfg, len(tris))
        ntri[cfg] = len(tris)
        for t, tri in enumerate(tris):
            tri_table[cfg, 3 * t:3 * t + 3] = tri
    return tri_table, ntri, ambig


def _table_consistency_check():
    """Every crossed edge must have exactly one in/out segment in every
    config (the directed-loop invariant the derivation relies on)."""
    for cfg in range(256):
        loops = _loops_for_config(cfg)
        flat = [e for lp in loops for e in lp]
        assert len(flat) == len(set(flat)), cfg
    return True


# ---------------------------------------------------------------------------
# device extraction
# ---------------------------------------------------------------------------

def _corner_values(values: jax.Array):
    """[X,Y,Z] field -> [cx, cy, cz, 8] per-cell corner values."""
    segs = []
    for (dx, dy, dz) in CORNERS:
        segs.append(values[dx:values.shape[0] - 1 + dx,
                           dy:values.shape[1] - 1 + dy,
                           dz:values.shape[2] - 1 + dz])
    return jnp.stack(segs, axis=-1)


@functools.partial(jax.jit, static_argnames=("tri_cap",))
def marching_cubes(values: jax.Array, isolevel=0.0, tri_cap: int = 0):
    """Classic-MC isosurface of `values` [X,Y,Z] (inside = value <
    isolevel, matching the tet extractor's convention).

    Returns (verts [T, 3, 3], valid [T]) with T = tri_cap (default:
    5 * num_cells, the exact upper bound).  Triangles beyond the cap are
    dropped; `triangle_count` of the full-cap call gives the true
    count."""
    tri_np, ntri_np, _ = build_tables()
    tri_tbl = jnp.asarray(tri_np)
    ntri_tbl = jnp.asarray(ntri_np)
    ea = jnp.asarray(EDGE_ENDS[:, 0])
    eb = jnp.asarray(EDGE_ENDS[:, 1])
    corners = jnp.asarray(CORNERS, jnp.float32)

    cx, cy, cz = (values.shape[0] - 1, values.shape[1] - 1,
                  values.shape[2] - 1)
    C = cx * cy * cz
    T = tri_cap or MAX_TRIS * C
    cvals = _corner_values(values).reshape(C, 8)
    inside = cvals < isolevel
    config = jnp.sum(inside.astype(jnp.int32)
                     * (1 << jnp.arange(8, dtype=jnp.int32))[None, :], axis=1)
    ntris = ntri_tbl[config]                       # [C]
    offs = jnp.cumsum(ntris) - ntris               # exclusive prefix sum
    eids = tri_tbl[config][:, :3 * MAX_TRIS].reshape(C, MAX_TRIS, 3)

    # cell base coordinates
    gx, gy, gz = jnp.meshgrid(jnp.arange(cx), jnp.arange(cy),
                              jnp.arange(cz), indexing="ij")
    base = jnp.stack([gx, gy, gz], -1).reshape(C, 3).astype(jnp.float32)

    e = jnp.maximum(eids, 0)                       # [C,5,3] edge ids
    ca = ea[e]                                     # corner indices
    cb = eb[e]
    va = jnp.take_along_axis(cvals[:, None, :].repeat(MAX_TRIS, 1),
                             ca, axis=2)           # [C,5,3]
    vb = jnp.take_along_axis(cvals[:, None, :].repeat(MAX_TRIS, 1),
                             cb, axis=2)
    t = jnp.clip((isolevel - va) / jnp.where(jnp.abs(vb - va) > 1e-12,
                                             vb - va, 1e-12), 0.0, 1.0)
    pa = corners[ca]                               # [C,5,3,3]
    pb = corners[cb]
    pos = base[:, None, None, :] + pa + t[..., None] * (pb - pa)

    tslot = offs[:, None] + jnp.arange(MAX_TRIS)[None, :]     # [C,5]
    tvalid = jnp.arange(MAX_TRIS)[None, :] < ntris[:, None]
    slot = jnp.where(tvalid & (tslot < T), tslot, T)
    verts = jnp.zeros((T, 3, 3), jnp.float32)
    verts = verts.at[slot.reshape(-1)].set(
        pos.reshape(C * MAX_TRIS, 3, 3), mode="drop")
    valid = jnp.zeros((T,), bool).at[slot.reshape(-1)].set(
        tvalid.reshape(-1), mode="drop")
    return verts, valid


def triangle_count(valid) -> int:
    return int(jnp.sum(valid))


def cell_configs(values: jax.Array, isolevel=0.0) -> jax.Array:
    """Per-cell 8-bit case ids [cx, cy, cz] (for golden comparisons)."""
    cvals = _corner_values(values)
    inside = cvals < isolevel
    return jnp.sum(inside.astype(jnp.int32)
                   * (1 << jnp.arange(8, dtype=jnp.int32)), axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("num_blocks", "tri_cap", "stride"))
def marching_cubes_blocks(values: jax.Array, isolevel=0.0,
                          num_blocks: int = 4, tri_cap: int = 4096,
                          stride: int = 1):
    """Per-block triangle lists (voxels.h:188): the XY plane is split
    into num_blocks x num_blocks chunks, each extracted independently
    with its own `tri_cap` budget, at LOD `stride` (2^lod subsampling,
    positions scaled back to full-grid units).

    Returns (verts [B, cap, 3, 3], valid [B, cap], counts [B]) with
    B = num_blocks**2; counts report the UNCAPPED per-block triangle
    demand so callers can detect budget overflow."""
    if stride > 1:
        values = values[::stride, ::stride, ::stride]
    X, Y, Z = values.shape
    nb = num_blocks
    bx = -(-(X - 1) // nb)          # cells per block (ceil)
    by = -(-(Y - 1) // nb)
    # pad so every block has a full bx+1 x by+1 vertex slab; padding
    # repeats the edge (gradient 0 -> no crossings in padded cells)
    Xp, Yp = nb * bx + 1, nb * by + 1
    values = jnp.pad(values, ((0, Xp - X), (0, Yp - Y), (0, 0)),
                     mode="edge")

    def one_block(ij):
        i, j = ij // nb, ij % nb
        sub = jax.lax.dynamic_slice(
            values, (i * bx, j * by, 0), (bx + 1, by + 1, Z))
        v, m = marching_cubes(sub, isolevel, tri_cap=tri_cap)
        ntr = _block_demand(sub, isolevel)
        off = jnp.array([i * bx, j * by, 0], jnp.float32)
        return v + off[None, None, :], m, ntr

    verts, valid, counts = jax.vmap(one_block)(jnp.arange(nb * nb))
    return verts * float(stride), valid, counts


def _block_demand(sub, isolevel):
    tri_np, ntri_np, _ = build_tables()
    cfg = cell_configs(sub, isolevel)
    return jnp.sum(jnp.asarray(ntri_np)[cfg])


def extract_lods(values, isolevel=0.0, num_blocks: int = 4,
                 tri_cap: int = 4096, lods=(0, 1)):
    """Per-block lists at each LOD (stride 2^lod), like the reference's
    per-block LOD tri lists.  Returns {lod: (verts, valid, counts)}."""
    out = {}
    for lod in lods:
        cap = max(tri_cap >> (2 * lod), 64)
        out[lod] = marching_cubes_blocks(values, isolevel,
                                         num_blocks=num_blocks,
                                         tri_cap=cap, stride=1 << lod)
    return out
