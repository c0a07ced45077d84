"""Mesh optimization: vertex-cache index reordering + simplification.

Re-designed equivalents of the reference's model post-processing
(vertex_opt.cpp:12-59 `vert_optimizer` — ACMR metric, sort-by-min-index
fallback, full triangle-order optimization; model3d.cpp:431-528
`indexed_vntc_vect_t::simplify` — normal-coherence-prioritized half-edge
collapse skipping mesh-boundary vertices).  The reference delegates its
production path to the external meshoptimizer library; here the full
pipeline is self-contained.

Host-side by design: index reordering and LOD generation are load-time
model preparation (the reference also runs them on the CPU at model
load).  Everything is vectorized numpy — per-vertex loops only in the
sequential collapse ordering, which is inherently a priority sweep.

Triangle-order optimization uses Tipsify (Sander/Nehab/Barczak 2007,
"Fast Triangle Reordering for Vertex Locality and Reduced Overdraw"),
the standard linear-time replacement for the FIFO-cache greedy walk the
reference pulls in via triListOpt.
"""

from __future__ import annotations

import numpy as np

VBUF_SZ = 32  # reference cache size (vertex_opt.cpp:8)


# ---------------------------------------------------------------------------
# ACMR (average cache miss ratio) — vertex_opt.cpp:11-30
# ---------------------------------------------------------------------------

def calc_acmr(indices: np.ndarray, cache_size: int = VBUF_SZ) -> float:
    """Cache-miss ratio under the reference's replacement policy
    (evict the entry with the oldest *insertion* position, i.e. FIFO).

    FIFO equivalence: an index hits iff it is among the last
    `cache_size` distinct values inserted; vectorized by tracking each
    value's last insertion serial number.
    """
    idx = np.asarray(indices, np.int64).ravel()
    if idx.size == 0:
        return 0.0
    nv = int(idx.max()) + 1
    last_insert = np.full(nv, -(10 ** 9), np.int64)
    serial = 0
    misses = 0
    # FIFO insertion serial; hit iff serial - last_insert[i] <= cache_size.
    # Python loop retained: cache state is a serial dependence.  Used for
    # metrics/tests only (the optimizers below don't call it per-vertex).
    for i in idx:
        if serial - last_insert[i] > cache_size:
            misses += 1
            last_insert[i] = serial
            serial += 1
    return misses / idx.size


# ---------------------------------------------------------------------------
# index reordering
# ---------------------------------------------------------------------------

def sort_by_min_ix(indices: np.ndarray, npts_per_prim: int = 3) -> np.ndarray:
    """The reference's cheap path (vertex_opt.cpp:41-44): sort primitives
    by their minimum vertex index.  Works for tris and quads."""
    ix = np.asarray(indices).reshape(-1, npts_per_prim)
    order = np.argsort(ix.min(axis=1), kind="stable")
    return ix[order].reshape(-1).astype(indices.dtype)


def tipsify(indices: np.ndarray, num_verts: int,
            cache_size: int = VBUF_SZ,
            use_native: bool = True) -> np.ndarray:
    """Linear-speed vertex-cache triangle reordering (Tipsify).

    Replaces vert_optimizer's full_opt path (vertex_opt.cpp:46-50).
    Returns reordered triangle indices [F*3].

    The hot path runs in the native C++ module (w3dnative.tipsify — the
    reference's mesh optimization is likewise native, triListOpt.cpp);
    the Python implementation below is the fallback and the test oracle
    (both produce IDENTICAL streams — same tie-breaks, same dead-end
    stack order)."""
    if use_native and np.asarray(indices).size:
        from ..native import get_native
        nat = get_native()
        if nat is not None and hasattr(nat, "tipsify"):
            arr = np.ascontiguousarray(np.asarray(indices, np.int32)
                                       .reshape(-1))
            out = nat.tipsify(arr.tobytes(), int(num_verts),
                              int(cache_size))
            return np.frombuffer(out, np.int32).astype(
                np.asarray(indices).dtype)
    tris = np.asarray(indices, np.int64).reshape(-1, 3)
    F = len(tris)
    if F == 0:
        return np.asarray(indices)
    # vertex -> incident triangles (CSR)
    counts = np.bincount(tris.ravel(), minlength=num_verts)
    offs = np.zeros(num_verts + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    # CSR adjacency via one argsort: corners grouped by vertex -> tri ids
    order = np.argsort(tris.ravel(), kind="stable")
    adj = order // 3
    live = counts.copy()          # remaining live triangles per vertex
    emitted = np.zeros(F, bool)
    cache_time = np.full(num_verts, -(10 ** 9), np.int64)
    time = cache_size + 1
    out = np.empty((F, 3), np.int64)
    n_out = 0
    dead_end = []                 # stack of emitted tris for restarts
    fanning = 0                   # current fanning vertex (or -1)
    have_fan = False
    cursor = 0                    # input-order scan cursor for restarts

    def next_fan_from(v):
        """1-ring candidates: pick live-tri vertex with max cache score."""
        best, best_pri = -1, -1
        for t in adj[offs[v]:offs[v + 1]]:
            if emitted[t]:
                continue
            for u in tris[t]:
                pri = 0
                # would-stay-in-cache heuristic (Tipsify eq. 1)
                if time - cache_time[u] + 2 * live[u] <= cache_size:
                    pri = time - cache_time[u]
                if live[u] > 0 and pri > best_pri:
                    best, best_pri = u, pri
        return best

    while n_out < F:
        if not have_fan:
            # dead-end: restart from stack or scan
            fanning = -1
            while dead_end:
                v = dead_end.pop()
                if live[v] > 0:
                    fanning = v
                    break
            if fanning < 0:
                while cursor < num_verts and live[cursor] == 0:
                    cursor += 1
                fanning = cursor if cursor < num_verts else -1
            if fanning < 0:
                break
            have_fan = True
        # emit all live triangles of the fanning vertex
        any_emitted = False
        for t in adj[offs[fanning]:offs[fanning + 1]]:
            if emitted[t]:
                continue
            emitted[t] = True
            out[n_out] = tris[t]
            n_out += 1
            any_emitted = True
            for u in tris[t]:
                live[u] -= 1
                dead_end.append(u)
                if time - cache_time[u] > cache_size:
                    cache_time[u] = time
                    time += 1
        nxt = next_fan_from(fanning)
        if nxt < 0 or not any_emitted:
            have_fan = False
        else:
            fanning = nxt
            have_fan = live[fanning] > 0
    # any stragglers (disconnected leftovers)
    if n_out < F:
        rest = np.where(~emitted)[0]
        out[n_out:n_out + len(rest)] = tris[rest]
        n_out += len(rest)
    return out.reshape(-1).astype(np.asarray(indices).dtype)


def optimize_indices(indices: np.ndarray, num_verts: int,
                     npts_per_prim: int = 3, full_opt: bool = True,
                     cache_size: int = VBUF_SZ):
    """vert_optimizer::run (vertex_opt.cpp:33-59): skip when the index
    stream is already cache-friendly, else reorder.  Returns
    (new_indices, acmr_before, acmr_after)."""
    idx = np.asarray(indices)
    num_prims = idx.size // npts_per_prim
    mult = 2.0 if npts_per_prim == 4 else 3.0
    if idx.size < 1.5 * num_verts or num_verts < 2 * cache_size:
        return idx, 0.0, 0.0
    acmr = mult * calc_acmr(idx, cache_size)
    perfect = mult * num_verts / idx.size
    if acmr < 1.05 * perfect:
        return idx, acmr, acmr
    if full_opt and npts_per_prim == 3:
        out = tipsify(idx, num_verts, cache_size)
    else:
        out = sort_by_min_ix(idx, npts_per_prim)
    return out, acmr, mult * calc_acmr(out, cache_size)


# ---------------------------------------------------------------------------
# simplification — model3d.cpp:431-528 half-edge collapse
# ---------------------------------------------------------------------------

def simplify(positions: np.ndarray, normals: np.ndarray,
             indices: np.ndarray, target: float,
             max_tris_per_vert: int = 8) -> np.ndarray:
    """Collapse flat-region vertices until `target` fraction remains.

    Mirrors the reference: candidates are non-boundary vertices with at
    most `max_tris_per_vert` incident triangles, prioritized by normal
    coherence (|sum of incident corner normals| / count — flat regions
    score high and collapse first); each collapses onto its nearest
    not-yet-remapped neighbor; degenerate triangles drop out.
    Returns the new index array (same vertex buffer).
    """
    assert 0.0 < target < 1.0
    tris = np.asarray(indices, np.int64).reshape(-1, 3)
    pos = np.asarray(positions, np.float64)
    num_verts = len(pos)
    target_nv = int(target * num_verts)
    if target_nv <= 3 or len(tris) == 0:
        return np.asarray(indices)

    # --- boundary vertices: edges used by exactly one triangle ---
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    e_sorted = np.sort(e, axis=1)
    uniq, cnt = np.unique(e_sorted, axis=0, return_counts=True)
    boundary_v = np.zeros(num_verts, bool)
    b = uniq[cnt == 1]
    boundary_v[b.ravel()] = True

    # --- incident-triangle CSR ---
    counts = np.bincount(tris.ravel(), minlength=num_verts)
    offs = np.zeros(num_verts + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    order = np.argsort(tris.ravel(), kind="stable")
    vt = order // 3  # triangle ids grouped by vertex

    # --- normal-coherence priority (counted_normal in the reference) ---
    if normals is None or len(normals) == 0:
        # face normals from geometry
        v0, v1, v2 = pos[tris[:, 0]], pos[tris[:, 1]], pos[tris[:, 2]]
        fn = np.cross(v1 - v0, v2 - v0)
        fl = np.linalg.norm(fn, axis=1, keepdims=True)
        fn = fn / np.maximum(fl, 1e-20)
        corner_n = np.repeat(fn, 3, axis=0).reshape(-1, 3, 3)
    else:
        corner_n = np.asarray(normals, np.float64)[tris]
    # per-vertex: sum of all 3 corner normals of each incident triangle
    tri_nsum = corner_n.sum(axis=1)                      # [F, 3]
    nsum = np.zeros((num_verts, 3))
    np.add.at(nsum, tris[:, 0], tri_nsum)
    np.add.at(nsum, tris[:, 1], tri_nsum)
    np.add.at(nsum, tris[:, 2], tri_nsum)
    ncount = 3 * counts
    val = np.linalg.norm(nsum, axis=1) / np.maximum(ncount, 1)

    cand = (~boundary_v) & (counts > 0) & (counts <= max_tris_per_vert)
    cand_ix = np.where(cand)[0]
    # descending priority (max-heap in the reference)
    cand_ix = cand_ix[np.argsort(-val[cand_ix], kind="stable")]

    remap = np.arange(num_verts, dtype=np.int64)
    remapped = np.zeros(num_verts, bool)
    num_valid = num_verts

    def resolve(i):
        while remap[i] != i:
            i = remap[i]
        return i

    for src in cand_ix:
        if num_valid <= target_nv:
            break
        if remapped[src]:
            continue
        # nearest not-remapped neighbor among incident triangle corners
        neigh = np.unique(tris[vt[offs[src]:offs[src + 1]]].ravel())
        neigh = neigh[(neigh != src) & ~remapped[neigh]]
        if len(neigh) == 0:
            continue
        d2 = ((pos[neigh] - pos[src]) ** 2).sum(axis=1)
        dest = int(neigh[np.argmin(d2)])
        remap[src] = dest
        remapped[src] = True
        num_valid -= 1

    # path-compress + rebuild indices, dropping degenerates
    final = remap.copy()
    for i in range(num_verts):
        final[i] = resolve(i)
    new_tris = final[tris]
    keep = ((new_tris[:, 0] != new_tris[:, 1])
            & (new_tris[:, 1] != new_tris[:, 2])
            & (new_tris[:, 2] != new_tris[:, 0]))
    return new_tris[keep].reshape(-1).astype(np.asarray(indices).dtype)


def simplify_model(m, target: float):
    """Model3d -> Model3d with simplified faces (normals/uvs follow the
    surviving triangles)."""
    from .model3d import compute_vertex_normals
    nrm = compute_vertex_normals(m) if m.num_faces else None
    new_idx = simplify(m.positions, nrm,
                       m.faces.reshape(-1), target).reshape(-1, 3)
    # carry face attribute rows for surviving (possibly remapped) faces:
    # match by first-vertex membership is ambiguous after collapse, so
    # recompute normals downstream if exact attribution matters.
    return m._replace(
        faces=new_idx.astype(np.int32),
        face_normals=np.full(new_idx.shape, -1, np.int32),
        face_uvs=np.full(new_idx.shape, -1, np.int32),
    )
