"""True marching cubes (voxel/mc256): derived 256-case table, per-block
LOD lists, and a golden comparison against the REFERENCE's own tables
(marching_cubes.h:9) via a compile-at-test-time harness."""

import os
import shutil
import struct
import subprocess
from collections import Counter

import numpy as np
import pytest
import jax.numpy as jnp

from w3d.voxel import mc256 as M

REF_SRC = "/root/reference/src"


def _sphere_field(n=20, r_frac=3.0):
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    return np.sqrt(((g - n / 2) ** 2).sum(0)) - n / r_frac


def _blob_field(n=20, seed=3):
    rng = np.random.default_rng(seed)
    f = np.zeros((n, n, n), np.float32)
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    for _ in range(5):
        c = rng.uniform(0.2 * n, 0.8 * n, 3)
        r = rng.uniform(0.15 * n, 0.3 * n)
        d = np.sqrt(((g - c[:, None, None, None]) ** 2).sum(0))
        f += np.exp(-((d / r) ** 2))
    return (0.6 - f).astype(np.float32)


def test_table_structure():
    tri, ntri, amb = M.build_tables()
    assert M._table_consistency_check()
    assert ntri[0] == 0 and ntri[255] == 0
    assert ntri[1] == 1 and ntri[254] == 1    # single corner
    assert ntri[3] == 2                       # two adjacent corners
    assert ntri.max() == M.MAX_TRIS
    # crossed-edge sets must match the case parity exactly: an edge is
    # crossed iff its endpoints differ
    for cfg in (1, 3, 9, 65, 105, 255 - 105):
        used = set(int(e) for e in tri[cfg] if e >= 0)
        expect = set(i for i, (a, b) in enumerate(M.EDGE_ENDS)
                     if ((cfg >> a) & 1) != ((cfg >> b) & 1))
        assert used == expect, cfg


def _watertight(v):
    edges = Counter()
    for t in v:
        for i in range(3):
            a = tuple(np.round(t[i], 4))
            b = tuple(np.round(t[(i + 1) % 3], 4))
            edges[(a, b)] += 1
    return all(edges.get((b, a), 0) == c for (a, b), c in edges.items())


def test_sphere_watertight_and_oriented():
    f = _sphere_field(20)
    v, m = M.marching_cubes(jnp.asarray(f), 0.0)
    v = np.asarray(v)[np.asarray(m)]
    assert len(v) > 500
    assert _watertight(v)
    ctr = np.full(3, 10.0)
    nrm = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    outward = ((v.mean(1) - ctr) * nrm).sum(1)
    assert (outward > 0).all()


def test_blob_watertight():
    f = _blob_field(18)
    v, m = M.marching_cubes(jnp.asarray(f), 0.0)
    v = np.asarray(v)[np.asarray(m)]
    assert len(v) > 100 and _watertight(v)


def test_blocks_match_flat_extraction():
    """Per-block lists must contain the same triangles as the flat
    extraction (blocks only re-bucket them)."""
    f = _blob_field(16)
    v, m = M.marching_cubes(jnp.asarray(f), 0.0)
    flat = np.asarray(v)[np.asarray(m)]
    bv, bm, cnt = M.marching_cubes_blocks(jnp.asarray(f), 0.0,
                                          num_blocks=3, tri_cap=2048)
    blk = np.asarray(bv)[np.asarray(bm)]
    assert len(blk) == len(flat) == int(np.asarray(cnt).sum())

    def key(tris):
        return sorted(tuple(np.round(t, 4).ravel()) for t in tris)
    assert key(blk) == key(flat)


def test_lod_levels_reduce_triangles():
    f = _sphere_field(24)
    out = M.extract_lods(jnp.asarray(f), 0.0, num_blocks=2,
                         tri_cap=4096, lods=(0, 1, 2))
    t0 = int(np.asarray(out[0][1]).sum())
    t1 = int(np.asarray(out[1][1]).sum())
    t2 = int(np.asarray(out[2][1]).sum())
    assert t0 > 2 * t1 > 2 * t2 > 0


def test_block_budget_overflow_reported():
    f = _sphere_field(20)
    bv, bm, cnt = M.marching_cubes_blocks(jnp.asarray(f), 0.0,
                                          num_blocks=1, tri_cap=64)
    assert int(np.asarray(cnt).sum()) > 64      # demand exceeds cap
    assert int(np.asarray(bm).sum()) <= 64      # output respects cap


# ---------------------------------------------------------------------------
# golden: reference tables via compile-at-test-time harness
# ---------------------------------------------------------------------------

@pytest.mark.skipif(shutil.which("g++") is None
                    or not os.path.isdir(REF_SRC),
                    reason="g++ or reference tree unavailable")
def test_against_reference_tables(tmp_path):
    """Triangle-count and vertex-position comparison per cell against
    the reference's 256-entry tables (VERDICT r4 item 3 'done'
    criterion).  Non-ambiguous cells must agree exactly on count and on
    the vertex-position SET; ambiguous cells (where published MC makes
    a crack-prone arbitrary choice and this table makes the consistent
    separating choice) may differ and are bounded."""
    here = os.path.dirname(os.path.abspath(__file__))
    harness = str(tmp_path / "mc_harness")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", os.path.join(here, "cpp/mc_harness.cpp"),
         "-I", REF_SRC, "-o", harness], check=True)
    f = _blob_field(16, seed=7)
    X, Y, Z = f.shape
    fin = str(tmp_path / "f.f32")
    fout = str(tmp_path / "tris.bin")
    f.astype("<f4").tofile(fin)     # (x*Y + y)*Z + z == C order
    subprocess.run([harness, fin, str(X), str(Y), str(Z), "0.0", fout],
                   check=True)

    # reference per-cell triangles
    ref = {}
    raw = open(fout, "rb").read()
    o = 0
    while o < len(raw):
        x, y, z, nt = struct.unpack_from("<4i", raw, o)
        o += 16
        tris = np.frombuffer(raw, "<f4", nt * 9, o).reshape(nt, 3, 3)
        o += nt * 36
        ref[(x, y, z)] = tris
    assert ref, "harness produced no cells"

    # 1) per-cell TRIANGLE COUNTS: our table (inside convention) vs the
    # reference extraction — exact agreement required for every
    # non-ambiguous cell
    _tri, ntri, amb = M.build_tables()
    cfgs = np.asarray(M.cell_configs(jnp.asarray(f), 0.0))
    checked = mismatched = amb_cells = 0
    for cell, rtris in ref.items():
        cfg = int(cfgs[cell])
        if amb[cfg]:
            amb_cells += 1
            continue
        checked += 1
        if int(ntri[cfg]) != len(rtris):
            mismatched += 1
    assert checked > 500
    assert mismatched == 0, f"{mismatched}/{checked} non-ambiguous cells"
    assert amb_cells < 0.05 * len(ref)      # ambiguity is rare in practice

    # 2) VERTEX POSITIONS: both triangulations place vertices on the same
    # crossed edges with the same interpolation, so the GLOBAL position
    # sets must match exactly (ambiguity changes connectivity, not points)
    v, m = M.marching_cubes(jnp.asarray(f), 0.0)
    v = np.asarray(v)[np.asarray(m)]
    oset = set(map(tuple, np.round(v.reshape(-1, 3), 4)))
    rall = np.concatenate([t.reshape(-1, 3) for t in ref.values()])
    rset = set(map(tuple, np.round(rall, 4)))
    only_r = rset - oset
    only_o = oset - rset
    assert not only_r and not only_o, (len(only_r), len(only_o))

    # 3) total triangle count within the ambiguous-cell bound
    n_ref = sum(len(t) for t in ref.values())
    assert abs(len(v) - n_ref) <= 2 * amb_cells
