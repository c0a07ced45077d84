"""Checkpoint / resume: simulation-state pytrees + sidecar artifacts.

The reference persists mesh + RNG seeds + object state via
`save_state`/`load_state` (mesh_gen.cpp:968-1010, config `state_file`),
plus sidecars: PNG heightmaps, heightmap "modmap" brush journals with undo
(heightmap.cpp:218-307), voxel brush journals, cached lighting files.

Here: any pytree of arrays checkpoints to one .npz (+ a JSON-encoded
treedef), restoring bitwise-identically; the sidecar formats live in
export/heightmap_io.py, voxel/edit.py (BrushJournal) and lighting/lmap.py.
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, like):
    """Restore a checkpoint into the structure of `like` (same treedef)."""
    z = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = sum(1 for k in z.files if k.startswith("leaf_"))
    assert n == len(leaves_like), f"leaf count mismatch: {n} vs {len(leaves_like)}"
    if "__treedef__" in z.files:
        stored = json.loads(z["__treedef__"].tobytes().decode())
        if stored != str(treedef):
            raise ValueError(
                f"checkpoint treedef mismatch:\n  stored: {stored}\n"
                f"  expected: {treedef}")
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class ModmapJournal:
    """Heightmap brush journal (tex_mod_map_manager_t,
    heightmap.cpp:218-307): a list of (x, y, radius, delta, shape) edits
    with undo; replay applies them to a heightmap."""

    def __init__(self):
        self.edits: list[tuple] = []

    def add(self, x: int, y: int, radius: int, delta: float, shape: int = 0):
        self.edits.append((x, y, radius, delta, shape))

    def undo(self):
        return self.edits.pop() if self.edits else None

    def apply(self, heightmap):
        hm = jnp.asarray(heightmap)
        my, mx = hm.shape
        yi, xi = jnp.meshgrid(jnp.arange(my), jnp.arange(mx), indexing="ij")
        for (x, y, r, delta, shape) in self.edits:
            d2 = (xi - x) ** 2 + (yi - y) ** 2
            if shape == 0:      # constant
                fall = (d2 <= r * r).astype(hm.dtype)
            elif shape == 1:    # linear falloff
                fall = jnp.maximum(1.0 - jnp.sqrt(d2.astype(hm.dtype)) / max(r, 1), 0.0)
            else:               # quadratic
                fall = jnp.maximum(1.0 - d2.astype(hm.dtype) / max(r * r, 1), 0.0)
            hm = hm + delta * fall
        return hm

    def save(self, path: str) -> None:
        # np.save appends '.npy' to bare paths; write through a file object
        # so save('x.modmap')/load('x.modmap') agree on the filename
        with open(path, "wb") as f:
            np.save(f, np.array(self.edits, np.float32).reshape(-1, 5))

    @classmethod
    def load(cls, path: str) -> "ModmapJournal":
        j = cls()
        with open(path, "rb") as f:
            rows = np.load(f).reshape(-1, 5)
        for row in rows:
            j.add(int(row[0]), int(row[1]), int(row[2]), float(row[3]), int(row[4]))
        return j
