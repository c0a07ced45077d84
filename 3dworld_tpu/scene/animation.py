"""Skeletal animation: bone hierarchies + linear-blend skinning.

The reference supports skeletal animation through Assimp: <=4 bone
influences per vertex, animation channels with position/rotation/scale
keyframes evaluated per frame (model3d.h:205-254, assimp_wrap.cpp).

TPU form: a skeleton is SoA arrays (parent ids, bind/inverse-bind
matrices); a pose evaluates by composing local transforms down the
hierarchy (host loop over depth — bone counts are tiny) and skinning is
one batched program: positions [V] x 4 bone influences via one-hot-free
weighted matrix application.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

MAX_BONE_INFLUENCES = 4  # model3d.h bone limit


class Skeleton(NamedTuple):
    parent: np.ndarray        # [B] parent bone id (-1 root)
    inv_bind: np.ndarray      # [B, 4, 4] inverse bind matrices
    local_bind: np.ndarray    # [B, 4, 4] bind-pose local transforms


class SkinWeights(NamedTuple):
    bone_ids: jax.Array       # [V, 4] int32
    weights: jax.Array        # [V, 4] f32 (sum to 1)


class AnimChannel(NamedTuple):
    """Per-bone keyframes: times [K], translations [K, 3], rotations
    [K, 4] (quaternions), scales [K]."""

    times: np.ndarray
    trans: np.ndarray
    quats: np.ndarray
    scales: np.ndarray


def _quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)


def _slerp(q0, q1, t):
    d = np.dot(q0, q1)
    if d < 0:
        q1 = -q1
        d = -d
    if d > 0.9995:
        out = q0 + t * (q1 - q0)
    else:
        th = np.arccos(np.clip(d, -1, 1))
        out = (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)
    return out / np.linalg.norm(out)


def sample_channel(ch: AnimChannel, time: float):
    """Keyframe interpolation (position lerp, rotation slerp, scale lerp)."""
    times = ch.times
    t = float(np.clip(time, times[0], times[-1]))
    i = int(np.searchsorted(times, t, side="right") - 1)
    i = min(i, len(times) - 2) if len(times) > 1 else 0
    if len(times) == 1:
        return ch.trans[0], ch.quats[0], ch.scales[0]
    f = (t - times[i]) / max(times[i + 1] - times[i], 1e-9)
    tr = ch.trans[i] * (1 - f) + ch.trans[i + 1] * f
    q = _slerp(ch.quats[i], ch.quats[i + 1], f)
    s = ch.scales[i] * (1 - f) + ch.scales[i + 1] * f
    return tr, q, s


def evaluate_pose(skel: Skeleton, channels: dict, time: float) -> jnp.ndarray:
    """Global skinning matrices [B, 4, 4] at `time`: compose local
    transforms down the hierarchy, multiply by inverse bind."""
    B = len(skel.parent)
    local = skel.local_bind.copy()
    for b, ch in channels.items():
        tr, q, s = sample_channel(ch, time)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = _quat_to_mat(np.asarray(q)) * s
        m[:3, 3] = tr
        local[b] = m
    world = np.zeros_like(local)
    for b in range(B):  # parents precede children by construction
        p = skel.parent[b]
        world[b] = local[b] if p < 0 else world[p] @ local[b]
    return jnp.asarray(world @ skel.inv_bind)


@jax.jit
def skin_vertices(positions, skin: SkinWeights, bone_mats):
    """Linear-blend skinning, batched over all vertices.

    positions [V, 3]; bone_mats [B, 4, 4].  Per-vertex: sum over the 4
    influences of w_i * (M_{b_i} p).  Bone matrices are gathered by a
    (V*4, B) one-hot matmul over the flattened matrix rows (no gathers).
    """
    V = positions.shape[0]
    Bn = bone_mats.shape[0]
    flat = bone_mats.reshape(Bn, 16)
    oh = jax.nn.one_hot(skin.bone_ids.reshape(-1), Bn, dtype=jnp.float32)
    mats = (oh @ flat).reshape(V, 4, 16)                  # per-influence mats
    hom = jnp.concatenate([positions, jnp.ones((V, 1))], -1)  # [V, 4]
    m = mats.reshape(V, 4, 4, 4)
    out = jnp.einsum("vi,vkji->vkj", hom, m)              # [V, 4inf, 4]
    w = skin.weights[..., None]
    return jnp.sum(out[:, :, :3] * w, axis=1)


def make_simple_skeleton(num_bones: int, spacing: float = 0.2) -> tuple:
    """A test chain skeleton along +z with identity bind."""
    parent = np.arange(num_bones) - 1
    local = np.tile(np.eye(4, dtype=np.float32), (num_bones, 1, 1))
    local[1:, 2, 3] = spacing
    world = np.zeros_like(local)
    for b in range(num_bones):
        world[b] = local[b] if parent[b] < 0 else world[parent[b]] @ local[b]
    inv_bind = np.linalg.inv(world).astype(np.float32)
    return Skeleton(parent=parent, inv_bind=inv_bind, local_bind=local)
