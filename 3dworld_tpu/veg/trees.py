"""Procedural trees: batched branch generation + placement.

The reference builds each deciduous tree by per-tree recursive cylinder
branching with 4 levels and per-type parameters (tree_type table
Tree.cpp:37-44; builder `tree_builder_t` Tree.cpp), and places trees by
density/slope-thresholded noise sampling (Tree.cpp:2214+,
tree_density_thresh / tree_slope_thresh); pine/palm "small trees" are
instanced cone+cylinder pairs (sm_tree.cpp).

TPU design: generation is *level-parallel* — one jitted program emits
level k's cylinders for ALL trees at once from threefry streams keyed by
(seed, tree, branch), instead of walking each tree's recursion.  Output is
fixed-shape SoA (component arrays, padded + masked) ready for instanced
export or cobj registration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import rng as w3d_rng

# tree_type table (Tree.cpp:37-44):
# (branch_size, branch_radius, leaf_size, height_scale, branch_break_off)
TREE_TYPES = np.array([
    # bsize brad  lsize hscale break_off
    (1.0, 0.7, 1.0, 1.0, 1.0),
    (1.0, 1.0, 1.0, 1.0, 1.0),
    (1.0, 1.0, 1.0, 2.0, 0.5),
    (1.0, 0.7, 1.5, 1.0, 1.0),   # birch
    (1.0, 1.0, 1.0, 2.0, 2.0),   # papaya
], np.float32)
NUM_TREE_TYPES = len(TREE_TYPES)

TRUNK_SEGS = 4
NUM_B1 = 10      # first-level branches
NUM_B2 = 4       # second-level per branch
LEAVES_PER_B2 = 4
MAX_CYLINS = TRUNK_SEGS + NUM_B1 + NUM_B1 * NUM_B2
MAX_LEAVES = NUM_B1 * NUM_B2 * LEAVES_PER_B2


class TreeSet(NamedTuple):
    """Batched tree geometry, SoA (all [T, MAX_CYLINS] / [T, MAX_LEAVES])."""

    cyl_x1: jax.Array
    cyl_y1: jax.Array
    cyl_z1: jax.Array
    cyl_x2: jax.Array
    cyl_y2: jax.Array
    cyl_z2: jax.Array
    cyl_r1: jax.Array
    cyl_r2: jax.Array
    cyl_level: jax.Array    # 0=trunk, 1, 2
    leaf_x: jax.Array
    leaf_y: jax.Array
    leaf_z: jax.Array
    leaf_size: jax.Array


def _unit_from_angles(theta, phi):
    st = jnp.sin(theta)
    return st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)


@functools.partial(jax.jit, static_argnames=())
def gen_trees(key, base_x, base_y, base_z, type_id, height_scale=1.0) -> TreeSet:
    """Generate T trees at base positions [T] with per-tree type ids.

    Deterministic per (key, tree index); all levels batched.
    """
    T = base_x.shape[0]
    tt = jnp.asarray(TREE_TYPES)
    oh = jax.nn.one_hot(type_id, NUM_TREE_TYPES, dtype=jnp.float32)
    b_size = oh @ tt[:, 0]
    b_rad = oh @ tt[:, 1]
    l_size = oh @ tt[:, 2]
    h_scale = oh @ tt[:, 3] * height_scale

    ks = jax.random.split(key, 8)
    height = 0.35 * h_scale * jax.random.uniform(ks[0], (T,), minval=0.8, maxval=1.2)
    trunk_r = 0.035 * b_rad * height / 0.35

    # trunk: TRUNK_SEGS stacked segments with slight lean
    seg_h = height / TRUNK_SEGS
    lean_x = 0.08 * jax.random.normal(ks[1], (T, TRUNK_SEGS))
    lean_y = 0.08 * jax.random.normal(ks[2], (T, TRUNK_SEGS))
    seg_dx = jnp.cumsum(lean_x, 1) * seg_h[:, None]
    seg_dy = jnp.cumsum(lean_y, 1) * seg_h[:, None]
    s = jnp.arange(TRUNK_SEGS, dtype=jnp.float32)
    t_z1 = base_z[:, None] + s[None, :] * seg_h[:, None]
    t_z2 = t_z1 + seg_h[:, None]
    t_x1 = base_x[:, None] + jnp.pad(seg_dx, ((0, 0), (1, 0)))[:, :TRUNK_SEGS]
    t_y1 = base_y[:, None] + jnp.pad(seg_dy, ((0, 0), (1, 0)))[:, :TRUNK_SEGS]
    t_x2 = base_x[:, None] + seg_dx
    t_y2 = base_y[:, None] + seg_dy
    taper = 1.0 - 0.18 * s[None, :]
    t_r1 = trunk_r[:, None] * taper
    t_r2 = trunk_r[:, None] * (taper - 0.18)

    # level-1 branches off the upper trunk
    kb = jax.random.split(ks[3], 4)
    attach = jax.random.uniform(kb[0], (T, NUM_B1), minval=0.35, maxval=0.95)
    phi1 = jax.random.uniform(kb[1], (T, NUM_B1), minval=0.0, maxval=2 * np.pi)
    theta1 = jax.random.uniform(kb[2], (T, NUM_B1), minval=0.35 * np.pi, maxval=0.55 * np.pi)
    blen1 = 0.45 * height[:, None] * b_size[:, None] * \
        jax.random.uniform(kb[3], (T, NUM_B1), minval=0.7, maxval=1.3) * (1.2 - 0.5 * attach)
    ax = base_x[:, None] + attach * seg_dx[:, -1:]
    ay = base_y[:, None] + attach * seg_dy[:, -1:]
    az = base_z[:, None] + attach * height[:, None]
    d1x, d1y, d1z = _unit_from_angles(theta1, phi1)
    b1_x2 = ax + blen1 * d1x
    b1_y2 = ay + blen1 * d1y
    b1_z2 = az + blen1 * d1z
    b1_r1 = 0.4 * trunk_r[:, None] * (1.2 - 0.6 * attach)
    b1_r2 = 0.35 * b1_r1

    # level-2 branches off each level-1 branch
    kc = jax.random.split(ks[4], 4)
    sh2 = (T, NUM_B1, NUM_B2)
    attach2 = jax.random.uniform(kc[0], sh2, minval=0.3, maxval=1.0)
    phi2 = jax.random.uniform(kc[1], sh2, minval=0.0, maxval=2 * np.pi)
    theta2 = jax.random.uniform(kc[2], sh2, minval=0.2 * np.pi, maxval=0.6 * np.pi)
    blen2 = 0.45 * blen1[..., None] * jax.random.uniform(kc[3], sh2, minval=0.6, maxval=1.2)
    a2x = ax[..., None] + attach2 * (b1_x2 - ax)[..., None]
    a2y = ay[..., None] + attach2 * (b1_y2 - ay)[..., None]
    a2z = az[..., None] + attach2 * (b1_z2 - az)[..., None]
    d2x, d2y, d2z = _unit_from_angles(theta2, phi2)
    b2_x2 = a2x + blen2 * d2x
    b2_y2 = a2y + blen2 * d2y
    b2_z2 = a2z + blen2 * d2z
    b2_r1 = 0.4 * jnp.broadcast_to(b1_r1[..., None], sh2)
    b2_r2 = 0.3 * b2_r1

    # leaves at the ends of level-2 branches
    kl = jax.random.split(ks[5], 3)
    shl = (T, NUM_B1, NUM_B2, LEAVES_PER_B2)
    lt = jax.random.uniform(kl[0], shl, minval=0.5, maxval=1.0)
    jx = 0.03 * jax.random.normal(kl[1], shl)
    jy = 0.03 * jax.random.normal(kl[2], shl)
    leaf_x = (a2x[..., None] + lt * (b2_x2 - a2x)[..., None] + jx).reshape(T, -1)
    leaf_y = (a2y[..., None] + lt * (b2_y2 - a2y)[..., None] + jy).reshape(T, -1)
    leaf_z = (a2z[..., None] + lt * (b2_z2 - a2z)[..., None]).reshape(T, -1)
    leaf_size = jnp.broadcast_to((0.02 * l_size)[:, None], (T, MAX_LEAVES))

    cat = lambda *a: jnp.concatenate([x.reshape(T, -1) for x in a], axis=1)
    return TreeSet(
        cyl_x1=cat(t_x1, ax * jnp.ones_like(b1_x2), a2x),
        cyl_y1=cat(t_y1, ay * jnp.ones_like(b1_y2), a2y),
        cyl_z1=cat(t_z1, az * jnp.ones_like(b1_z2), a2z),
        cyl_x2=cat(t_x2, b1_x2, b2_x2),
        cyl_y2=cat(t_y2, b1_y2, b2_y2),
        cyl_z2=cat(t_z2, b1_z2, b2_z2),
        cyl_r1=cat(t_r1, b1_r1, b2_r1),
        cyl_r2=cat(t_r2, b1_r2, b2_r2),
        cyl_level=jnp.broadcast_to(
            jnp.concatenate([jnp.zeros(TRUNK_SEGS), jnp.ones(NUM_B1),
                             jnp.full(NUM_B1 * NUM_B2, 2.0)]).astype(jnp.int32)[None],
            (T, MAX_CYLINS)),
        leaf_x=leaf_x, leaf_y=leaf_y, leaf_z=leaf_z, leaf_size=leaf_size,
    )


def place_trees_on_tile(seed: int, tile_x0: float, tile_y0: float,
                        zvals, norm_z, weights, world,
                        density: float = 0.5, max_trees: int = 256,
                        slope_thresh: float = 0.6):
    """Density/slope-gated tree placement on a tile (the `regen_trees` /
    tiled tree distribution semantics: hashed per-cell Bernoulli draws
    modulated by vegetation density on grass/dirt, rejected on steep or
    snowy cells).  Returns (x, y, z, type_id, valid) [max_trees]."""
    from ..terrain import biomes as B

    my, mx = zvals.shape
    cell = jnp.arange(my * mx, dtype=jnp.uint32)
    h = w3d_rng.xxhash_u32(cell + jnp.uint32(seed * 2654435761 % (1 << 31)), seed=seed)
    u = (h >> 8).astype(jnp.float32) / float(1 << 24)
    veg_w = (weights[B.GRASS] + 0.5 * weights[B.DIRT]).reshape(-1)
    ok = (u < density * veg_w * 0.1) & (norm_z.reshape(-1) > slope_thresh)
    # order cells by hash, take first max_trees accepted (deterministic)
    score = jnp.where(ok, h, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(score)[:max_trees]
    valid = jnp.take(ok, order)
    cy = (order // mx).astype(jnp.float32)
    cx = (order % mx).astype(jnp.float32)
    x = (tile_x0 + cx) * world.dx - world.x_scene * 0.0
    y = (tile_y0 + cy) * world.dy
    z = jnp.take(zvals.reshape(-1), order)
    tid = (jnp.take(h, order) % NUM_TREE_TYPES).astype(jnp.int32)
    return x, y, z, tid, valid


class SmallTreeSet(NamedTuple):
    """Pine/palm instances (sm_tree.cpp): trunk cylinder + cone levels."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    height: jax.Array
    width: jax.Array
    kind: jax.Array   # 0=pine, 1=palm


def gen_small_trees(key, x, y, z, kind=None) -> SmallTreeSet:
    n = x.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    height = 0.2 * jax.random.uniform(k1, (n,), minval=0.8, maxval=1.4)
    width = 0.35 * height * jax.random.uniform(k2, (n,), minval=0.8, maxval=1.2)
    if kind is None:
        kind = (jax.random.uniform(k3, (n,)) < 0.8).astype(jnp.int32)  # mostly pine
    return SmallTreeSet(x=x, y=y, z=z, height=height, width=width, kind=kind)


# ---------------------------------------------------------------------------
# leaf dynamics (Tree.cpp:588-830): per-leaf color/health, temperature
# leaf fall, burning, blast damage, spraypaint
# ---------------------------------------------------------------------------

LEAF_GEN_RAND1 = 16      # every Nth leaf considered (Tree.cpp:21)
LEAF_GEN_RAND2 = 200000  # larger is fewer leaves falling (Tree.cpp:22)
LEAF_DAM_SCALE = 0.0001  # blast -> leaf damage (Gameplay LEAF_DAM_SCALE)

# per-type base leaf colors (tree_type color entries; birch lighter)
LEAF_BASE_COLORS = np.array([
    (0.20, 0.55, 0.15), (0.16, 0.50, 0.13), (0.22, 0.60, 0.20),
    (0.35, 0.60, 0.22), (0.25, 0.58, 0.18)], np.float32)


class LeafState(NamedTuple):
    """Batched per-leaf dynamics ([T, MAX_LEAVES]): lcolor is the
    reference's 0..1000 health/greenness (<= 0 black, -1000 destroyed);
    damage [T] is the tree's accumulated damage fraction."""

    lcolor: jax.Array    # [T, L]
    r: jax.Array         # [T, L] display colors (lcolor-blended)
    g: jax.Array
    b: jax.Array
    damage: jax.Array    # [T]


def init_leaves(key, type_id, deadness: float = 0.0,
                coherence: float = 0.5) -> LeafState:
    """gen_leaf_color / create_init_color (Tree.cpp:87-150): per-leaf
    color jitter around the type base, reduced by `coherence`; global
    `deadness` browns and lowers initial lcolor."""
    T = type_id.shape[0]
    oh = jax.nn.one_hot(type_id, NUM_TREE_TYPES, dtype=jnp.float32)
    base = oh @ jnp.asarray(LEAF_BASE_COLORS)          # [T, 3]
    k1, k2 = jax.random.split(key)
    jit_amt = 0.12 * (1.0 - coherence)
    jr = jit_amt * jax.random.normal(k1, (T, MAX_LEAVES, 3))
    lcolor = jnp.full((T, MAX_LEAVES), 1000.0 * (1.0 - 0.7 * deadness))
    col = jnp.clip(base[:, None, :] + jr, 0.0, 1.0)
    dead_mix = deadness * 0.6
    brown = jnp.asarray([0.35, 0.22, 0.08])
    col = (1 - dead_mix) * col + dead_mix * brown
    return LeafState(lcolor=lcolor, r=col[..., 0], g=col[..., 1],
                     b=col[..., 2], damage=jnp.zeros((T,)))


@jax.jit
def drop_leaves(ls: LeafState, key, temperature=20.0, fticks=1.0):
    """tree::drop_leaves (Tree.cpp:807-829): every LEAF_GEN_RAND1-th
    leaf falls with probability 1/rmod.  Quirk preserved: the reference's
    temp0 = max(1.0, min(0.3, (20-T)/30)) collapses to 1.0 for every
    temperature (swapped max/min), so temperature does not actually
    modulate leaf fall.  Returns (ls, fell [T, L]) — the caller spawns
    LEAF physics objects at the fallen leaves' positions."""
    T, L = ls.lcolor.shape
    temp0 = 1.0    # reference quirk (see docstring)
    rmod = jnp.clip(temp0 * LEAF_GEN_RAND2 / jnp.maximum(fticks, 1e-3),
                    1.0, LEAF_GEN_RAND2 / 10.0)
    k1, k2 = jax.random.split(key)
    stride_ok = (jnp.arange(L)[None, :]
                 + jax.random.randint(k1, (T, 1), 0, LEAF_GEN_RAND1)) \
        % LEAF_GEN_RAND1 == 0
    u = jax.random.uniform(k2, (T, L))
    fell = stride_ok & (u < 1.0 / rmod) & (ls.lcolor > 0) \
        & (ls.damage[:, None] < 1.0)
    return ls, fell


@jax.jit
def burn_leaves(ls: LeafState, key, temperature, max_t: float = 60.0):
    """tree::burn_leaves (Tree.cpp:666-685): above the leaf max
    temperature, up to 5 random leaves per tree char per frame (lcolor
    drops; destroyed at 0), accumulating tree damage."""
    T, L = ls.lcolor.shape
    over = jnp.maximum(temperature - max_t, 0.0)
    num_burn = jnp.clip(5.0 * over / max_t, 0.0, 5.0)
    p_burn = num_burn / L
    u = jax.random.uniform(key, (T, L))
    burn = (u < p_burn) & (ls.lcolor > -1000)
    lcolor = jnp.where(burn, jnp.maximum(ls.lcolor - 250.0, 0.0), ls.lcolor)
    charred = burn & (lcolor <= 0.0)
    dmg = ls.damage + (1.0 - ls.damage) * jnp.sum(burn, 1) / L
    fade = jnp.clip(lcolor / 1000.0, 0.0, 1.0)
    return ls._replace(
        lcolor=jnp.where(charred, -1000.0, lcolor),
        r=jnp.where(burn, ls.r * fade, ls.r),
        g=jnp.where(burn, ls.g * fade, ls.g),
        b=jnp.where(burn, ls.b * fade, ls.b),
        damage=jnp.clip(dmg, 0.0, 1.0)), charred


@jax.jit
def blast_damage_leaves(ls: LeafState, trees: TreeSet, key,
                        bx, by, bz, bradius, bdamage):
    """tree::blast_damage + damage_leaf (Tree.cpp:707-760): leaves
    within the blast radius take distance-scaled damage; heavy damage
    destroys the leaf outright, and destroyed leaves have a 25% chance
    of falling as physics objects.  Returns (ls, fell)."""
    d2 = ((trees.leaf_x - bx) ** 2 + (trees.leaf_y - by) ** 2
          + (trees.leaf_z - bz) ** 2)
    in_r = d2 < bradius * bradius
    dist_scale = 1.0 - jnp.sqrt(d2) / jnp.maximum(bradius, 1e-6)
    done = jnp.where(in_r, LEAF_DAM_SCALE * bdamage * dist_scale * 1e4, 0.0)
    heavy = done > 4.0
    lcolor = jnp.where(in_r, jnp.maximum(ls.lcolor - 300.0 * done, 0.0),
                       ls.lcolor)
    destroyed = (heavy | (in_r & (lcolor <= 0.0))) & (ls.lcolor > -1000)
    u = jax.random.uniform(key, ls.lcolor.shape)
    fell = destroyed & (u < 0.25)
    dmg = ls.damage + jnp.sum(destroyed, 1) / ls.lcolor.shape[1]
    fade = jnp.clip(lcolor / 1000.0, 0.2, 1.0)
    return ls._replace(
        lcolor=jnp.where(destroyed, -1000.0, lcolor),
        r=jnp.where(in_r, ls.r * fade, ls.r),
        g=jnp.where(in_r, ls.g * fade, ls.g),
        b=jnp.where(in_r, ls.b * fade, ls.b),
        damage=jnp.clip(dmg, 0.0, 1.0)), fell


@jax.jit
def spraypaint_leaves(ls: LeafState, trees: TreeSet, px, py, pz, radius,
                      color):
    """tree::spraypaint_leaves (Tree.cpp:631-663): recolor live leaves
    within the spray radius."""
    d2 = ((trees.leaf_x - px) ** 2 + (trees.leaf_y - py) ** 2
          + (trees.leaf_z - pz) ** 2)
    hit = (d2 < radius * radius) & (ls.lcolor > -1000)
    return ls._replace(r=jnp.where(hit, color[0], ls.r),
                       g=jnp.where(hit, color[1], ls.g),
                       b=jnp.where(hit, color[2], ls.b))
