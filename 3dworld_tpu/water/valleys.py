"""Valley flooding: watershed labeling + basin water levels.

The reference precomputes a watershed matrix (every mesh cell assigned to
the local-minimum "valley" its steepest-descent path reaches,
`calc_watershed` Water.cpp:1272) and per-frame merges/fills valleys to
equal water levels via a spill graph (spillover.cpp,
`update_valleys_and_draw_spillover`).

TPU formulation:
* flow directions = argmin over the 8-neighborhood (one fused stencil);
* watershed labels = pointer-jumping (label <- flow[label]) to fixpoint —
  O(log diameter) doubling steps;
* basin fill levels: given per-basin water volume, solve
  sum(max(0, z - h)) * dxdy = V by vectorized bisection with
  segment-sums over the label map;
* spillover (merging overflowing basins): `update_valleys` union-finds
  over the saddle graph — overflowing basins merge with their spill
  neighbor, pool volumes at the union root, and refill to a common
  level, iterated to fixpoint (spillover.cpp's graph equalization).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst, DEFAULT_WORLD


def flow_directions(mesh: jax.Array) -> jax.Array:
    """Steepest-descent neighbor (flat index) per cell; self at strict
    minima.  FLAT cells (no strictly lower neighbor but an equal one)
    flow to their +x/+y neighbor, the reference's "force flat areas to
    still have flow: default flow is NE" rule (matrix_ops.cpp:371-373)
    — without it every plateau cell becomes its own one-cell basin and
    flat valley floors fragment."""
    my, mx = mesh.shape
    INF = jnp.float32(1e30)
    best = mesh
    yi, xi = jnp.meshgrid(jnp.arange(my), jnp.arange(mx), indexing="ij")
    best_idx = yi * mx + xi
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = jnp.roll(mesh, (-dy, -dx), (0, 1))
            # invalidate wrapped borders
            if dy == 1:
                n = n.at[-1, :].set(INF)
            elif dy == -1:
                n = n.at[0, :].set(INF)
            if dx == 1:
                n = n.at[:, -1].set(INF)
            elif dx == -1:
                n = n.at[:, 0].set(INF)
            nidx = (jnp.clip(yi + dy, 0, my - 1) * mx + jnp.clip(xi + dx, 0, mx - 1))
            better = n < best
            best = jnp.where(better, n, best)
            best_idx = jnp.where(better, nidx, best_idx)
    # flat-cell NE default (only where a non-border equal neighbor
    # exists; strict minima keep flowing to themselves)
    self_idx = yi * mx + xi
    ne = jnp.roll(mesh, (-1, -1), (0, 1)).at[-1, :].set(INF).at[:, -1].set(INF)
    is_flat = (best_idx == self_idx) & (ne == mesh)
    ne_idx = jnp.clip(yi + 1, 0, my - 1) * mx + jnp.clip(xi + 1, 0, mx - 1)
    best_idx = jnp.where(is_flat, ne_idx, best_idx)
    return best_idx.reshape(-1)


@jax.jit
def watershed_labels(mesh: jax.Array) -> jax.Array:
    """Basin id (flat index of the basin's minimum) per cell
    (~ watershed_matrix.wsi, Water.cpp:1272)."""
    flow = flow_directions(mesh)
    n = flow.shape[0]
    steps = int(np.ceil(np.log2(max(n, 2))))

    def body(_, lab):
        return lab[lab]  # pointer jumping

    return jax.lax.fori_loop(0, steps, body, flow)


def basin_fill_levels(mesh: jax.Array, labels: jax.Array, volumes: jax.Array,
                      world: WorldConst = DEFAULT_WORLD, iters: int = 24):
    """Water level per basin from per-basin volume.

    volumes: [n_cells] array, nonzero at basin-minimum indices (per-basin
    water volume).  Returns (zval [n_cells] per-basin level at each basin id
    slot, water_matrix [my, mx])."""
    my, mx = mesh.shape
    n = my * mx
    h = mesh.reshape(-1)
    cell_area = world.dxdy
    h_min = jax.ops.segment_min(h, labels, num_segments=n)
    lo = jnp.where(jnp.isfinite(h_min), h_min, 0.0)
    hi = lo + (jnp.max(mesh) - jnp.min(mesh)) + 1.0

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        depth = jnp.maximum(mid[labels] - h, 0.0)
        vol = jax.ops.segment_sum(depth, labels, num_segments=n) * cell_area
        too_much = vol > volumes
        return jnp.where(too_much, lo, mid), jnp.where(too_much, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    zval = 0.5 * (lo + hi)
    water = zval[labels].reshape(my, mx)
    return zval, water


@functools.partial(jax.jit, static_argnames=("world",))
def fill_valleys(mesh: jax.Array, volumes_per_basin: jax.Array,
                 world: WorldConst = DEFAULT_WORLD):
    """Convenience: labels + fill in one jitted call.
    Returns (labels, zval, water_matrix, wet_mask)."""
    labels = watershed_labels(mesh)
    zval, water = basin_fill_levels(mesh, labels, volumes_per_basin, world)
    wet = water > mesh
    return labels, zval, water, wet


def add_rain_volume(volumes: jax.Array, labels: jax.Array, my, mx,
                    rain_per_cell: float, world: WorldConst = DEFAULT_WORLD):
    """Accumulate rainfall: every cell contributes rain volume to its basin
    (~ RAIN_VOLUME accumulation into valleys, Water.cpp)."""
    contrib = jnp.full((my * mx,), rain_per_cell * world.dxdy, jnp.float32)
    return volumes + jax.ops.segment_sum(contrib, labels, num_segments=my * mx)


def basin_saddles(mesh, labels):
    """Saddle heights between adjacent basins (the spill graph,
    spillover.cpp): for each basin pair sharing a boundary, the lowest
    crossing height min over boundary cells of max(h_a, h_b)."""
    h = np.asarray(mesh)
    lab = np.asarray(labels).reshape(h.shape)
    saddles = {}
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        a_lab = lab[max(0, -dy):lab.shape[0] - dy or None,
                    max(0, -dx):lab.shape[1] - dx or None]
        b_lab = lab[max(0, dy):lab.shape[0] + min(0, dy) or None,
                    max(0, dx):lab.shape[1] + min(0, dx) or None]
        a_h = h[max(0, -dy):h.shape[0] - dy or None,
                max(0, -dx):h.shape[1] - dx or None]
        b_h = h[max(0, dy):h.shape[0] + min(0, dy) or None,
                max(0, dx):h.shape[1] + min(0, dx) or None]
        diff = a_lab != b_lab
        cross = np.maximum(a_h, b_h)[diff]
        for pa, pb, ch in zip(a_lab[diff].ravel(), b_lab[diff].ravel(),
                              cross.ravel()):
            key = (min(pa, pb), max(pa, pb))
            if key not in saddles or ch < saddles[key]:
                saddles[key] = float(ch)
    return saddles


def update_valleys(mesh, labels, volumes, world=DEFAULT_WORLD,
                   max_merge_iters: int = 8):
    """Fill + spillover equalization (update_valleys_and_draw_spillover):
    overflowing basins merge with their spill neighbor (union-find over
    the saddle graph) and refill to a common level.

    Returns (zval_per_slot, water_matrix, wet_mask, merged_labels)."""
    my, mx = mesh.shape
    labels_np = np.asarray(labels)
    saddles = basin_saddles(mesh, labels_np)
    parent = {}

    def find(a):
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    merged = jnp.asarray(labels_np)
    vols = jnp.asarray(volumes)
    for _ in range(max_merge_iters):
        zval, water = basin_fill_levels(mesh, merged, vols, world)
        zn = np.asarray(zval)
        merged_np = np.asarray(merged)
        changed = False
        for (a, b), s in saddles.items():
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            # overflow: either side's level exceeds the saddle
            if zn[ra] > s + 1e-6 or zn[rb] > s + 1e-6:
                parent[max(ra, rb)] = min(ra, rb)
                changed = True
        if not changed:
            break
        # relabel to union roots and pool volumes at the root slot;
        # only the live basin labels (a few dozen) go through find(),
        # not every mesh cell
        live = np.unique(merged_np)
        root_of = np.arange(my * mx, dtype=np.int32)
        for l in live:
            root_of[l] = find(int(l))
        vols_np = np.zeros(my * mx, np.float32)
        np.add.at(vols_np, root_of, np.asarray(vols))
        merged = jnp.asarray(root_of[merged_np])
        vols = jnp.asarray(vols_np)
    zval, water = basin_fill_levels(mesh, merged, vols, world)
    wet = water > mesh
    return zval, water, wet, merged


def basin_spill_points(mesh, labels):
    """Per-basin spill point + saddle height (valley::spill_func): the
    lowest boundary saddle of each basin and its cell position.  Host
    build (irregular) for the float_downstream drift."""
    m = np.asarray(mesh)
    my, mx = m.shape
    lab = np.asarray(labels).reshape(my, mx)
    best = {}
    # 8-neighborhood to match the 8-connected flow basins (a 4-scan
    # missed diagonal-only basin contacts, leaving sz=inf for basins
    # that basin_saddles DOES merge)
    for (dy, dx) in ((0, 1), (1, 0), (1, 1), (1, -1)):
        xs0 = max(0, -dx)
        xs1 = mx - max(0, dx)
        a = lab[:my - dy, xs0:xs1]
        b = lab[dy:, xs0 + dx:xs1 + dx]
        h = np.maximum(m[:my - dy, xs0:xs1], m[dy:, xs0 + dx:xs1 + dx])
        diff = a != b
        ys, xs = np.nonzero(diff)
        for y, x in zip(ys, xs):
            for basin in (a[y, x], b[y, x]):
                if basin not in best or h[y, x] < best[basin][0]:
                    best[basin] = (float(h[y, x]), x + xs0 + dx * 0.5,
                                   y + dy * 0.5)
    nb = int(lab.max()) + 1
    sx = np.zeros(nb, np.float32)
    sy = np.zeros(nb, np.float32)
    sz = np.full(nb, np.inf, np.float32)
    for basin, (h, x, y) in best.items():
        if 0 <= basin < nb:
            sz[basin] = h
            sx[basin] = x
            sy[basin] = y
    return sx, sy, sz


def float_downstream(px, py, pz, rad, labels, water, mesh,
                     spill_x, spill_y, spill_z, spill_flow,
                     world=DEFAULT_WORLD):
    """Batched float_downstream (Water.cpp:1245-1260): floating objects
    in a SPILLING basin drift toward its spill point with velocity
    ~ spill flow / distance (capped at 0.005/frame).  Returns (dx, dy)
    position deltas."""
    my, mx = np.asarray(mesh).shape
    gx = jnp.clip(jnp.floor(px * world.dx_inv + mx // 2), 0, mx - 1).astype(jnp.int32)
    gy = jnp.clip(jnp.floor(py * world.dy_inv + my // 2), 0, my - 1).astype(jnp.int32)
    lab = jnp.asarray(labels).reshape(my, mx)[gy, gx]
    wl = jnp.asarray(water)[gy, gx]
    mh = jnp.asarray(mesh)[gy, gx]
    spx = jnp.asarray(spill_x)[lab]
    spy = jnp.asarray(spill_y)[lab]
    spz = jnp.asarray(spill_z)[lab]
    flow = jnp.asarray(spill_flow)[lab]
    # world coords of the spill cell
    tx = (spx - mx // 2) * world.dx
    ty = (spy - my // 2) * world.dy
    # spilling = water over the saddle; floating = above the bottom
    active = (wl > mh) & (wl > spz) & jnp.isfinite(spz) & (flow > 0.0) \
        & ((pz - rad) > (mh + 0.5 * rad))
    ex = tx - px
    ey = ty - py
    dist = jnp.sqrt(ex * ex + ey * ey) + 1e-9
    vel = jnp.minimum(0.005, 5.0e-5 * flow / (world.dx + world.dy + dist))
    s = jnp.where(active, vel / dist, 0.0)
    return s * ex, s * ey
