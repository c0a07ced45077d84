"""Batched physics step: the `process_groups` / `dwobject::advance_object`
hot loop (build_world.cpp:310-600, Physics.cpp:716-1080) as a fixed-shape
vmapped XLA program over all objects at once.

Design vs the reference:

* The reference iterates object groups serially, each object advancing with
  1-40 substeps and mutating shared state.  Here the whole object
  population is SoA arrays and one substep is a pure function
  `state -> state`; substeps are `lax.scan`.

* **Layout discipline**: every per-object quantity is a separate [N] array
  (px, py, pz, vx, ...), never [N,3] — TPU tiles (sublane,lane)=(8,128)
  over the last two dims, so a trailing 3 would run at ~2% lane
  utilization (measured ~40x slower on v5e).  The same applies to contact
  normals: component planes, not vectors.

* Static-scene collision = branchless sphere-vs-shape tests against the
  padded cobj SoA (cobjs.py), reduced by argmax penetration.

* Per-type parameters come from ONE one-hot matmul against the type table
  (8 XLA gathers would dominate the step).

* Dynamic sphere-sphere collision replaces the reference's re-registration
  of each large object as a dynamic sphere cobj every frame
  (build_world.cpp:526-543): an all-pairs pass on [B,N] Gram matrices
  (MXU), tiled over blocks to bound memory.

Reference quirk preserved: `advance_object`'s static-friction branch is
dead code — its condition is `!(flags | IN_WATER)` (always false,
Physics.cpp:826-829) — so the reference never applies it and neither do we.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst, DEFAULT_WORLD
from . import types as T
from .cobjs import CobjSet, GroupedCobjs, deepest_hits, deepest_hits_grouped


class ObjectState(NamedTuple):
    """SoA dynamic object state (~ dwobject, physics_objects.h:150)."""

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    status: jax.Array   # [N] int32: 0=dead, 1=airborne, 2=on mesh, 3=underwater-ground, 4=stopped
    flags: jax.Array    # [N] uint32 FL_* bits
    otype: jax.Array    # [N] int32 object type id
    time: jax.Array     # [N] int32 frames alive
    health: jax.Array   # [N] f32

    @property
    def pos(self):  # convenience (N,3) view for host-side consumers
        return jnp.stack([self.px, self.py, self.pz], axis=-1)

    @property
    def vel(self):
        return jnp.stack([self.vx, self.vy, self.vz], axis=-1)


class PhysicsEnv(NamedTuple):
    """Per-step environment (traced): terrain + water + wind."""

    mesh_height: jax.Array   # [my, mx]
    water_plane_z: jax.Array # scalar flat-water level
    wind: jax.Array          # [3] global wind (Physics.cpp:36)
    temperature: jax.Array   # scalar degrees C
    base_gravity: jax.Array  # scalar (config "gravity")
    zmin: jax.Array          # kill plane
    # per-cell water surface (the reference's water_matrix, mesh.h:100):
    # when present, objects see max(water_plane_z, water_height[cell]) —
    # valley-filled lakes at different levels behave correctly.  None =
    # flat-water only (the fused Pallas substep always uses the scalar).
    water_height: jax.Array | None = None


def make_state(pos, vel, otype, table: T.ObjTypeTable) -> ObjectState:
    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.asarray(vel, jnp.float32)
    n = pos.shape[0]
    otype = jnp.asarray(otype, jnp.int32)
    oh = jax.nn.one_hot(otype, table.health.shape[0], dtype=jnp.float32)
    return ObjectState(
        px=pos[:, 0], py=pos[:, 1], pz=pos[:, 2],
        vx=vel[:, 0], vy=vel[:, 1], vz=vel[:, 2],
        status=jnp.ones((n,), jnp.int32),
        flags=jnp.zeros((n,), jnp.uint32),
        otype=otype,
        time=jnp.zeros((n,), jnp.int32),
        health=oh @ table.health,
    )


# ---------------------------------------------------------------------------
# mesh sampling (one-hot matmuls; no gathers)
# ---------------------------------------------------------------------------

def _bilinear_onehots(g, n):
    """Fractional grid coord [D] -> bilinear sampling weights [D, n] (two
    nonzeros per row); sampling map M is then rowreduce((Z@M)*X)."""
    g0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, n - 2)
    f = jnp.clip(g - g0.astype(g.dtype), 0.0, 1.0)
    ar = jnp.arange(n, dtype=jnp.int32)[None, :]
    oh0 = (g0[:, None] == ar).astype(g.dtype)
    oh1 = (g0[:, None] + 1 == ar).astype(g.dtype)
    return oh0 * (1.0 - f)[:, None] + oh1 * f[:, None]


def sample_mesh(mesh: jax.Array, x, y, world: WorldConst):
    """Bilinear (height, normal-xyz) sample at world (x, y) for a batch —
    interpolate_mesh_zval + surface-normal lookup fused into one one-hot
    matmul over [mesh | dz/dx | dz/dy] stacked maps.

    On TPU with a native-layout mesh and a big enough batch, the sampling
    runs as a VMEM-resident Pallas kernel (ops/pallas/sample_kernel) —
    the XLA form's [N, 3*mx] intermediate round-trips ~25 MB of HBM per
    call (~126 us at N=10K, ~90% of the integrate substep)."""
    my, mx = mesh.shape
    if x.ndim == 1 and _on_tpu():
        from ..ops.pallas import sample_kernel as SK
        if SK.supported(mesh.shape, x.shape[0]):
            return SK.sample_mesh_pallas(mesh, x, y, world.dx_inv,
                                         world.dy_inv)
    gx = x * world.dx_inv + mx // 2
    gy = y * world.dy_inv + my // 2
    dzdx = (jnp.roll(mesh, -1, 1) - jnp.roll(mesh, 1, 1)) * (0.5 * world.dx_inv)
    dzdy = (jnp.roll(mesh, -1, 0) - jnp.roll(mesh, 1, 0)) * (0.5 * world.dy_inv)
    maps = jnp.concatenate([mesh, dzdx, dzdy], axis=1)        # [my, 3*mx]
    Z = _bilinear_onehots(gy, my)
    X = _bilinear_onehots(gx, mx)
    V = jnp.einsum("dy,yx->dx", Z, maps, preferred_element_type=jnp.float32)
    h = jnp.sum(V[:, :mx] * X, -1)
    sx = jnp.sum(V[:, mx:2 * mx] * X, -1)
    sy = jnp.sum(V[:, 2 * mx:] * X, -1)
    inv = jax.lax.rsqrt(sx * sx + sy * sy + 1.0)
    return h, -sx * inv, -sy * inv, inv  # (height, nx, ny, nz)


def outside_mesh(x, y, world: WorldConst):
    my, mx = world.mesh_y, world.mesh_x
    gx = x * world.dx_inv + mx // 2
    gy = y * world.dy_inv + my // 2
    return (gx < 0) | (gx >= mx) | (gy < 0) | (gy >= my)


# ---------------------------------------------------------------------------
# bounce (dwobject::object_bounce, Physics.cpp:1349-1409), componentized
# ---------------------------------------------------------------------------

def bounce_velocity(vx, vy, vz, nx, ny, nz, elasticity, air_factor):
    """(bounced vx,vy,vz, did_bounce).  Reflect about the normal
    (calc_reflection_angle); xy scaled by e*(1-air), z by e; bounce only
    sticks if post-bounce |v|^2 >= BOUNCE_CUTOFF (Physics.cpp:1391-1409)."""
    e = jnp.clip(elasticity, 0.0, 1.0)
    vdotn = vx * nx + vy * ny + vz * nz
    bx = vx - 2.0 * vdotn * nx
    by = vy - 2.0 * vdotn * ny
    bz = vz - 2.0 * vdotn * nz
    exy = e * (1.0 - air_factor)
    bx, by, bz = bx * exy, by * exy, bz * e
    did = (bx * bx + by * by + bz * bz) >= T.BOUNCE_CUTOFF
    return (jnp.where(did, bx, vx), jnp.where(did, by, vy),
            jnp.where(did, bz, vz), did)


# ---------------------------------------------------------------------------
# pairwise dynamic sphere collisions (MXU all-pairs)
# ---------------------------------------------------------------------------

def sphere_pair_collisions(px, py, pz, vx, vy, vz, radius, mass, elas, active,
                           block: int = 2048):
    """All-pairs sphere collision response (component-SoA form).

    Returns (dpx,dpy,dpz, dvx,dvy,dvz): mass-weighted push-out +
    restitution impulses summed over overlapping pairs.  Pair geometry is
    [B,N] Gram matrices from 1-D matvecs (MXU); per-axis results come from
    row sums and (B,N)@(N,) products — no [.,3] tensors anywhere.
    """
    n = px.shape[0]
    nb = -(-n // block)
    npad = nb * block
    pad = lambda a, v=0.0: jnp.pad(a, (0, npad - n), constant_values=v)
    PX, PY, PZ = pad(px), pad(py), pad(pz)
    VX, VY, VZ = pad(vx), pad(vy), pad(vz)
    R, M_, E = pad(radius), pad(mass, 1.0), pad(elas)
    A = pad(active.astype(jnp.float32))
    p_sq = PX * PX + PY * PY + PZ * PZ
    pv = PX * VX + PY * VY + PZ * VZ
    ident = jnp.arange(npad)

    def blk(i):
        sl = slice(i * block, (i + 1) * block)
        G = (jnp.outer(PX[sl], PX) + jnp.outer(PY[sl], PY)
             + jnp.outer(PZ[sl], PZ))                       # [B,Np]
        d2 = p_sq[sl][:, None] + p_sq[None, :] - 2.0 * G
        d2 = jnp.maximum(d2, 1e-12)
        d = jnp.sqrt(d2)
        rsum = R[sl][:, None] + R[None, :]
        hit = (d < rsum) & (ident[sl][:, None] != ident[None, :])
        hit &= (A[sl][:, None] > 0) & (A[None, :] > 0)
        pen = jnp.where(hit, rsum - d, 0.0)
        mw = M_[None, :] / (M_[sl][:, None] + M_[None, :])
        push = pen * mw / d                                 # coeff on (p_i - p_j)
        rs = jnp.sum(push, -1)
        dpx = PX[sl] * rs - push @ PX
        dpy = PY[sl] * rs - push @ PY
        dpz = PZ[sl] * rs - push @ PZ
        # restitution for approaching pairs:
        # rel = (v_i-v_j).(p_i-p_j)/d2 via Gram identities
        VPp = (jnp.outer(VX[sl], PX) + jnp.outer(VY[sl], PY) + jnp.outer(VZ[sl], PZ))
        PVp = (jnp.outer(PX[sl], VX) + jnp.outer(PY[sl], VY) + jnp.outer(PZ[sl], VZ))
        rel = (pv[sl][:, None] + pv[None, :] - VPp - PVp) / d2
        eij = jnp.minimum(E[sl][:, None], E[None, :])
        a = jnp.where(hit & (rel < 0), -(1.0 + eij) * mw * rel, 0.0)
        ra = jnp.sum(a, -1)
        dvx = PX[sl] * ra - a @ PX
        dvy = PY[sl] * ra - a @ PY
        dvz = PZ[sl] * ra - a @ PZ
        return dpx, dpy, dpz, dvx, dvy, dvz

    outs = [blk(i) for i in range(nb)]
    cat = lambda k: jnp.concatenate([o[k] for o in outs])[:n]
    return cat(0), cat(1), cat(2), cat(3), cat(4), cat(5)


# ---------------------------------------------------------------------------
# sorted-band broad phase: Morton sort + shifted-window pairs
# ---------------------------------------------------------------------------

def _part1by1(v):
    """Interleave 16-bit value with zeros (Morton helper)."""
    v = v & jnp.uint32(0x0000FFFF)
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v


def morton_key(px, py, cell: float, half_extent: float):
    """2D Morton (Z-order) cell key — spatially local sort order."""
    cx = jnp.clip(((px + half_extent) / cell).astype(jnp.int32), 0, 0xFFFF).astype(jnp.uint32)
    cy = jnp.clip(((py + half_extent) / cell).astype(jnp.int32), 0, 0xFFFF).astype(jnp.uint32)
    return (_part1by1(cx) | (_part1by1(cy) << 1)).astype(jnp.uint32)


def spatial_sort(state: ObjectState, world: WorldConst,
                 key: str = "x") -> ObjectState:
    """Sort the whole object population spatially.

    `lax.sort` co-sorts every state column on TPU — no argsort+gather.
    Object order carries no meaning in this engine (no cross-references),
    so the state simply *stays* sorted.  Dead objects sort last so the
    active prefix stays dense.

    Default key is the x coordinate: contacts then sit within a sorted-
    order window bounded by the occupancy of an rsum-wide x slab (~250 at
    the 10K config_spheres pile density; audited in
    tests/test_physics_oracle.py), so the banded pair pass with
    window=PAIR_WINDOW is EXACT for realistic densities.  The Morton key
    ('morton') is kept for reference but its Z-order curve has long jumps
    that put ~11% of pile contacts beyond any practical window.
    """
    if key == "morton":
        k = morton_key(state.px, state.py, 0.1, 2.0 * world.x_scene)
        k = jnp.where(state.status > 0, k, jnp.uint32(0xFFFFFFFF))
    else:
        k = jnp.where(state.status > 0, state.px, jnp.float32(jnp.inf))
    cols = [state.px, state.py, state.pz, state.vx, state.vy, state.vz,
            state.status, state.flags, state.otype, state.time, state.health]
    sorted_all = jax.lax.sort([k] + cols, num_keys=1)
    return ObjectState(*sorted_all[1:])


# gap schedule for the comb repair: halving gaps catch rank drifts up to
# ~REPAIR_GAPS[0] in one sweep; the trailing 1s finish local inversions
REPAIR_GAPS = (64, 32, 16, 8, 4, 2, 1, 1, 1)


def spatial_sort_repair(state: ObjectState, world: WorldConst,
                        gaps: tuple = REPAIR_GAPS) -> ObjectState:
    """`spatial_sort` for an almost-sorted population.

    Comb-style gap compare-exchange sweeps — pure elementwise
    rolls/selects — then a global sortedness check that falls back to
    the real sort under `lax.cond` when the sweeps didn't converge, so
    the banded pair pass's EXACT window guarantee always sees a fully
    sorted order whichever branch ran.

    MEASURED NEGATIVE RESULT (round 3, v5e, bench scene): NOT used by
    `step_objects`.  Rank drift per frame in the live 10K pile is far
    beyond any cheap gap schedule — convection moves 1-30% of objects
    >64 ranks, and every off-mesh/lifetime kill teleports a key to +inf
    (~N-rank displacement), so the fallback fired nearly every frame
    and the frame got 0.26 ms SLOWER.  Kept (tested) for calm scenes:
    profitable when objects neither die nor cross ~gaps[0] ranks
    between frames."""
    k = jnp.where(state.status > 0, state.px, jnp.float32(jnp.inf))
    cols = [state.px, state.py, state.pz, state.vx, state.vy, state.vz,
            state.status, state.flags, state.otype, state.time, state.health]
    n = k.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    def phase(k, cols, g, parity):
        # brick pattern: element i leads the (i, i+g) pair when its
        # g-block index has `parity`; lead/trail masks never overlap
        lead = ((idx // g) % 2 == parity) & (idx + g < n)
        kf = jnp.roll(k, -g)
        swap_lead = lead & (k > kf)
        swap_trail = jnp.roll(swap_lead, g)

        def ex(c):
            return jnp.where(swap_lead, jnp.roll(c, -g),
                             jnp.where(swap_trail, jnp.roll(c, g), c))
        return ex(k), [ex(c) for c in cols]

    for g in gaps:
        k, cols = phase(k, cols, g, 0)
        k, cols = phase(k, cols, g, 1)
    repaired = ObjectState(*cols)
    ok = jnp.all(k[:-1] <= k[1:])
    return jax.lax.cond(ok, lambda s: s,
                        lambda s: spatial_sort(s, world), repaired)


def grid_pair_collisions(px, py, pz, vx, vy, vz, radius, mass, elas, active,
                         cell: float, half_extent: float, K: int = 16):
    """EXACT pair broad phase: the reference's collision grid
    (v_collision_matrix, collision_detect.h:421-438) as a regular TPU
    array program.

    Objects hash into 3D cells of size `cell` (>= max pair diameter); each
    cell keeps up to K occupants in a bucket table built by one lax.sort +
    scatter; every object then tests the 27 neighbor cells' candidates —
    fixed-shape [N, 27K] gathers, no [N,N] work.  Misses occur only on
    bucket overflow (audited in tests/test_physics_oracle.py: 0 at 10K
    config_spheres pile density with cell=0.12, K=16).

    Returns the same (dpx,dpy,dpz,dvx,dvy,dvz) one-sided symmetric deltas
    as banded_pair_collisions.
    """
    n = px.shape[0]
    f32 = px.dtype
    # hashed cell ids (spatial hashing: cells -> H buckets, H ~ 4N so
    # distinct-cell hash collisions are rare; they only ADD candidates,
    # never drop pairs — the distance test filters them)
    H = 1 << max(int(np.ceil(np.log2(max(4 * n, 64)))), 6)
    cx = jnp.floor((px + half_extent) / cell).astype(jnp.int32)
    cy = jnp.floor((py + half_extent) / cell).astype(jnp.int32)
    cz = jnp.floor((pz + half_extent) / cell).astype(jnp.int32)

    def chash(ax, ay, az):
        h = (ax * jnp.int32(73856093)) ^ (ay * jnp.int32(19349663)) \
            ^ (az * jnp.int32(83492791))
        return (h & jnp.int32(0x7FFFFFFF)) % H

    cid = chash(cx, cy, cz)
    cid = jnp.where(active, cid, H)                     # dead -> overflow
    # bucket build: objects of a (hashed) cell are contiguous after sorting
    sorted_cid, sorted_idx = jax.lax.sort(
        [cid, jnp.arange(n, dtype=jnp.int32)], num_keys=1)
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    nbuck = H * K
    addr = sorted_cid * K + rank
    addr = jnp.where((rank < K) & (sorted_cid < H), addr, nbuck)
    bucket = jnp.full((nbuck + 1,), n, jnp.int32)
    bucket = bucket.at[addr].set(sorted_idx, mode="drop")

    # candidate index matrix [N, 27K]; if two neighbor cells hash to the
    # same bucket, mask the later one (else its candidates double-count)
    bases = []
    for dz_ in (-1, 0, 1):
        for dy_ in (-1, 0, 1):
            for dx_ in (-1, 0, 1):
                bases.append(chash(cx + dx_, cy + dy_, cz + dz_))
    cand_cols = []
    dup_cols = []
    for a, base in enumerate(bases):
        dup = jnp.zeros((n,), bool)
        for b in range(a):
            dup = dup | (base == bases[b])
        for k in range(K):
            cand_cols.append(bucket[base * K + k])
            dup_cols.append(dup)
    cand = jnp.stack(cand_cols, axis=1)                 # [N, 27K]
    dup_mask = jnp.stack(dup_cols, axis=1)

    padd = lambda a, v: jnp.concatenate([a, jnp.full((1,), v, a.dtype)])
    gx, gy, gz = padd(px, 1e9), padd(py, 1e9), padd(pz, 1e9)
    gvx, gvy, gvz = padd(vx, 0), padd(vy, 0), padd(vz, 0)
    gr, gm, ge = padd(radius, 0), padd(mass, 1), padd(elas, 0)
    ga = padd(active.astype(f32), 0)

    ex = px[:, None] - gx[cand]
    ey = py[:, None] - gy[cand]
    ez = pz[:, None] - gz[cand]
    d2 = jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-12)
    dist = jnp.sqrt(d2)
    rsum = radius[:, None] + gr[cand]
    valid = ((cand != jnp.arange(n, dtype=jnp.int32)[:, None]) & (cand < n)
             & (active[:, None]) & (ga[cand] > 0) & ~dup_mask)
    hit = valid & (dist < rsum)
    pen = jnp.where(hit, rsum - dist, 0.0)
    mj = gm[cand]
    mw_i = mj / (mass[:, None] + mj)
    push_i = pen * mw_i / dist
    relv = ((vx[:, None] - gvx[cand]) * ex + (vy[:, None] - gvy[cand]) * ey
            + (vz[:, None] - gvz[cand]) * ez) / d2
    eij = jnp.minimum(elas[:, None], ge[cand])
    ai = jnp.where(hit & (relv < 0), -(1.0 + eij) * relv, 0.0) * mw_i
    dpx = jnp.sum(push_i * ex, -1)
    dpy = jnp.sum(push_i * ey, -1)
    dpz = jnp.sum(push_i * ez, -1)
    dvx = jnp.sum(ai * ex, -1)
    dvy = jnp.sum(ai * ey, -1)
    dvz = jnp.sum(ai * ez, -1)
    return dpx, dpy, dpz, dvx, dvy, dvz


def block_pair_collisions(px, py, pz, vx, vy, vz, radius, mass, elas, active,
                          block: int = 384):
    """Gather-free pair pass over the x-SORTED order.

    Blocks of `block` consecutive objects; every unordered pair is
    evaluated ONCE, in one of two dense [G, B, B] matrices:
      * SELF: upper triangle of block-g x block-g,
      * NEXT: block-g x block-(g+1) (full).
    i-side deltas come from row sums, j-side from column sums (rolled back
    one block for NEXT) — both reduction directions are native on TPU, and
    there are no gathers and no [N,N] work.

    Exact for every pair within `block` ranks in the sorted order (and up
    to 2B-1 for straddling pairs), i.e. while no rsum-wide x slab holds
    more than `block` objects — audited at 10K pile density in
    tests/test_physics_oracle.py (max span 247).  Returns the same
    symmetric deltas as grid_pair_collisions.
    """
    n = px.shape[0]
    B = block
    G = -(-n // B)
    npad = G * B
    padv = lambda a, v=0.0: jnp.pad(a, (0, npad - n), constant_values=v)
    X, Y, Z = padv(px, 1e9), padv(py, 1e9), padv(pz, 1e9)
    VX, VY, VZ = padv(vx), padv(vy), padv(vz)
    R, M_, E = padv(radius), padv(mass, 1.0), padv(elas)
    A = padv(active.astype(px.dtype))

    bl = lambda a: a.reshape(G, B)
    nx = lambda a: jnp.roll(a.reshape(G, B), -1, 0)

    ii = jnp.arange(B, dtype=jnp.int32)
    upper = (ii[:, None] < ii[None, :])[None]            # [1, B, B]
    # NEXT matrices: block G-1's "next" wraps to block 0 — mask it out
    next_ok = (jnp.arange(G, dtype=jnp.int32) < G - 1)[:, None, None]

    def halfpass(side):
        """side 0: SELF (j in own block, upper triangle); side 1: NEXT."""
        nb = bl if side == 0 else nx
        ex = bl(X)[:, :, None] - nb(X)[:, None, :]
        ey = bl(Y)[:, :, None] - nb(Y)[:, None, :]
        ez = bl(Z)[:, :, None] - nb(Z)[:, None, :]
        d2 = jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-12)
        rinv = jax.lax.rsqrt(d2)   # one transcendental per pair
        rsum = bl(R)[:, :, None] + nb(R)[:, None, :]
        valid = (bl(A)[:, :, None] > 0) & (nb(A)[:, None, :] > 0)
        valid = valid & (upper if side == 0 else next_ok)
        hit = valid & (d2 < rsum * rsum)
        mi = bl(M_)[:, :, None]
        mj = nb(M_)[:, None, :]
        minv = 1.0 / (mi + mj)
        # pen/dist, shared by both sides; mass weights split it
        p = jnp.where(hit, rsum * rinv - 1.0, 0.0)
        relv = ((bl(VX)[:, :, None] - nb(VX)[:, None, :]) * ex
                + (bl(VY)[:, :, None] - nb(VY)[:, None, :]) * ey
                + (bl(VZ)[:, :, None] - nb(VZ)[:, None, :]) * ez) \
            * (rinv * rinv)
        eij = jnp.minimum(bl(E)[:, :, None], nb(E)[:, None, :])
        a = jnp.where(hit & (relv < 0), -(1.0 + eij) * relv, 0.0)
        wi = mj * minv      # i-side weight
        wj = mi * minv
        outs = []
        for e in (ex, ey, ez):
            pi = jnp.sum(p * wi * e, -1)          # rows -> i side [G,B]
            pj = jnp.sum(p * wj * e, -2)          # cols -> j side [G,B]
            outs.append((pi, pj))
        for e in (ex, ey, ez):
            qi = jnp.sum(a * wi * e, -1)
            qj = jnp.sum(a * wj * e, -2)
            outs.append((qi, qj))
        return outs

    self_o = halfpass(0)
    next_o = halfpass(1)
    res = []
    for k in range(6):
        si, sj = self_o[k]
        ni_, nj = next_o[k]
        # j-side contributions are -delta (e points i->j); NEXT j sums
        # belong to block g+1
        tot = si - sj + ni_ - jnp.roll(nj, 1, 0)
        res.append(tot.reshape(npad)[:n])
    return tuple(res)


def rowblock_pair_collisions(px, py, pz, vx, vy, vz, radius, mass, elas,
                             active, i_limit: int | None = None,
                             qmax: int = 2):
    """Row-block EXACT pair pass over the x-sorted order.

    Reshape the sorted population to [S, 128] rows; every pair within
    (qmax+1)*128 - 1 ranks lies in a dense row-vs-row block at row offset
    q <= qmax, so the whole pass is qmax+1 batched [S, 128, 128]
    elementwise blocks with row/column-sum reductions — no serial
    shift loop (the banded kernel runs `window` dependent iterations), no
    gathers, and XLA fuses each block chain into its two reductions.

    Coverage per offset: q=0 spans rank distances 1..127 (upper
    triangle), q=1 spans 1..255, q=2 spans 129..383 — the union covers
    every distance in [1, 383] exactly once, beating the banded kernel's
    PAIR_WINDOW=288 guarantee.  Same contact math and symmetric deltas as
    banded_pair_collisions; `i_limit` as there (sharded halo support —
    note the halo must then span ceil(i_limit-relative coverage) = 383
    ranks, i.e. 3 rows).
    """
    n = px.shape[0]
    Lr = 128
    S = -(-n // Lr)
    npad = S * Lr
    f32 = px.dtype
    ilim = n if i_limit is None else i_limit

    pad = lambda a, v=0.0: jnp.pad(a, (0, npad - n),
                                   constant_values=v).reshape(S, Lr)
    X, Y, Z = pad(px), pad(py), pad(pz)
    VX, VY, VZ = pad(vx), pad(vy), pad(vz)
    R, M_, E = pad(radius), pad(mass, 1.0), pad(elas)
    A = pad(active.astype(f32))
    rank = (jnp.arange(S, dtype=jnp.int32)[:, None] * Lr
            + jnp.arange(Lr, dtype=jnp.int32)[None, :])
    maski = (rank < ilim)[:, :, None]                     # i-side limit
    lane = jnp.arange(Lr, dtype=jnp.int32)
    tri = (lane[:, None] < lane[None, :])[None]           # q=0 triangle

    accs = [jnp.zeros((S, Lr), f32) for _ in range(6)]
    for q in range(qmax + 1):
        rl = lambda M: jnp.roll(M, -q, 0)
        ex = X[:, :, None] - rl(X)[:, None, :]            # [S, 128, 128]
        ey = Y[:, :, None] - rl(Y)[:, None, :]
        ez = Z[:, :, None] - rl(Z)[:, None, :]
        d2 = jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-12)
        rinv = jax.lax.rsqrt(d2)
        rsum = R[:, :, None] + rl(R)[:, None, :]
        valid = (A[:, :, None] > 0) & (rl(A)[:, None, :] > 0) & maski
        if q == 0:
            valid = valid & tri
        else:
            valid = valid & (jnp.arange(S) < S - q)[:, None, None]
        hit = valid & (d2 < rsum * rsum)
        mi = M_[:, :, None]
        mj = rl(M_)[:, None, :]
        minv = 1.0 / (mi + mj)
        p = jnp.where(hit, rsum * rinv - 1.0, 0.0)        # pen/dist
        relv = ((VX[:, :, None] - rl(VX)[:, None, :]) * ex
                + (VY[:, :, None] - rl(VY)[:, None, :]) * ey
                + (VZ[:, :, None] - rl(VZ)[:, None, :]) * ez) \
            * (rinv * rinv)
        eij = jnp.minimum(E[:, :, None], rl(E)[:, None, :])
        a = jnp.where(hit & (relv < 0), -(1.0 + eij) * relv, 0.0)
        wi = mj * minv
        wj = mi * minv
        for k, e in enumerate((ex, ey, ez)):
            accs[k] = accs[k] + jnp.sum(p * wi * e, -1) \
                - jnp.roll(jnp.sum(p * wj * e, -2), q, 0)
            accs[3 + k] = accs[3 + k] + jnp.sum(a * wi * e, -1) \
                - jnp.roll(jnp.sum(a * wj * e, -2), q, 0)
    return tuple(acc.reshape(npad)[:n] for acc in accs)


def _on_tpu() -> bool:
    """Where will this trace execute?  Honors jax.default_device(...)
    contexts (jax.default_backend() alone ignores them, which broke
    mixed-device runs like scripts/tpu_parity_check.py)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", str(dev)) == "tpu"
    return jax.default_backend() == "tpu"


# pair-pass cell size: >= 2x the largest dynamic-object radius in the type
# table (SMILEY 0.06 -> rsum 0.12); smaller cells cut bucket occupancy
# (audited at 10K pile density: 0 overflow misses with K=16)
PAIR_CELL = 0.12
# banded window over the x-sorted order: must exceed the max occupancy of
# an rsum-wide x slab (247 measured at 10K pile density; audited in
# tests/test_physics_oracle.py)
PAIR_WINDOW = 288
# the XLA block path tiles in 128-multiples; 384 >= PAIR_WINDOW keeps its
# guarantee at least as wide as the banded kernel's
PAIR_BLOCK = 384


def _pair_deltas(px, py, pz, vx, vy, vz, radius, mass, elas, active,
                 window: int = PAIR_WINDOW, world: WorldConst = DEFAULT_WORLD,
                 method: str = "auto"):
    """Pair-collision dispatch over the x-SORTED order (spatial_sort
    key='x') — exact while no rsum-wide x slab holds more than `window`
    objects (audited in tests/test_physics_oracle.py).

    'auto': the Pallas roll-shift kernel on TPU (N*window pair slots, all
    VMEM-resident — ~3x less arithmetic than the block pass for the same
    rank-distance guarantee), the XLA block pass elsewhere.  'block' is
    the dense [B,B] XLA path (any backend); 'banded' the XLA roll-shift
    fori_loop; 'grid' the spatial-hash exact path: density-independent
    but gather-bound (~200 ms/substep at 10K on v5e — TPU XLA random
    gathers), kept as the audit reference."""
    if method == "grid":
        return grid_pair_collisions(px, py, pz, vx, vy, vz, radius, mass,
                                    elas, active, cell=PAIR_CELL,
                                    half_extent=2.0 * world.x_scene)
    if method == "rowblock":
        return rowblock_pair_collisions(px, py, pz, vx, vy, vz, radius,
                                        mass, elas, active)
    if method == "block" or (method == "auto" and not _on_tpu()):
        return block_pair_collisions(px, py, pz, vx, vy, vz, radius, mass,
                                     elas, active,
                                     block=max(window, PAIR_BLOCK))
    if method == "auto":        # on TPU (the CPU auto case returned above)
        from ..ops.pallas.pairs_kernel import banded_pairs_pallas
        return banded_pairs_pallas(px, py, pz, vx, vy, vz, radius, mass,
                                   elas, active, window=window)
    if method == "banded":      # explicit XLA roll-shift path, any backend
        return banded_pair_collisions(px, py, pz, vx, vy, vz, radius, mass,
                                      elas, active, window=window)
    raise ValueError(f"unknown pair method {method!r}")


def banded_pair_collisions(px, py, pz, vx, vy, vz, radius, mass, elas, active,
                           window: int = 64, i_limit: int | None = None):
    """Pair collisions against the `window` nearest sorted-order neighbors.

    Pure shifted-slice arithmetic: for each offset d in 1..window compare
    row i with row i+d — O(N*window) elementwise VPU work, no [N,N]
    matrices, no gathers.  Requires the state to be Morton-sorted (see
    `spatial_sort`); pairs further apart in Z-order than `window` are
    missed, which at game densities is a vanishing fraction (and the
    reference's racy OMP collision order is itself approximate).

    `i_limit` restricts the i side of every evaluated pair to ranks
    < i_limit: the sharded halo pass (parallel/pairs.py) appends a
    `window`-rank halo from the next device and sets i_limit to the local
    slab length, so halo rows contribute only as the j side.
    """
    n = px.shape[0]
    ilim = n if i_limit is None else i_limit
    act = active.astype(px.dtype)
    dpx = jnp.zeros_like(px)
    dpy = jnp.zeros_like(px)
    dpz = jnp.zeros_like(px)
    dvx = jnp.zeros_like(px)
    dvy = jnp.zeros_like(px)
    dvz = jnp.zeros_like(px)

    def body(d, acc):
        dpx, dpy, dpz, dvx, dvy, dvz = acc
        # rows i (head) vs i+d (tail): slice-shift by dynamic offset
        sh = lambda a: jnp.roll(a, -d, 0)
        ex = px - sh(px)
        ey = py - sh(py)
        ez = pz - sh(pz)
        d2 = jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-12)
        dist = jnp.sqrt(d2)
        rsum = radius + sh(radius)
        idx = jnp.arange(n)
        valid = (idx < jnp.minimum(ilim, n - d)) & (act > 0) & (sh(act) > 0)
        hit = valid & (dist < rsum)
        pen = jnp.where(hit, rsum - dist, 0.0)
        m_i, m_j = mass, sh(mass)
        mw_i = m_j / (m_i + m_j)        # push weight on i
        mw_j = m_i / (m_i + m_j)
        push_i = pen * mw_i / dist      # coeff on (p_i - p_j)
        push_j = pen * mw_j / dist
        relv = ((vx - sh(vx)) * ex + (vy - sh(vy)) * ey + (vz - sh(vz)) * ez) / d2
        eij = jnp.minimum(elas, sh(elas))
        a = jnp.where(hit & (relv < 0), -(1.0 + eij) * relv, 0.0)
        ai = a * mw_i
        aj = a * mw_j
        unsh = lambda v: jnp.roll(v, d, 0)  # accumulate back onto row i+d
        dpx = dpx + push_i * ex - unsh(push_j * ex)
        dpy = dpy + push_i * ey - unsh(push_j * ey)
        dpz = dpz + push_i * ez - unsh(push_j * ez)
        dvx = dvx + ai * ex - unsh(aj * ex)
        dvy = dvy + ai * ey - unsh(aj * ey)
        dvz = dvz + ai * ez - unsh(aj * ez)
        return dpx, dpy, dpz, dvx, dvy, dvz

    acc = (dpx, dpy, dpz, dvx, dvy, dvz)
    acc = jax.lax.fori_loop(1, window + 1, body, acc)
    return acc


# ---------------------------------------------------------------------------
# per-type parameter fetch (one matmul, not 8 gathers)
# ---------------------------------------------------------------------------

def _type_params(otype, table: T.ObjTypeTable):
    cols = jnp.stack([table.radius, table.air_factor, table.friction,
                      table.gravity, table.elasticity, table.density,
                      table.terminal_vel, table.mass,
                      table.lifetime.astype(jnp.float32)], axis=1)
    oh = jax.nn.one_hot(otype, cols.shape[0], dtype=jnp.float32)
    v = jnp.einsum("nt,tp->np", oh, cols, preferred_element_type=jnp.float32)
    return tuple(v[:, i] for i in range(cols.shape[1]))


# ---------------------------------------------------------------------------
# one substep
# ---------------------------------------------------------------------------

def _substep(state: ObjectState, env: PhysicsEnv, cobjs: CobjSet | None,
             table: T.ObjTypeTable, tstep, world: WorldConst,
             obj_collisions: bool, pair_fn=None, water: bool = True):
    rad, air, fric, grav, elas, dens, tv, mass, _life = _type_params(state.otype, table)

    alive = state.status > 0
    # capture + clear last-substep collision (advance_object entry,
    # Physics.cpp:720-721: coll_last_frame then flags &= ~OBJ_COLLIDED)
    coll_last = (state.flags & T.FL_COLLIDED) != 0
    flags = state.flags & ~T.FL_COLLIDED
    floating = (flags & T.FL_FLOATING) != 0
    z_stop = (flags & T.FL_Z_STOPPED) != 0
    xy_stop = (flags & T.FL_XY_STOPPED) != 0
    underwater = (flags & T.FL_UNDERWATER) != 0
    in_water = (flags & T.FL_IN_WATER) != 0
    # the reference's airborne branch is status==1 only; 2/3 take the
    # on-ground surface_advance path below (Physics.cpp:755,901)
    moving = alive & (state.status == 1)
    grounded = alive & ((state.status == 2) | (state.status == 3))

    px, py, pz = state.px, state.py, state.pz
    vx, vy, vz = state.vx, state.vy, state.vz

    # air factor (Physics.cpp:760-774)
    air_eff = jnp.where(underwater, 0.0,
                        jnp.where(floating, (1.0 - T.WATER_SURF_FRICTION) * air, air))

    # Z_STOPPED clause (Physics.cpp:774-785), BEFORE the collided flag
    # and vz_old capture: above the water line with low friction the
    # flag clears (object resumes falling); otherwise vz is zeroed
    unstop = z_stop & moving & ((pz - rad) > env.water_plane_z) \
        & (fric < 2.0 * T.STICK_THRESHOLD)
    z_stop = z_stop & ~unstop
    flags = jnp.where(unstop, flags & ~T.FL_Z_STOPPED, flags)
    vz = jnp.where(z_stop & moving, 0.0, vz)
    # collided flag + vz_old captured POST-zero, PRE-gravity
    # (Physics.cpp:787-789); vz_old feeds the buoyant deep-float branch
    # (:1121)
    collided = coll_last | (jnp.abs(vz) < 1.0e-6)
    vz_old = vz

    # gravity with terminal velocity (Physics.cpp:795-819); objects denser
    # than water sink with reduced gravity (gscale, :798)
    gscale = jnp.where(in_water & (dens > T.WATER_DENSITY),
                       (dens - T.WATER_DENSITY) / dens, 1.0)
    can_fall = moving & ~z_stop
    vz_new = jnp.where(-vz < tv,
                       jnp.maximum(vz - env.base_gravity * gscale * T.GRAVITY
                                   * tstep * grav, -tv),
                       vz)
    vz = jnp.where(can_fall, vz_new, vz)
    # wind (Physics.cpp:820-833): xy drag relaxes toward vtot = v + wind
    # (wind skipped when collided last frame); z adds wind directly
    wx, wy, wz = env.wind[0], env.wind[1], env.wind[2]
    vz = jnp.where(can_fall & ((jnp.abs(air_eff * wz) > jnp.abs(vz)) | ((wz < 0) != (vz < 0))),
                   vz + air_eff * wz, vz)
    move_xy = moving & ~xy_stop

    def drag(v, w):
        vtot = v + jnp.where(collided, 0.0, w)
        c = (jnp.abs(air_eff * vtot) > jnp.abs(v)) | ((vtot < 0) != (v < 0))
        return jnp.where(c & move_xy, (1.0 - air_eff) * v + air_eff * vtot, v)

    vx = drag(vx, wx)
    vy = drag(vy, wy)

    px = px + jnp.where(move_xy, tstep * vx, 0.0)
    py = py + jnp.where(move_xy, tstep * vy, 0.0)
    pz = pz + jnp.where(moving, tstep * vz, 0.0)

    # --- mesh surface ---
    mh, mnx, mny, mnz = sample_mesh(env.mesh_height, px, py, world)
    off_mesh = outside_mesh(px, py, world)
    on_mesh = ~off_mesh & ((pz - rad) <= mh)

    # --- water (check_water_collision core, Physics.cpp:1082-1180);
    # per-object level from water_matrix when a per-cell map exists.
    # `water=False` (scene declared disable_water, 3DWorld.cpp kwmb)
    # skips the whole water+ice block statically ---
    if not water:
        wpz = env.water_plane_z
        touches_water = jnp.zeros_like(alive)
        wcoll = touches_water
        status = state.status
        v_sq = vx * vx + vy * vy + vz * vz
    elif env.water_height is not None:
        wh, _, _, _ = sample_mesh(env.water_height, px, py, world)
        wpz = jnp.maximum(env.water_plane_z, wh)
    else:
        wpz = env.water_plane_z
    if water:
        over_water = ~off_mesh & (wpz > mh)
        touches_water = over_water & ((pz - rad) < wpz) & alive
        # frozen water becomes an ice SURFACE (check_water_collision ice
        # branch, Physics.cpp:1198-1218): objects sit on it, bounce if
        # elastic enough, else stick (XYZ_STOPPED | IS_ON_ICE, status 4)
        frozen = env.temperature <= T.W_FREEZE_POINT
        ice_touch = touches_water & frozen
        touches_water = touches_water & ~frozen
        v_sq = vx * vx + vy * vy + vz * vz
        # slow branch also taken when Z_STOPPED regardless of speed
        # (Physics.cpp:1117 `v_tot_sq < BOUNCE_CUTOFF || (flags & Z_STOPPED)`)
        fast = (v_sq >= T.BOUNCE_CUTOFF) & ~z_stop
        den_ratio = T.WATER_DENSITY / (dens + T.WATER_DENSITY)
        damp = 1.0 - T.WATER_DAMPING * den_ratio
        floats = dens < T.WATER_DENSITY
        w_fast = touches_water & fast
        w_slow = touches_water & ~fast
        # surface skip / ricochet (check_water_collision, Physics.cpp:1154-1163):
        # fast shallow-angle surface hits bounce off the water instead of
        # entering; coll_angle = acos(-vz/|v|) vs CRITICAL_ANGLE/den_ratio
        v_mag = jnp.sqrt(jnp.maximum(v_sq, 1e-12))
        coll_angle = jnp.arccos(jnp.clip(-vz / v_mag, -1.0, 1.0))
        zpos_w = jnp.maximum(wpz + rad * (1.0 - 2.0 * dens), mh + rad)
        surf_coll = (pz > wpz - rad - T.MAX_SPLASH_DEPTH) & ~underwater & ~z_stop
        sbx, sby, sbz, s_did = bounce_velocity(vx, vy, vz, 0.0, 0.0, 1.0,
                                               T.WATER_ELASTIC, air_eff)
        skip = (w_fast & surf_coll & (coll_angle >= T.CRITICAL_ANGLE / den_ratio)
                & ((zpos_w - pz) <= 6.0 * rad) & s_did)
        w_fast = w_fast & ~skip
        vx = jnp.where(skip, sbx, jnp.where(w_fast, vx * damp, vx))
        vy = jnp.where(skip, sby, jnp.where(w_fast, vy * damp, vy))
        vz = jnp.where(skip, sbz, jnp.where(w_fast, jnp.where(floats, 0.0, vz * damp),
                                            vz))
        touches_water = touches_water & ~skip
        w_fast = w_fast & ~skip
        flags = jnp.where(touches_water, flags | T.FL_IN_WATER, flags)
        # fast floaters enter Z_STOPPED|FLOATING (Physics.cpp:1171-1173)
        flags = jnp.where(w_fast & floats,
                          flags | (T.FL_Z_STOPPED | T.FL_FLOATING), flags)
        flags = jnp.where(w_fast & ~floats,
                          flags | T.FL_UNDERWATER, flags)
        ground_z = mh + rad
        zpos_f = zpos_w   # float height, already computed for the skip test
        # --- slow branch, mirroring the validated oracle bit for bit
        # (tests/oracle_physics.py check_water_collision, Physics.cpp:
        # 1117-1151).  Floaters more than 2r below their float height
        # rise BUOYANTLY over substeps (vz_old minus signed buoyant
        # gravity, Z_STOPPED); shallow floaters snap to zpos +
        # SMALL_NUMBER=0.001 (pinned by tests/test_cpp_golden.py).
        # Sinkers above the bottom damp velocity by dens/(dens+WATER)
        # per substep instead of teleporting to the lake bed ---
        f_deep = w_slow & floats & ((zpos_f - pz) > 2.0 * rad)
        f_snap = w_slow & floats & ~((zpos_f - pz) > 2.0 * rad)
        buoy_vz = vz_old - ((dens - T.WATER_DENSITY) / dens) \
            * env.base_gravity * T.GRAVITY * tstep
        sink = w_slow & ~floats
        s_damp = sink & (pz > ground_z + 1e-5)
        s_rest = sink & ~(pz > ground_z + 1e-5)
        sink_f = dens / (dens + T.WATER_DENSITY)
        vx = jnp.where(f_snap | s_rest, 0.0, jnp.where(s_damp, vx * sink_f, vx))
        vy = jnp.where(f_snap | s_rest, 0.0, jnp.where(s_damp, vy * sink_f, vy))
        vz = jnp.where(f_snap | s_rest, 0.0,
                       jnp.where(s_damp, vz * sink_f,
                                 jnp.where(f_deep, buoy_vz, vz)))
        pz = jnp.where(f_snap, zpos_f + 0.001, jnp.where(s_rest, ground_z, pz))
        flags = jnp.where(f_deep, flags | T.FL_Z_STOPPED, flags)
        flags = jnp.where(f_snap, flags | T.FL_FLOATING, flags)
        # float-branch status (Physics.cpp:1130-1140): floating on water
        # when above the ground; at the water's edge 1/2 -> 3, else 4
        w_float = w_slow & floats
        edge_st = jnp.where((state.status == 1) | (state.status == 2), 3, 4)
        status = jnp.where(w_float,
                           jnp.where(pz > ground_z, 1, edge_st), state.status)
        status = jnp.where(s_rest, 3, status)
        # fast underwater ground contact: status 3 only, no snap
        # (Physics.cpp:1169-1172 `status = 3; return`)
        hit_bottom = w_fast & ~floats & (pz <= ground_z + 1e-5)
        status = jnp.where(hit_bottom, 3, status)
        # water-HANDLED set (check_water_collision returned 1).  The
        # return-0 paths — float edge 1/2->3, sink at rest, fast bottom
        # contact — CONTINUE into the mesh/cobj collision handling below
        # (a sinking rock reaching the lake bed bounces off the mesh,
        # Physics.cpp:868-882) — only wcoll objects skip it
        edge3 = w_float & ~(pz > ground_z) \
            & ((state.status == 1) | (state.status == 2))
        wcoll = touches_water & ~edge3 & ~s_rest & ~hit_bottom

        # --- ice surface (frozen): sit at wpz + radius; bounce only for
        # elasticity >= ICE_BOUNCE_ELAS, otherwise stuck to the ice.
        # object_bounce(1,...) multiplies by ICE_ELASTICITY=0.95
        # (Physics.cpp:1379) ---
        ibx, iby, ibz, idid = bounce_velocity(vx, vy, vz, 0.0, 0.0, 1.0,
                                              elas * T.ICE_ELASTICITY, air_eff)
        stick = ice_touch & ((elas < T.ICE_BOUNCE_ELAS) | ~idid)
        bounce_ice = ice_touch & ~stick
        # sitting on the ice surface adds SMALL_NUMBER=0.001
        # (Physics.cpp:1209, `water_height + radius + SMALL_NUMBER`)
        pz = jnp.where(ice_touch, wpz + rad + 0.001, pz)
        vx = jnp.where(stick, 0.0, jnp.where(bounce_ice, ibx, vx))
        vy = jnp.where(stick, 0.0, jnp.where(bounce_ice, iby, vy))
        vz = jnp.where(stick, 0.0, jnp.where(bounce_ice, ibz, vz))
        status = jnp.where(stick, 4, jnp.where(bounce_ice, 1, status))
        flags = jnp.where(stick, flags | (T.FL_Z_STOPPED | T.FL_XY_STOPPED
                                          | T.FL_IS_ON_ICE), flags)

    # --- static cobj collisions ---
    cobj_hit = jnp.zeros_like(alive)
    if cobjs is not None and cobjs.size > 0:
        if isinstance(cobjs, GroupedCobjs):
            # shape-grouped: each cobj evaluated by its own formula only.
            # On TPU the query runs as a VMEM-resident Pallas kernel
            # (ops/pallas/narrow_kernel) — the XLA form materializes
            # ~10 [N, M] planes in HBM per substep (~45 MB at 10K/112).
            from ..ops.pallas import narrow_kernel as NK
            if px.ndim == 1 and _on_tpu() and NK.supported(cobjs, px.shape[0]):
                hit, pen, cnx, cny, cnz, celas, cfric = NK.deepest_hits_pallas(
                    px, py, pz, rad, cobjs)
            else:
                hit, pen, cnx, cny, cnz, celas, cfric = deepest_hits_grouped(
                    px, py, pz, rad, cobjs)
        else:
            hit, pen, cnx, cny, cnz, celas, cfric = deepest_hits(px, py, pz, rad, cobjs)
        hit = hit & alive & ~wcoll
        px = px + jnp.where(hit, pen * cnx, 0.0)
        py = py + jnp.where(hit, pen * cny, 0.0)
        pz = pz + jnp.where(hit, pen * cnz, 0.0)
        bx, by, bz, did = bounce_velocity(vx, vy, vz, cnx, cny, cnz, elas * celas, air)
        # FRESH speed: the water/ice block above may have rewritten the
        # velocity since v_sq was computed (a stale value lets objects
        # slowed below the cutoff keep sliding instead of stopping)
        v_sq_c = vx * vx + vy * vy + vz * vz
        stop = hit & ~did & ((jnp.maximum(fric, cfric) >= T.STICK_THRESHOLD)
                             | (v_sq_c < T.BOUNCE_CUTOFF))
        hd = hit & did
        vx = jnp.where(hd, bx, jnp.where(stop, 0.0, vx))
        vy = jnp.where(hd, by, jnp.where(stop, 0.0, vy))
        vz = jnp.where(hd, bz, jnp.where(stop, 0.0, vz))
        status = jnp.where(stop, 4, jnp.where(hd, 1, status))
        flags = jnp.where(hit, flags | (T.FL_STATIC_COBJ_COLL | T.FL_COLLIDED), flags)
        cobj_hit = hit

    if water:
        # no cobj collision this substep -> Z_STOPPED clears
        # (Physics.cpp:861, the landmine fix).  This is what lets a deep
        # floater's buoyant vz ACCUMULATE across frames: the water branch
        # sets Z_STOPPED, this clears it again unless something holds the
        # object.  Ice-stuck objects keep their flags (they leave the
        # airborne path via status 4, reference :740-747)
        clr = moving & ~cobj_hit & ~ice_touch
        flags = jnp.where(clr, flags & ~T.FL_Z_STOPPED, flags)
        # water-HANDLED objects (check_water_collision returned 1):
        # status resets to 1 and all stop flags clear (Physics.cpp:863-867)
        status = jnp.where(wcoll, 1, status)
        flags = jnp.where(wcoll, flags & ~T.FL_ALL_COLL_STOPPED, flags)

    # --- mesh bounce (airborne val==2 && !coll path, Physics.cpp:868-882) ---
    mesh_coll = on_mesh & moving & ~wcoll & ~cobj_hit
    pz = jnp.where(mesh_coll, jnp.maximum(pz, mh + rad), pz)
    bx, by, bz, did_m = bounce_velocity(vx, vy, vz, mnx, mny, mnz,
                                        elas * T.LAND_ELASTICITY, air)
    v_sq2 = vx * vx + vy * vy + vz * vz
    stopped_m = mesh_coll & ~did_m & ((fric >= T.STICK_THRESHOLD) | xy_stop
                                      | (v_sq2 < T.BOUNCE_CUTOFF))
    md = mesh_coll & did_m
    damp_m = jnp.where(stopped_m, 0.0, 0.95)
    vx = jnp.where(md, bx, jnp.where(mesh_coll, vx * damp_m, vx))
    vy = jnp.where(md, by, jnp.where(mesh_coll, vy * damp_m, vy))
    vz = jnp.where(md, bz, jnp.where(mesh_coll, vz * damp_m, vz))
    status = jnp.where(md, 1, jnp.where(mesh_coll, 2, status))
    # mesh contact does NOT set the collided flag: only cobj collisions
    # do (collision_detect.cpp:1561, build_world.cpp:292) — the wind
    # gate reengages via |vz| < 1e-6 instead (pinned bitwise against the
    # compiled reference in tests/test_cpp_golden.py)

    # --- on-ground rolling (surface_advance, Physics.cpp:980-1037):
    # grounded objects roll downhill along the surface normal's xy
    # component, blending residual momentum by (1-friction), then stop
    # (status 4) when the slope can't overcome friction ---
    roll_ok = grounded & ~cobj_hit & ~touches_water
    stick_g = (fric >= T.STICK_THRESHOLD) | xy_stop
    killed_g = roll_ok & (pz < mh - T.KILL_DEPTH * rad)
    pz = jnp.where(roll_ok & (pz < mh - T.RECOVER_DEPTH * rad), mh, pz)
    dzn = jnp.sqrt(jnp.maximum(mnx * mnx + mny * mny, 1.0e-20))
    vel_m = ((T.SURF_ADV_STEP / world.x_scene) * dzn
             * (1.0 - 0.5 * fric) / T.DEF_TIMESTEP)
    vel_m = jnp.where(in_water & (dens >= T.WATER_DENSITY),
                      vel_m * (dens - T.WATER_DENSITY) / jnp.maximum(dens, 1e-9),
                      vel_m)
    moved_g = (dzn > 1.0e-12) & (dzn > fric) & (vel_m > 1.0e-12)
    mvx = jnp.where(moved_g, vel_m * world.dx * mnx / dzn, 0.0)
    mvy = jnp.where(moved_g, vel_m * world.dy * mny / dzn, 0.0)
    vmult = jnp.maximum(1.0 - fric, 0.0)          # (1-friction)^fticks
    gvx = mvx * (1.0 - vmult) + vx * vmult
    gvy = mvy * (1.0 - vmult) + vy * vmult
    rolling = roll_ok & ~stick_g
    vx = jnp.where(rolling, gvx, jnp.where(roll_ok & stick_g, 0.0, vx))
    vy = jnp.where(rolling, gvy, jnp.where(roll_ok & stick_g, 0.0, vy))
    vz = jnp.where(roll_ok, 0.0, vz)
    px = px + jnp.where(rolling, gvx * tstep, 0.0)
    py = py + jnp.where(rolling, gvy * tstep, 0.0)
    pz = jnp.where(roll_ok, mh + rad, pz)
    # val==1 (no slope motion) -> stopped; val==2 -> status 3 (moving)
    settled = roll_ok & (stick_g | ~moved_g)
    vx = jnp.where(settled, 0.0, vx)
    vy = jnp.where(settled, 0.0, vy)
    status = jnp.where(settled, 4, jnp.where(rolling & moved_g, 3, status))
    status = jnp.where(killed_g, 0, status)

    # --- dynamic object-object collisions (sorted-band broad phase) ---
    if obj_collisions:
        act = alive & (rad >= T.LARGE_OBJ_RAD)
        fn = pair_fn if pair_fn is not None else functools.partial(
            _pair_deltas, world=world)
        dpx, dpy, dpz, dvx, dvy, dvz = fn(
            px, py, pz, vx, vy, vz, rad, mass, elas, act)
        px = px + jnp.where(act, dpx, 0.0)
        py = py + jnp.where(act, dpy, 0.0)
        pz = pz + jnp.where(act, dpz, 0.0)
        vx = vx + jnp.where(act, dvx, 0.0)
        vy = vy + jnp.where(act, dvy, 0.0)
        vz = vz + jnp.where(act, dvz, 0.0)
        woke = act & ((dvx * dvx + dvy * dvy + dvz * dvz) > 1e-10)
        status = jnp.where(woke & (status == 4), 1, status)

    # kill conditions (advance_object preamble, Physics.cpp:725-729)
    status = jnp.where(pz < env.zmin, 0, status)
    status = jnp.where(off_mesh & alive, 0, status)
    return state._replace(px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz,
                          status=status, flags=flags)


@functools.partial(jax.jit, static_argnames=("substeps", "world", "obj_collisions",
                                             "pair_method", "pair_window",
                                             "pair_every", "water"))
def step_objects(
    state: ObjectState,
    env: PhysicsEnv,
    cobjs: CobjSet | None,
    table: T.ObjTypeTable,
    tstep: float = T.DEF_TIMESTEP,
    substeps: int = 4,
    world: WorldConst = DEFAULT_WORLD,
    obj_collisions: bool = True,
    pair_method: str = "auto",
    pair_window: int = PAIR_WINDOW,
    pair_every: int = 1,
    water: bool = True,
) -> ObjectState:
    """One frame: `substeps` uniform physics substeps with dt=tstep/substeps
    (the reference runs 1-40 substeps by type, build_world.cpp:467-505).
    When pair collisions are on, the state is Morton-sorted once per frame
    so the banded pair pass sees spatially-local windows.

    `pair_every`: run the pair pass on every k-th substep (starting with
    the first, right after the sort when the window-slack guarantee is
    freshest).  The REFERENCE resolves object-object contacts at frame
    granularity — each large object re-registers as a dynamic sphere
    cobj once per frame with a defer-if-unmoved optimization
    (build_world.cpp:397-404,526-543) — so pair_every=substeps matches
    its cadence; pair_every=1 is the conservative every-substep default.
    """
    dt = jnp.asarray(tstep / substeps, jnp.float32)
    if obj_collisions:
        state = spatial_sort(state, world)
    pair_fn = functools.partial(_pair_deltas, window=pair_window, world=world,
                                method=pair_method)

    def body(s, k):
        if pair_every <= 1 or not obj_collisions:
            run_pairs = obj_collisions
            s2 = _substep(s, env, cobjs, table, dt, world, run_pairs,
                          pair_fn=pair_fn, water=water)
        else:
            s2 = jax.lax.cond(
                k % pair_every == 0,
                lambda ss: _substep(ss, env, cobjs, table, dt, world, True,
                                    pair_fn=pair_fn, water=water),
                lambda ss: _substep(ss, env, cobjs, table, dt, world, False,
                                    water=water),
                s)
        return s2, None

    state, _ = jax.lax.scan(body, state, jnp.arange(substeps), length=substeps)
    return _frame_bookkeeping(state, table)


def _frame_bookkeeping(state: ObjectState, table: T.ObjTypeTable) -> ObjectState:
    """Age + lifetime kill (advance_object preamble); shared by the
    single-chip and sharded frame steps."""
    life = _type_params(state.otype, table)[8]
    time = state.time + 1
    status = jnp.where((life > 0) & (time.astype(jnp.float32) > life), 0, state.status)
    return state._replace(time=time, status=status)


# ---------------------------------------------------------------------------
# fused-kernel frame path (ops/pallas/physics_kernel)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("substeps", "world",
                                             "obj_collisions", "Nb",
                                             "interpret", "pair_every"))
def step_objects_fused(
    state: ObjectState,
    env: PhysicsEnv,
    cobjs: CobjSet,
    table: T.ObjTypeTable,
    tstep: float = T.DEF_TIMESTEP,
    substeps: int = 4,
    world: WorldConst = DEFAULT_WORLD,
    obj_collisions: bool = True,
    Nb: int = 512,
    interpret: bool = False,
    pair_every: int = 1,
) -> ObjectState:
    """`step_objects` with the per-substep pipeline (integrate -> mesh ->
    water -> cobjs -> mesh bounce) fused into one Pallas kernel; the Morton
    sort and the banded pair pass stay in XLA between kernel calls.

    Semantics match `step_objects` except penetration ties across
    coincident cobjs (see physics_kernel docstring) and frozen-water ice
    surfaces (the fused kernel always takes the liquid branch; use
    step_objects for below-freezing scenes).  Requires cobjs
    (the kernel always runs the narrow phase; pass a 0-count padded set
    for a cobj-free scene)."""
    from ..ops.pallas.physics_kernel import (substep_pallas, mesh_maps,
                                             pack_cobj_fields)
    dt = jnp.asarray(tstep / substeps, jnp.float32)
    if obj_collisions:
        state = spatial_sort(state, world)

    rad, air, fric, grav, elas, dens, tv, mass, life = _type_params(
        state.otype, table)
    maps3 = mesh_maps(env.mesh_height, world)
    cf = pack_cobj_fields(cobjs)
    env8 = jnp.stack([dt, env.base_gravity,
                      env.wind[0], env.wind[1], env.wind[2],
                      env.water_plane_z,
                      jnp.float32(world.dx_inv), jnp.float32(world.dy_inv),
                      jnp.float32(world.x_scene),
                      jnp.float32(world.dx), jnp.float32(world.dy),
                      jnp.float32(0.0)])
    my, mx = env.mesh_height.shape

    def body(s, k):
        px, py, pz, vx, vy, vz, status, flags_i = substep_pallas(
            s.px, s.py, s.pz, s.vx, s.vy, s.vz,
            s.status, s.flags.astype(jnp.int32),
            rad, air, fric, grav, elas, dens, tv,
            maps3, cf, env8, Nb=Nb, interpret=interpret)
        flags = flags_i.astype(s.flags.dtype)
        alive = s.status > 0
        # off-mesh kill tests the pre-pair-pass position (matches _substep,
        # which evaluates off_mesh before the pair deltas are applied)
        off = outside_mesh(px, py, world)
        if obj_collisions:
            def pairs(args):
                px, py, pz, vx, vy, vz, status = args
                act = alive & (rad >= T.LARGE_OBJ_RAD)
                dpx, dpy, dpz, dvx, dvy, dvz = _pair_deltas(
                    px, py, pz, vx, vy, vz, rad, mass, elas, act,
                    world=world)
                px = px + jnp.where(act, dpx, 0.0)
                py = py + jnp.where(act, dpy, 0.0)
                pz = pz + jnp.where(act, dpz, 0.0)
                vx = vx + jnp.where(act, dvx, 0.0)
                vy = vy + jnp.where(act, dvy, 0.0)
                vz = vz + jnp.where(act, dvz, 0.0)
                woke = act & ((dvx * dvx + dvy * dvy + dvz * dvz) > 1e-10)
                status = jnp.where(woke & (status == 4), 1, status)
                return (px, py, pz, vx, vy, vz, status)

            args = (px, py, pz, vx, vy, vz, status)
            if pair_every <= 1:
                args = pairs(args)
            else:
                args = jax.lax.cond(k % pair_every == 0, pairs,
                                    lambda a: a, args)
            (px, py, pz, vx, vy, vz, status) = args
        # kill conditions (advance_object preamble, Physics.cpp:725-729)
        status = jnp.where(pz < env.zmin, 0, status)
        status = jnp.where(off & alive, 0, status)
        return s._replace(px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz,
                          status=status, flags=flags), None

    state, _ = jax.lax.scan(body, state, jnp.arange(substeps),
                            length=substeps)
    time = state.time + 1
    status = jnp.where((life > 0) & (time.astype(jnp.float32) > life), 0,
                       state.status)
    return state._replace(time=time, status=status)


def local_wind_field(px, py, pz, wind, mesh, world: WorldConst,
                     zbottom, ztop, t_offset=0.0, seed: int = 0):
    """Batched get_local_wind (Physics.cpp:649-676): under the mesh no
    wind; near the surface the wind follows the terrain contour
    (orthogonalized against the vertex normal, z damped 10x) blended by
    (1 - rel_height)^2; pressure rises over hills; spatial intensity
    modulates by a drifting noise field (the WIND_TEX lookup)."""
    from ..utils import rng as w3d_rng
    mh, nx, ny, nz = sample_mesh(mesh, px, py, world)
    wx, wy, wz = wind[0], wind[1], wind[2]
    d = wx * nx + wy * ny + wz * nz
    ox = wx - d * nx
    oy = wy - d * ny
    oz = (wz - d * nz) * 0.1            # z component much smaller
    span = jnp.maximum(ztop - mh, 1e-6)
    rel = jnp.clip((pz - mh) / span, 0.0, 1.0)
    hval = (1.0 - rel) ** 2
    pressure = jnp.minimum(2.0, 0.5 * (ztop - zbottom) / jnp.maximum(
        ztop - mh, 1e-6))
    lwx = ox * hval + wx * (1.0 - hval)
    lwy = oy * hval + wy * (1.0 - hval)
    lwz = oz * hval + wz * (1.0 - hval)
    # wind-texture intensity: hashed cell noise drifting with total wind
    gx = (px * world.dx_inv + t_offset).astype(jnp.int32).astype(jnp.uint32)
    gy = (py * world.dy_inv + t_offset).astype(jnp.int32).astype(jnp.uint32)
    h = w3d_rng.xxhash_u32(gx * jnp.uint32(92837111) ^ gy, seed=seed)
    tex = (h & 0xFFFF).astype(jnp.float32) / 65535.0
    inten = jnp.clip(1.0 - 2.0 * tex, 0.0, 1.0)
    scale = pressure * (hval * inten + (1.0 - hval))
    under = pz < mh
    above = pz > ztop
    def sel(lc, w):
        v = lc * scale
        return jnp.where(under, 0.0, jnp.where(above, w, v))
    return sel(lwx, wx), sel(lwy, wy), sel(lwz, wz)
