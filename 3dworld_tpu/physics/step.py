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
    water_plane_z: jax.Array # scalar; flat-water approximation of water_matrix
    wind: jax.Array          # [3] global wind (Physics.cpp:36)
    temperature: jax.Array   # scalar degrees C
    base_gravity: jax.Array  # scalar (config "gravity")
    zmin: jax.Array          # kill plane


def make_state(pos, vel, otype, table: T.ObjTypeTable) -> ObjectState:
    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.asarray(vel, jnp.float32)
    n = pos.shape[0]
    otype = jnp.asarray(otype, jnp.int32)
    oh = jax.nn.one_hot(otype, T.NUM_TOT_OBJS, dtype=jnp.float32)
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
    matmul over [mesh | dz/dx | dz/dy] stacked maps."""
    my, mx = mesh.shape
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


def spatial_sort(state: ObjectState, world: WorldConst, cell: float = 0.1) -> ObjectState:
    """Sort the whole object population by Morton cell key.

    `lax.sort` co-sorts every state column on TPU — no argsort+gather.
    Object order carries no meaning in this engine (no cross-references),
    so the state simply *stays* sorted; the pair pass then only needs a
    small sorted-order window (collision partners are spatially adjacent,
    hence almost always nearby in Z-order).  Dead objects sort last so the
    active prefix stays dense.
    """
    key = morton_key(state.px, state.py, cell, 2.0 * world.x_scene)
    key = jnp.where(state.status > 0, key, jnp.uint32(0xFFFFFFFF))
    cols = [state.px, state.py, state.pz, state.vx, state.vy, state.vz,
            state.status, state.flags, state.otype, state.time, state.health]
    sorted_all = jax.lax.sort([key] + cols, num_keys=1)
    return ObjectState(*sorted_all[1:])


def _on_tpu() -> bool:
    """Where will this trace execute?  Honors jax.default_device(...)
    contexts (jax.default_backend() alone ignores them, which broke
    mixed-device runs like scripts/tpu_parity_check.py)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", str(dev)) == "tpu"
    return jax.default_backend() == "tpu"


def _pair_deltas(px, py, pz, vx, vy, vz, radius, mass, elas, active,
                 window: int = 64):
    """Backend dispatch: the Pallas roll-shift kernel on TPU (bit-exact,
    2.4x the XLA fori_loop), the XLA path elsewhere."""
    if _on_tpu():
        from ..ops.pallas.pairs_kernel import banded_pairs_pallas
        return banded_pairs_pallas(px, py, pz, vx, vy, vz, radius, mass,
                                   elas, active, window=window)
    return banded_pair_collisions(px, py, pz, vx, vy, vz, radius, mass,
                                  elas, active, window=window)


def banded_pair_collisions(px, py, pz, vx, vy, vz, radius, mass, elas, active,
                           window: int = 64):
    """Pair collisions against the `window` nearest sorted-order neighbors.

    Pure shifted-slice arithmetic: for each offset d in 1..window compare
    row i with row i+d — O(N*window) elementwise VPU work, no [N,N]
    matrices, no gathers.  Requires the state to be Morton-sorted (see
    `spatial_sort`); pairs further apart in Z-order than `window` are
    missed, which at game densities is a vanishing fraction (and the
    reference's racy OMP collision order is itself approximate).
    """
    n = px.shape[0]
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
        valid = (idx < n - d) & (act > 0) & (sh(act) > 0)
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
             obj_collisions: bool):
    rad, air, fric, grav, elas, dens, tv, mass, _life = _type_params(state.otype, table)

    alive = state.status > 0
    flags = state.flags
    floating = (flags & T.FL_FLOATING) != 0
    z_stop = (flags & T.FL_Z_STOPPED) != 0
    xy_stop = (flags & T.FL_XY_STOPPED) != 0
    underwater = (flags & T.FL_UNDERWATER) != 0
    moving = alive & (state.status != 4)

    px, py, pz = state.px, state.py, state.pz
    vx, vy, vz = state.vx, state.vy, state.vz

    # air factor (Physics.cpp:760-774)
    air_eff = jnp.where(underwater, 0.0,
                        jnp.where(floating, (1.0 - T.WATER_SURF_FRICTION) * air, air))

    # gravity with terminal velocity (Physics.cpp:815-819)
    can_fall = moving & ~z_stop
    vz_new = jnp.where(-vz < tv,
                       jnp.maximum(vz - env.base_gravity * T.GRAVITY * tstep * grav, -tv),
                       vz)
    vz = jnp.where(can_fall, vz_new, jnp.where(z_stop, 0.0, vz))
    # wind (Physics.cpp:820-833)
    wx, wy, wz = env.wind[0], env.wind[1], env.wind[2]
    vz = jnp.where(can_fall & ((jnp.abs(air_eff * wz) > jnp.abs(vz)) | ((wz < 0) != (vz < 0))),
                   vz + air_eff * wz, vz)
    move_xy = moving & ~xy_stop

    def drag(v, w):
        c = (jnp.abs(air_eff * w) > jnp.abs(v)) | ((w < 0) != (v < 0))
        return jnp.where(c & move_xy, (1.0 - air_eff) * v + air_eff * w, v)

    vx = drag(vx, wx)
    vy = drag(vy, wy)

    px = px + jnp.where(move_xy, tstep * vx, 0.0)
    py = py + jnp.where(move_xy, tstep * vy, 0.0)
    pz = pz + jnp.where(moving, tstep * vz, 0.0)

    # --- mesh surface ---
    mh, mnx, mny, mnz = sample_mesh(env.mesh_height, px, py, world)
    off_mesh = outside_mesh(px, py, world)
    on_mesh = ~off_mesh & ((pz - rad) <= mh)

    # --- water (check_water_collision core, Physics.cpp:1082-1180) ---
    wpz = env.water_plane_z
    over_water = ~off_mesh & (wpz > mh)
    touches_water = over_water & ((pz - rad) < wpz) & alive
    v_sq = vx * vx + vy * vy + vz * vz
    fast = v_sq >= T.BOUNCE_CUTOFF
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
    vx = jnp.where(skip, sbx, jnp.where(w_fast, vx * damp,
                                        jnp.where(w_slow, 0.0, vx)))
    vy = jnp.where(skip, sby, jnp.where(w_fast, vy * damp,
                                        jnp.where(w_slow, 0.0, vy)))
    vz = jnp.where(skip, sbz, jnp.where(w_fast, jnp.where(floats, 0.0, vz * damp),
                                        jnp.where(w_slow, 0.0, vz)))
    touches_water = touches_water & ~skip
    ground_z = mh + rad
    slow_pos_z = jnp.where(floats, jnp.maximum(wpz + rad * (1.0 - 2.0 * dens), ground_z),
                           ground_z)
    pz = jnp.where(w_slow, slow_pos_z, pz)
    flags = jnp.where(w_fast & ~floats, flags | (T.FL_IN_WATER | T.FL_UNDERWATER), flags)
    flags = jnp.where(w_slow & floats, flags | (T.FL_FLOATING | T.FL_IN_WATER), flags)
    status = jnp.where(w_slow, jnp.where(floats, 1, 3), state.status)
    # underwater ground contact: stop at the bottom (Physics.cpp:1146-1151)
    hit_bottom = touches_water & (pz <= ground_z + 1e-5)
    pz = jnp.where(hit_bottom, ground_z, pz)
    vx = jnp.where(hit_bottom, 0.0, vx)
    vy = jnp.where(hit_bottom, 0.0, vy)
    vz = jnp.where(hit_bottom, 0.0, vz)
    status = jnp.where(hit_bottom, 3, status)

    # --- static cobj collisions ---
    cobj_hit = jnp.zeros_like(alive)
    if cobjs is not None and cobjs.size > 0:
        if isinstance(cobjs, GroupedCobjs):
            # shape-grouped: each cobj evaluated by its own formula only
            hit, pen, cnx, cny, cnz, celas, cfric = deepest_hits_grouped(
                px, py, pz, rad, cobjs)
        else:
            hit, pen, cnx, cny, cnz, celas, cfric = deepest_hits(px, py, pz, rad, cobjs)
        hit = hit & alive & ~touches_water
        px = px + jnp.where(hit, pen * cnx, 0.0)
        py = py + jnp.where(hit, pen * cny, 0.0)
        pz = pz + jnp.where(hit, pen * cnz, 0.0)
        bx, by, bz, did = bounce_velocity(vx, vy, vz, cnx, cny, cnz, elas * celas, air)
        stop = hit & ~did & ((jnp.maximum(fric, cfric) >= T.STICK_THRESHOLD)
                             | (v_sq < T.BOUNCE_CUTOFF))
        hd = hit & did
        vx = jnp.where(hd, bx, jnp.where(stop, 0.0, vx))
        vy = jnp.where(hd, by, jnp.where(stop, 0.0, vy))
        vz = jnp.where(hd, bz, jnp.where(stop, 0.0, vz))
        status = jnp.where(stop, 4, jnp.where(hd, 1, status))
        flags = jnp.where(hit, flags | (T.FL_STATIC_COBJ_COLL | T.FL_COLLIDED), flags)
        cobj_hit = hit

    # --- mesh bounce (val==2 && !coll path) ---
    mesh_coll = on_mesh & alive & ~touches_water & ~cobj_hit
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
    flags = jnp.where(mesh_coll, flags | T.FL_COLLIDED, flags)

    # --- dynamic object-object collisions (sorted-band broad phase) ---
    if obj_collisions:
        act = alive & (rad >= T.LARGE_OBJ_RAD)
        dpx, dpy, dpz, dvx, dvy, dvz = _pair_deltas(
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


@functools.partial(jax.jit, static_argnames=("substeps", "world", "obj_collisions"))
def step_objects(
    state: ObjectState,
    env: PhysicsEnv,
    cobjs: CobjSet | None,
    table: T.ObjTypeTable,
    tstep: float = T.DEF_TIMESTEP,
    substeps: int = 4,
    world: WorldConst = DEFAULT_WORLD,
    obj_collisions: bool = True,
) -> ObjectState:
    """One frame: `substeps` uniform physics substeps with dt=tstep/substeps
    (the reference runs 1-40 substeps by type, build_world.cpp:467-505).
    When pair collisions are on, the state is Morton-sorted once per frame
    so the banded pair pass sees spatially-local windows."""
    dt = jnp.asarray(tstep / substeps, jnp.float32)
    if obj_collisions:
        state = spatial_sort(state, world)

    def body(s, _):
        return _substep(s, env, cobjs, table, dt, world, obj_collisions), None

    state, _ = jax.lax.scan(body, state, None, length=substeps)
    # frame bookkeeping: age + lifetime kill (advance_object preamble)
    life = _type_params(state.otype, table)[8]
    time = state.time + 1
    status = jnp.where((life > 0) & (time.astype(jnp.float32) > life), 0, state.status)
    return state._replace(time=time, status=status)


# ---------------------------------------------------------------------------
# fused-kernel frame path (ops/pallas/physics_kernel)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("substeps", "world",
                                             "obj_collisions", "Nb",
                                             "interpret"))
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
) -> ObjectState:
    """`step_objects` with the per-substep pipeline (integrate -> mesh ->
    water -> cobjs -> mesh bounce) fused into one Pallas kernel; the Morton
    sort and the banded pair pass stay in XLA between kernel calls.

    Semantics match `step_objects` except penetration ties across
    coincident cobjs (see physics_kernel docstring).  Requires cobjs
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
                      jnp.float32(world.dx_inv), jnp.float32(world.dy_inv)])
    my, mx = env.mesh_height.shape

    def body(s, _):
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
            act = alive & (rad >= T.LARGE_OBJ_RAD)
            dpx, dpy, dpz, dvx, dvy, dvz = _pair_deltas(
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
        status = jnp.where(off & alive, 0, status)
        return s._replace(px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz,
                          status=status, flags=flags), None

    state, _ = jax.lax.scan(body, state, None, length=substeps)
    time = state.time + 1
    status = jnp.where((life > 0) & (time.astype(jnp.float32) > life), 0,
                       state.status)
    return state._replace(time=time, status=status)
