"""Pallas TPU kernel: fully fused physics substep.

One substep of the object pipeline (ops mirrored 1:1 from
physics/step.py `_substep`, which follows the reference's advance_object
/ check_water_collision / vert_coll_detector chain,
Physics.cpp:725-1409, collision_detect.cpp:1027-1599):

  integrate (gravity/terminal-velocity/wind drag)
  -> mesh sample (bilinear height + surface normal)
  -> water interaction
  -> static-cobj narrow phase (all 6 shapes, deepest hit)
  -> mesh bounce

The XLA path materializes ~30 [N,128]-plane intermediates per substep in
HBM (~150 us at N=10K).  Here each object block runs start-to-finish in
VMEM: HBM sees only the 8 state rows in, 8 rows out, plus the shared
mesh-map stack and cobj table (resident, ~200 KB).  The banded pair pass
and the Morton sort stay in XLA between kernel calls.

Layout (same discipline as erosion_kernel.py):
* object state is [1, Nb] rows, Nb a multiple of 128 (lane dim);
* cobj narrow-phase planes are [M, Nb] (cobjs in sublanes);
* cobj scalar columns [M, 1] are extracted from the packed [M, F] field
  matrix by a one-hot matmul (no 1-wide lane slicing — Mosaic requires
  128-multiple lane slices);
* the mesh + its gradient maps are a [384, 128] sublane stack; bilinear
  sampling is one [384,128]x[128,Nb] matmul + two sublane reductions;
* runtime env scalars ride in SMEM.

Known deviation from the XLA path: penetration ties across distinct
cobjs average their normals instead of taking the first (argmax); exact
f32 ties only occur for coincident geometry.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...physics import types as T
from ...physics.cobjs import (COLL_NULL, COLL_CUBE, COLL_CYLINDER,
                              COLL_SPHERE, COLL_CYLINDER_ROT, COLL_POLYGON,
                              COLL_CAPSULE, COLL_TORUS)

_EPS = 1e-12

# column order in the packed cobj field matrix (see pack_cobj_fields)
_CF = ("shape", "p1x", "p1y", "p1z", "p2x", "p2y", "p2z", "r1", "r2",
       "npts",
       "pt0x", "pt0y", "pt0z", "pt1x", "pt1y", "pt1z",
       "pt2x", "pt2y", "pt2z", "pt3x", "pt3y", "pt3z",
       "pnx", "pny", "pnz", "elas", "fric")
_CF_PAD = 32  # lane-pad the field axis


def pack_cobj_fields(c) -> jax.Array:
    """CobjSet (or GroupedCobjs) -> [M, 32] f32 field matrix (`_CF`)."""
    if hasattr(c, "cobjs"):          # GroupedCobjs wrapper
        c = c.cobjs
    cols = [c.shape.astype(jnp.float32),
            c.p1[:, 0], c.p1[:, 1], c.p1[:, 2],
            c.p2[:, 0], c.p2[:, 1], c.p2[:, 2],
            c.r1, c.r2, c.npts.astype(jnp.float32)]
    for k in range(4):
        cols += [c.pts[:, k, 0], c.pts[:, k, 1], c.pts[:, k, 2]]
    cols += [c.pnorm[:, 0], c.pnorm[:, 1], c.pnorm[:, 2],
             c.elasticity, c.friction]
    m = jnp.stack(cols, axis=1).astype(jnp.float32)
    return jnp.pad(m, ((0, 0), (0, _CF_PAD - m.shape[1])))


def mesh_maps(mesh: jax.Array, world) -> jax.Array:
    """[my, mx] heightmap -> [3*my, mx] stack of (height, dz/dx, dz/dy)."""
    dzdx = (jnp.roll(mesh, -1, 1) - jnp.roll(mesh, 1, 1)) * (0.5 * world.dx_inv)
    dzdy = (jnp.roll(mesh, -1, 0) - jnp.roll(mesh, 1, 0)) * (0.5 * world.dy_inv)
    return jnp.concatenate([mesh, dzdx, dzdy], axis=0).astype(jnp.float32)


def _substep_kernel(env_ref, maps_ref, cf_ref,
                    px_ref, py_ref, pz_ref, vx_ref, vy_ref, vz_ref,
                    st_ref, fl_ref,
                    rad_ref, air_ref, fric_ref, grav_ref, elas_ref,
                    dens_ref, tv_ref,
                    opx_ref, opy_ref, opz_ref, ovx_ref, ovy_ref, ovz_ref,
                    ost_ref, ofl_ref, *,
                    Nb: int, M: int, my: int, mx: int, ncobj_fields: int):
    f32 = jnp.float32
    # ---- env scalars (SMEM) ----
    tstep = env_ref[0]
    base_gravity = env_ref[1]
    wx, wy, wz = env_ref[2], env_ref[3], env_ref[4]
    water_plane_z = env_ref[5]
    dx_inv, dy_inv = env_ref[6], env_ref[7]
    x_scene = env_ref[8]
    dx_val, dy_val = env_ref[9], env_ref[10]

    # ---- state rows ----
    px = px_ref[0, :, :]
    py = py_ref[0, :, :]
    pz = pz_ref[0, :, :]
    vx = vx_ref[0, :, :]
    vy = vy_ref[0, :, :]
    vz = vz_ref[0, :, :]
    status = st_ref[0, :, :]
    flags = fl_ref[0, :, :]
    rad = rad_ref[0, :, :]
    air = air_ref[0, :, :]
    fric = fric_ref[0, :, :]
    grav = grav_ref[0, :, :]
    elas = elas_ref[0, :, :]
    dens = dens_ref[0, :, :]
    tv = tv_ref[0, :, :]

    alive = status > 0
    # capture + clear last-substep collision (advance_object entry,
    # Physics.cpp:720-721) — mirrors step._substep exactly
    coll_last = (flags & T.FL_COLLIDED) != 0
    flags = flags & ~T.FL_COLLIDED
    floating = (flags & T.FL_FLOATING) != 0
    z_stop = (flags & T.FL_Z_STOPPED) != 0
    xy_stop = (flags & T.FL_XY_STOPPED) != 0
    underwater = (flags & T.FL_UNDERWATER) != 0
    in_water = (flags & T.FL_IN_WATER) != 0
    moving = alive & (status == 1)
    grounded = alive & ((status == 2) | (status == 3))

    # ---- integrate (Physics.cpp:760-833) ----
    air_eff = jnp.where(underwater, 0.0,
                        jnp.where(floating, (1.0 - T.WATER_SURF_FRICTION) * air, air))
    gscale = jnp.where(in_water & (dens > T.WATER_DENSITY),
                       (dens - T.WATER_DENSITY) / dens, 1.0)
    can_fall = moving & ~z_stop
    vz_new = jnp.where(-vz < tv,
                       jnp.maximum(vz - base_gravity * gscale * T.GRAVITY
                                   * tstep * grav, -tv),
                       vz)
    vz = jnp.where(can_fall, vz_new, jnp.where(z_stop & moving, 0.0, vz))
    vz = jnp.where(can_fall & ((jnp.abs(air_eff * wz) > jnp.abs(vz))
                               | ((wz < 0) != (vz < 0))),
                   vz + air_eff * wz, vz)
    move_xy = moving & ~xy_stop
    collided = coll_last | (jnp.abs(vz) < 1.0e-6)

    def drag(v, w):
        vtot = v + jnp.where(collided, 0.0, w)
        c = (jnp.abs(air_eff * vtot) > jnp.abs(v)) | ((vtot < 0) != (v < 0))
        return jnp.where(c & move_xy, (1.0 - air_eff) * v + air_eff * vtot, v)

    vx = drag(vx, wx)
    vy = drag(vy, wy)
    px = px + jnp.where(move_xy, tstep * vx, 0.0)
    py = py + jnp.where(move_xy, tstep * vy, 0.0)
    pz = pz + jnp.where(moving, tstep * vz, 0.0)

    # ---- mesh sample: bilinear h + gradient via one matmul ----
    gx = px * dx_inv + f32(mx // 2)
    gy = py * dy_inv + f32(my // 2)
    sub_x = jax.lax.broadcasted_iota(jnp.int32, (mx, Nb), 0).astype(f32)
    sub_y = jax.lax.broadcasted_iota(jnp.int32, (my, Nb), 0).astype(f32)
    x0 = jnp.clip(jnp.floor(gx), 0.0, mx - 2.0)
    y0 = jnp.clip(jnp.floor(gy), 0.0, my - 2.0)
    fx = jnp.clip(gx - x0, 0.0, 1.0)
    fy = jnp.clip(gy - y0, 0.0, 1.0)
    XW = ((x0 == sub_x).astype(f32) * (1.0 - fx)
          + ((x0 + 1.0) == sub_x).astype(f32) * fx)      # [mx, Nb]
    YW = ((y0 == sub_y).astype(f32) * (1.0 - fy)
          + ((y0 + 1.0) == sub_y).astype(f32) * fy)      # [my, Nb]
    A = jax.lax.dot_general(maps_ref[:, :], XW, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)  # [3*my, Nb]
    mh = jnp.sum(A[0:my, :] * YW, 0, keepdims=True)
    sx = jnp.sum(A[my:2 * my, :] * YW, 0, keepdims=True)
    sy = jnp.sum(A[2 * my:3 * my, :] * YW, 0, keepdims=True)
    ninv = jax.lax.rsqrt(sx * sx + sy * sy + 1.0)
    mnx, mny, mnz = -sx * ninv, -sy * ninv, ninv
    off_mesh = (gx < 0) | (gx >= f32(mx)) | (gy < 0) | (gy >= f32(my))
    on_mesh = ~off_mesh & ((pz - rad) <= mh)

    # ---- water (Physics.cpp:1082-1180) ----
    wpz = water_plane_z
    over_water = ~off_mesh & (wpz > mh)
    touches_water = over_water & ((pz - rad) < wpz) & alive
    v_sq = vx * vx + vy * vy + vz * vz
    fast = v_sq >= T.BOUNCE_CUTOFF
    den_ratio = T.WATER_DENSITY / (dens + T.WATER_DENSITY)
    damp = 1.0 - T.WATER_DAMPING * den_ratio
    floats = dens < T.WATER_DENSITY
    w_fast = touches_water & fast
    w_slow = touches_water & ~fast
    # surface skip / ricochet (Physics.cpp:1154-1163), mirrors _substep:
    # fast shallow-angle surface hits bounce off the water surface
    v_mag = jnp.sqrt(jnp.maximum(v_sq, 1e-12))
    # acos doesn't lower in Mosaic; compare in cos domain instead:
    # arccos(x) >= thresh  <=>  x <= cos(thresh) for thresh in [0, pi]
    # (arccos is decreasing); thresh > pi means always-false
    cos_v = jnp.clip(-vz / v_mag, -1.0, 1.0)
    zpos_w = jnp.maximum(wpz + rad * (1.0 - 2.0 * dens), mh + rad)
    surf_coll = (pz > wpz - rad - T.MAX_SPLASH_DEPTH) & ~underwater & ~z_stop
    e_w = jnp.clip(jnp.full_like(vz, T.WATER_ELASTIC), 0.0, 1.0)
    exy_w = e_w * (1.0 - air_eff)
    sbx = vx * exy_w
    sby = vy * exy_w
    sbz = -vz * e_w
    s_did = (sbx * sbx + sby * sby + sbz * sbz) >= T.BOUNCE_CUTOFF
    thresh = T.CRITICAL_ANGLE / den_ratio
    angle_ok = (thresh <= jnp.pi) & \
        (cos_v <= jnp.cos(jnp.minimum(thresh, jnp.pi)))
    skip = (w_fast & surf_coll & angle_ok
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
    slow_pos_z = jnp.where(floats,
                           jnp.maximum(wpz + rad * (1.0 - 2.0 * dens), ground_z),
                           ground_z)
    pz = jnp.where(w_slow, slow_pos_z, pz)
    flags = jnp.where(w_fast & ~floats,
                      flags | (T.FL_IN_WATER | T.FL_UNDERWATER), flags)
    flags = jnp.where(w_slow & floats,
                      flags | (T.FL_FLOATING | T.FL_IN_WATER), flags)
    status = jnp.where(w_slow, jnp.where(floats, 1, 3), status)
    hit_bottom = touches_water & (pz <= ground_z + 1e-5)
    pz = jnp.where(hit_bottom, ground_z, pz)
    vx = jnp.where(hit_bottom, 0.0, vx)
    vy = jnp.where(hit_bottom, 0.0, vy)
    vz = jnp.where(hit_bottom, 0.0, vz)
    status = jnp.where(hit_bottom, 3, status)

    # ---- cobj narrow phase: [M, Nb] planes, cobjs in sublanes ----
    cf = cf_ref[:, :]                                    # [M, F]
    eyeM = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)).astype(f32)

    def col(name):
        """cobj scalar field -> [M, 1] column (one-hot matmul, no slicing)."""
        i = _CF.index(name)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (1, ncobj_fields), 1)
              == i).astype(f32)                          # [1, F]
        row = jax.lax.dot_general(oh, cf, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)  # [1, M]
        return jax.lax.dot_general(eyeM, row, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)  # [M, 1]

    shape = col("shape")
    p1x, p1y, p1z = col("p1x"), col("p1y"), col("p1z")
    p2x, p2y, p2z = col("p2x"), col("p2y"), col("p2z")
    r1, r2 = col("r1"), col("r2")
    npts = col("npts")
    pnx, pny, pnz = col("pnx"), col("pny"), col("pnz")

    X, Y, Z, r = px, py, pz, rad                         # [1, Nb] rows

    def norm3(ax, ay, az):
        d = jnp.sqrt(ax * ax + ay * ay + az * az)
        inv = 1.0 / jnp.maximum(d, _EPS)
        return d, ax * inv, ay * inv, az * inv

    # cube
    lox, hix = jnp.minimum(p1x, p2x), jnp.maximum(p1x, p2x)
    loy, hiy = jnp.minimum(p1y, p2y), jnp.maximum(p1y, p2y)
    loz, hiz = jnp.minimum(p1z, p2z), jnp.maximum(p1z, p2z)
    cx = jnp.clip(X, lox, hix)
    cy = jnp.clip(Y, loy, hiy)
    cz = jnp.clip(Z, loz, hiz)
    dist_out, ox, oy, oz = norm3(X - cx, Y - cy, Z - cz)
    outside = dist_out > 1e-9
    dxl, dxh = X - lox, hix - X
    dyl, dyh = Y - loy, hiy - Y
    dzl, dzh = Z - loz, hiz - Z
    dx_m = jnp.minimum(dxl, dxh)
    dy_m = jnp.minimum(dyl, dyh)
    dz_m = jnp.minimum(dzl, dzh)
    din = jnp.minimum(dx_m, jnp.minimum(dy_m, dz_m))
    sxi = jnp.where(dxl < dxh, -1.0, 1.0)
    syi = jnp.where(dyl < dyh, -1.0, 1.0)
    szi = jnp.where(dzl < dzh, -1.0, 1.0)
    use_x = din == dx_m
    use_y = (din == dy_m) & ~use_x
    use_z = ~use_x & ~use_y
    pen_cube = jnp.where(outside, r - dist_out, r + din)
    nx_cube = jnp.where(outside, ox, jnp.where(use_x, sxi, 0.0))
    ny_cube = jnp.where(outside, oy, jnp.where(use_y, syi, 0.0))
    nz_cube = jnp.where(outside, oz, jnp.where(use_z, szi, 0.0))

    # sphere
    dist, nx_sph, ny_sph, nz_sph = norm3(X - p1x, Y - p1y, Z - p1z)
    pen_sph = (r + r1) - dist

    # vertical cylinder
    zlo = jnp.minimum(p1z, p2z)
    zhi = jnp.maximum(p1z, p2z)
    rxy = jnp.maximum(r1, r2)
    ddx, ddy = X - p1x, Y - p1y
    dist_xy = jnp.sqrt(ddx * ddx + ddy * ddy)
    inv_xy = 1.0 / jnp.maximum(dist_xy, _EPS)
    in_z = (Z > zlo - r) & (Z < zhi + r)
    pen_side = (r + rxy) - dist_xy
    top_pen = (zhi + r) - Z
    bot_pen = Z - (zlo - r)
    cap_is_top = top_pen < bot_pen
    pen_cap = jnp.minimum(top_pen, bot_pen)
    use_cap = (dist_xy < rxy) & (pen_cap < pen_side)
    pen_cyl = jnp.where(in_z & (dist_xy < rxy + r),
                        jnp.where(use_cap, pen_cap, pen_side), -1.0)
    nx_cyl = jnp.where(use_cap, 0.0, ddx * inv_xy)
    ny_cyl = jnp.where(use_cap, 0.0, ddy * inv_xy)
    nz_cyl = jnp.where(use_cap, jnp.where(cap_is_top, 1.0, -1.0), 0.0)

    # capsule: per-t interpolated radius (physics/cobjs.py semantics)
    abx, aby, abz = p2x - p1x, p2y - p1y, p2z - p1z
    ab2 = jnp.maximum(abx * abx + aby * aby + abz * abz, _EPS)
    t = jnp.clip(((X - p1x) * abx + (Y - p1y) * aby + (Z - p1z) * abz) / ab2,
                 0.0, 1.0)
    dist_seg, nx_cap, ny_cap, nz_cap = norm3(
        X - (p1x + t * abx), Y - (p1y + t * aby), Z - (p1z + t * abz))
    pen_caps = (r + (r1 + t * (r2 - r1))) - dist_seg

    # rotated cylinder: EXACT taper + flat end caps
    # (sphere_intersect_cylinder_ipt, Math3d.cpp:731-830)
    leninv = jax.lax.rsqrt(ab2)
    length = ab2 * leninv
    t_un = ((X - p1x) * abx + (Y - p1y) * aby + (Z - p1z) * abz) / ab2
    t_cl = jnp.clip(t_un, 0.0, 1.0)
    rdist, rnx, rny, rnz = norm3(X - (p1x + t_un * abx),
                                 Y - (p1y + t_un * aby),
                                 Z - (p1z + t_un * abz))
    rad_tc = r1 + t_cl * (r2 - r1)
    in_t = (t_un >= 0.0) & (t_un <= 1.0)
    pen_s = (rad_tc + r) - rdist
    side_ok = in_t & (pen_s > 0.0)
    d_end = t_un > 0.5
    end_r = jnp.where(d_end, r2, r1)
    axial_out = jnp.maximum(jnp.maximum(-t_un, t_un - 1.0), 0.0) * length
    tv_cl = jnp.where(d_end, 1.0 - t_cl, t_cl) * length
    pen_e = r - axial_out
    end_ok = (end_r > 0.0) & (tv_cl < jnp.minimum(r, rdist)) \
        & (rdist <= rad_tc + r) & (pen_e > 0.0)
    sgn = jnp.where(d_end, 1.0, -1.0)
    use_end = end_ok & (~side_ok | (pen_e < pen_s))
    pen_rcyl = jnp.where(use_end, pen_e, jnp.where(side_ok, pen_s, -1.0))
    nx_rcyl = jnp.where(use_end, sgn * abx * leninv, rnx)
    ny_rcyl = jnp.where(use_end, sgn * aby * leninv, rny)
    nz_rcyl = jnp.where(use_end, sgn * abz * leninv, rnz)

    # polygon
    ptx = [col(f"pt{k}x") for k in range(4)]
    pty = [col(f"pt{k}y") for k in range(4)]
    ptz = [col(f"pt{k}z") for k in range(4)]
    dp = (X - ptx[0]) * pnx + (Y - pty[0]) * pny + (Z - ptz[0]) * pnz
    side = jnp.sign(dp)
    prx = X - dp * pnx
    pry = Y - dp * pny
    prz = Z - dp * pnz
    inside = dp == dp  # all-true plane (avoids a bool-literal const)
    for k in range(4):
        ax_, ay_, az_ = ptx[k], pty[k], ptz[k]
        nxt_ok = (k + 1) % 4 < npts
        bx_ = jnp.where(nxt_ok, ptx[(k + 1) % 4], ptx[0])
        by_ = jnp.where(nxt_ok, pty[(k + 1) % 4], pty[0])
        bz_ = jnp.where(nxt_ok, ptz[(k + 1) % 4], ptz[0])
        ex, ey, ez = bx_ - ax_, by_ - ay_, bz_ - az_
        wvx, wvy, wvz = prx - ax_, pry - ay_, prz - az_
        crx = ey * wvz - ez * wvy
        cry = ez * wvx - ex * wvz
        crz = ex * wvy - ey * wvx
        ok = (crx * pnx + cry * pny + crz * pnz) >= -1e-7
        # no bool literals in where() — Mosaic can't truncate i8 consts to i1
        inside = inside & (ok | ~(k < npts))
    pen_poly = jnp.where(inside, (r + 0.5 * r1) - jnp.abs(dp), -1.0)
    nx_pol, ny_pol, nz_pol = pnx * side, pny * side, pnz * side

    # torus
    tx, ty, tz = X - p1x, Y - p1y, Z - p1z
    axial = tx * p2x + ty * p2y + tz * p2z
    rvx = tx - axial * p2x
    rvy = ty - axial * p2y
    rvz = tz - axial * p2z
    radial = jnp.sqrt(rvx * rvx + rvy * rvy + rvz * rvz)
    rinv = r1 / jnp.maximum(radial, _EPS)
    dist_ring, nx_tor, ny_tor, nz_tor = norm3(tx - rvx * rinv, ty - rvy * rinv,
                                              tz - rvz * rinv)
    pen_torus = (r + r2) - dist_ring

    is_cube = shape == COLL_CUBE
    is_sph = shape == COLL_SPHERE
    is_cyl = shape == COLL_CYLINDER
    is_caps = shape == COLL_CAPSULE
    is_rcyl = shape == COLL_CYLINDER_ROT
    is_poly = shape == COLL_POLYGON
    is_tor = shape == COLL_TORUS

    def sel6(vals, default):
        out = jnp.full((M, Nb), default, f32)
        for m, v in zip((is_cube, is_sph, is_cyl, is_caps, is_rcyl,
                         is_poly, is_tor), vals):
            out = jnp.where(m, v, out)
        return out

    pen = sel6([pen_cube, pen_sph, pen_cyl, pen_caps, pen_rcyl,
                pen_poly, pen_torus], -1.0)
    pen = jnp.where(shape != COLL_NULL, pen, -1.0)
    cnx = sel6([nx_cube, nx_sph, nx_cyl, nx_cap, nx_rcyl, nx_pol, nx_tor], 0.0)
    cny = sel6([ny_cube, ny_sph, ny_cyl, ny_cap, ny_rcyl, ny_pol, ny_tor], 0.0)
    cnz = sel6([nz_cube, nz_sph, nz_cyl, nz_cap, nz_rcyl, nz_pol, nz_tor], 0.0)

    # deepest hit per object (ties average — see module docstring)
    pmax = jnp.max(pen, axis=0, keepdims=True)           # [1, Nb]
    wsel = (pen == pmax).astype(f32)
    wnorm = wsel / jnp.maximum(jnp.sum(wsel, 0, keepdims=True), 1.0)
    best = pmax
    bnx = jnp.sum(cnx * wnorm, 0, keepdims=True)
    bny = jnp.sum(cny * wnorm, 0, keepdims=True)
    bnz = jnp.sum(cnz * wnorm, 0, keepdims=True)
    celas = jnp.sum(col("elas") * wnorm, 0, keepdims=True)
    cfric = jnp.sum(col("fric") * wnorm, 0, keepdims=True)

    hit = (best > 0.0) & alive & ~touches_water
    px = px + jnp.where(hit, best * bnx, 0.0)
    py = py + jnp.where(hit, best * bny, 0.0)
    pz = pz + jnp.where(hit, best * bnz, 0.0)

    def bounce(nx_, ny_, nz_, e):
        # exact mirror of step.bounce_velocity (Physics.cpp:1349-1409):
        # reflect about the normal, scale xy by e*(1-air), z by e
        e = jnp.clip(e, 0.0, 1.0)
        vdn = vx * nx_ + vy * ny_ + vz * nz_
        bx = vx - 2.0 * vdn * nx_
        by = vy - 2.0 * vdn * ny_
        bz = vz - 2.0 * vdn * nz_
        exy = e * (1.0 - air_eff)
        bx, by, bz = bx * exy, by * exy, bz * e
        did = (bx * bx + by * by + bz * bz) >= T.BOUNCE_CUTOFF
        return (jnp.where(did, bx, vx), jnp.where(did, by, vy),
                jnp.where(did, bz, vz), did)

    bx, by, bz, did = bounce(bnx, bny, bnz, elas * celas)
    stop = hit & ~did & ((jnp.maximum(fric, cfric) >= T.STICK_THRESHOLD)
                         | (v_sq < T.BOUNCE_CUTOFF))
    hd = hit & did
    vx = jnp.where(hd, bx, jnp.where(stop, 0.0, vx))
    vy = jnp.where(hd, by, jnp.where(stop, 0.0, vy))
    vz = jnp.where(hd, bz, jnp.where(stop, 0.0, vz))
    status = jnp.where(stop, 4, jnp.where(hd, 1, status))
    flags = jnp.where(hit, flags | (T.FL_STATIC_COBJ_COLL | T.FL_COLLIDED),
                      flags)

    # ---- mesh bounce (airborne only, Physics.cpp:868-882) ----
    mesh_coll = on_mesh & moving & ~touches_water & ~hit
    pz = jnp.where(mesh_coll, jnp.maximum(pz, mh + rad), pz)
    mbx, mby, mbz, did_m = bounce(mnx, mny, mnz, elas * T.LAND_ELASTICITY)
    v_sq2 = vx * vx + vy * vy + vz * vz
    stopped_m = mesh_coll & ~did_m & ((fric >= T.STICK_THRESHOLD) | xy_stop
                                      | (v_sq2 < T.BOUNCE_CUTOFF))
    md = mesh_coll & did_m
    damp_m = jnp.where(stopped_m, 0.0, 0.95)
    vx = jnp.where(md, mbx, jnp.where(mesh_coll, vx * damp_m, vx))
    vy = jnp.where(md, mby, jnp.where(mesh_coll, vy * damp_m, vy))
    vz = jnp.where(md, mbz, jnp.where(mesh_coll, vz * damp_m, vz))
    status = jnp.where(md, 1, jnp.where(mesh_coll, 2, status))
    flags = jnp.where(mesh_coll, flags | T.FL_COLLIDED, flags)

    # ---- on-ground rolling (surface_advance, Physics.cpp:980-1037),
    # mirrors step._substep ----
    roll_ok = grounded & ~hit & ~touches_water
    stick_g = (fric >= T.STICK_THRESHOLD) | xy_stop
    killed_g = roll_ok & (pz < mh - T.KILL_DEPTH * rad)
    pz = jnp.where(roll_ok & (pz < mh - T.RECOVER_DEPTH * rad), mh, pz)
    dzn = jnp.sqrt(jnp.maximum(mnx * mnx + mny * mny, 1.0e-20))
    vel_m = ((T.SURF_ADV_STEP / x_scene) * dzn
             * (1.0 - 0.5 * fric) / T.DEF_TIMESTEP)
    vel_m = jnp.where(in_water & (dens >= T.WATER_DENSITY),
                      vel_m * (dens - T.WATER_DENSITY) / jnp.maximum(dens, _EPS),
                      vel_m)
    moved_g = (dzn > 1.0e-12) & (dzn > fric) & (vel_m > 1.0e-12)
    mvx = jnp.where(moved_g, vel_m * dx_val * mnx / dzn, 0.0)
    mvy = jnp.where(moved_g, vel_m * dy_val * mny / dzn, 0.0)
    vmult = jnp.maximum(1.0 - fric, 0.0)
    gvx = mvx * (1.0 - vmult) + vx * vmult
    gvy = mvy * (1.0 - vmult) + vy * vmult
    rolling = roll_ok & ~stick_g
    vx = jnp.where(rolling, gvx, jnp.where(roll_ok & stick_g, 0.0, vx))
    vy = jnp.where(rolling, gvy, jnp.where(roll_ok & stick_g, 0.0, vy))
    vz = jnp.where(roll_ok, 0.0, vz)
    px = px + jnp.where(rolling, gvx * tstep, 0.0)
    py = py + jnp.where(rolling, gvy * tstep, 0.0)
    pz = jnp.where(roll_ok, mh + rad, pz)
    settled = roll_ok & (stick_g | ~moved_g)
    vx = jnp.where(settled, 0.0, vx)
    vy = jnp.where(settled, 0.0, vy)
    status = jnp.where(settled, 4, jnp.where(rolling & moved_g, 3, status))
    status = jnp.where(killed_g, 0, status)

    opx_ref[0, :, :] = px
    opy_ref[0, :, :] = py
    opz_ref[0, :, :] = pz
    ovx_ref[0, :, :] = vx
    ovy_ref[0, :, :] = vy
    ovz_ref[0, :, :] = vz
    ost_ref[0, :, :] = status
    ofl_ref[0, :, :] = flags


@functools.partial(jax.jit, static_argnames=("Nb", "interpret"))
def substep_pallas(px, py, pz, vx, vy, vz, status, flags,
                   rad, air, fric, grav, elas, dens, tv,
                   maps3, cf, env8, Nb: int = 512,
                   interpret: bool = False):
    """One fused substep over the whole population.

    State/param arrays are [N] (N padded internally to a multiple of Nb);
    maps3 [3*my, mx] from `mesh_maps`; cf [M, 32] from `pack_cobj_fields`
    (M a multiple of 8, realistically 128-padded); env8 [8] f32:
    (tstep, base_gravity, wind_x, wind_y, wind_z, water_plane_z,
     dx_inv, dy_inv).
    Returns (px, py, pz, vx, vy, vz, status, flags) rows, same [N].
    """
    N = px.shape[0]
    G = -(-N // Nb)
    Np = G * Nb
    padf = lambda a: jnp.pad(a, (0, Np - N)).reshape(G, 1, Nb)
    # padded lanes: status 0 (dead) keeps every branch inert
    ins_f = [padf(a) for a in (px, py, pz, vx, vy, vz)]
    ins_i = [padf(status), padf(flags)]
    ins_p = [padf(a) for a in (rad, air, fric, grav, elas, dens, tv)]
    my3, mx = maps3.shape
    M, F = cf.shape
    row = pl.BlockSpec((1, 1, Nb), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    rep = lambda shp: pl.BlockSpec(shp, lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)
    kern = functools.partial(_substep_kernel, Nb=Nb, M=M, my=my3 // 3,
                             mx=mx, ncobj_fields=F)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  rep((my3, mx)), rep((M, F))]
                 + [row] * 6 + [row] * 2 + [row] * 7,
        out_specs=[row] * 8,
        out_shape=[jax.ShapeDtypeStruct((G, 1, Nb), jnp.float32)] * 6
                  + [jax.ShapeDtypeStruct((G, 1, Nb), jnp.int32)] * 2,
        interpret=interpret,
    )(jnp.asarray(env8, jnp.float32), maps3, cf, *ins_f, *ins_i, *ins_p)
    return tuple(o.reshape(Np)[:N] for o in out)
