"""Pallas TPU kernel: shape-grouped static-cobj narrow phase.

`physics/cobjs.deepest_hits_grouped` — the TPU form of the reference's
sphere-vs-scene collision query (collision_detect.cpp:1027-1599, one
formula per cobj shape class) — is the hot static-scene cost of the
physics frame after the pair pass: the XLA formulation materializes
~10 [N, M] planes (pen/normals/one-hot + formula temps) in HBM per
substep, ~45 MB of traffic at N=10K, M=112.

Here each object block runs the whole query in VMEM:

* the packed cobj field matrix (`physics_kernel.pack_cobj_fields`,
  [M, 32]) rides resident; per-field [M, 1] columns are extracted by
  one-hot matmuls (no 1-wide lane slicing — Mosaic requires
  128-multiple lane slices);
* the shape grouping (`physics/cobjs.GroupedCobjs`) becomes STATIC
  sublane slices: group extents are multiples of 8 by construction
  (`group_cobjs(pad_to=8)`), so each shape formula runs only on its
  own [Mg, Nb] slice — the branchless all-formulas form pays ~7x the
  VPU work;
* the deepest-hit argmax is first-index exact (iota-min over the max
  plane), matching the XLA path's `jnp.argmax` tie semantics bitwise;
* HBM sees the 4 object rows in and 6 result rows out (~0.5 MB).

Formulas are op-for-op the grouped XLA path's
(`physics/cobjs.sphere_cobj_test_grouped`) with the [N, Mg] planes
transposed to [Mg, Nb]; elementwise order is preserved so results match
the XLA path bitwise (asserted in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...physics.cobjs import COLL_NULL, GroupedCobjs

_EPS = 1e-12


def padded_bounds(g: GroupedCobjs) -> tuple:
    """Live (lo, hi) bounds -> padded (lo, hi) covering each group's
    8-aligned slice in the packed set (dead pad slots included; they are
    masked off by the COLL_NULL test like the XLA path's)."""
    M = g.size
    b = g.bounds
    out = []
    for i, (lo, _hi) in enumerate(b):
        nxt = b[i + 1][0] if i + 1 < len(b) else M
        out.append((lo, nxt))
    return tuple(out)


def supported(g, n: int) -> bool:
    """VMEM residency bound on the cobj table + alignment + a batch big
    enough to beat dispatch overhead; fall back to XLA otherwise."""
    if not isinstance(g, GroupedCobjs):
        return False
    M = g.size
    if M > 256 or M % 8 != 0 or n < 2048:
        return False
    return all(lo % 8 == 0 and hi % 8 == 0 for lo, hi in padded_bounds(g))


def _norm3(ax, ay, az):
    d = jnp.sqrt(ax * ax + ay * ay + az * az)
    inv = 1.0 / jnp.maximum(d, _EPS)
    return d, ax * inv, ay * inv, az * inv


# column order must match physics_kernel._CF
_CF = ("shape", "p1x", "p1y", "p1z", "p2x", "p2y", "p2z", "r1", "r2",
       "npts",
       "pt0x", "pt0y", "pt0z", "pt1x", "pt1y", "pt1z",
       "pt2x", "pt2y", "pt2z", "pt3x", "pt3y", "pt3z",
       "pnx", "pny", "pnz", "elas", "fric")


def _narrow_kernel(cf_ref, px_ref, py_ref, pz_ref, rad_ref,
                   pen_ref, nx_ref, ny_ref, nz_ref, el_ref, fr_ref, *,
                   Nb: int, M: int, F: int, pb: tuple):
    f32 = jnp.float32
    cf = cf_ref[:, :]                                    # [M, F]
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (M, F), 1)

    def col(name):
        """cobj field -> [M, 1] column via one-hot multiply + lane
        reduction.  All-VPU and f32-exact: an MXU one-hot matmul at
        DEFAULT precision runs one bf16 pass, which quantizes the
        extracted field values (~1e-3 penetration error measured live);
        the XLA path's formulas never touch the MXU, so the extraction
        must stay exact to match it bitwise."""
        i = _CF.index(name)
        return jnp.sum(jnp.where(lane_f == i, cf, 0.0), axis=1,
                       keepdims=True)                    # [M, 1]

    shape = col("shape")
    p1x, p1y, p1z = col("p1x"), col("p1y"), col("p1z")
    p2x, p2y, p2z = col("p2x"), col("p2y"), col("p2z")
    r1c, r2c = col("r1"), col("r2")
    npts = col("npts")
    pnxc, pnyc, pnzc = col("pnx"), col("pny"), col("pnz")

    X = px_ref[0, :][None, :]                            # [1, Nb]
    Y = py_ref[0, :][None, :]
    Z = pz_ref[0, :][None, :]
    r = rad_ref[0, :][None, :]

    sl = lambda a, lo, hi: a[lo:hi]                      # static sublanes
    pens, nxs, nys, nzs = [], [], [], []

    def put(p, a, b, cc):
        pens.append(p)
        nxs.append(a)
        nys.append(b)
        nzs.append(cc)

    # cube group
    lo, hi = pb[0]
    if hi > lo:
        lox = jnp.minimum(sl(p1x, lo, hi), sl(p2x, lo, hi))
        hix = jnp.maximum(sl(p1x, lo, hi), sl(p2x, lo, hi))
        loy = jnp.minimum(sl(p1y, lo, hi), sl(p2y, lo, hi))
        hiy = jnp.maximum(sl(p1y, lo, hi), sl(p2y, lo, hi))
        loz = jnp.minimum(sl(p1z, lo, hi), sl(p2z, lo, hi))
        hiz = jnp.maximum(sl(p1z, lo, hi), sl(p2z, lo, hi))
        cx = jnp.clip(X, lox, hix)
        cy = jnp.clip(Y, loy, hiy)
        cz = jnp.clip(Z, loz, hiz)
        dist_out, ox, oy, oz = _norm3(X - cx, Y - cy, Z - cz)
        outside = dist_out > 1e-9
        dxl, dxh = X - lox, hix - X
        dyl, dyh = Y - loy, hiy - Y
        dzl, dzh = Z - loz, hiz - Z
        dx_m = jnp.minimum(dxl, dxh)
        dy_m = jnp.minimum(dyl, dyh)
        dz_m = jnp.minimum(dzl, dzh)
        din = jnp.minimum(dx_m, jnp.minimum(dy_m, dz_m))
        use_x = din == dx_m
        use_y = (din == dy_m) & ~use_x
        use_z = ~use_x & ~use_y
        put(jnp.where(outside, r - dist_out, r + din),
            jnp.where(outside, ox,
                      jnp.where(use_x, jnp.where(dxl < dxh, -1.0, 1.0), 0.0)),
            jnp.where(outside, oy,
                      jnp.where(use_y, jnp.where(dyl < dyh, -1.0, 1.0), 0.0)),
            jnp.where(outside, oz,
                      jnp.where(use_z, jnp.where(dzl < dzh, -1.0, 1.0), 0.0)))

    # sphere group
    lo, hi = pb[1]
    if hi > lo:
        dist, sx, sy, sz = _norm3(X - sl(p1x, lo, hi), Y - sl(p1y, lo, hi),
                                  Z - sl(p1z, lo, hi))
        put((r + sl(r1c, lo, hi)) - dist, sx, sy, sz)

    # vertical cylinder group
    lo, hi = pb[2]
    if hi > lo:
        p1z_ = sl(p1z, lo, hi)
        p2z_ = sl(p2z, lo, hi)
        zlo = jnp.minimum(p1z_, p2z_)
        zhi = jnp.maximum(p1z_, p2z_)
        rxy = jnp.maximum(sl(r1c, lo, hi), sl(r2c, lo, hi))
        ddx = X - sl(p1x, lo, hi)
        ddy = Y - sl(p1y, lo, hi)
        dist_xy = jnp.sqrt(ddx * ddx + ddy * ddy)
        inv_xy = 1.0 / jnp.maximum(dist_xy, _EPS)
        in_z = (Z > zlo - r) & (Z < zhi + r)
        pen_side = (r + rxy) - dist_xy
        top_pen = (zhi + r) - Z
        bot_pen = Z - (zlo - r)
        cap_is_top = top_pen < bot_pen
        pen_cap = jnp.minimum(top_pen, bot_pen)
        use_cap = (dist_xy < rxy) & (pen_cap < pen_side)
        put(jnp.where(in_z & (dist_xy < rxy + r),
                      jnp.where(use_cap, pen_cap, pen_side), -1.0),
            jnp.where(use_cap, 0.0, ddx * inv_xy),
            jnp.where(use_cap, 0.0, ddy * inv_xy),
            jnp.where(use_cap, jnp.where(cap_is_top, 1.0, -1.0), 0.0))

    # capsule group: per-t interpolated radius
    lo, hi = pb[3]
    if hi > lo:
        p1x_, p1y_, p1z_ = sl(p1x, lo, hi), sl(p1y, lo, hi), sl(p1z, lo, hi)
        abx = sl(p2x, lo, hi) - p1x_
        aby = sl(p2y, lo, hi) - p1y_
        abz = sl(p2z, lo, hi) - p1z_
        ab2 = jnp.maximum(abx * abx + aby * aby + abz * abz, _EPS)
        t = jnp.clip(((X - p1x_) * abx + (Y - p1y_) * aby
                      + (Z - p1z_) * abz) / ab2, 0.0, 1.0)
        dist_seg, sx, sy, sz = _norm3(X - (p1x_ + t * abx),
                                      Y - (p1y_ + t * aby),
                                      Z - (p1z_ + t * abz))
        rad_t = sl(r1c, lo, hi) + t * (sl(r2c, lo, hi) - sl(r1c, lo, hi))
        put((r + rad_t) - dist_seg, sx, sy, sz)

    # polygon group
    lo, hi = pb[4]
    if hi > lo:
        pnx = sl(pnxc, lo, hi)
        pny = sl(pnyc, lo, hi)
        pnz = sl(pnzc, lo, hi)
        np_ = sl(npts, lo, hi)
        ptx = [sl(col(f"pt{k}x"), lo, hi) for k in range(4)]
        pty = [sl(col(f"pt{k}y"), lo, hi) for k in range(4)]
        ptz = [sl(col(f"pt{k}z"), lo, hi) for k in range(4)]
        dp = ((X - ptx[0]) * pnx + (Y - pty[0]) * pny + (Z - ptz[0]) * pnz)
        side = jnp.sign(dp)
        prx = X - dp * pnx
        pry = Y - dp * pny
        prz = Z - dp * pnz
        inside = dp == dp  # all-true (no bool literals in Mosaic consts)
        for k in range(4):
            ax_, ay_, az_ = ptx[k], pty[k], ptz[k]
            nxt_ok = jnp.float32((k + 1) % 4) < np_
            bx_ = jnp.where(nxt_ok, ptx[(k + 1) % 4], ptx[0])
            by_ = jnp.where(nxt_ok, pty[(k + 1) % 4], pty[0])
            bz_ = jnp.where(nxt_ok, ptz[(k + 1) % 4], ptz[0])
            ex, ey, ez = bx_ - ax_, by_ - ay_, bz_ - az_
            vx_, vy_, vz_ = prx - ax_, pry - ay_, prz - az_
            crx = ey * vz_ - ez * vy_
            cry = ez * vx_ - ex * vz_
            crz = ex * vy_ - ey * vx_
            ok = (crx * pnx + cry * pny + crz * pnz) >= -1e-7
            inside = inside & (ok | ~(jnp.float32(k) < np_))
        put(jnp.where(inside, (r + 0.5 * sl(r1c, lo, hi)) - jnp.abs(dp),
                      -1.0),
            pnx * side, pny * side, pnz * side)

    # torus group
    lo, hi = pb[5]
    if hi > lo:
        tx = X - sl(p1x, lo, hi)
        ty = Y - sl(p1y, lo, hi)
        tz = Z - sl(p1z, lo, hi)
        axx = sl(p2x, lo, hi)
        axy = sl(p2y, lo, hi)
        axz = sl(p2z, lo, hi)
        axial = tx * axx + ty * axy + tz * axz
        rvx = tx - axial * axx
        rvy = ty - axial * axy
        rvz = tz - axial * axz
        radial = jnp.sqrt(rvx * rvx + rvy * rvy + rvz * rvz)
        rinv = sl(r1c, lo, hi) / jnp.maximum(radial, _EPS)
        dist_ring, sx, sy, sz = _norm3(tx - rvx * rinv, ty - rvy * rinv,
                                       tz - rvz * rinv)
        put((r + sl(r2c, lo, hi)) - dist_ring, sx, sy, sz)

    # rotated-cylinder group: EXACT taper + flat end caps
    lo, hi = pb[6] if len(pb) > 6 else (0, 0)
    if hi > lo:
        p1x_, p1y_, p1z_ = sl(p1x, lo, hi), sl(p1y, lo, hi), sl(p1z, lo, hi)
        abx = sl(p2x, lo, hi) - p1x_
        aby = sl(p2y, lo, hi) - p1y_
        abz = sl(p2z, lo, hi) - p1z_
        ab2 = jnp.maximum(abx * abx + aby * aby + abz * abz, _EPS)
        leninv = jax.lax.rsqrt(ab2)
        length = ab2 * leninv
        r1_, r2_ = sl(r1c, lo, hi), sl(r2c, lo, hi)
        t_un = ((X - p1x_) * abx + (Y - p1y_) * aby
                + (Z - p1z_) * abz) / ab2
        t_cl = jnp.clip(t_un, 0.0, 1.0)
        rdist, rnx, rny, rnz = _norm3(X - (p1x_ + t_un * abx),
                                      Y - (p1y_ + t_un * aby),
                                      Z - (p1z_ + t_un * abz))
        rad_tc = r1_ + t_cl * (r2_ - r1_)
        in_t = (t_un >= 0.0) & (t_un <= 1.0)
        pen_s = (rad_tc + r) - rdist
        side_ok = in_t & (pen_s > 0.0)
        d_end = t_un > 0.5
        end_r = jnp.where(d_end, r2_, r1_)
        axial_out = jnp.maximum(jnp.maximum(-t_un, t_un - 1.0), 0.0) * length
        tv_cl = jnp.where(d_end, 1.0 - t_cl, t_cl) * length
        pen_e = r - axial_out
        end_ok = (end_r > 0.0) & (tv_cl < jnp.minimum(r, rdist)) \
            & (rdist <= rad_tc + r) & (pen_e > 0.0)
        sgn = jnp.where(d_end, 1.0, -1.0)
        use_end = end_ok & (~side_ok | (pen_e < pen_s))
        put(jnp.where(use_end, pen_e, jnp.where(side_ok, pen_s, -1.0)),
            jnp.where(use_end, sgn * abx * leninv, rnx),
            jnp.where(use_end, sgn * aby * leninv, rny),
            jnp.where(use_end, sgn * abz * leninv, rnz))

    pen = jnp.concatenate(pens, axis=0)                  # [M, Nb]
    cnx = jnp.concatenate(nxs, axis=0)
    cny = jnp.concatenate(nys, axis=0)
    cnz = jnp.concatenate(nzs, axis=0)
    pen = jnp.where(shape != jnp.float32(COLL_NULL), pen, -1.0)

    # first-index argmax (ties -> lowest slot, == jnp.argmax)
    pmax = jnp.max(pen, axis=0, keepdims=True)           # [1, Nb]
    iota = jax.lax.broadcasted_iota(jnp.int32, (M, Nb), 0).astype(jnp.float32)
    first = jnp.min(jnp.where(pen == pmax, iota, jnp.float32(M)),
                    axis=0, keepdims=True)               # [1, Nb]
    oh = (iota == first).astype(jnp.float32)             # [M, Nb]
    pen_ref[0, :] = pmax[0, :]
    nx_ref[0, :] = jnp.sum(cnx * oh, axis=0)
    ny_ref[0, :] = jnp.sum(cny * oh, axis=0)
    nz_ref[0, :] = jnp.sum(cnz * oh, axis=0)
    el_ref[0, :] = jnp.sum(col("elas") * oh, axis=0)
    fr_ref[0, :] = jnp.sum(col("fric") * oh, axis=0)


@functools.partial(jax.jit, static_argnames=("pb", "Nb", "interpret"))
def _call(cf, px, py, pz, rad, pb: tuple, Nb: int, interpret: bool):
    n = px.shape[0]
    M, F = cf.shape
    npad = -n % Nb
    rows = [jnp.pad(a, (0, npad))[None, :] for a in (px, py, pz, rad)]
    grid = (rows[0].shape[1] // Nb,)
    kern = functools.partial(_narrow_kernel, Nb=Nb, M=M, F=F, pb=pb)
    row = pl.BlockSpec((1, Nb), lambda i: (0, i))
    shp = jax.ShapeDtypeStruct((1, rows[0].shape[1]), jnp.float32)
    pen, nx, ny, nz, el, fr = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((M, F), lambda i: (0, 0))] + [row] * 4,
        out_specs=[row] * 6,
        out_shape=[shp] * 6,
        interpret=interpret,
    )(cf, *rows)
    return tuple(o[0, :n] for o in (pen, nx, ny, nz, el, fr))


def deepest_hits_pallas(px, py, pz, radius, g: GroupedCobjs,
                        Nb: int = 512, interpret: bool = False):
    """Drop-in for `physics/cobjs.deepest_hits_grouped` on TPU."""
    from .physics_kernel import pack_cobj_fields
    cf = pack_cobj_fields(g)
    pen, nx, ny, nz, el, fr = _call(cf, px, py, pz, radius,
                                    padded_bounds(g), Nb, interpret)
    return pen > 0.0, pen, nx, ny, nz, el, fr
