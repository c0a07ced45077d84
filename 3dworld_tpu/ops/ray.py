"""Batched ray-vs-scene intersection, componentized for TPU.

The reference walks a BVH per ray (`check_coll_line_exact`,
cobj_bsp_tree.cpp) plus a hierarchical mesh intersector
(mesh_intersect.cpp:248).  Pointer-chasing BVH traversal is hostile to the
TPU's execution model, so scenes here use the dense formulation: every ray
tests every cobj slot ([N,M] planes, branchless per-shape t computation,
min-reduce), and the heightfield is intersected by fixed-count stepped
sampling.  At typical scene sizes (O(100-10K) cobjs) the dense pair test on
the VPU beats any traversal, and it batches perfectly.

Shapes follow physics/cobjs.py: cube (slab test), sphere (quadratic),
vertical cylinder (xy-quadratic + caps), polygon (plane + inside test);
capsule / rotated (tapered) cylinder / torus intersect exactly (cone
quadratic + end discs/spheres; torus via Newton refinement of the
quartic from the bounding-sphere entry).

Each shape family's formula block only enters the compiled graph when
the scene actually CONTAINS that type (host-known presence check on the
concrete cobj set).  The dense test otherwise pays for all 7 formulas on
every cobj; real scenes use 2-3 types, so this is a 2-3x cut in VPU work
on the tracer's hottest op.  Traced cobj sets keep every block.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..physics.cobjs import (
    CobjSet, COLL_NULL, COLL_CUBE, COLL_SPHERE, COLL_CYLINDER,
    COLL_CYLINDER_ROT, COLL_POLYGON, COLL_CAPSULE, COLL_TORUS,
)
from ..utils.constants import WorldConst

_EPS = 1e-9
_BIG = 1e30


def _isect_cube(c, OX, OY, OZ, DX, DY, DZ, ix, iy, iz):
    """Slab test.  Returns (t, (nx,ny,nz), t_exit)."""
    lox = jnp.minimum(c.p1[:, 0], c.p2[:, 0])
    hix = jnp.maximum(c.p1[:, 0], c.p2[:, 0])
    loy = jnp.minimum(c.p1[:, 1], c.p2[:, 1])
    hiy = jnp.maximum(c.p1[:, 1], c.p2[:, 1])
    loz = jnp.minimum(c.p1[:, 2], c.p2[:, 2])
    hiz = jnp.maximum(c.p1[:, 2], c.p2[:, 2])
    t1x = (lox - OX) * ix
    t2x = (hix - OX) * ix
    t1y = (loy - OY) * iy
    t2y = (hiy - OY) * iy
    t1z = (loz - OZ) * iz
    t2z = (hiz - OZ) * iz
    tnx = jnp.minimum(t1x, t2x)
    tfx = jnp.maximum(t1x, t2x)
    tny = jnp.minimum(t1y, t2y)
    tfy = jnp.maximum(t1y, t2y)
    tnz = jnp.minimum(t1z, t2z)
    tfz = jnp.maximum(t1z, t2z)
    tn = jnp.maximum(jnp.maximum(tnx, tny), tnz)
    tf = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
    cube_hit = (tn <= tf) & (tf > _EPS) & (tn > _EPS)
    t_cube = jnp.where(cube_hit, tn, _BIG)
    # entry face normal: the axis achieving tn, sign opposite ray dir
    use_x = tn == tnx
    use_y = (tn == tny) & ~use_x
    use_z = ~use_x & ~use_y
    ncx = jnp.where(use_x, -jnp.sign(DX), 0.0)
    ncy = jnp.where(use_y, -jnp.sign(DY), 0.0)
    ncz = jnp.where(use_z, -jnp.sign(DZ), 0.0)
    tx_cube = jnp.where(cube_hit, tf, t_cube)
    return t_cube, (ncx, ncy, ncz), tx_cube


def _isect_sphere(c, OX, OY, OZ, DX, DY, DZ, a):
    """True spheres: center p1, radius r1."""
    LX = OX - c.p1[:, 0]
    LY = OY - c.p1[:, 1]
    LZ = OZ - c.p1[:, 2]
    b = 2.0 * (LX * DX + LY * DY + LZ * DZ)
    cc = LX * LX + LY * LY + LZ * LZ - c.r1 * c.r1
    disc = b * b - 4.0 * a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_s = (-b - sq) / (2.0 * a)
    sph_hit = (disc > 0.0) & (t_s > _EPS)
    t_sph = jnp.where(sph_hit, t_s, _BIG)
    hx = OX + t_s * DX - c.p1[:, 0]
    hy = OY + t_s * DY - c.p1[:, 1]
    hz = OZ + t_s * DZ - c.p1[:, 2]
    hl = jnp.maximum(jnp.sqrt(hx * hx + hy * hy + hz * hz), _EPS)
    # exit: valid far root whenever the quadratic has one ahead (an
    # origin inside the sphere still needs an exit for transmission)
    t_s2 = (-b + sq) / (2.0 * a)
    tx_sph = jnp.where((disc > 0.0) & (t_s2 > _EPS), t_s2, t_sph)
    return t_sph, (hx / hl, hy / hl, hz / hl), tx_sph


def _isect_tapered(c, OX, OY, OZ, DX, DY, DZ, a, want_caps, want_rcyl):
    """Capsule / rotated (tapered) cylinder: EXACT cone quadratic.

    Axis A=p1, B=p2, unit u, length L; radius r(s) = r1 + (s/L)(r2-r1).
    Side surface: |P-A|^2 - s^2 = r(s)^2 with s = (P-A).u — a quadratic
    in ray t (the line_intersect_cylinder math of Math3d.cpp, done
    branchlessly).  Rot-cylinders add flat end discs; capsules add end
    spheres of radius r1/r2.  Returns a dict with the requested family
    results: t/caps normals/exits keyed 'caps' and 'rcyl'.
    """
    ux_ = c.p2[:, 0] - c.p1[:, 0]
    uy_ = c.p2[:, 1] - c.p1[:, 1]
    uz_ = c.p2[:, 2] - c.p1[:, 2]
    Lax = jnp.sqrt(jnp.maximum(ux_ * ux_ + uy_ * uy_ + uz_ * uz_, _EPS))
    ux_, uy_, uz_ = ux_ / Lax, uy_ / Lax, uz_ / Lax
    kslope = (c.r2 - c.r1) / Lax
    wx_ = OX - c.p1[:, 0]
    wy_ = OY - c.p1[:, 1]
    wz_ = OZ - c.p1[:, 2]
    s_w = wx_ * ux_ + wy_ * uy_ + wz_ * uz_
    s_d = DX * ux_ + DY * uy_ + DZ * uz_
    one_k2 = 1.0 + kslope * kslope
    Ac = a - s_d * s_d * one_k2
    Bc = 2.0 * ((wx_ * DX + wy_ * DY + wz_ * DZ)
                - s_w * s_d * one_k2 - c.r1 * kslope * s_d)
    Cc = (wx_ * wx_ + wy_ * wy_ + wz_ * wz_) - s_w * s_w * one_k2 \
        - 2.0 * c.r1 * kslope * s_w - c.r1 * c.r1
    discc = Bc * Bc - 4.0 * Ac * Cc
    sqc = jnp.sqrt(jnp.maximum(discc, 0.0))
    Ac_s = jnp.where(jnp.abs(Ac) < _EPS, _EPS, Ac)
    tc1 = (-Bc - sqc) / (2.0 * Ac_s)
    tc2 = (-Bc + sqc) / (2.0 * Ac_s)

    def side_t(tcand):
        s_at = s_w + tcand * s_d
        ok = (discc > 0.0) & (tcand > _EPS) & (s_at >= 0.0) & (s_at <= Lax)
        return jnp.where(ok, tcand, _BIG)

    t_side_rc = jnp.minimum(side_t(jnp.minimum(tc1, tc2)),
                            side_t(jnp.maximum(tc1, tc2)))
    t_side_far = side_t(jnp.maximum(tc1, tc2))
    s_d_s = jnp.where(jnp.abs(s_d) < _EPS, _EPS, s_d)

    def cone_normal(tbest):
        px_ = wx_ + tbest * DX
        py_ = wy_ + tbest * DY
        pz_ = wz_ + tbest * DZ
        s_at = px_ * ux_ + py_ * uy_ + pz_ * uz_
        rad_at = c.r1 + kslope * s_at
        coef = s_at + kslope * rad_at     # grad of the cone implicit
        gx = px_ - coef * ux_
        gy = py_ - coef * uy_
        gz = pz_ - coef * uz_
        gl = jnp.maximum(jnp.sqrt(gx * gx + gy * gy + gz * gz), _EPS)
        return gx / gl, gy / gl, gz / gl

    out = {}
    if want_rcyl:
        # flat end discs (rot-cylinder check_ends)
        t_d0 = -s_w / s_d_s
        t_dL = (Lax - s_w) / s_d_s

        def disc_t(tcand, rad_end):
            px_ = wx_ + tcand * DX
            py_ = wy_ + tcand * DY
            pz_ = wz_ + tcand * DZ
            s_at = px_ * ux_ + py_ * uy_ + pz_ * uz_
            r2d = px_ * px_ + py_ * py_ + pz_ * pz_ - s_at * s_at
            ok = (tcand > _EPS) & (r2d <= rad_end * rad_end)
            return jnp.where(ok, tcand, _BIG)

        t_rcyl = jnp.minimum(t_side_rc,
                             jnp.minimum(disc_t(t_d0, c.r1),
                                         disc_t(t_dL, c.r2)))

        def rc_normal(tbest):
            # side -> cone gradient; ends -> +-axis
            on_side = jnp.abs(tbest - t_side_rc) < 1e-6
            gx, gy, gz = cone_normal(tbest)
            s_at = s_w + tbest * s_d
            sgn = jnp.where(s_at > 0.5 * Lax, 1.0, -1.0)
            return (jnp.where(on_side, gx, sgn * ux_),
                    jnp.where(on_side, gy, sgn * uy_),
                    jnp.where(on_side, gz, sgn * uz_))

        tx_rcyl = jnp.maximum(
            jnp.where(t_side_far < _BIG, t_side_far, -_BIG),
            jnp.maximum(jnp.where(disc_t(t_d0, c.r1) < _BIG, t_d0, -_BIG),
                        jnp.where(disc_t(t_dL, c.r2) < _BIG, t_dL, -_BIG)))
        tx_rcyl = jnp.where(tx_rcyl > -_BIG, tx_rcyl, t_rcyl)
        out["rcyl"] = (t_rcyl, rc_normal(t_rcyl), tx_rcyl)

    if want_caps:
        # capsule: side + end SPHERES (r1 at A, r2 at B)
        def end_sphere_t(ex0, ey0, ez0, rr):
            lx = OX - ex0
            ly = OY - ey0
            lz = OZ - ez0
            bb = 2.0 * (lx * DX + ly * DY + lz * DZ)
            cc2 = lx * lx + ly * ly + lz * lz - rr * rr
            dd = bb * bb - 4.0 * a * cc2
            tt = (-bb - jnp.sqrt(jnp.maximum(dd, 0.0))) / (2.0 * a)
            return jnp.where((dd > 0.0) & (tt > _EPS), tt, _BIG)

        t_caps = jnp.minimum(
            t_side_rc,
            jnp.minimum(
                end_sphere_t(c.p1[:, 0], c.p1[:, 1], c.p1[:, 2], c.r1),
                end_sphere_t(c.p2[:, 0], c.p2[:, 1], c.p2[:, 2], c.r2)))

        def caps_normal(tbest):
            on_side = jnp.abs(tbest - t_side_rc) < 1e-6
            gx, gy, gz = cone_normal(tbest)
            # end-sphere normal from the nearer end center
            s_at = s_w + tbest * s_d
            near_b = s_at > 0.5 * Lax
            exc = jnp.where(near_b, c.p2[:, 0], c.p1[:, 0])
            eyc = jnp.where(near_b, c.p2[:, 1], c.p1[:, 1])
            ezc = jnp.where(near_b, c.p2[:, 2], c.p1[:, 2])
            sx_ = OX + tbest * DX - exc
            sy_ = OY + tbest * DY - eyc
            sz_ = OZ + tbest * DZ - ezc
            sl_ = jnp.maximum(jnp.sqrt(sx_ * sx_ + sy_ * sy_ + sz_ * sz_),
                              _EPS)
            return (jnp.where(on_side, gx, sx_ / sl_),
                    jnp.where(on_side, gy, sy_ / sl_),
                    jnp.where(on_side, gz, sz_ / sl_))

        # capsule exit: max over the far cone-side root and the far
        # roots of both end spheres (a bounding-sphere exit would be a
        # gross over-estimate — up to L+2r chords)
        def end_sphere_tfar(ex0, ey0, ez0, rr):
            lx = OX - ex0
            ly = OY - ey0
            lz = OZ - ez0
            bb = 2.0 * (lx * DX + ly * DY + lz * DZ)
            cc2 = lx * lx + ly * ly + lz * lz - rr * rr
            dd = bb * bb - 4.0 * a * cc2
            tt = (-bb + jnp.sqrt(jnp.maximum(dd, 0.0))) / (2.0 * a)
            return jnp.where((dd > 0.0) & (tt > _EPS), tt, -_BIG)

        tx_caps = jnp.maximum(
            jnp.where(t_side_far < _BIG, t_side_far, -_BIG),
            jnp.maximum(
                end_sphere_tfar(c.p1[:, 0], c.p1[:, 1], c.p1[:, 2], c.r1),
                end_sphere_tfar(c.p2[:, 0], c.p2[:, 1], c.p2[:, 2], c.r2)))
        tx_caps = jnp.where(tx_caps > -_BIG, tx_caps, t_caps)
        out["caps"] = (t_caps, caps_normal(t_caps), tx_caps)
    return out


def _isect_torus(c, OX, OY, OZ, DX, DY, DZ, a):
    """Newton refinement of the quartic from the bounding-sphere entry
    (line_torus_intersect semantics, Math3d.cpp:835+); axis = unit c.p2,
    ring center c.p1, ring radius r1, tube radius r2."""
    # bounding sphere: center p1, radius r1+r2
    rs = c.r1 + c.r2
    LX = OX - c.p1[:, 0]
    LY = OY - c.p1[:, 1]
    LZ = OZ - c.p1[:, 2]
    b = 2.0 * (LX * DX + LY * DY + LZ * DZ)
    cc = LX * LX + LY * LY + LZ * LZ - rs * rs
    disc = b * b - 4.0 * a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_s = (-b - sq) / (2.0 * a)

    def torus_F_dF(tt):
        qx_ = OX + tt * DX - c.p1[:, 0]
        qy_ = OY + tt * DY - c.p1[:, 1]
        qz_ = OZ + tt * DZ - c.p1[:, 2]
        au = c.p2[:, 0]
        av = c.p2[:, 1]
        aw = c.p2[:, 2]
        q2 = qx_ * qx_ + qy_ * qy_ + qz_ * qz_
        qu = qx_ * au + qy_ * av + qz_ * aw
        qd = qx_ * DX + qy_ * DY + qz_ * DZ
        du = DX * au + DY * av + DZ * aw
        K = q2 + c.r1 * c.r1 - c.r2 * c.r2
        F = K * K - 4.0 * c.r1 * c.r1 * (q2 - qu * qu)
        dF = 4.0 * K * qd - 4.0 * c.r1 * c.r1 * (2.0 * qd - 2.0 * qu * du)
        return F, dF

    t_n = jnp.maximum(t_s, _EPS)          # seed at bounding-sphere entry
    # gate on the bounding sphere being AHEAD at all (far root > eps):
    # a ray starting inside the r1+r2 sphere — e.g. a bounce ray leaving
    # the torus surface, or an AO sample under a ring — must still be
    # able to hit; gating on the near root made those rays miss
    t_s2 = (-b + sq) / (2.0 * a)
    sph_ahead = (disc > 0.0) & (t_s2 > _EPS)
    for _ in range(6):
        Fv, dFv = torus_F_dF(t_n)
        t_n = t_n - Fv / jnp.where(jnp.abs(dFv) < _EPS, _EPS, dFv)
    Fv, _ = torus_F_dF(t_n)
    scale4 = jnp.maximum(c.r1, _EPS) ** 4
    tor_ok = sph_ahead & (jnp.abs(Fv) < 1e-3 * scale4) & (t_n > _EPS)
    t_torus = jnp.where(tor_ok, t_n, _BIG)

    def torus_normal(tt):
        qx_ = OX + tt * DX - c.p1[:, 0]
        qy_ = OY + tt * DY - c.p1[:, 1]
        qz_ = OZ + tt * DZ - c.p1[:, 2]
        au = c.p2[:, 0]
        av = c.p2[:, 1]
        aw = c.p2[:, 2]
        q2 = qx_ * qx_ + qy_ * qy_ + qz_ * qz_
        qu = qx_ * au + qy_ * av + qz_ * aw
        K = q2 + c.r1 * c.r1 - c.r2 * c.r2
        gx = 4.0 * K * qx_ - 8.0 * c.r1 * c.r1 * (qx_ - qu * au)
        gy = 4.0 * K * qy_ - 8.0 * c.r1 * c.r1 * (qy_ - qu * av)
        gz = 4.0 * K * qz_ - 8.0 * c.r1 * c.r1 * (qz_ - qu * aw)
        gl = jnp.maximum(jnp.sqrt(gx * gx + gy * gy + gz * gz), _EPS)
        return gx / gl, gy / gl, gz / gl

    # torus exit: the bounding-sphere far root as a transmission-chord
    # upper bound
    tx_tor = jnp.where(sph_ahead, t_s2, t_torus)
    return t_torus, torus_normal(t_torus), tx_tor


def _isect_vcyl(c, OX, OY, OZ, DX, DY, DZ, iz):
    """Vertical cylinder: xy quadratic + z clip + caps."""
    rc = jnp.maximum(c.r1, c.r2)
    zlo = jnp.minimum(c.p1[:, 2], c.p2[:, 2])
    zhi = jnp.maximum(c.p1[:, 2], c.p2[:, 2])
    LXc = OX - c.p1[:, 0]
    LYc = OY - c.p1[:, 1]
    a2 = DX * DX + DY * DY
    b2 = 2.0 * (LXc * DX + LYc * DY)
    c2 = LXc * LXc + LYc * LYc - rc * rc
    disc2 = b2 * b2 - 4.0 * a2 * c2
    sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
    t_side = (-b2 - sq2) / jnp.maximum(2.0 * a2, _EPS)
    z_at = OZ + t_side * DZ
    side_ok = (disc2 > 0.0) & (t_side > _EPS) & (z_at >= zlo) & (z_at <= zhi)
    # caps
    t_top = (zhi - OZ) * iz
    t_bot = (zlo - OZ) * iz

    def cap_ok(t_c):
        xx = OX + t_c * DX - c.p1[:, 0]
        yy = OY + t_c * DY - c.p1[:, 1]
        return (t_c > _EPS) & (xx * xx + yy * yy <= rc * rc)

    top_ok = cap_ok(t_top)
    bot_ok = cap_ok(t_bot)
    t_cyl = jnp.where(side_ok, t_side, _BIG)
    t_cyl = jnp.minimum(t_cyl, jnp.where(top_ok, t_top, _BIG))
    t_cyl = jnp.minimum(t_cyl, jnp.where(bot_ok, t_bot, _BIG))
    cyl_hit = t_cyl < _BIG
    from_side = cyl_hit & (t_cyl == jnp.where(side_ok, t_side, _BIG))
    hxc = (OX + t_cyl * DX - c.p1[:, 0])
    hyc = (OY + t_cyl * DY - c.p1[:, 1])
    hlc = jnp.maximum(jnp.sqrt(hxc * hxc + hyc * hyc), _EPS)
    ncyx = jnp.where(from_side, hxc / hlc, 0.0)
    ncyy = jnp.where(from_side, hyc / hlc, 0.0)
    ncyz = jnp.where(from_side, 0.0, -jnp.sign(DZ))
    # exit: max valid side/cap t
    t_side2 = (-b2 + sq2) / jnp.maximum(2.0 * a2, _EPS)
    z_at2 = OZ + t_side2 * DZ
    side2_ok = (disc2 > 0.0) & (t_side2 > _EPS) & (z_at2 >= zlo) & (z_at2 <= zhi)
    tx_cyl = jnp.maximum(jnp.where(side2_ok, t_side2, -_BIG),
                         jnp.maximum(jnp.where(top_ok, t_top, -_BIG),
                                     jnp.where(bot_ok, t_bot, -_BIG)))
    tx_cyl = jnp.where(cyl_hit & (tx_cyl > -_BIG), tx_cyl, t_cyl)
    return t_cyl, (ncyx, ncyy, ncyz), tx_cyl


def _isect_polygon(c, OX, OY, OZ, DX, DY, DZ):
    """Plane + inside test; thickness r1 feeds the exit chord."""
    pnx, pny, pnz = c.pnorm[:, 0], c.pnorm[:, 1], c.pnorm[:, 2]
    denom = DX * pnx + DY * pny + DZ * pnz
    t_pl = (((c.pts[:, 0, 0] - OX) * pnx + (c.pts[:, 0, 1] - OY) * pny
             + (c.pts[:, 0, 2] - OZ) * pnz)
            / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom))
    qx = OX + t_pl * DX
    qy = OY + t_pl * DY
    qz = OZ + t_pl * DZ
    inside = jnp.ones_like(t_pl, dtype=bool)
    for k in range(4):
        ax_, ay_, az_ = c.pts[:, k, 0], c.pts[:, k, 1], c.pts[:, k, 2]
        nk = (k + 1) % 4
        ok_next = (nk < c.npts)
        bx_ = jnp.where(ok_next, c.pts[:, nk, 0], c.pts[:, 0, 0])
        by_ = jnp.where(ok_next, c.pts[:, nk, 1], c.pts[:, 0, 1])
        bz_ = jnp.where(ok_next, c.pts[:, nk, 2], c.pts[:, 0, 2])
        ex, ey, ez = bx_ - ax_, by_ - ay_, bz_ - az_
        vx_, vy_, vz_ = qx - ax_, qy - ay_, qz - az_
        crx = ey * vz_ - ez * vy_
        cry = ez * vx_ - ex * vz_
        crz = ex * vy_ - ey * vx_
        okk = (crx * pnx + cry * pny + crz * pnz) >= -1e-7
        inside = inside & jnp.where(k < c.npts, okk, True)
    poly_hit = inside & (t_pl > _EPS)
    t_poly = jnp.where(poly_hit, t_pl, _BIG)
    side_sign = -jnp.sign(denom)
    tx_poly = t_poly + jnp.maximum(c.r1, 0.0) / jnp.maximum(jnp.abs(denom),
                                                            0.1)
    return t_poly, (pnx * side_sign, pny * side_sign, pnz * side_sign), tx_poly


def present_types(c: CobjSet):
    """Host-side: the sorted tuple of shape types actually present in a
    CONCRETE cobj set — pass it as `ray_cobjs_nearest(..., present=...)`
    from inside jit (where c is traced and can't be inspected) so absent
    shape families compile out."""
    sh_host = np.asarray(c.shape)
    all_t = (COLL_CUBE, COLL_SPHERE, COLL_CYLINDER, COLL_CYLINDER_ROT,
             COLL_POLYGON, COLL_CAPSULE, COLL_TORUS)
    return tuple(t for t in all_t if bool((sh_host == t).any()))


def ray_cobjs_nearest(ox, oy, oz, dx, dy, dz, tmax, c: CobjSet,
                      with_exit: bool = False, present=None):
    """Nearest intersection of N rays against all cobjs.

    Inputs [N] each (directions need not be normalized — t is in direction
    units).  Returns (hit [N], t [N], nx, ny, nz [N], idx_onehot [N,M]);
    with `with_exit` a 7th element `t_exit` [N] — the far intersection of
    the SAME (nearest) cobj along the ray, used by the lighting tracer's
    straight-through transmission chord (ray_trace.cpp:418-456).

    `present` (a static tuple from `present_types`) names the shape
    families in the scene; under jit the cobj arrays are traced, so
    without it every family's formula block stays in the graph.
    """
    OX, OY, OZ = ox[:, None], oy[:, None], oz[:, None]       # [N,1]
    DX, DY, DZ = dx[:, None], dy[:, None], dz[:, None]

    inv = lambda d: 1.0 / jnp.where(jnp.abs(d) < _EPS,
                                    jnp.where(d < 0, -_EPS, _EPS), d)

    if present is None:
        try:    # concrete cobj sets: compile out absent shape families
            present = present_types(c)
        except Exception:   # traced shape array: keep every block
            present = (COLL_CUBE, COLL_SPHERE, COLL_CYLINDER,
                       COLL_CYLINDER_ROT, COLL_POLYGON, COLL_CAPSULE,
                       COLL_TORUS)
    has_cube = COLL_CUBE in present
    has_sph = COLL_SPHERE in present
    has_cyl = COLL_CYLINDER in present
    has_rcyl = COLL_CYLINDER_ROT in present
    has_poly = COLL_POLYGON in present
    has_caps = COLL_CAPSULE in present
    has_torus = COLL_TORUS in present

    a = DX * DX + DY * DY + DZ * DZ

    # (pred [M], t [N,M], (nx,ny,nz), t_exit [N,M]) per present family
    cands = []
    if has_cube or has_cyl:
        iz = inv(DZ)
    if has_cube:
        ix, iy = inv(DX), inv(DY)
        t_k, n_k, tx_k = _isect_cube(c, OX, OY, OZ, DX, DY, DZ, ix, iy, iz)
        cands.append((c.shape == COLL_CUBE, t_k, n_k, tx_k))
    if has_cyl:
        t_k, n_k, tx_k = _isect_vcyl(c, OX, OY, OZ, DX, DY, DZ, iz)
        cands.append((c.shape == COLL_CYLINDER, t_k, n_k, tx_k))
    if has_poly:
        t_k, n_k, tx_k = _isect_polygon(c, OX, OY, OZ, DX, DY, DZ)
        cands.append((c.shape == COLL_POLYGON, t_k, n_k, tx_k))
    if has_caps or has_rcyl:
        fam = _isect_tapered(c, OX, OY, OZ, DX, DY, DZ, a,
                             want_caps=has_caps, want_rcyl=has_rcyl)
        if has_caps:
            t_k, n_k, tx_k = fam["caps"]
            cands.append((c.shape == COLL_CAPSULE, t_k, n_k, tx_k))
        if has_rcyl:
            t_k, n_k, tx_k = fam["rcyl"]
            cands.append((c.shape == COLL_CYLINDER_ROT, t_k, n_k, tx_k))
    if has_torus:
        t_k, n_k, tx_k = _isect_torus(c, OX, OY, OZ, DX, DY, DZ, a)
        cands.append((c.shape == COLL_TORUS, t_k, n_k, tx_k))
    if has_sph:
        t_k, n_k, tx_k = _isect_sphere(c, OX, OY, OZ, DX, DY, DZ, a)
        cands.append((c.shape == COLL_SPHERE, t_k, n_k, tx_k))

    if not cands:   # empty / all-NULL cobj set
        n = ox.shape[0]
        zero = jnp.zeros((n,))
        oh = jnp.zeros((n, c.size))
        big = jnp.full((n,), _BIG)
        if with_exit:
            return (jnp.zeros((n,), bool), big, zero, zero, zero, oh, big)
        return (jnp.zeros((n,), bool), big, zero, zero, zero, oh)

    preds = [p for (p, _, _, _) in cands]
    t_all = jnp.select(preds, [t for (_, t, _, _) in cands],
                       default=jnp.float32(_BIG))
    t_all = jnp.where(c.shape == COLL_NULL, _BIG, t_all)
    t_all = jnp.where(t_all <= tmax[:, None], t_all, _BIG)
    nx_all = jnp.select(preds, [n[0] for (_, _, n, _) in cands],
                        default=jnp.float32(0.0))
    ny_all = jnp.select(preds, [n[1] for (_, _, n, _) in cands],
                        default=jnp.float32(0.0))
    nz_all = jnp.select(preds, [n[2] for (_, _, n, _) in cands],
                        default=jnp.float32(1.0))

    i = jnp.argmin(t_all, axis=-1)
    oh = (i[:, None] == jnp.arange(c.size, dtype=jnp.int32)[None, :]).astype(
        ox.dtype)
    t_best = jnp.sum(t_all * oh, -1)
    hit = t_best < _BIG
    if not with_exit:
        return (hit, t_best,
                jnp.sum(nx_all * oh, -1), jnp.sum(ny_all * oh, -1),
                jnp.sum(nz_all * oh, -1), oh)

    tx_all = jnp.select(preds, [tx for (_, _, _, tx) in cands],
                        default=jnp.float32(_BIG))
    t_exit = jnp.sum(jnp.maximum(tx_all, t_all) * oh, -1)
    return (hit, t_best,
            jnp.sum(nx_all * oh, -1), jnp.sum(ny_all * oh, -1),
            jnp.sum(nz_all * oh, -1), oh, t_exit)


def ray_heightfield(ox, oy, oz, dx, dy, dz, tmax, mesh, world: WorldConst,
                    num_steps: int = 64):
    """Stepped ray-vs-heightfield intersection (line_intersect_mesh
    equivalent, mesh_intersect.cpp:248): sample the mesh height at
    `num_steps` points along each ray; first sample below the surface wins,
    refined by one interpolation.  Returns (hit [N], t [N]).

    Heights are sampled with the one-hot-matmul bilinear sampler.
    Samples are placed on the sub-range of [0, tmax] that overlaps the
    mesh's XY footprint (sky rays start far outside it): same step
    count, ~3x finer effective resolution, and rays that never cross
    the footprint can't hit at all (the reference's mesh is finite).
    """
    from ..physics.step import sample_mesh

    N = ox.shape[0]
    my, mx = mesh.shape
    hx = 0.5 * mx * world.dx
    hy = 0.5 * my * world.dy

    def axis_range(o, d, lo, hi):
        dsafe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        ta = (lo - o) / dsafe
        tb = (hi - o) / dsafe
        return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

    t0x, t1x = axis_range(ox, dx, -hx, hx)
    t0y, t1y = axis_range(oy, dy, -hy, hy)
    t0m = jnp.maximum(jnp.maximum(t0x, t0y), 0.0)
    t1m = jnp.minimum(jnp.minimum(t1x, t1y), tmax)
    span = jnp.maximum(t1m - t0m, 0.0)

    ts = (jnp.arange(1, num_steps + 1, dtype=jnp.float32) / num_steps)  # [S]
    t_grid = t0m[:, None] + ts[None, :] * span[:, None]                 # [N,S]

    def below_at(tcol):
        x = ox + tcol * dx
        y = oy + tcol * dy
        z = oz + tcol * dz
        h, _, _, _ = sample_mesh(mesh, x, y, world)
        return z < h, h, z

    # scan over steps to avoid an [N*S] mega-sample (S sequential cheap steps)
    def body(carry, tcol):
        found, t_hit = carry
        b, h, z = below_at(tcol)
        new = b & ~found
        t_hit = jnp.where(new, tcol, t_hit)
        return (found | b, t_hit), None

    (found, t_hit), _ = jax.lax.scan(body, (jnp.zeros(N, bool), jnp.full((N,), _BIG)),
                                     t_grid.T)
    # a ray that never crosses the footprint cannot hit (its samples all
    # collapsed onto t0m and compared against clamped edge heights)
    crosses = span > 0.0
    return found & crosses, jnp.where(crosses, t_hit, _BIG)


def cosine_hemisphere_dirs(key, nx, ny, nz, shape):
    """Cosine-weighted scatter directions (the reference's normal-offset
    unit sphere trick: v = normalize(n + random_unit), ray_trace.cpp:482).

    The random unit vector comes from the cylinder-area map
    (z = 2u-1, angle = 2 pi v) — exactly uniform on the sphere from TWO
    uniform draws, vs the gaussian-triple's six draws + three
    Box-Muller transcendentals (the RNG soup was measured at ~half the
    production bounce cost)."""
    ku, kv = jax.random.split(key)
    z = 2.0 * jax.random.uniform(ku, shape) - 1.0
    ang = (2.0 * np.pi) * jax.random.uniform(kv, shape)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    rx = r * jnp.cos(ang)
    ry = r * jnp.sin(ang)
    vx = nx + rx
    vy = ny + ry
    vz = nz + z
    vl = jnp.sqrt(vx * vx + vy * vy + vz * vz) + _EPS
    return vx / vl, vy / vl, vz / vl


def ray_heightfield_dda(ox, oy, oz, dx, dy, dz, tmax, mesh,
                        world: WorldConst, max_cells: int = 64):
    """Exact cell-walking ray-vs-heightfield intersection.

    The reference's `mesh_intersector` (mesh_intersect.h:21,
    mesh_intersect.cpp:248-256) visits mesh cells along the ray and
    intersects exactly within each; this is that traversal as a
    fixed-iteration DDA: per step, fetch the cell's 4 corners (one-hot
    matmuls), solve the quadratic z(t) = h_bilinear(t) on [t_entry,
    t_exit], advance to the next cell boundary otherwise.  Exact for
    rays crossing <= max_cells cells (no thin-feature misses, unlike
    the fixed-sampling `ray_heightfield`).  Returns (hit [N], t [N]).
    """
    from ..physics.step import _bilinear_onehots  # noqa: F401 (same module family)

    my, mx = mesh.shape
    N = ox.shape[0]
    gx0 = ox * world.dx_inv + mx // 2
    gy0 = oy * world.dy_inv + my // 2
    gdx = dx * world.dx_inv
    gdy = dy * world.dy_inv
    ar_x = jnp.arange(mx, dtype=jnp.float32)[None, :]
    ar_y = jnp.arange(my, dtype=jnp.float32)[None, :]

    def corners(cx, cy):
        ohx0 = (cx[:, None] == ar_x).astype(jnp.float32)
        ohx1 = (cx[:, None] + 1 == ar_x).astype(jnp.float32)
        ohy0 = (cy[:, None] == ar_y).astype(jnp.float32)
        ohy1 = (cy[:, None] + 1 == ar_y).astype(jnp.float32)
        r0 = jnp.einsum("ny,yx->nx", ohy0, mesh,
                        preferred_element_type=jnp.float32)
        r1 = jnp.einsum("ny,yx->nx", ohy1, mesh,
                        preferred_element_type=jnp.float32)
        return (jnp.sum(r0 * ohx0, -1), jnp.sum(r0 * ohx1, -1),
                jnp.sum(r1 * ohx0, -1), jnp.sum(r1 * ohx1, -1))

    eps = 1e-5

    def body(carry, _):
        t, found, t_hit = carry
        # current cell
        px = gx0 + t * gdx
        py = gy0 + t * gdy
        cx = jnp.floor(px)
        cy = jnp.floor(py)
        inside = (cx >= 0) & (cx < mx - 1) & (cy >= 0) & (cy < my - 1)
        cxc = jnp.clip(cx, 0, mx - 2)
        cyc = jnp.clip(cy, 0, my - 2)
        h00, h10, h01, h11 = corners(cxc, cyc)
        # exit t: next x / y cell boundary
        tx = jnp.where(gdx > eps, (cx + 1 - gx0) / jnp.where(gdx == 0, 1, gdx),
                       jnp.where(gdx < -eps, (cx - gx0) / jnp.where(gdx == 0, 1, gdx),
                                 jnp.inf))
        ty = jnp.where(gdy > eps, (cy + 1 - gy0) / jnp.where(gdy == 0, 1, gdy),
                       jnp.where(gdy < -eps, (cy - gy0) / jnp.where(gdy == 0, 1, gdy),
                                 jnp.inf))
        t_exit = jnp.minimum(jnp.minimum(tx, ty), tmax)
        # f(t) = z(t) - h(x(t), y(t)); h bilinear -> f quadratic in t
        # local coords u = px - cx + s*gdx, v = py - cy + s*gdy, s = t' - t
        u0 = px - cxc
        v0 = py - cyc
        a_h = (h00 - h10 - h01 + h11)
        # h(u, v) = h00 + (h10-h00) u + (h01-h00) v + a_h u v
        # f(s) = (oz + (t+s) dz) - h(u0+s gdx, v0+s gdy)
        c0 = (oz + t * dz) - (h00 + (h10 - h00) * u0 + (h01 - h00) * v0
                              + a_h * u0 * v0)
        c1 = dz - ((h10 - h00) * gdx + (h01 - h00) * gdy
                   + a_h * (u0 * gdy + v0 * gdx))
        c2 = -a_h * gdx * gdy
        # solve c2 s^2 + c1 s + c0 = 0 on s in [0, t_exit - t]
        smax = jnp.maximum(t_exit - t, 0.0)
        disc = c1 * c1 - 4.0 * c2 * c0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        is_quad = jnp.abs(c2) > 1e-12
        s_lin = jnp.where(jnp.abs(c1) > 1e-12, -c0 / jnp.where(c1 == 0, 1, c1),
                          jnp.inf)
        q = -0.5 * (c1 + jnp.sign(c1) * sq)
        r1_ = jnp.where(is_quad, q / jnp.where(c2 == 0, 1, c2), s_lin)
        r2_ = jnp.where(is_quad & (jnp.abs(q) > 1e-20),
                        c0 / jnp.where(q == 0, 1, q), jnp.inf)
        ok1 = (disc >= 0) & (r1_ >= 0) & (r1_ <= smax)
        ok2 = (disc >= 0) & (r2_ >= 0) & (r2_ <= smax)
        s_hit = jnp.where(ok1 & ok2, jnp.minimum(r1_, r2_),
                          jnp.where(ok1, r1_, jnp.where(ok2, r2_, jnp.inf)))
        # an origin already below the surface counts as an immediate hit
        started_below = (c0 < 0.0)
        s_hit = jnp.where(started_below, 0.0, s_hit)
        new_hit = inside & ~found & jnp.isfinite(s_hit) & (t + s_hit <= tmax)
        t_hit = jnp.where(new_hit, t + s_hit, t_hit)
        found = found | new_hit
        # monotonic advance: f32 boundary times can round to just BEHIND
        # the current t (cells whose crossing we already passed), which
        # would reset t to the same value forever — always move forward
        t = jnp.where(found, t, jnp.maximum(t + eps, t_exit + eps))
        return (t, found, t_hit), None

    init = (jnp.zeros(N), jnp.zeros(N, bool), jnp.full((N,), _BIG))
    (t, found, t_hit), _ = jax.lax.scan(body, init, None, length=max_cells)
    return found, t_hit
