"""Static collision objects (cobjs) as fixed-shape SoA arrays + branchless
sphere-vs-shape narrow phase.

The reference's `coll_obj` supports cube / cylinder / sphere / rotated
cylinder / extruded polygon / capsule / torus (collision_detect.h:14,
class at :130) with per-shape sphere push-out in
`vert_coll_detector::check_cobj_intersect` (collision_detect.cpp:1027-1599).

TPU design: one padded SoA set for all cobjs; each shape test is a
branchless function of the unified parameter layout, evaluated for every
(object, cobj) pair under vmap/broadcast and masked by shape id — the
classic "compute all branches, select" trade that XLA maps well.  Scenes
have O(100-10K) cobjs; pair tests ride the VPU, with the pairwise-position
inner products on the MXU where applicable.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# collision_detect.h:14
COLL_NULL = 0
COLL_CUBE = 1
COLL_CYLINDER = 2       # axis-aligned vertical (p1.xy == p2.xy)
COLL_SPHERE = 3
COLL_CYLINDER_ROT = 4   # arbitrary axis
COLL_POLYGON = 5        # thickness-extruded planar polygon (tri/quad)
COLL_CAPSULE = 6
COLL_TORUS = 7

_EPS = 1e-12


class CobjSet(NamedTuple):
    """Padded SoA cobj scene.  `count` live entries; the rest COLL_NULL."""

    shape: jax.Array    # [M] int32 shape id (COLL_NULL = dead slot)
    p1: jax.Array       # [M,3] cube lo corner / cylinder-capsule end 1 / sphere center / polygon centroid
    p2: jax.Array       # [M,3] cube hi corner / cylinder-capsule end 2 / torus axis
    r1: jax.Array       # [M] sphere/cylinder/capsule radius 1 / torus ring radius / polygon thickness
    r2: jax.Array       # [M] cylinder radius 2 / torus tube radius
    # polygon support: up to 4 points + normal
    npts: jax.Array     # [M] int32 number of polygon points (0 for non-polys)
    pts: jax.Array      # [M,4,3]
    pnorm: jax.Array    # [M,3] polygon plane normal
    elasticity: jax.Array  # [M] cp.elastic
    friction: jax.Array    # [M] surface friction factor
    is_movable: jax.Array  # [M] bool
    # material / lighting properties (cobj_params: color, specular, shine)
    color_r: jax.Array     # [M]
    color_g: jax.Array
    color_b: jax.Array
    alpha: jax.Array
    specular: jax.Array
    shine: jax.Array

    @property
    def size(self) -> int:
        return self.shape.shape[0]


def empty_cobjs(capacity: int) -> CobjSet:
    z3 = jnp.zeros((capacity, 3), jnp.float32)
    z = jnp.zeros((capacity,), jnp.float32)
    return CobjSet(
        shape=jnp.zeros((capacity,), jnp.int32),
        p1=z3, p2=z3, r1=z, r2=z,
        npts=jnp.zeros((capacity,), jnp.int32),
        pts=jnp.zeros((capacity, 4, 3), jnp.float32),
        pnorm=z3,
        elasticity=z, friction=z,
        is_movable=jnp.zeros((capacity,), bool),
        color_r=jnp.ones((capacity,)), color_g=jnp.ones((capacity,)),
        color_b=jnp.ones((capacity,)), alpha=jnp.ones((capacity,)),
        specular=z, shine=jnp.ones((capacity,)),
    )


def sphere_cobj_test(px, py, pz, radius, c: CobjSet):
    """Batched sphere-vs-all-cobjs narrow phase, fully componentized.

    px/py/pz/radius: [N] object spheres; returns
    (pen [N,M], nx [N,M], ny [N,M], nz [N,M]) — signed penetration depth
    (>0 = intersecting) and outward contact normal components.

    LAYOUT NOTE (the whole point of this shape discipline): TPU tiles the
    last two dims as (sublane, lane)=(8,128).  An [N,M,3] normal tensor
    puts 3 in the lane dim -> ~2% lane utilization and a ~40x slowdown
    measured on v5e.  Component planes [N,M] keep every op fully tiled.
    Branchless: every shape formula is evaluated, then selected by shape id.
    """
    N = px.shape[0]
    M = c.size
    X = px[:, None]   # [N,1] vs [M]
    Y = py[:, None]
    Z = pz[:, None]
    r = radius[:, None]

    def norm3(ax, ay, az):
        d = jnp.sqrt(ax * ax + ay * ay + az * az)
        inv = 1.0 / jnp.maximum(d, _EPS)
        return d, ax * inv, ay * inv, az * inv

    # --- cube (collision_detect.cpp sphere-cube push-out) ---
    lox, hix = jnp.minimum(c.p1[:, 0], c.p2[:, 0]), jnp.maximum(c.p1[:, 0], c.p2[:, 0])
    loy, hiy = jnp.minimum(c.p1[:, 1], c.p2[:, 1]), jnp.maximum(c.p1[:, 1], c.p2[:, 1])
    loz, hiz = jnp.minimum(c.p1[:, 2], c.p2[:, 2]), jnp.maximum(c.p1[:, 2], c.p2[:, 2])
    cx = jnp.clip(X, lox, hix)
    cy = jnp.clip(Y, loy, hiy)
    cz = jnp.clip(Z, loz, hiz)
    dist_out, ox, oy, oz = norm3(X - cx, Y - cy, Z - cz)
    outside = dist_out > 1e-9
    # inside: push through the nearest slab face
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
    nxi = jnp.where(use_x, sxi, 0.0)
    nyi = jnp.where(use_y, syi, 0.0)
    nzi = jnp.where(use_z, szi, 0.0)
    pen_cube = jnp.where(outside, r - dist_out, r + din)
    nx_cube = jnp.where(outside, ox, nxi)
    ny_cube = jnp.where(outside, oy, nyi)
    nz_cube = jnp.where(outside, oz, nzi)

    # --- sphere ---
    dist, nx_sph, ny_sph, nz_sph = norm3(X - c.p1[:, 0], Y - c.p1[:, 1], Z - c.p1[:, 2])
    pen_sph = (r + c.r1) - dist

    # --- vertical cylinder (p1 bottom, p2 top) ---
    zlo = jnp.minimum(c.p1[:, 2], c.p2[:, 2])
    zhi = jnp.maximum(c.p1[:, 2], c.p2[:, 2])
    rxy = jnp.maximum(c.r1, c.r2)
    ddx, ddy = X - c.p1[:, 0], Y - c.p1[:, 1]
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

    # --- capsule / rotated cylinder: sphere-vs-segment, max radius ---
    abx = c.p2[:, 0] - c.p1[:, 0]
    aby = c.p2[:, 1] - c.p1[:, 1]
    abz = c.p2[:, 2] - c.p1[:, 2]
    ab2 = jnp.maximum(abx * abx + aby * aby + abz * abz, _EPS)
    t = jnp.clip(((X - c.p1[:, 0]) * abx + (Y - c.p1[:, 1]) * aby
                  + (Z - c.p1[:, 2]) * abz) / ab2, 0.0, 1.0)
    dist_seg, nx_cap, ny_cap, nz_cap = norm3(
        X - (c.p1[:, 0] + t * abx), Y - (c.p1[:, 1] + t * aby),
        Z - (c.p1[:, 2] + t * abz))
    pen_caps = (r + jnp.maximum(c.r1, c.r2)) - dist_seg

    # --- polygon (thin extruded): plane distance + inside test ---
    pnx, pny, pnz = c.pnorm[:, 0], c.pnorm[:, 1], c.pnorm[:, 2]
    dp = ((X - c.pts[:, 0, 0]) * pnx + (Y - c.pts[:, 0, 1]) * pny
          + (Z - c.pts[:, 0, 2]) * pnz)
    side = jnp.sign(dp)
    prx = X - dp * pnx
    pry = Y - dp * pny
    prz = Z - dp * pnz
    inside = jnp.ones_like(dp, dtype=bool)
    for k in range(4):
        ax_, ay_, az_ = c.pts[:, k, 0], c.pts[:, k, 1], c.pts[:, k, 2]
        nxt_ok = ((k + 1) % 4 < c.npts)
        bx_ = jnp.where(nxt_ok, c.pts[:, (k + 1) % 4, 0], c.pts[:, 0, 0])
        by_ = jnp.where(nxt_ok, c.pts[:, (k + 1) % 4, 1], c.pts[:, 0, 1])
        bz_ = jnp.where(nxt_ok, c.pts[:, (k + 1) % 4, 2], c.pts[:, 0, 2])
        ex, ey, ez = bx_ - ax_, by_ - ay_, bz_ - az_
        vx, vy, vz = prx - ax_, pry - ay_, prz - az_
        crx = ey * vz - ez * vy
        cry = ez * vx - ex * vz
        crz = ex * vy - ey * vx
        ok = (crx * pnx + cry * pny + crz * pnz) >= -1e-7
        inside = inside & jnp.where(k < c.npts, ok, True)
    pen_poly = jnp.where(inside, (r + 0.5 * c.r1) - jnp.abs(dp), -1.0)
    nx_pol, ny_pol, nz_pol = pnx * side, pny * side, pnz * side

    # --- torus (ring center p1, unit axis p2) ---
    tx, ty, tz = X - c.p1[:, 0], Y - c.p1[:, 1], Z - c.p1[:, 2]
    axx, axy, axz = c.p2[:, 0], c.p2[:, 1], c.p2[:, 2]
    axial = tx * axx + ty * axy + tz * axz
    rvx = tx - axial * axx
    rvy = ty - axial * axy
    rvz = tz - axial * axz
    radial = jnp.sqrt(rvx * rvx + rvy * rvy + rvz * rvz)
    rinv = c.r1 / jnp.maximum(radial, _EPS)
    dist_ring, nx_tor, ny_tor, nz_tor = norm3(tx - rvx * rinv, ty - rvy * rinv,
                                              tz - rvz * rinv)
    pen_torus = (r + c.r2) - dist_ring

    is_cube = c.shape == COLL_CUBE
    is_sph = c.shape == COLL_SPHERE
    is_cyl = c.shape == COLL_CYLINDER
    is_caps = (c.shape == COLL_CAPSULE) | (c.shape == COLL_CYLINDER_ROT)
    is_poly = c.shape == COLL_POLYGON
    is_tor = c.shape == COLL_TORUS
    sel = lambda vals: jnp.select([is_cube, is_sph, is_cyl, is_caps, is_poly, is_tor],
                                  vals, default=jnp.float32(0.0))
    pen = jnp.select([is_cube, is_sph, is_cyl, is_caps, is_poly, is_tor],
                     [pen_cube, pen_sph, pen_cyl, pen_caps, pen_poly, pen_torus],
                     default=jnp.float32(-1.0))
    nx = sel([nx_cube, nx_sph, nx_cyl, nx_cap, nx_pol, nx_tor])
    ny = sel([ny_cube, ny_sph, ny_cyl, ny_cap, ny_pol, ny_tor])
    nz = sel([nz_cube, nz_sph, nz_cyl, nz_cap, nz_pol, nz_tor])
    return pen, nx, ny, nz


def deepest_hits(px, py, pz, radius, c: CobjSet):
    """Batched argmax-penetration reduce over the scene.

    Returns (hit [N], pen [N], nx, ny, nz, elas, fric) of each object's
    deepest penetrating cobj; winner fields extracted by one-hot reduction
    (no gathers)."""
    pen, nx, ny, nz = sphere_cobj_test(px, py, pz, radius, c)
    pen = jnp.where(c.shape != COLL_NULL, pen, -1.0)
    i = jnp.argmax(pen, axis=-1)
    oh = (i[:, None] == jnp.arange(c.size, dtype=jnp.int32)[None, :]).astype(px.dtype)
    best = jnp.sum(pen * oh, axis=-1)
    return (best > 0.0, best,
            jnp.sum(nx * oh, -1), jnp.sum(ny * oh, -1), jnp.sum(nz * oh, -1),
            oh @ c.elasticity, oh @ c.friction)
