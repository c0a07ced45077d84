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
    # scene-DSL properties (build_world.cpp: Q platforms, density/metalness/
    # damage keywords, 'l' light_atten/refract_ix, 'a' destroyability)
    platform_id: jax.Array  # [M] int32, -1 = not on a platform
    density: jax.Array      # [M] cp.density (movable mass = density*volume)
    metalness: jax.Array    # [M]
    damage: jax.Array       # [M] contact damage/sec
    light_atten: jax.Array  # [M] volume light attenuation ('l' optional)
    refract_ix: jax.Array   # [M] refraction index ('l' optional)
    destroy: jax.Array      # [M] int32 destroyability level ('a')

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
        platform_id=jnp.full((capacity,), -1, jnp.int32),
        density=jnp.ones((capacity,)), metalness=z, damage=z,
        light_atten=z, refract_ix=jnp.ones((capacity,)),
        destroy=jnp.zeros((capacity,), jnp.int32),
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

    # --- capsule: sphere-vs-segment with the per-t interpolated radius
    # (the reference tests end spheres r1/r2 + the side at
    # rad=r1+t*(r2-r1): collision_detect.cpp:1384-1388 + Math3d.cpp:736) ---
    abx = c.p2[:, 0] - c.p1[:, 0]
    aby = c.p2[:, 1] - c.p1[:, 1]
    abz = c.p2[:, 2] - c.p1[:, 2]
    ab2 = jnp.maximum(abx * abx + aby * aby + abz * abz, _EPS)
    t = jnp.clip(((X - c.p1[:, 0]) * abx + (Y - c.p1[:, 1]) * aby
                  + (Z - c.p1[:, 2]) * abz) / ab2, 0.0, 1.0)
    dist_seg, nx_cap, ny_cap, nz_cap = norm3(
        X - (c.p1[:, 0] + t * abx), Y - (c.p1[:, 1] + t * aby),
        Z - (c.p1[:, 2] + t * abz))
    rad_t = c.r1 + t * (c.r2 - c.r1)
    pen_caps = (r + rad_t) - dist_seg

    # --- rotated cylinder: EXACT per-t tapered radius + flat end caps
    # (sphere_intersect_cylinder_ipt, Math3d.cpp:731-830: side candidate
    # at rad=r1+t*(r2-r1)+sr with a radial normal, end candidate pushing
    # along the axis, nearest displacement wins) ---
    leninv = jax.lax.rsqrt(ab2)
    length = ab2 * leninv
    t_un = ((X - c.p1[:, 0]) * abx + (Y - c.p1[:, 1]) * aby
            + (Z - c.p1[:, 2]) * abz) / ab2
    t_cl = jnp.clip(t_un, 0.0, 1.0)
    # pure radial perpendicular (unclamped projection)
    px_ = X - (c.p1[:, 0] + t_un * abx)
    py_ = Y - (c.p1[:, 1] + t_un * aby)
    pz_ = Z - (c.p1[:, 2] + t_un * abz)
    rdist, rnx, rny, rnz = norm3(px_, py_, pz_)
    rad_tc = c.r1 + t_cl * (c.r2 - c.r1)
    in_t = (t_un >= 0.0) & (t_un <= 1.0)
    pen_s = (rad_tc + r) - rdist                      # side candidate
    side_ok = in_t & (pen_s > 0.0)
    # end candidate: nearer end, push along +-axis (flat cap)
    d_end = t_un > 0.5
    end_r = jnp.where(d_end, c.r2, c.r1)
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
    is_caps = c.shape == COLL_CAPSULE
    is_rcyl = c.shape == COLL_CYLINDER_ROT
    is_poly = c.shape == COLL_POLYGON
    is_tor = c.shape == COLL_TORUS
    preds = [is_cube, is_sph, is_cyl, is_caps, is_rcyl, is_poly, is_tor]
    sel = lambda vals: jnp.select(preds, vals, default=jnp.float32(0.0))
    pen = jnp.select(preds,
                     [pen_cube, pen_sph, pen_cyl, pen_caps, pen_rcyl,
                      pen_poly, pen_torus],
                     default=jnp.float32(-1.0))
    nx = sel([nx_cube, nx_sph, nx_cyl, nx_cap, nx_rcyl, nx_pol, nx_tor])
    ny = sel([ny_cube, ny_sph, ny_cyl, ny_cap, ny_rcyl, ny_pol, ny_tor])
    nz = sel([nz_cube, nz_sph, nz_cyl, nz_cap, nz_rcyl, nz_pol, nz_tor])
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


# ---------------------------------------------------------------------------
# shape-grouped narrow phase: each cobj evaluated by its own formula only
# ---------------------------------------------------------------------------

class GroupedCobjs:
    """CobjSet sorted by shape with STATIC per-shape counts.

    The branchless `sphere_cobj_test` evaluates all 6 shape formulas for
    every cobj slot and selects — simple, but 6x the VPU work.  Scenes
    are concrete at build time, so we can sort cobjs by shape on the
    host, pad each group to a multiple of 8 (sublane tile), and record
    the group extents statically; the grouped test then runs each
    formula only on its own slice.  Registered as a pytree with the
    counts in aux_data, so jit specializes per grouping (collision
    semantics identical; only slot order differs, which can flip exact
    argmax ties between coincident cobjs).
    """

    #      cube, sphere, cyl, capsule, poly, torus, rot-cylinder
    SHAPE_ORDER = (COLL_CUBE, COLL_SPHERE, COLL_CYLINDER, COLL_CAPSULE,
                   COLL_POLYGON, COLL_TORUS, COLL_CYLINDER_ROT)

    def __init__(self, cobjs: CobjSet, bounds: tuple):
        self.cobjs = cobjs          # sorted + padded CobjSet
        self.bounds = bounds        # ((start, stop) per SHAPE_ORDER entry)

    @property
    def size(self):
        return self.cobjs.size


def _gc_flatten(g):
    return (g.cobjs,), g.bounds


def _gc_unflatten(aux, children):
    return GroupedCobjs(children[0], aux)


jax.tree_util.register_pytree_node(GroupedCobjs, _gc_flatten, _gc_unflatten)


def group_cobjs(c: CobjSet, pad_to: int = 8) -> GroupedCobjs:
    """Host-side: sort by shape class, pad each group to `pad_to`.
    Requires concrete (non-traced) arrays."""
    shape = np.asarray(c.shape)
    cls_of = {COLL_CUBE: 0, COLL_SPHERE: 1, COLL_CYLINDER: 2,
              COLL_CAPSULE: 3, COLL_POLYGON: 4, COLL_TORUS: 5,
              COLL_CYLINDER_ROT: 6}
    groups = [[] for _ in range(7)]
    for i, s in enumerate(shape):
        if s in cls_of:
            groups[cls_of[s]].append(i)
    # index list with dead padding rows appended per group; bounds track
    # each group's live extent in the packed order
    idx = []
    bounds = []
    for g in groups:
        bounds.append((len(idx), len(idx) + len(g)))
        idx.extend(g)
        npad = (-len(g)) % pad_to if g else 0
        idx.extend([len(shape)] * npad)   # map to an appended dead slot
    if not idx:
        idx = [len(shape)] * pad_to
        bounds = [(0, 0)] * 7

    def take(a):
        a = np.asarray(a)
        dead = np.zeros((1,) + a.shape[1:], a.dtype)
        return jnp.asarray(np.concatenate([a, dead])[np.asarray(idx)])

    packed = CobjSet(*(take(f) for f in c))
    # dead pads keep shape COLL_NULL (zeros) -> pen forced to -1
    return GroupedCobjs(packed, tuple(bounds))


def _norm3(ax, ay, az):
    d = jnp.sqrt(ax * ax + ay * ay + az * az)
    inv = 1.0 / jnp.maximum(d, _EPS)
    return d, ax * inv, ay * inv, az * inv


def sphere_cobj_test_grouped(px, py, pz, radius, g: GroupedCobjs):
    """Grouped narrow phase: same outputs as `sphere_cobj_test` on the
    sorted set, ~6x less VPU work on mixed scenes."""
    c = g.cobjs
    M = c.size
    X = px[:, None]
    Y = py[:, None]
    Z = pz[:, None]
    r = radius[:, None]
    N = px.shape[0]
    pen = jnp.full((N, M), -1.0)
    nx = jnp.zeros((N, M))
    ny = jnp.zeros((N, M))
    nz = jnp.zeros((N, M))

    def put(lo, hi, p, a, b, cc):
        return (pen.at[:, lo:hi].set(p), nx.at[:, lo:hi].set(a),
                ny.at[:, lo:hi].set(b), nz.at[:, lo:hi].set(cc))

    sl = lambda a, lo, hi: a[lo:hi]
    b = g.bounds

    # cube group
    lo, hi = b[0]
    if hi > lo:
        p1x, p1y, p1z = sl(c.p1[:, 0], lo, hi), sl(c.p1[:, 1], lo, hi), sl(c.p1[:, 2], lo, hi)
        p2x, p2y, p2z = sl(c.p2[:, 0], lo, hi), sl(c.p2[:, 1], lo, hi), sl(c.p2[:, 2], lo, hi)
        lox, hix = jnp.minimum(p1x, p2x), jnp.maximum(p1x, p2x)
        loy, hiy = jnp.minimum(p1y, p2y), jnp.maximum(p1y, p2y)
        loz, hiz = jnp.minimum(p1z, p2z), jnp.maximum(p1z, p2z)
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
        pen, nx, ny, nz = put(
            lo, hi, jnp.where(outside, r - dist_out, r + din),
            jnp.where(outside, ox, jnp.where(use_x, jnp.where(dxl < dxh, -1.0, 1.0), 0.0)),
            jnp.where(outside, oy, jnp.where(use_y, jnp.where(dyl < dyh, -1.0, 1.0), 0.0)),
            jnp.where(outside, oz, jnp.where(use_z, jnp.where(dzl < dzh, -1.0, 1.0), 0.0)))

    # sphere group
    lo, hi = b[1]
    if hi > lo:
        dist, sx, sy, sz = _norm3(X - sl(c.p1[:, 0], lo, hi),
                                  Y - sl(c.p1[:, 1], lo, hi),
                                  Z - sl(c.p1[:, 2], lo, hi))
        pen, nx, ny, nz = put(lo, hi, (r + sl(c.r1, lo, hi)) - dist, sx, sy, sz)

    # vertical cylinder group
    lo, hi = b[2]
    if hi > lo:
        p1z_ = sl(c.p1[:, 2], lo, hi)
        p2z_ = sl(c.p2[:, 2], lo, hi)
        zlo = jnp.minimum(p1z_, p2z_)
        zhi = jnp.maximum(p1z_, p2z_)
        rxy = jnp.maximum(sl(c.r1, lo, hi), sl(c.r2, lo, hi))
        ddx = X - sl(c.p1[:, 0], lo, hi)
        ddy = Y - sl(c.p1[:, 1], lo, hi)
        dist_xy = jnp.sqrt(ddx * ddx + ddy * ddy)
        inv_xy = 1.0 / jnp.maximum(dist_xy, _EPS)
        in_z = (Z > zlo - r) & (Z < zhi + r)
        pen_side = (r + rxy) - dist_xy
        top_pen = (zhi + r) - Z
        bot_pen = Z - (zlo - r)
        cap_is_top = top_pen < bot_pen
        pen_cap = jnp.minimum(top_pen, bot_pen)
        use_cap = (dist_xy < rxy) & (pen_cap < pen_side)
        pen, nx, ny, nz = put(
            lo, hi,
            jnp.where(in_z & (dist_xy < rxy + r),
                      jnp.where(use_cap, pen_cap, pen_side), -1.0),
            jnp.where(use_cap, 0.0, ddx * inv_xy),
            jnp.where(use_cap, 0.0, ddy * inv_xy),
            jnp.where(use_cap, jnp.where(cap_is_top, 1.0, -1.0), 0.0))

    # capsule group: per-t interpolated radius (see sphere_cobj_test)
    lo, hi = b[3]
    if hi > lo:
        p1x_, p1y_, p1z_ = (sl(c.p1[:, k], lo, hi) for k in range(3))
        abx = sl(c.p2[:, 0], lo, hi) - p1x_
        aby = sl(c.p2[:, 1], lo, hi) - p1y_
        abz = sl(c.p2[:, 2], lo, hi) - p1z_
        ab2 = jnp.maximum(abx * abx + aby * aby + abz * abz, _EPS)
        t = jnp.clip(((X - p1x_) * abx + (Y - p1y_) * aby
                      + (Z - p1z_) * abz) / ab2, 0.0, 1.0)
        dist_seg, sx, sy, sz = _norm3(X - (p1x_ + t * abx),
                                      Y - (p1y_ + t * aby),
                                      Z - (p1z_ + t * abz))
        rad_t = sl(c.r1, lo, hi) + t * (sl(c.r2, lo, hi) - sl(c.r1, lo, hi))
        pen, nx, ny, nz = put(lo, hi, (r + rad_t) - dist_seg, sx, sy, sz)

    # polygon group
    lo, hi = b[4]
    if hi > lo:
        pnx = sl(c.pnorm[:, 0], lo, hi)
        pny = sl(c.pnorm[:, 1], lo, hi)
        pnz = sl(c.pnorm[:, 2], lo, hi)
        npts = sl(c.npts, lo, hi)
        pts = c.pts[lo:hi]
        dp = ((X - pts[:, 0, 0]) * pnx + (Y - pts[:, 0, 1]) * pny
              + (Z - pts[:, 0, 2]) * pnz)
        side = jnp.sign(dp)
        prx = X - dp * pnx
        pry = Y - dp * pny
        prz = Z - dp * pnz
        inside = jnp.ones_like(dp, dtype=bool)
        for k in range(4):
            ax_, ay_, az_ = pts[:, k, 0], pts[:, k, 1], pts[:, k, 2]
            nxt_ok = ((k + 1) % 4 < npts)
            bx_ = jnp.where(nxt_ok, pts[:, (k + 1) % 4, 0], pts[:, 0, 0])
            by_ = jnp.where(nxt_ok, pts[:, (k + 1) % 4, 1], pts[:, 0, 1])
            bz_ = jnp.where(nxt_ok, pts[:, (k + 1) % 4, 2], pts[:, 0, 2])
            ex, ey, ez = bx_ - ax_, by_ - ay_, bz_ - az_
            vx_, vy_, vz_ = prx - ax_, pry - ay_, prz - az_
            crx = ey * vz_ - ez * vy_
            cry = ez * vx_ - ex * vz_
            crz = ex * vy_ - ey * vx_
            ok = (crx * pnx + cry * pny + crz * pnz) >= -1e-7
            inside = inside & jnp.where(k < npts, ok, True)
        pen, nx, ny, nz = put(
            lo, hi,
            jnp.where(inside, (r + 0.5 * sl(c.r1, lo, hi)) - jnp.abs(dp), -1.0),
            pnx * side, pny * side, pnz * side)

    # torus group
    lo, hi = b[5]
    if hi > lo:
        tx = X - sl(c.p1[:, 0], lo, hi)
        ty = Y - sl(c.p1[:, 1], lo, hi)
        tz = Z - sl(c.p1[:, 2], lo, hi)
        axx = sl(c.p2[:, 0], lo, hi)
        axy = sl(c.p2[:, 1], lo, hi)
        axz = sl(c.p2[:, 2], lo, hi)
        axial = tx * axx + ty * axy + tz * axz
        rvx = tx - axial * axx
        rvy = ty - axial * axy
        rvz = tz - axial * axz
        radial = jnp.sqrt(rvx * rvx + rvy * rvy + rvz * rvz)
        rinv = sl(c.r1, lo, hi) / jnp.maximum(radial, _EPS)
        dist_ring, sx, sy, sz = _norm3(tx - rvx * rinv, ty - rvy * rinv,
                                       tz - rvz * rinv)
        pen, nx, ny, nz = put(lo, hi, (r + sl(c.r2, lo, hi)) - dist_ring,
                              sx, sy, sz)

    # rotated-cylinder group: EXACT taper + flat end caps
    # (sphere_intersect_cylinder_ipt, Math3d.cpp:731-830)
    lo, hi = b[6] if len(b) > 6 else (0, 0)
    if hi > lo:
        p1x_, p1y_, p1z_ = (sl(c.p1[:, k], lo, hi) for k in range(3))
        abx = sl(c.p2[:, 0], lo, hi) - p1x_
        aby = sl(c.p2[:, 1], lo, hi) - p1y_
        abz = sl(c.p2[:, 2], lo, hi) - p1z_
        ab2 = jnp.maximum(abx * abx + aby * aby + abz * abz, _EPS)
        leninv = jax.lax.rsqrt(ab2)
        length = ab2 * leninv
        r1_, r2_ = sl(c.r1, lo, hi), sl(c.r2, lo, hi)
        t_un = ((X - p1x_) * abx + (Y - p1y_) * aby + (Z - p1z_) * abz) / ab2
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
        # cap gate is the reference's exact condition
        # (sphere_intersect_cylinder_ipt, Math3d.cpp:803:
        # fabs(tv_clamped)*len < min(sr, rdist)) — a sphere that tunnels
        # past the cap deep on-axis resolves via the side candidate,
        # faithfully matching the reference's behavior
        end_ok = (end_r > 0.0) & (tv_cl < jnp.minimum(r, rdist)) \
            & (rdist <= rad_tc + r) & (pen_e > 0.0)
        sgn = jnp.where(d_end, 1.0, -1.0)
        use_end = end_ok & (~side_ok | (pen_e < pen_s))
        pen, nx, ny, nz = put(
            lo, hi,
            jnp.where(use_end, pen_e, jnp.where(side_ok, pen_s, -1.0)),
            jnp.where(use_end, sgn * abx * leninv, rnx),
            jnp.where(use_end, sgn * aby * leninv, rny),
            jnp.where(use_end, sgn * abz * leninv, rnz))

    pen = jnp.where(c.shape[None, :] != COLL_NULL, pen, -1.0)
    return pen, nx, ny, nz


def deepest_hits_grouped(px, py, pz, radius, g: GroupedCobjs):
    """`deepest_hits` over a grouped set."""
    pen, nx, ny, nz = sphere_cobj_test_grouped(px, py, pz, radius, g)
    c = g.cobjs
    i = jnp.argmax(pen, axis=-1)
    oh = (i[:, None] == jnp.arange(c.size, dtype=jnp.int32)[None, :]).astype(px.dtype)
    best = jnp.sum(pen * oh, axis=-1)
    return (best > 0.0, best,
            jnp.sum(nx * oh, -1), jnp.sum(ny * oh, -1), jnp.sum(nz * oh, -1),
            oh @ c.elasticity, oh @ c.friction)
