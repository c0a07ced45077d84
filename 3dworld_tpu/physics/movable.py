"""Movable cobjs: quasi-rigid pushing with blocking checks.

The reference's movable cobjs support push/pull with stacking support
checks, tipping via convex-hull-over-contacts, and binary-search
penetration resolution (movable_cobj.cpp:25,189,408,599,715).

Here: the push core — objects (or the player) colliding with a movable
cobj accumulate horizontal push; the cobj translates if the destination
is free (cube-vs-cube overlap test against all other cobjs) and supported
(something under it); unsupported movables fall.  Tipping/rotation is a
later round.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cobjs import CobjSet, COLL_NULL, COLL_CUBE


def _cube_overlap(lo_a, hi_a, lo_b, hi_b):
    """[M] vs [M] pairwise cube overlap -> [M, M] bool."""
    sep = (hi_a[:, None, 0] <= lo_b[None, :, 0]) | (hi_b[None, :, 0] <= lo_a[:, None, 0]) | \
          (hi_a[:, None, 1] <= lo_b[None, :, 1]) | (hi_b[None, :, 1] <= lo_a[:, None, 1]) | \
          (hi_a[:, None, 2] <= lo_b[None, :, 2]) | (hi_b[None, :, 2] <= lo_a[:, None, 2])
    return ~sep


@jax.jit
def push_movable_cobjs(cobjs: CobjSet, push_x, push_y,
                       max_step: float = 0.05,
                       bisect_iters: int = 6) -> CobjSet:
    """Apply accumulated per-cobj horizontal pushes (push_cobj).

    push_x/push_y: [M] desired motion.  Instead of all-or-nothing, the
    largest collision-free FRACTION of each cobj's delta is found by
    bisection — the reference's binary_step_moving_cobj_delta
    (movable_cobj.cpp:715-737) as a branchless lockstep search: test the
    full move, then bisect t in [0, 1] against the blocking set.
    Obstacles resting ON TOP of the moving cobj (stacked movables) are
    ignored, as in the reference's flat-top skip."""
    lo = jnp.minimum(cobjs.p1, cobjs.p2)
    hi = jnp.maximum(cobjs.p1, cobjs.p2)
    live = cobjs.shape != COLL_NULL
    mv = cobjs.is_movable & live & (cobjs.shape == COLL_CUBE)
    dx = jnp.clip(push_x, -max_step, max_step) * mv
    dy = jnp.clip(push_y, -max_step, max_step) * mv
    d = jnp.stack([dx, dy, jnp.zeros_like(dx)], -1)
    M = cobjs.size
    ii = jnp.arange(M)
    other = (ii[:, None] != ii[None, :]) & live[None, :]
    # stacked-movable skip: obstacle RESTS ON this cobj — xy overlap and
    # its bottom at/above our top (not merely "center higher", which
    # would also skip tall movables standing beside us)
    xy_ov0 = (hi[:, None, 0] > lo[None, :, 0]) & (lo[:, None, 0] < hi[None, :, 0]) & \
             (hi[:, None, 1] > lo[None, :, 1]) & (lo[:, None, 1] < hi[None, :, 1])
    riding = cobjs.is_movable[None, :] & xy_ov0 \
        & (lo[None, :, 2] >= hi[:, 2][:, None] - 1e-3)
    obst = other & ~riding
    # obstacles that are themselves moving this call are tested as their
    # SWEPT box (union of start and destination) so two cobjs pushed
    # toward each other can't both validate against the other's stale
    # position and end interpenetrating
    lo_sw = lo + jnp.minimum(d, 0.0)
    hi_sw = hi + jnp.maximum(d, 0.0)

    def free_at(t):
        lo2 = lo + t[:, None] * d
        hi2 = hi + t[:, None] * d
        ov = _cube_overlap(lo2, hi2, lo_sw, hi_sw)
        return ~jnp.any(ov & obst, axis=1)

    one = jnp.ones((M,))
    full_ok = free_at(one)
    # bisect between t_lo (known free: 0) and t_hi (known blocked: 1)
    t_lo = jnp.zeros((M,))
    t_hi = one

    def body(_, c):
        tl, th = c
        tm = 0.5 * (tl + th)
        ok = free_at(tm)
        return (jnp.where(ok, tm, tl), jnp.where(ok, th, tm))

    t_lo, t_hi = jax.lax.fori_loop(0, bisect_iters, body, (t_lo, t_hi))
    t = jnp.where(full_ok, 1.0, t_lo)
    delta = d * (t * mv)[:, None]
    return cobjs._replace(p1=cobjs.p1 + delta, p2=cobjs.p2 + delta)


@jax.jit
def settle_movable_cobjs(cobjs: CobjSet, mesh_min_z, fall_step: float = 0.02):
    """Unsupported movable cubes fall (check_cobj_fall): supported if
    another cobj's top touches the bottom, or resting at mesh_min_z."""
    lo = jnp.minimum(cobjs.p1, cobjs.p2)
    hi = jnp.maximum(cobjs.p1, cobjs.p2)
    live = cobjs.shape != COLL_NULL
    mv = cobjs.is_movable & live & (cobjs.shape == COLL_CUBE)
    # support: xy overlap with another cobj whose top is at our bottom
    xy_ov = (hi[:, None, 0] > lo[None, :, 0]) & (lo[:, None, 0] < hi[None, :, 0]) & \
            (hi[:, None, 1] > lo[None, :, 1]) & (lo[:, None, 1] < hi[None, :, 1])
    touch = jnp.abs(lo[:, None, 2] - hi[None, :, 2]) < 1e-3
    M = cobjs.size
    ii = jnp.arange(M)
    others = ii[:, None] != ii[None, :]
    supported = jnp.any(xy_ov & touch & live[None, :] & others, axis=1)
    on_ground = lo[:, 2] <= mesh_min_z + 1e-3
    fall = mv & ~supported & ~on_ground
    # clamp the step to land exactly on the highest cobj top below us
    # (else a gap in (1e-3, fall_step] steps PAST the support and the
    # object tunnels through it on the next pass)
    below_top = jnp.where(
        xy_ov & live[None, :] & others
        & (hi[None, :, 2] <= lo[:, None, 2] + 1e-6),
        hi[None, :, 2], -jnp.inf)
    support_z = jnp.maximum(jnp.max(below_top, axis=1),
                            jnp.asarray(mesh_min_z, lo.dtype))
    dz = -jnp.minimum(fall_step, lo[:, 2] - support_z) * fall
    delta = jnp.stack([jnp.zeros_like(dz), jnp.zeros_like(dz), dz], -1)
    return cobjs._replace(p1=cobjs.p1 + delta, p2=cobjs.p2 + delta)


def object_pushes(cobjs: CobjSet, px, py, pz, vx, vy, rad, mass,
                  strength: float = 0.02):
    """Per-cobj push accumulated from objects intersecting movable cubes
    (momentum-weighted, horizontal)."""
    lo = jnp.minimum(cobjs.p1, cobjs.p2)
    hi = jnp.maximum(cobjs.p1, cobjs.p2)
    X = px[:, None]
    Y = py[:, None]
    Z = pz[:, None]
    inside = ((X > lo[None, :, 0] - rad[:, None]) & (X < hi[None, :, 0] + rad[:, None])
              & (Y > lo[None, :, 1] - rad[:, None]) & (Y < hi[None, :, 1] + rad[:, None])
              & (Z > lo[None, :, 2]) & (Z < hi[None, :, 2] + rad[:, None]))
    ins = inside.astype(jnp.float32)
    return (vx * mass) @ ins * strength, (vy * mass) @ ins * strength


# ---------------------------------------------------------------------------
# tipping (movable_cobj.cpp:455-545 support/resting normals + rotate_about)
# ---------------------------------------------------------------------------

def support_region(cobjs: CobjSet, i: int, mesh_min_z: float):
    """XY extent of what holds cube `i` up: the union bounds of all
    overlapping tops touching its bottom (or its own footprint on the
    ground).  Returns (x1, y1, x2, y2) or None if unsupported."""
    import numpy as np
    lo = np.minimum(np.asarray(cobjs.p1), np.asarray(cobjs.p2))
    hi = np.maximum(np.asarray(cobjs.p1), np.asarray(cobjs.p2))
    live = np.asarray(cobjs.shape) != COLL_NULL
    if lo[i, 2] <= mesh_min_z + 1e-3:
        return (lo[i, 0], lo[i, 1], hi[i, 0], hi[i, 1])
    sup = None
    for j in range(cobjs.size):
        if j == i or not live[j]:
            continue
        if abs(lo[i, 2] - hi[j, 2]) > 1e-3:
            continue
        x1 = max(lo[i, 0], lo[j, 0]); x2 = min(hi[i, 0], hi[j, 0])
        y1 = max(lo[i, 1], lo[j, 1]); y2 = min(hi[i, 1], hi[j, 1])
        if x2 <= x1 or y2 <= y1:
            continue
        sup = ((x1, y1, x2, y2) if sup is None else
               (min(sup[0], x1), min(sup[1], y1),
                max(sup[2], x2), max(sup[3], y2)))
    return sup


def check_unstable(cobjs: CobjSet, i: int, mesh_min_z: float):
    """Center-of-mass-over-support test: returns the tip direction
    (+/-1, dim) if the COM hangs past a support edge, else None.
    (The reference reaches the same outcome through
    get_cobj_supporting_normal returning zero at the COM.)"""
    import numpy as np
    lo = np.minimum(np.asarray(cobjs.p1), np.asarray(cobjs.p2))
    hi = np.maximum(np.asarray(cobjs.p1), np.asarray(cobjs.p2))
    sup = support_region(cobjs, i, mesh_min_z)
    if sup is None:
        return None  # free fall, not a tip
    cx = 0.5 * (lo[i, 0] + hi[i, 0])
    cy = 0.5 * (lo[i, 1] + hi[i, 1])
    if cx < sup[0]:
        return (-1, 0)
    if cx > sup[2]:
        return (+1, 0)
    if cy < sup[1]:
        return (-1, 1)
    if cy > sup[3]:
        return (+1, 1)
    return None


def tip_cube(cobjs: CobjSet, i: int, direction, mesh_min_z: float = None,
             angle_deg: float = 90.0) -> CobjSet:
    """Tip cube `i` about its bottom support edge: the cube becomes an
    extruded COLL_POLYGON (the reference's rotate_about converts rotated
    cubes to polygon cobjs — coll_obj::was_a_cube).

    direction: (+/-1, dim) from `check_unstable`.  angle_deg=90 lands it
    flat on the adjacent face (the terminal state of the tip
    integration); smaller angles give the in-flight pose.
    """
    import numpy as np
    sgn, dim = direction
    lo = np.minimum(np.asarray(cobjs.p1[i]), np.asarray(cobjs.p2[i]))
    hi = np.maximum(np.asarray(cobjs.p1[i]), np.asarray(cobjs.p2[i]))
    # pivot edge: bottom edge on the tipping side
    piv = hi[dim] if sgn > 0 else lo[dim]
    pz = lo[2]
    # tipping toward +dim rotates d' = d cos(th) - z sin(th),
    # z' = d sin(th) + z cos(th) with th = -90 deg so the point directly
    # above the pivot (d=0, z=1) lands BEYOND it at (d=1, z=0); the +sgn
    # convention would mirror the cube through the pivot and underground
    th = -np.radians(angle_deg) * sgn
    c, s = np.cos(th), np.sin(th)
    odim = 1 - dim

    def rot(p):
        """rotate about the pivot edge (axis = odim horizontal axis)"""
        d, z = p[dim] - piv, p[2] - pz
        return np.array([
            piv + (d * c - z * s) if k == dim else
            (pz + (d * s + z * c) if k == 2 else p[k])
            for k in range(3)])

    # the face quad that was vertical on the far side becomes the new
    # footprint; represent the whole box as that quad extruded by the
    # box depth along its (rotated) normal
    depth = hi[dim] - lo[dim]
    far = lo[dim] if sgn > 0 else hi[dim]
    quad = []
    for (a, b) in ((lo[odim], lo[2]), (hi[odim], lo[2]),
                   (hi[odim], hi[2]), (lo[odim], hi[2])):
        p = np.zeros(3)
        p[dim], p[odim], p[2] = far, a, b
        quad.append(rot(p))
    quad = np.stack(quad)
    # outward normal of the far face (-sgn along dim), rotated in the
    # (dim, z) plane — built componentwise so it is correct for dim=1 too
    nr = np.zeros(3)
    nr[dim] = -sgn * c
    nr[2] = -sgn * s
    nr = nr / max(np.linalg.norm(nr), 1e-12)
    # the quad is an OUTER face of the slab; the polygon plane is the
    # slab CENTER (pen = r + r1/2 - |dp|), so shift half the depth
    # inward, against the outward normal
    center_quad = quad - 0.5 * depth * nr
    from .cobjs import COLL_POLYGON
    pts = np.asarray(cobjs.pts).copy()
    pts[i, :4] = center_quad
    return cobjs._replace(
        shape=cobjs.shape.at[i].set(COLL_POLYGON),
        pts=jnp.asarray(pts),
        pnorm=cobjs.pnorm.at[i].set(jnp.asarray(nr, jnp.float32)),
        npts=cobjs.npts.at[i].set(4),
        r1=cobjs.r1.at[i].set(float(depth)),
    )


def apply_tipping(cobjs: CobjSet, mesh_min_z: float) -> CobjSet:
    """Tip every unstable movable cube (one settle pass)."""
    import numpy as np
    mv = np.asarray(cobjs.is_movable) & (np.asarray(cobjs.shape) == COLL_CUBE)
    for i in np.where(mv)[0]:
        d = check_unstable(cobjs, int(i), mesh_min_z)
        if d is not None:
            cobjs = tip_cube(cobjs, int(i), d, mesh_min_z)
    return cobjs


# ---------------------------------------------------------------------------
# hull-based rotate-to-rest (get_cobj_rot_axis, movable_cobj.cpp:599-615)
# ---------------------------------------------------------------------------

def support_points(cobjs: CobjSet, i: int, mesh_min_z: float):
    """Support CONTACT POINTS under cobj i (the reference collects the
    supported bottom points / overlap corners rather than a single
    rect): corners of each supporting-top overlap region, in xy."""
    import numpy as np
    lo = np.minimum(np.asarray(cobjs.p1), np.asarray(cobjs.p2))
    hi = np.maximum(np.asarray(cobjs.p1), np.asarray(cobjs.p2))
    live = np.asarray(cobjs.shape) != COLL_NULL
    pts = []
    if lo[i, 2] <= mesh_min_z + 1e-3:       # resting on the ground
        pts += [(lo[i, 0], lo[i, 1]), (hi[i, 0], lo[i, 1]),
                (hi[i, 0], hi[i, 1]), (lo[i, 0], hi[i, 1])]
    for j in range(cobjs.size):
        if j == i or not live[j]:
            continue
        if abs(lo[i, 2] - hi[j, 2]) > 1e-3:
            continue
        x1 = max(lo[i, 0], lo[j, 0]); x2 = min(hi[i, 0], hi[j, 0])
        y1 = max(lo[i, 1], lo[j, 1]); y2 = min(hi[i, 1], hi[j, 1])
        if x2 <= x1 or y2 <= y1:
            continue
        pts += [(x1, y1), (x2, y1), (x2, y2), (x1, y2)]
    return np.asarray(pts, np.float64).reshape(-1, 2)


def convex_hull_2d(pts):
    """Monotone-chain hull (convex_hull in the reference), CCW."""
    import numpy as np
    P = sorted(map(tuple, pts))
    if len(P) <= 2:
        return np.asarray(P, np.float64)
    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])) <= 0:
                out.pop()
            out.append(p)
        return out[:-1]
    return np.asarray(half(P) + half(P[::-1]), np.float64)


def _closest_on_segment(a, b, p):
    import numpy as np
    ab = b - a
    t = float(np.clip(np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-18), 0, 1))
    return a + t * ab


def get_cobj_rot_axis(cobjs: CobjSet, i: int, mesh_min_z: float):
    """The reference's rotate-to-rest decision (get_cobj_rot_axis,
    movable_cobj.cpp:599): convex hull of support points; COM inside the
    hull -> stable (None); otherwise (pivot_point_xy, axis_xy) where the
    axis is the horizontal lever perpendicular (gravity x lever), so
    diagonal supports tip about DIAGONAL axes — not just +-x/+-y."""
    import numpy as np
    sp = support_points(cobjs, i, mesh_min_z)
    if len(sp) == 0:
        return None                      # free fall, not a tip
    lo = np.minimum(np.asarray(cobjs.p1[i]), np.asarray(cobjs.p2[i]))
    hi = np.maximum(np.asarray(cobjs.p1[i]), np.asarray(cobjs.p2[i]))
    com = 0.5 * (lo[:2] + hi[:2])
    if len(sp) == 1:
        closest = sp[0]
    elif len(sp) == 2:
        closest = _closest_on_segment(sp[0], sp[1], com)
    else:
        hull = convex_hull_2d(sp)
        if len(hull) >= 3:
            inside = True
            for k in range(len(hull)):
                a = hull[k]
                b = hull[(k + 1) % len(hull)]
                cr = (b[0] - a[0]) * (com[1] - a[1]) \
                    - (b[1] - a[1]) * (com[0] - a[0])
                if cr < -1e-12:
                    inside = False
                    break
            if inside:
                return None              # COM over the support hull
            closest = min((_closest_on_segment(hull[k],
                                               hull[(k + 1) % len(hull)],
                                               com)
                           for k in range(len(hull))),
                          key=lambda q: float(np.hypot(*(com - q))))
        else:
            closest = _closest_on_segment(hull[0], hull[-1], com)
    lever = com - closest
    ll = float(np.hypot(*lever))
    if ll < 1e-9:
        return None                      # perfect balance
    # rot axis = gravity x lever (horizontal, perpendicular to the lever)
    axis = np.array([-lever[1], lever[0]]) / ll
    return (closest, axis)


def _rodrigues(pts, pivot, axis, angle):
    """Rotate points about (pivot, axis) by angle (rotate_point /
    rotate_vector3d, movable_cobj.cpp:538-543)."""
    import numpy as np
    ax = np.asarray(axis, np.float64)
    ax = ax / max(np.linalg.norm(ax), 1e-12)
    p = np.asarray(pts, np.float64) - pivot
    c, s = np.cos(angle), np.sin(angle)
    return (p * c + np.cross(ax, p) * s
            + ax * (p @ ax)[:, None] * (1 - c)) + pivot


def _cube_corners(lo, hi):
    import numpy as np
    return np.array([(x, y, z) for z in (lo[2], hi[2])
                     for y in (lo[1], hi[1]) for x in (lo[0], hi[0])])


def _box_to_polygon(cobjs: CobjSet, i: int, corners):
    """Replace cobj i with the extruded-polygon representation of a
    rotated box: center-plane quad + rotated z normal + height
    thickness (the reference converts rotated cubes to polygon cobjs,
    coll_obj::rotate_about -> was_a_cube)."""
    import numpy as np
    from .cobjs import COLL_POLYGON
    bot = corners[:4][[0, 1, 3, 2]]     # cycle order
    top = corners[4:][[0, 1, 3, 2]]
    quad = 0.5 * (bot + top)
    nr = np.cross(quad[1] - quad[0], quad[3] - quad[0])
    nr = nr / max(np.linalg.norm(nr), 1e-12)
    height = float(np.linalg.norm(top[0] - bot[0]))
    pts = np.asarray(cobjs.pts).copy()
    pts[i, :4] = quad
    return cobjs._replace(
        shape=cobjs.shape.at[i].set(COLL_POLYGON),
        pts=jnp.asarray(pts),
        pnorm=cobjs.pnorm.at[i].set(jnp.asarray(nr, jnp.float32)),
        npts=cobjs.npts.at[i].set(4),
        r1=cobjs.r1.at[i].set(height),
        p1=cobjs.p1.at[i].set(jnp.asarray(corners.min(0), jnp.float32)),
        p2=cobjs.p2.at[i].set(jnp.asarray(corners.max(0), jnp.float32)))


def _corners_blocked(corners, cobjs: CobjSet, i: int, mesh_min_z: float,
                     tol: float = 1e-4):
    """Any rotated corner below the ground or inside another (cube)
    cobj — the penetration test the binary search resolves against."""
    import numpy as np
    if (corners[:, 2] < mesh_min_z - tol).any():
        return True
    lo = np.minimum(np.asarray(cobjs.p1), np.asarray(cobjs.p2))
    hi = np.maximum(np.asarray(cobjs.p1), np.asarray(cobjs.p2))
    live = np.asarray(cobjs.shape) == COLL_CUBE
    for j in np.where(live)[0]:
        if j == i:
            continue
        inside = ((corners > lo[j] + tol) & (corners < hi[j] - tol))
        if inside.all(axis=1).any():
            return True
    return False


def rotate_cube_to_rest(cobjs: CobjSet, i: int, mesh_min_z: float,
                        bisect_iters: int = 20):
    """Tip an unstable cube about its support-hull pivot until a NEW
    contact stops it, finding the contact angle by binary search
    (the get_cobj_rot_axis + rotate_about + binary-delta scheme of
    movable_cobj.cpp:599-735).  Returns (cobjs', rotated_bool)."""
    import numpy as np
    rv = get_cobj_rot_axis(cobjs, i, mesh_min_z)
    if rv is None:
        return cobjs, False
    pivot_xy, axis_xy = rv
    lo = np.minimum(np.asarray(cobjs.p1[i]), np.asarray(cobjs.p2[i]))
    hi = np.maximum(np.asarray(cobjs.p1[i]), np.asarray(cobjs.p2[i]))
    pivot = np.array([pivot_xy[0], pivot_xy[1], lo[2]])
    axis = np.array([axis_xy[0], axis_xy[1], 0.0])
    corners = _cube_corners(lo, hi).astype(np.float64)
    com = corners.mean(0)
    # rotation sign: the COM must move DOWN (gravity drives the tip)
    eps = 1e-3
    if _rodrigues(com[None], pivot, axis, eps)[0, 2] > com[2]:
        axis = -axis
    # largest collision-free angle in (0, pi/2]: grow until blocked,
    # then bisect the contact angle (get_max_cobj_move_delta's
    # binary-split scheme applied to rotation)
    a_lo, a_hi = 0.0, np.pi / 2
    if not _corners_blocked(_rodrigues(corners, pivot, axis, a_hi),
                            cobjs, i, mesh_min_z):
        a_lo = a_hi                      # quarter-turn lands flat
    else:
        for _ in range(bisect_iters):
            mid = 0.5 * (a_lo + a_hi)
            if _corners_blocked(_rodrigues(corners, pivot, axis, mid),
                                cobjs, i, mesh_min_z):
                a_hi = mid
            else:
                a_lo = mid
    if a_lo < 1e-4:
        return cobjs, False              # already in contact
    out = _rodrigues(corners, pivot, axis, a_lo)
    return _box_to_polygon(cobjs, i, out), True


def mesh_normal_at(mesh, world, x: float, y: float):
    """Bilinear mesh normal (get_mesh_normal_at,
    movable_cobj.cpp:484-495) from central height differences."""
    import numpy as np
    m = np.asarray(mesh)
    my, mx = m.shape
    dx = 2.0 * world.x_scene / max(mx - 1, 1)
    dy = 2.0 * world.y_scene / max(my - 1, 1)
    fx = np.clip((x + world.x_scene) / dx, 1, mx - 2)
    fy = np.clip((y + world.y_scene) / dy, 1, my - 2)
    ix, iy = int(fx), int(fy)
    gx = (m[iy, ix + 1] - m[iy, ix - 1]) / (2 * dx)
    gy = (m[iy + 1, ix] - m[iy - 1, ix]) / (2 * dy)
    n = np.array([-gx, -gy, 1.0])
    return n / np.linalg.norm(n)


def rotate_to_align_with_mesh(cobjs: CobjSet, i: int, mesh, world):
    """Rotate a grounded cube about its COM so its resting normal
    matches the local mesh normal (rotate_to_align_with_mesh /
    adjust_cobj_resting_normal, movable_cobj.cpp:495-509).  Returns
    (cobjs', rotated_bool)."""
    import numpy as np
    lo = np.minimum(np.asarray(cobjs.p1[i]), np.asarray(cobjs.p2[i]))
    hi = np.maximum(np.asarray(cobjs.p1[i]), np.asarray(cobjs.p2[i]))
    com = 0.5 * (lo + hi)
    supp = mesh_normal_at(mesh, world, com[0], com[1])
    rest = np.array([0.0, 0.0, 1.0])    # cube resting normal, negated up
    if supp @ rest > 0.999:
        return cobjs, False             # already aligned
    axis = np.cross(supp, rest)
    axis = axis / max(np.linalg.norm(axis), 1e-12)
    angle = float(np.arccos(np.clip(supp @ rest, -1.0, 1.0)))
    corners = _cube_corners(lo, hi).astype(np.float64)
    out = _rodrigues(corners, com, axis, -angle)
    return _box_to_polygon(cobjs, i, out), True


def binary_search_drop(cobjs: CobjSet, i: int, mesh_min_z: float,
                       max_drop: float, iters: int = 20) -> float:
    """Largest downward translation of cube i that stays
    penetration-free against the ground and other cubes — the
    reference's get_max_cobj_move_delta binary split
    (movable_cobj.cpp:699-713) specialized to the drop vector."""
    import numpy as np
    lo = np.minimum(np.asarray(cobjs.p1[i]), np.asarray(cobjs.p2[i]))
    hi = np.maximum(np.asarray(cobjs.p1[i]), np.asarray(cobjs.p2[i]))
    corners = _cube_corners(lo, hi).astype(np.float64)

    def free(t):
        return not _corners_blocked(
            corners - np.array([0.0, 0.0, t * max_drop]),
            cobjs, i, mesh_min_z)

    if free(1.0):
        return max_drop
    t_lo, t_hi = 0.0, 1.0
    for _ in range(iters):
        mid = 0.5 * (t_lo + t_hi)
        if free(mid):
            t_lo = mid
        else:
            t_hi = mid
    return t_lo * max_drop


def check_unstable_hull(cobjs: CobjSet, i: int, mesh_min_z: float):
    """Axis-aligned projection of the hull decision, for tip_cube: maps
    the lever direction onto the dominant (+-1, dim) tip direction."""
    import numpy as np
    rv = get_cobj_rot_axis(cobjs, i, mesh_min_z)
    if rv is None:
        return None
    closest, axis = rv
    lever = np.array([axis[1], -axis[0]])   # inverse of axis = g x lever
    dim = 0 if abs(lever[0]) >= abs(lever[1]) else 1
    return (1 if lever[dim] > 0 else -1, dim)
