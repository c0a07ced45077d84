"""Exact rotated-cylinder (tapered / cone) narrow phase vs analytic
results — the reference does per-t radius (Math3d.cpp:731-830,
sphere_intersect_cylinder_ipt); a max-radius capsule approximation fails
these cases."""

import numpy as np
import jax.numpy as jnp

import w3d  # noqa: F401
from w3d.physics import cobjs as PC


def _one_rcyl(p1, p2, r1, r2, shape=PC.COLL_CYLINDER_ROT):
    c = PC.empty_cobjs(1)
    c = c._replace(shape=jnp.asarray([shape], jnp.int32),
                   p1=jnp.asarray([p1], jnp.float32),
                   p2=jnp.asarray([p2], jnp.float32),
                   r1=jnp.asarray([r1], jnp.float32),
                   r2=jnp.asarray([r2], jnp.float32))
    return c


def _test(c, pos, r):
    px = jnp.asarray([pos[0]], jnp.float32)
    py = jnp.asarray([pos[1]], jnp.float32)
    pz = jnp.asarray([pos[2]], jnp.float32)
    rr = jnp.asarray([r], jnp.float32)
    pen, nx, ny, nz = PC.sphere_cobj_test(px, py, pz, rr, c)
    g = PC.group_cobjs(c)
    peng, gx, gy, gz = PC.sphere_cobj_test_grouped(px, py, pz, rr, g)
    # grouped layout reorders; single live cobj -> take the max slot
    k = int(jnp.argmax(peng[0]))
    np.testing.assert_allclose(float(pen[0, 0]), float(peng[0, k]),
                               atol=1e-6)
    return (float(pen[0, 0]), float(nx[0, 0]), float(ny[0, 0]),
            float(nz[0, 0]))


def test_cone_side_miss_where_max_radius_would_hit():
    # cone z 0->1, r 0.5->0.1; at z=0.5 radius is 0.3
    c = _one_rcyl((0, 0, 0), (0, 0, 1), 0.5, 0.1)
    pen, *_ = _test(c, (0.4, 0.0, 0.5), 0.05)
    assert pen <= 0.0     # 0.4 > 0.3 + 0.05: no contact on the taper


def test_cone_side_hit_exact_depth():
    c = _one_rcyl((0, 0, 0), (0, 0, 1), 0.5, 0.1)
    pen, nx, ny, nz = _test(c, (0.32, 0.0, 0.5), 0.05)
    np.testing.assert_allclose(pen, 0.3 + 0.05 - 0.32, atol=1e-6)
    # reference pushes along the radial perpendicular (Math3d.cpp:797)
    np.testing.assert_allclose((nx, ny, nz), (1.0, 0.0, 0.0), atol=1e-6)


def test_cone_flat_end_cap():
    c = _one_rcyl((0, 0, 0), (0, 0, 1), 0.5, 0.1)
    pen, nx, ny, nz = _test(c, (0.1, 0.0, -0.03), 0.05)
    np.testing.assert_allclose(pen, 0.05 - 0.03, atol=1e-6)
    np.testing.assert_allclose((nx, ny, nz), (0.0, 0.0, -1.0), atol=1e-6)


def test_cone_beyond_tip_no_hit():
    # beyond the narrow end, radially outside the tip radius
    c = _one_rcyl((0, 0, 0), (0, 0, 1), 0.5, 0.1)
    pen, *_ = _test(c, (0.3, 0.0, 1.2), 0.05)
    assert pen <= 0.0


def test_horizontal_cone_axis():
    # taper along +x: radius at x=0.75 is 0.5 + 0.75*(0.1-0.5) = 0.2
    c = _one_rcyl((0, 0, 0), (1, 0, 0), 0.5, 0.1)
    pen, nx, ny, nz = _test(c, (0.75, 0.0, 0.22), 0.05)
    np.testing.assert_allclose(pen, 0.2 + 0.05 - 0.22, atol=1e-6)
    np.testing.assert_allclose((nx, ny, nz), (0.0, 0.0, 1.0), atol=1e-6)


def test_tapered_capsule_uses_interpolated_radius():
    c = _one_rcyl((0, 0, 0), (1, 0, 0), 0.3, 0.1, shape=PC.COLL_CAPSULE)
    # at t=0.5 radius is 0.2; max-radius approximation would say 0.3
    pen, *_ = _test(c, (0.5, 0.0, 0.26), 0.05)
    assert pen <= 0.0
    pen2, _, _, nz2 = _test(c, (0.5, 0.0, 0.22), 0.05)
    np.testing.assert_allclose(pen2, 0.2 + 0.05 - 0.22, atol=1e-6)
    np.testing.assert_allclose(nz2, 1.0, atol=1e-6)
