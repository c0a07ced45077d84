"""Movable-cobj rotation to rest (VERDICT r4 item 4): hull-pivot
rotation stopped by a NEW contact via binary search, resting-normal
alignment with the mesh, and binary-search drop resolve
(movable_cobj.cpp:599-735, adjust_cobj_resting_normal :495-509)."""

import numpy as np
import pytest
import jax.numpy as jnp

from w3d.physics import movable as MV
from w3d.physics.cobjs import empty_cobjs, COLL_CUBE, COLL_POLYGON
from w3d.utils.constants import WorldConst


def _two_cubes(ped_lo, ped_hi, box_lo, box_hi):
    c = empty_cobjs(4)
    return c._replace(
        shape=c.shape.at[0].set(COLL_CUBE).at[1].set(COLL_CUBE),
        p1=c.p1.at[0].set(jnp.asarray(ped_lo, jnp.float32))
            .at[1].set(jnp.asarray(box_lo, jnp.float32)),
        p2=c.p2.at[0].set(jnp.asarray(ped_hi, jnp.float32))
            .at[1].set(jnp.asarray(box_hi, jnp.float32)),
        is_movable=c.is_movable.at[1].set(True))


def test_tipped_box_rotates_until_floor_contact():
    """A 0.3 box overhanging a 0.4-tall pedestal (COM past the edge)
    rotates about the pivot until a corner TOUCHES the floor — the
    binary search stops at the contact, not at a canned 90 degrees."""
    # pedestal top z=0.2; 0.4 box overhangs 0.25 past the edge (COM at
    # x=1.05 > 1.0) -> floor contact at sin(theta)=0.2/0.25, ~53 deg
    c = _two_cubes((0.0, 0.0, 0.0), (1.0, 1.0, 0.2),
                   (0.85, 0.2, 0.2), (1.25, 0.6, 0.6))
    out, rotated = MV.rotate_cube_to_rest(c, 1, mesh_min_z=0.0)
    assert rotated
    assert int(out.shape[1]) == COLL_POLYGON
    lo_z = float(np.minimum(np.asarray(out.p1[1]),
                            np.asarray(out.p2[1]))[2])
    # new contact: the lowest rotated corner rests on the floor
    assert lo_z == pytest.approx(0.0, abs=2e-3)
    # rest ORIENTATION matches the analytic contact angle (~53.13 deg)
    nz = abs(float(out.pnorm[1, 2]))
    assert nz == pytest.approx(np.cos(np.arcsin(0.8)), abs=5e-3)


def test_quarter_turn_lands_flat_when_unobstructed():
    """Tipping off a TALL pedestal with nothing below within the
    quarter-turn sweep lands the box flat (a_lo = pi/2), matching the
    tip_cube terminal pose."""
    c = _two_cubes((0.0, 0.0, 0.0), (1.0, 1.0, 3.0),
                   (0.95, 0.2, 3.0), (1.15, 0.4, 3.2))
    out, rotated = MV.rotate_cube_to_rest(c, 1, mesh_min_z=0.0)
    assert rotated
    nz = abs(float(out.pnorm[1, 2]))
    assert nz == pytest.approx(0.0, abs=1e-5)    # face now vertical


def test_stable_box_does_not_rotate():
    c = _two_cubes((0.0, 0.0, 0.0), (1.0, 1.0, 0.4),
                   (0.3, 0.3, 0.4), (0.6, 0.6, 0.7))
    out, rotated = MV.rotate_cube_to_rest(c, 1, mesh_min_z=0.0)
    assert not rotated
    assert int(out.shape[1]) == COLL_CUBE


def test_align_with_sloped_mesh():
    world = WorldConst()
    mx, my = world.mesh_x, world.mesh_y
    xs = np.linspace(-world.x_scene, world.x_scene, mx, dtype=np.float32)
    mesh = np.broadcast_to(0.25 * xs, (my, mx)).copy()
    c = empty_cobjs(2)
    c = c._replace(
        shape=c.shape.at[0].set(COLL_CUBE),
        p1=c.p1.at[0].set(jnp.asarray([-0.2, -0.2, 0.0])),
        p2=c.p2.at[0].set(jnp.asarray([0.2, 0.2, 0.4])),
        is_movable=c.is_movable.at[0].set(True))
    out, rotated = MV.rotate_to_align_with_mesh(c, 0, mesh, world)
    assert rotated
    n = np.asarray(out.pnorm[0])
    expect = MV.mesh_normal_at(mesh, world, 0.0, 0.0)
    assert abs(float(n @ expect)) > 0.999, (n, expect)

    # flat mesh: already aligned, no rotation
    out2, rotated2 = MV.rotate_to_align_with_mesh(
        c, 0, np.zeros((my, mx), np.float32), world)
    assert not rotated2


def test_binary_search_drop_lands_on_support():
    c = _two_cubes((0.0, 0.0, 0.0), (1.0, 1.0, 0.4),
                   (0.2, 0.2, 1.0), (0.6, 0.6, 1.3))
    d = MV.binary_search_drop(c, 1, mesh_min_z=0.0, max_drop=2.0)
    assert d == pytest.approx(0.6, abs=2e-3)
    # free fall to the floor when no support is under it
    c2 = _two_cubes((5.0, 5.0, 0.0), (6.0, 6.0, 0.4),
                    (0.2, 0.2, 1.0), (0.6, 0.6, 1.3))
    d2 = MV.binary_search_drop(c2, 1, mesh_min_z=0.0, max_drop=2.0)
    assert d2 == pytest.approx(1.0, abs=2e-3)
