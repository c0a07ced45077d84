"""Player / camera physics: surface walking + collision push-out.

The reference's camera is a collision sphere: `proc_sphere_coll` vs
mesh/cobjs/bridges, `set_true_obj_height` surface walking with
camera_height above the ground, step-height climbing, jumping, and
water wading (collision_detect.cpp camera paths, Physics.cpp player
motion; config keywords camera_height / camera_step_height now parse).

One object, so this is scalar-shaped — but it reuses the batched
sample_mesh / deepest_hits kernels with [1] arrays so the same code
paths (and their tests) cover the player.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

import functools

from ..utils.constants import WorldConst, DEFAULT_WORLD
from ..physics.step import sample_mesh, outside_mesh
from ..physics.cobjs import deepest_hits, deepest_hits_grouped, GroupedCobjs

GRAVITY_Z = 0.4          # per-second^2 in scene units (player scale)
JUMP_VEL = 0.22


class PlayerState(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array
    vz: jax.Array
    on_ground: jax.Array   # bool


def make_player(x=0.0, y=0.0, z=1.0) -> PlayerState:
    f = lambda v: jnp.asarray([v], jnp.float32)
    return PlayerState(f(x), f(y), f(z), f(0.0),
                       jnp.asarray([False]))


@functools.partial(jax.jit, static_argnames=("dt", "world", "camera_radius",
                                             "camera_height", "step_height",
                                             "speed"))
def step_player(p: PlayerState, mesh, cobjs, move_x, move_y, jump,
                dt: float = 0.05, world: WorldConst = DEFAULT_WORLD,
                camera_radius: float = 0.045, camera_height: float = 0.08,
                step_height: float = 0.04, speed: float = 0.4):
    """One player tick: walk, climb small steps, fall, jump, and get
    pushed out of cobjs (proc_sphere_coll + set_true_obj_height)."""
    x = p.x + speed * dt * jnp.asarray(move_x, jnp.float32)
    y = p.y + speed * dt * jnp.asarray(move_y, jnp.float32)
    # clamp to the mesh (the camera cannot leave the scene)
    x = jnp.clip(x, -world.x_scene + 0.01, world.x_scene - 0.01)
    y = jnp.clip(y, -world.y_scene + 0.01, world.y_scene - 0.01)

    # vertical motion first: jump or gravity, then integrate z
    vz = jnp.where(p.on_ground & jnp.asarray(jump, bool), JUMP_VEL,
                   p.vz - GRAVITY_Z * dt)
    z = p.z + vz * dt

    # mesh floor (+ small-step climbing)
    mh, _nx, _ny, _nz = sample_mesh(mesh, x, y, world)
    ground = mh + camera_height
    below = ground - z
    landed = (z <= ground) & (vz <= 0)
    # step climbing only while walking ON the ground and only up to
    # step_height — adding camera_height to the budget (or allowing it
    # mid-air) would snap jumps down and climb 3x-too-tall ledges
    can_step = p.on_ground & (below > 0) & (below <= step_height)
    z = jnp.where(landed | can_step, ground, z)
    vz = jnp.where(landed | can_step, 0.0, vz)
    on_ground = landed | can_step

    # cobj push-out AFTER the z update: tops act as floors
    if cobjs is not None and cobjs.size > 0:
        dh = deepest_hits_grouped if isinstance(cobjs, GroupedCobjs) \
            else deepest_hits
        hit, pen, cnx, cny, cnz, _e, _f = dh(
            x, y, z, jnp.full_like(x, camera_radius), cobjs)
        push = hit.astype(jnp.float32) * pen
        x = x + push * cnx
        y = y + push * cny
        z = z + push * cnz
        standing_on_cobj = hit & (cnz > 0.5)
        vz = jnp.where(standing_on_cobj, jnp.maximum(vz, 0.0), vz)
        on_ground = on_ground | standing_on_cobj

    off = outside_mesh(x, y, world)
    return p._replace(x=x, y=y, z=z, vz=vz,
                      on_ground=on_ground & ~off)
