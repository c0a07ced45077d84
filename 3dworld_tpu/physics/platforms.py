"""Animated platforms + triggers.

The reference's `platform` class animates cobjs along linear paths or
rotations with trigger activation, delays, and continuous modes
(collision_detect.h:460+, platform.cpp); platform riders inherit the
platform's frame delta (Physics.cpp:1427-1445); sensors/triggers activate
platforms and lights (trigger.h).

TPU form: platform state is SoA arrays advanced by one fused program; the
cobj set is functionally updated (p1/p2 translated) each frame; rider
deltas come from matching stopped objects against their supporting
platform cobj.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .cobjs import CobjSet

# platform continuous modes
P_TRIGGERED = 0   # move origin->dest when activated, back when deactivated
P_CONTINUOUS = 1  # ping-pong forever


class PlatformSet(NamedTuple):
    """SoA platforms; each owns one cobj slot."""

    cobj_idx: jax.Array    # [P] index into the CobjSet
    ox: jax.Array          # origin offset (0 position)
    oy: jax.Array
    oz: jax.Array
    dx: jax.Array          # travel vector
    dy: jax.Array
    dz: jax.Array
    speed: jax.Array       # fraction of travel per frame
    mode: jax.Array        # P_* mode
    t: jax.Array           # current param in [0, 1]
    direction: jax.Array   # +1 / -1
    active: jax.Array      # triggered state


def make_platforms(cobj_idx, travel, speed, mode=P_CONTINUOUS) -> PlatformSet:
    n = len(cobj_idx)
    travel = np.asarray(travel, np.float32).reshape(n, 3)
    return PlatformSet(
        cobj_idx=jnp.asarray(cobj_idx, jnp.int32),
        ox=jnp.zeros(n), oy=jnp.zeros(n), oz=jnp.zeros(n),
        dx=jnp.asarray(travel[:, 0]), dy=jnp.asarray(travel[:, 1]),
        dz=jnp.asarray(travel[:, 2]),
        speed=jnp.asarray(speed, jnp.float32) * jnp.ones(n),
        mode=jnp.full(n, mode, jnp.int32),
        t=jnp.zeros(n), direction=jnp.ones(n),
        active=jnp.ones(n, bool) if mode == P_CONTINUOUS else jnp.zeros(n, bool),
    )


@jax.jit
def step_platforms(p: PlatformSet):
    """Advance params: continuous ping-pong; triggered moves toward dest
    when active else back.  Returns (new_platforms, frame delta [P] xyz)."""
    tgt_dir = jnp.where(p.mode == P_CONTINUOUS, p.direction,
                        jnp.where(p.active, 1.0, -1.0))
    t_new = jnp.clip(p.t + tgt_dir * p.speed, 0.0, 1.0)
    # ping-pong: flip at the ends (continuous mode)
    flip = (p.mode == P_CONTINUOUS) & ((t_new >= 1.0) | (t_new <= 0.0))
    direction = jnp.where(flip, -p.direction, p.direction)
    dt = t_new - p.t
    return (p._replace(t=t_new, direction=direction),
            dt * p.dx, dt * p.dy, dt * p.dz)


@jax.jit
def apply_platform_motion(cobjs: CobjSet, p: PlatformSet, mx, my, mz) -> CobjSet:
    """Translate each platform's cobj by the frame delta (functional cobj
    update; the reference re-registers moved cobjs)."""
    M = cobjs.size
    oh = jax.nn.one_hot(p.cobj_idx, M, dtype=jnp.float32)   # [P, M]
    dx = oh.T @ mx
    dy = oh.T @ my
    dz = oh.T @ mz
    delta = jnp.stack([dx, dy, dz], axis=-1)
    return cobjs._replace(p1=cobjs.p1 + delta, p2=cobjs.p2 + delta,
                          pts=cobjs.pts + delta[:, None, :])


def rider_deltas(obj_px, obj_py, obj_pz, obj_status, cobjs: CobjSet,
                 p: PlatformSet, mx, my, mz, rad):
    """Objects stopped on top of a platform cobj inherit its delta
    (Physics.cpp:1427-1445).  Returns per-object (dx, dy, dz)."""
    M = cobjs.size
    oh = jax.nn.one_hot(p.cobj_idx, M, dtype=jnp.float32)
    cdx = oh.T @ mx     # [M] per-cobj deltas
    cdy = oh.T @ my
    cdz = oh.T @ mz
    moving_cobj = (oh.sum(0) > 0)
    # standing on a cube top: xy inside, z near the top face
    lo = jnp.minimum(cobjs.p1, cobjs.p2)
    hi = jnp.maximum(cobjs.p1, cobjs.p2)
    X = obj_px[:, None]
    Y = obj_py[:, None]
    Z = obj_pz[:, None]
    on = ((X >= lo[:, 0]) & (X <= hi[:, 0]) & (Y >= lo[:, 1]) & (Y <= hi[:, 1])
          & (jnp.abs(Z - rad[:, None] - hi[:, 2]) < 0.05) & moving_cobj[None, :])
    stopped = (obj_status == 4) | (obj_status == 2)
    w = on.astype(jnp.float32) * stopped[:, None].astype(jnp.float32)
    return w @ cdx, w @ cdy, w @ cdz


class TriggerSet(NamedTuple):
    """Proximity sensors activating platforms (trigger.h)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    radius: jax.Array
    platform: jax.Array   # platform index to activate


@jax.jit
def eval_triggers(tr: TriggerSet, px, py, pz, platforms: PlatformSet):
    """Any activator inside a trigger radius activates its platform."""
    d2 = ((tr.x[:, None] - px[None, :]) ** 2 + (tr.y[:, None] - py[None, :]) ** 2
          + (tr.z[:, None] - pz[None, :]) ** 2)
    fired = jnp.any(d2 <= (tr.radius[:, None] ** 2), axis=1)   # [T]
    P = platforms.t.shape[0]
    oh = jax.nn.one_hot(tr.platform, P, dtype=jnp.float32)
    act = (fired.astype(jnp.float32) @ oh) > 0
    return platforms._replace(active=act | (platforms.mode == P_CONTINUOUS))
