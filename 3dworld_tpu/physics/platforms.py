"""Animated platforms + triggers — the reference's full state machine.

`platform` (platform.cpp:211-380, collision_detect.h:460+) animates cobjs
along a direction for `ext_dist` units (or rotates them) through states
NOACT -> WAIT(sdelay) -> FWD -> CHDIR(rdelay) -> REV -> reset, at
fspeed/rspeed units per tick; `cont` platforms re-activate after reset,
triggered ones wait for a trigger (trigger_t: activation distance/region,
trigger.h) or an `act_dist` proximity trigger at the origin.  Platform
riders inherit the platform's frame delta (Physics.cpp:1427-1445).

TPU form: platform state is SoA arrays advanced by one fused jitted
program (the reference's per-platform while-loop is unrolled 3 state
transitions per frame — enough for any realistic fticks); cobjs are
functionally translated each frame via their `platform_id` field.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .cobjs import CobjSet

TICKS_PER_SECOND = 40.0   # 3DWorld.h:61

# states (platform.cpp)
ST_NOACT, ST_WAIT, ST_FWD, ST_CHDIR, ST_REV = 0, 1, 2, 3, 4

# compatibility modes for make_platforms
P_TRIGGERED = 0
P_CONTINUOUS = 1


class PlatformSet(NamedTuple):
    """SoA platforms (static params + dynamic state)."""

    # static
    fspeed: jax.Array     # [P] units/tick (file units/sec / TICKS_PER_SECOND)
    rspeed: jax.Array     # [P] units/tick
    sdelay: jax.Array     # [P] ticks
    rdelay: jax.Array     # [P] ticks (<0 = never reverse)
    ext_dist: jax.Array   # [P] travel distance (or rotation angle)
    act_dist: jax.Array   # [P] >0 = origin proximity trigger
    ox: jax.Array         # [P] origin
    oy: jax.Array
    oz: jax.Array
    dx: jax.Array         # [P] normalized direction (or rotation axis)
    dy: jax.Array
    dz: jax.Array
    cont: jax.Array       # [P] bool continuous
    is_rot: jax.Array     # [P] bool rotation platform
    # dynamic
    state: jax.Array      # [P] int32 ST_*
    ns_time: jax.Array    # [P] ticks until next state event
    dist: jax.Array       # [P] current travel distance (or angle)
    is_stopped: jax.Array  # [P] bool (auto-off pause)
    active_time: jax.Array  # [P] ticks active (auto_off)

    @property
    def size(self) -> int:
        return self.state.shape[0]


def build_platforms(specs) -> PlatformSet:
    """From scene PlatformSpecs (platform_cont::add_from_file units:
    speeds units/sec, delays seconds)."""
    n = len(specs)
    f = lambda g: jnp.asarray([g(s) for s in specs] or np.zeros(0), jnp.float32)
    return PlatformSet(
        fspeed=f(lambda s: s.fspeed / TICKS_PER_SECOND),
        rspeed=f(lambda s: s.rspeed / TICKS_PER_SECOND),
        sdelay=f(lambda s: s.sdelay * TICKS_PER_SECOND),
        rdelay=f(lambda s: s.rdelay * TICKS_PER_SECOND),
        ext_dist=f(lambda s: s.ext_dist), act_dist=f(lambda s: s.act_dist),
        ox=f(lambda s: s.origin[0]), oy=f(lambda s: s.origin[1]),
        oz=f(lambda s: s.origin[2]),
        dx=f(lambda s: s.dir[0]), dy=f(lambda s: s.dir[1]),
        dz=f(lambda s: s.dir[2]),
        cont=jnp.asarray([s.cont for s in specs] or np.zeros(0, bool)),
        is_rot=jnp.asarray([s.is_rot for s in specs] or np.zeros(0, bool)),
        state=jnp.zeros(n, jnp.int32), ns_time=jnp.zeros(n),
        dist=jnp.zeros(n), is_stopped=jnp.zeros(n, bool),
        active_time=jnp.zeros(n),
    )


def make_platforms(cobj_idx, travel, speed, mode=P_CONTINUOUS) -> PlatformSet:
    """Convenience constructor: platforms translating along `travel` at
    `speed` (fraction of travel per tick).  cobj binding now lives on the
    cobjs' platform_id field; `cobj_idx` gives the order (platform i drives
    cobjs with platform_id == i)."""
    n = len(cobj_idx)
    travel = np.asarray(travel, np.float32).reshape(n, 3)
    ext = np.linalg.norm(travel, axis=1)
    d = travel / np.maximum(ext[:, None], 1e-9)
    sp = np.asarray(speed, np.float32) * np.ones(n) * ext
    return PlatformSet(
        fspeed=jnp.asarray(sp), rspeed=jnp.asarray(sp),
        sdelay=jnp.zeros(n), rdelay=jnp.zeros(n),
        ext_dist=jnp.asarray(ext), act_dist=jnp.zeros(n),
        ox=jnp.zeros(n), oy=jnp.zeros(n), oz=jnp.zeros(n),
        dx=jnp.asarray(d[:, 0]), dy=jnp.asarray(d[:, 1]),
        dz=jnp.asarray(d[:, 2]),
        cont=jnp.full(n, mode == P_CONTINUOUS, bool),
        is_rot=jnp.zeros(n, bool),
        state=jnp.zeros(n, jnp.int32), ns_time=jnp.zeros(n),
        dist=jnp.zeros(n), is_stopped=jnp.zeros(n, bool),
        active_time=jnp.zeros(n),
    )


@functools.partial(jax.jit, static_argnames=())
def advance_platforms(p: PlatformSet, triggered=None, fticks=1.0):
    """One frame of platform::advance_timestep (platform.cpp:296-380) for
    every platform.  `triggered`: [P] bool from eval_triggers (sensor /
    trigger activation this frame).  Returns (new_platforms, mx, my, mz):
    per-platform frame deltas (for rotation platforms the delta is the
    angle change in mx; my/mz zero)."""
    P = p.size
    trig = jnp.zeros(P, bool) if triggered is None else triggered
    state, ns_time, dist = p.state, p.ns_time, p.dist

    # NOACT + (cont | trigger) -> activate (state=WAIT, ns_time=sdelay)
    act = (state == ST_NOACT) & (p.cont | trig)
    state = jnp.where(act, ST_WAIT, state)
    ns_time = jnp.where(act, p.sdelay, ns_time)

    started = state != ST_NOACT
    ns_time = jnp.where(started, ns_time - fticks, ns_time)
    dist0 = dist

    # unrolled state-transition loop (while ns_time < 0)
    for _ in range(3):
        pending = started & (ns_time < 0.0)
        # WAIT -> FWD (fallthrough)
        w = pending & (state == ST_WAIT)
        state = jnp.where(w, ST_FWD, state)
        # FWD: move forward by -fspeed*ns_time, clamp at ext_dist
        fw = pending & (state == ST_FWD)
        dt_f = -p.fspeed * ns_time
        past_end = (p.ext_dist > 0.0) & (dt_f + dist > p.ext_dist)
        dt_f_cl = jnp.where(past_end, p.ext_dist - dist, dt_f)
        new_ns = jnp.where(
            past_end,
            ns_time + dt_f_cl / jnp.maximum(p.fspeed, 1e-9)
            + jnp.maximum(0.0, p.rdelay),
            0.0)
        dist = jnp.where(fw, dist + dt_f_cl, dist)
        ns_time = jnp.where(fw, new_ns, ns_time)
        state = jnp.where(fw & past_end, ST_CHDIR, state)
        # CHDIR -> REV when rdelay >= 0 (rdelay < 0: wait forever)
        pending = started & (ns_time < 0.0)
        ch = pending & (state == ST_CHDIR)
        state = jnp.where(ch & (p.rdelay >= 0.0), ST_REV, state)
        ns_time = jnp.where(ch & (p.rdelay < 0.0), 0.0, ns_time)
        # REV: move back by rspeed*ns_time (negative), reset past start
        pending = started & (ns_time < 0.0)
        rv = pending & (state == ST_REV)
        no_rev = rv & (p.rspeed == 0.0)
        # rspeed==0 && cont && is_rot: infinite rotation — reset the
        # angle and go straight back to FWD (platform.cpp:348); others
        # wait in REV forever
        spin = no_rev & p.cont & p.is_rot
        dist = jnp.where(spin, 0.0, dist)
        state = jnp.where(spin, ST_FWD, state)
        ns_time = jnp.where(no_rev, 0.0, ns_time)
        dt_r = p.rspeed * ns_time          # negative
        past_start = (dt_r + dist) < 0.0
        reset = rv & ~no_rev & past_start
        dist = jnp.where(rv & ~no_rev & ~past_start, dist + dt_r, dist)
        ns_time = jnp.where(rv & ~no_rev & ~past_start, 0.0, ns_time)
        # reset: back to origin, NOACT (cont platforms re-activate next frame)
        state = jnp.where(reset, ST_NOACT, state)
        dist = jnp.where(reset, 0.0, dist)
        ns_time = jnp.where(reset, 0.0, ns_time)

    dd = dist - dist0
    # a cont+is_rot wrap resets dist to 0 after a full ext_dist cycle;
    # report the CONTINUOUS angle delta (without the -ext_dist jump) so
    # the applied rotation stays seamless for any ext_dist
    dd = jnp.where(p.is_rot & (dd < -0.5 * p.ext_dist), dd + p.ext_dist, dd)
    out = p._replace(state=state, ns_time=ns_time, dist=dist)
    mx = jnp.where(p.is_rot, dd, dd * p.dx)
    my = jnp.where(p.is_rot, 0.0, dd * p.dy)
    mz = jnp.where(p.is_rot, 0.0, dd * p.dz)
    return out, mx, my, mz


def step_platforms(p: PlatformSet, triggered=None):
    """Back-compat alias of advance_platforms."""
    return advance_platforms(p, triggered)


def _cobj_deltas(cobjs: CobjSet, mx, my, mz):
    """Gather each cobj's platform delta via its platform_id (-1 = none)."""
    pid = cobjs.platform_id
    on = pid >= 0
    idx = jnp.clip(pid, 0, max(mx.shape[0] - 1, 0))
    if mx.shape[0] == 0:
        z = jnp.zeros(cobjs.size)
        return z, z, z
    w = on.astype(jnp.float32)
    return mx[idx] * w, my[idx] * w, mz[idx] * w


def _rodrigues(v, axis, ang):
    """Rotate vectors v [...,3] about per-row unit axes by per-row angles."""
    c = jnp.cos(ang)[..., None]
    s = jnp.sin(ang)[..., None]
    av = jnp.cross(axis, v)
    aav = axis * jnp.sum(axis * v, axis=-1, keepdims=True)
    return v * c + av * s + aav * (1.0 - c)


def _platform_rot_params(cobjs: CobjSet, p: PlatformSet, mx):
    """Per-cobj (is_rot mask, angle delta, axis [M,3], origin [M,3])."""
    pid = cobjs.platform_id
    on = pid >= 0
    idx = jnp.clip(pid, 0, max(p.size - 1, 0))
    is_rot_c = p.is_rot[idx] & on
    ang = mx[idx] * is_rot_c.astype(jnp.float32)
    axis = jnp.stack([p.dx[idx], p.dy[idx], p.dz[idx]], -1)
    orig = jnp.stack([p.ox[idx], p.oy[idx], p.oz[idx]], -1)
    return is_rot_c, ang, axis, orig


@jax.jit
def apply_platform_motion(cobjs: CobjSet, p: PlatformSet, mx, my, mz) -> CobjSet:
    """Move platform cobjs by the frame delta (functional update; the
    reference re-registers moved cobjs in the collision grid).

    Translation platforms shift p1/p2/pts; ROTATION platforms rotate
    them about the platform origin+axis by the angle delta in mx
    (rotate_about — note cube cobjs only rotate faithfully for
    axis-aligned quarter/full turns; the reference converts rotated
    cubes to polygon cobjs, as does scene CSG here)."""
    if p.size == 0:
        return cobjs
    dx, dy, dz = _cobj_deltas(cobjs, mx, my, mz)
    is_rot_c, ang, axis, orig = _platform_rot_params(cobjs, p, mx)
    delta = jnp.stack([dx, dy, dz], axis=-1)
    delta = jnp.where(is_rot_c[:, None], 0.0, delta)

    def rot_pt(q):
        return orig + _rodrigues(q - orig, axis, ang)

    sel = is_rot_c[:, None]
    p1 = jnp.where(sel, rot_pt(cobjs.p1), cobjs.p1 + delta)
    p2 = jnp.where(sel, rot_pt(cobjs.p2), cobjs.p2 + delta)
    pts = jnp.where(sel[:, None],
                    orig[:, None] + _rodrigues(cobjs.pts - orig[:, None],
                                               axis[:, None], ang[:, None]),
                    cobjs.pts + delta[:, None, :])
    pnorm = jnp.where(sel, _rodrigues(cobjs.pnorm, axis, ang), cobjs.pnorm)
    return cobjs._replace(p1=p1, p2=p2, pts=pts, pnorm=pnorm)


def rider_deltas(obj_px, obj_py, obj_pz, obj_status, cobjs: CobjSet,
                 p: PlatformSet, mx, my, mz, rad):
    """Objects stopped on top of a platform cobj inherit its delta
    (Physics.cpp:1427-1445); riders on ROTATION platforms move along
    the arc their contact point sweeps.  Returns per-object (dx, dy, dz)."""
    cdx, cdy, cdz = _cobj_deltas(cobjs, mx, my, mz)
    moving_cobj = cobjs.platform_id >= 0
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
    tdx, tdy, tdz = w @ cdx, w @ cdy, w @ cdz
    if p.size > 0:
        # rotation platforms: the rider's own position sweeps the arc
        is_rot_c, ang, axis, orig = _platform_rot_params(cobjs, p, mx)
        wr = w * is_rot_c[None, :].astype(jnp.float32)   # [N, M]
        any_rot = jnp.sum(wr, axis=1) > 0
        # rider's dominant rotating support (first contact wins via argmax)
        ci = jnp.argmax(wr, axis=1)
        pos = jnp.stack([obj_px, obj_py, obj_pz], -1)
        rd = orig[ci] + _rodrigues(pos - orig[ci], axis[ci], ang[ci]) - pos
        tdx = jnp.where(any_rot, rd[:, 0], tdx)
        tdy = jnp.where(any_rot, rd[:, 1], tdy)
        tdz = jnp.where(any_rot, rd[:, 2], tdz)
    return tdx, tdy, tdz


class TriggerSet(NamedTuple):
    """Proximity triggers activating platforms (trigger_t, trigger.h):
    point + activation distance, optional cube region."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    radius: jax.Array
    platform: jax.Array     # platform index to activate
    # optional activation region (x1,x2,y1,y2,z1,z2); all-zero = unused
    region: jax.Array       # [T, 6]


def make_triggers(x, y, z, radius, platform, region=None) -> TriggerSet:
    n = len(x)
    return TriggerSet(
        x=jnp.asarray(x, jnp.float32), y=jnp.asarray(y, jnp.float32),
        z=jnp.asarray(z, jnp.float32),
        radius=jnp.asarray(radius, jnp.float32),
        platform=jnp.asarray(platform, jnp.int32),
        region=(jnp.asarray(region, jnp.float32) if region is not None
                else jnp.zeros((n, 6))),
    )


def triggers_from_specs(platform_specs) -> TriggerSet:
    """Build the trigger table from scene PlatformSpecs: each platform's
    'K' triggers plus the built-in act_dist trigger at its origin
    (platform.cpp:219)."""
    xs, ys, zs, rs, ps, regs = [], [], [], [], [], []
    for i, s in enumerate(platform_specs):
        for tr in s.triggers:
            xs.append(tr.act_pos[0]); ys.append(tr.act_pos[1])
            zs.append(tr.act_pos[2]); rs.append(tr.act_dist); ps.append(i)
            regs.append(tr.act_region or (0.0,) * 6)
        if s.act_dist > 0.0 and not s.triggers:
            xs.append(s.origin[0]); ys.append(s.origin[1])
            zs.append(s.origin[2]); rs.append(s.act_dist); ps.append(i)
            regs.append((0.0,) * 6)
    return make_triggers(xs, ys, zs, rs, ps, regs)


@jax.jit
def eval_triggers(tr: TriggerSet, px, py, pz, platforms: PlatformSet):
    """Any activator inside a trigger radius (or region) fires the
    trigger; returns [P] bool per-platform activation for
    advance_platforms."""
    d2 = ((tr.x[:, None] - px[None, :]) ** 2 + (tr.y[:, None] - py[None, :]) ** 2
          + (tr.z[:, None] - pz[None, :]) ** 2)
    near = d2 <= (tr.radius[:, None] ** 2)
    has_reg = jnp.any(tr.region != 0.0, axis=1)
    rg = tr.region
    in_reg = ((px[None, :] >= rg[:, 0:1]) & (px[None, :] <= rg[:, 1:2])
              & (py[None, :] >= rg[:, 2:3]) & (py[None, :] <= rg[:, 3:4])
              & (pz[None, :] >= rg[:, 4:5]) & (pz[None, :] <= rg[:, 5:6]))
    # a region REPLACES the distance test (Physics.cpp:1296-1303: if
    # use_act_region contains_pt(pos) ELSE dist_less_than; set_act_region
    # zeroes act_dist, so AND-ing the two could never fire)
    fired = jnp.any(jnp.where(has_reg[:, None], in_reg, near), axis=1)
    P = platforms.size
    oh = jax.nn.one_hot(tr.platform, P, dtype=jnp.float32)
    return (fired.astype(jnp.float32) @ oh) > 0
