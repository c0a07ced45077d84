"""Platform (cobj-accum) and dynamic-group lighting volumes.

LIGHTING_COBJ_ACCUM (ray_trace.cpp:829-885,1030-1070): sky rays whose
paths cross a *platform* cobj's bounds are recorded at bake time; when
the platform moves, only the rays whose blocked-status changed re-cast,
with negated weight for newly-blocked rays — an incremental delta update
of the light volume instead of a full re-trace.

LIGHTING_DYNAMIC (lightmap.cpp:430-500 light_volume_local /
indir_dlight_group_manager_t): named dlight groups each own a local
indirect volume; its intensity scales by the enabled/total light ratio,
and `need_update_indir` groups re-trace when their lights move.

TPU design: recorded ray sets are flat SoA batches; the
blocked-status test is a vectorized slab clip; delta updates ride the
same `trace_batch` path with signed weights (the volume accumulate is
linear, so negative weights subtract exactly what the positive pass
added for the same ray set and seed).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst, DEFAULT_WORLD
from . import lmap as L
from . import trace as TR


class AccumRays(NamedTuple):
    """Recorded sky-ray set for one platform cobj (merged_accum_map)."""

    ox: jax.Array
    oy: jax.Array
    oz: jax.Array
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    w: jax.Array
    cr: jax.Array
    cg: jax.Array
    cb: jax.Array
    seed: int


def segment_hits_cube(ox, oy, oz, dx, dy, dz, t_len, lo, hi):
    """check_line_clip: [N] segment vs one AABB -> [N] bool (slab test)."""
    t0 = jnp.zeros_like(ox)
    t1 = jnp.full_like(ox, t_len)
    for o, d, a, b in ((ox, dx, lo[0], hi[0]), (oy, dy, lo[1], hi[1]),
                       (oz, dz, lo[2], hi[2])):
        dinv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        ta = (a - o) * dinv
        tb = (b - o) * dinv
        tmin = jnp.minimum(ta, tb)
        tmax = jnp.maximum(ta, tb)
        t0 = jnp.maximum(t0, tmin)
        t1 = jnp.minimum(t1, tmax)
    return t0 <= t1


def record_platform_rays(key, n: int, cobj_lo, cobj_hi,
                         world: WorldConst = DEFAULT_WORLD,
                         line_length: float = 32.0,
                         sky_color=(0.7, 0.8, 1.0), seed: int = 0) -> AccumRays:
    """Bake step: generate the sky-ray population and keep those whose
    unblocked path crosses the platform cobj's bounds (the rays the
    platform can affect).  Stored compactly via mask-compaction on host.

    Per-ray weight is 1.0 — the SAME weight `compute_sky_lighting`
    bakes with — so a delta re-cast cancels exactly what the bake
    deposited (a 1/n weight here would make deltas n-times too weak to
    ever change the volume).  `seed` keys every future delta re-cast of
    this ray set (stored so A->B->A moves replay identical bounce
    randoms and cancel to zero)."""
    ox, oy, oz, dx, dy, dz, w, cr, cg, cb = TR.sky_rays(
        key, n, world, sky_color=sky_color, ray_weight=float(n))
    hit = segment_hits_cube(ox, oy, oz, dx, dy, dz, line_length,
                            jnp.asarray(cobj_lo), jnp.asarray(cobj_hi))
    m = np.asarray(hit)
    take = lambda a: jnp.asarray(np.asarray(a)[m])
    return AccumRays(take(ox), take(oy), take(oz), take(dx), take(dy),
                     take(dz), take(w), take(cr), take(cg), take(cb),
                     seed=seed)


def update_platform_lighting(grid: L.LightGrid, rays: AccumRays,
                             cobjs, mesh,
                             prev_lo, prev_hi, cur_lo, cur_hi,
                             key=None,
                             params: TR.TraceParams = TR.TraceParams(),
                             world: WorldConst = DEFAULT_WORLD) -> L.LightGrid:
    """Incremental delta update after a platform move
    (trace_ray_block_cobj_accum_single_update, ray_trace.cpp:850-885).

    Rays blocked in both or neither position are skipped (weight 0);
    newly-blocked rays re-cast with negated weight, newly-unblocked with
    positive weight.  `cobjs` should hold the scene WITHOUT the platform
    cobj (it can't be in both positions at once — same note as the
    reference).

    The batch always traces the FULL recorded ray set (unchanged rays at
    weight 0) with randoms keyed by the RECORDED seed, never a caller
    key: every delta then replays identical per-slot bounce randoms, so
    moving a platform away and back subtracts exactly what was added —
    the residual is zero, not trace(key2)-trace(key1) ghosting.  The
    `key` parameter is accepted for compatibility and ignored."""
    del key
    LL = params.line_length
    cur = segment_hits_cube(rays.ox, rays.oy, rays.oz,
                            rays.dx, rays.dy, rays.dz, LL,
                            jnp.asarray(cur_lo), jnp.asarray(cur_hi))
    prev = segment_hits_cube(rays.ox, rays.oy, rays.oz,
                             rays.dx, rays.dy, rays.dz, LL,
                             jnp.asarray(prev_lo), jnp.asarray(prev_hi))
    changed = cur != prev
    sign = jnp.where(cur, -1.0, 1.0)          # newly blocked -> subtract
    w = rays.w * sign * changed.astype(jnp.float32)
    return TR.trace_batch(grid, cobjs, mesh,
                          rays.ox, rays.oy, rays.oz,
                          rays.dx, rays.dy, rays.dz,
                          w, rays.cr, rays.cg, rays.cb,
                          jax.random.key(rays.seed),
                          ltype=L.LIGHTING_SKY, params=params, world=world)


# ---------------------------------------------------------------------------
# dynamic dlight-group volumes
# ---------------------------------------------------------------------------

@dataclass
class DlightGroup:
    """indir_dlight_group_manager_t group: named set of dlights sharing
    one local indirect volume (lightmap.cpp:452-500)."""

    name: str
    scale: float = 1.0
    dlight_ixs: list = field(default_factory=list)
    is_dynamic: bool = False
    base: L.LightGrid | None = None    # traced at full enablement


@dataclass
class DlightGroupManager:
    groups: dict = field(default_factory=dict)

    def get_group(self, name: str, scale: float = 1.0) -> DlightGroup:
        if name in ("", "none", "null"):
            name = "__none__"
        g = self.groups.get(name)
        if g is None:
            g = DlightGroup(name=name, scale=scale)
            self.groups[name] = g
        elif g.scale != scale:
            g.scale = scale                # reference warns; last wins
        return g

    def add_dlight(self, name: str, dlight_ix: int, scale: float = 1.0,
                   is_dynamic: bool = False):
        g = self.get_group(name, scale)
        g.dlight_ixs.append(dlight_ix)
        g.is_dynamic |= is_dynamic

    def gen_group_volume(self, g: DlightGroup, cobjs, mesh, lights,
                         rays_per_light: int, world: WorldConst,
                         seed: int = 0,
                         params: TR.TraceParams = TR.TraceParams()):
        """Trace the group's lights into a fresh LOCAL volume
        (light_volume_local::gen_data)."""
        grid = L.make_light_grid(world)
        for k, ix in enumerate(g.dlight_ixs):
            key = jax.random.key(seed * 1000 + 31 * k + 7)
            pos, color = lights[ix]
            ox, oy, oz, dx, dy, dz, w, cr, cg, cb = TR.local_rays(
                key, rays_per_light, pos, color, world)
            grid = TR.trace_batch(grid, cobjs, mesh, ox, oy, oz, dx, dy, dz,
                                  w, cr, cg, cb, key,
                                  ltype=L.LIGHTING_LOCAL, params=params,
                                  world=world)
        g.base = grid
        return grid

    def group_scale(self, g: DlightGroup, enabled_mask) -> float:
        """scale * enabled/total (lightmap.cpp:494)."""
        if not g.dlight_ixs:
            return 0.0
        en = sum(1 for ix in g.dlight_ixs if enabled_mask[ix])
        return g.scale * en / len(g.dlight_ixs)

    def scaled_volume(self, g: DlightGroup, enabled_mask):
        """The group's contribution at the current enable state — a pure
        rescale of the baked volume (no re-trace unless is_dynamic)."""
        s = self.group_scale(g, enabled_mask)
        b = g.base
        return b._replace(lc_r=b.lc_r * s, lc_g=b.lc_g * s,
                          lc_b=b.lc_b * s)
