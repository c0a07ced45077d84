"""Batched path tracer into the light volume.

The reference's `cast_light_ray` (ray_trace.cpp:256-490) recursively
bounces single rays on N CPU threads; here a whole flat ray batch advances
in lockstep through an iterative bounce loop (`lax.scan` over
MAX_RAY_BOUNCES), each iteration:

  intersect (dense cobj test + stepped heightfield)  ->
  accumulate the lit path into the lmcell volume (fixed samples/segment,
  one scatter-add per bounce) ->
  surface interaction (albedo modulation, water attenuation, weight
  threshold kill) ->
  cosine-hemisphere (or shine-blurred specular) scatter via threefry.

Matches the reference's constants: DIFFUSE_REFL 0.9, SPEC_REFL 1.0,
WEIGHT_THRESH 0.01, MAX_RAY_BOUNCES 20 default (ray_trace.cpp:16-26).
Sky / global / local ray generation mirrors trace_ray_block_{sky,global,
local} semantics: hemisphere dome points, directional sun rays, and
point-light shells respectively.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst, DEFAULT_WORLD
from ..utils import rng as w3d_rng
from ..physics.cobjs import CobjSet
from ..ops import ray as R
from . import lmap as L

DIFFUSE_REFL = 0.9   # ray_trace.cpp:18
SPEC_REFL = 1.0
WEIGHT_THRESH = 0.01
SNOW_ALBEDO = 0.9    # ray_trace.cpp:20
ICE_ALBEDO = 0.8     # ray_trace.cpp:21
ICE_C = (0.65, 0.65, 1.0)          # 3DWorld.h:1297
WATER_C = (0.4, 0.4, 1.0)          # 3DWorld.h:1296
UW_ATTEN_SCALE = (0.9, 1.0, 1.5)   # get_underwater_atten_color(0,0),
                                   # edit_ui.cpp:330-336; max = WHITE
W_FREEZE_POINT = -0.1              # 3DWorld.h:90
LT_DIR_FALLOFF = 0.005             # lightmap.h:15
MESH_ALBEDO = (0.55, 0.45, 0.30)  # fallback landscape color when no
# land_color map is supplied (the reference samples the generated terrain
# texture; get_landscape_texture_color)

# mean colors of the 5 biome texture layers {sand, dirt, grass, rock,
# snow} (stand-ins for the reference's texture-average colors)
LAYER_COLORS = ((0.76, 0.70, 0.50),   # sand
                (0.45, 0.33, 0.20),   # dirt
                (0.30, 0.52, 0.20),   # grass
                (0.52, 0.50, 0.48),   # rock
                (0.93, 0.93, 1.00))   # snow


class TraceParams(NamedTuple):
    max_bounces: int = 8
    samples_per_segment: int = 16
    line_length: float = 32.0
    water_plane_z: float = -1.0e9
    specular_enabled: bool = True
    mesh_steps: int = 24           # heightfield-march samples per ray
    exact_mesh: bool = False       # DDA cell-walking intersect (exact,
                                   # ~2x the cost of the sampled march)
    temperature: float = 20.0      # <= W_FREEZE_POINT -> water becomes ice
    transmission: bool = True      # alpha<1 cobj refraction/transmission
    compact: bool = False          # Russian-roulette population control:
                                   # shrink the ray array as rays die
                                   # (unbiased; see trace_batch docstring)
    samples_later: int = 0         # segment samples for bounces >= 1
                                   # (0 = samples_per_segment).  Later
                                   # segments are short surface-to-
                                   # surface hops crossing few cells, so
                                   # they need fewer jittered samples
                                   # than the long bounce-0 sky segment.
                                   # compact path only.
    deposit_shards: int = 0        # split each deposit scatter into this
                                   # many independent streams into private
                                   # volumes (summed after).  Independent
                                   # TPU scatters overlap near-perfectly,
                                   # so shards cut the serialized deposit
                                   # wall ~shards-fold (lmap.accumulate).
                                   # 0 = auto (8 for big batches, 1 small).
    cobj_types: tuple = ()         # static shape-type presence for the
                                   # intersect (ops.ray.present_types);
                                   # () = unknown -> every formula block
                                   # stays in the graph.  Set by the
                                   # compute_* drivers via _auto_types.
    uniform_color0: bool = False   # promise: every input ray carries the
                                   # SAME (cr,cg,cb) — true for all the
                                   # driver ray sources.  Lets bounce 0's
                                   # deposit scatter ONLY the weight
                                   # channel (1 scatter instead of 4 on
                                   # ~2/3 of all samples; channel
                                   # scatters don't fuse on TPU).
                                   # compact path only.
    sorted_deposit: bool = False   # co-sort deposit samples by cell id
                                   # (one variadic lax.sort shared by the
                                   # channels) and scatter with
                                   # indices_are_sorted=True.  Same sums;
                                   # enable if the sorted-scatter path
                                   # measures faster on the target chip
                                   # (see bench.py scatter probe).
    compact_shift: int = 0         # tighten the RR population schedule
                                   # by this many halvings: slots after
                                   # bounce b = N >> (b+1+shift).  Sky
                                   # bakes measure 22%/13%/6.5% alive
                                   # after bounces 1-3 (dome rays escape
                                   # upward), so shift=1 sizes slots to
                                   # the population with ~4% RR clipping
                                   # instead of 2x empty slots.  Still
                                   # unbiased (survivors upweighted).


def _luminance(r, g, b):
    return 0.299 * r + 0.587 * g + 0.114 * b  # colorRGBA::get_luminance


def landscape_color_map(mesh, world: WorldConst, biome_noise=None):
    """[my, mx, 3] landscape albedo from the biome weight layers —
    get_landscape_texture_color(xpos, ypos) equivalent (the reference
    samples the blended landscape texture; here the 5-layer biome weights
    blend the layers' mean colors)."""
    from ..terrain import biomes as B
    dzdx = (jnp.roll(mesh, -1, 1) - jnp.roll(mesh, 1, 1)) * (0.5 * world.dx_inv)
    dzdy = (jnp.roll(mesh, -1, 0) - jnp.roll(mesh, 1, 0)) * (0.5 * world.dy_inv)
    nz = jax.lax.rsqrt(dzdx * dzdx + dzdy * dzdy + 1.0)
    w = B.biome_weights(mesh, nz, mesh.min(), mesh.max(),
                        biome_noise=biome_noise)          # [5, my, mx]
    cols = jnp.asarray(LAYER_COLORS, jnp.float32)         # [5, 3]
    return jnp.einsum("lyx,lc->yxc", w, cols)


def _segment_samples(grid, ox, oy, oz, dx, dy, dz, t_hit, w, alive, S,
                     world):
    """Shared sample placement for the segment deposits: S jittered
    samples importance-placed on the sub-range of [0, t_hit] that
    overlaps the light volume's AABB (sky-dome segments start far
    outside it — uniform placement wasted over half the samples on
    out-of-volume positions that deposit nothing).  Each sample's
    weight carries the (t1-t0)/t_hit range compensation, so the
    per-cell expectation is EXACTLY the uniform estimator's.
    Returns (flat idx [N*S], ok [N*S], wv [N*S])."""
    nz, ny, nx = grid.shape
    hx = 0.5 * nx * world.dx
    hy = 0.5 * ny * world.dy

    def axis_range(o, d, lo, hi):
        dsafe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        ta = (lo - o) / dsafe
        tb = (hi - o) / dsafe
        return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

    t0x, t1x = axis_range(ox, dx, -hx, hx)
    t0y, t1y = axis_range(oy, dy, -hy, hy)
    t0z, t1z = axis_range(oz, dz, grid.z0, grid.z0 + nz * grid.dz)
    t0 = jnp.maximum(jnp.maximum(t0x, t0y), jnp.maximum(t0z, 0.0))
    t1 = jnp.minimum(jnp.minimum(t1x, t1y), jnp.minimum(t1z, t_hit))
    span = jnp.maximum(t1 - t0, 0.0)

    fr = (jnp.arange(S, dtype=jnp.float32)[None, :] + 0.5) / S     # [1,S]
    ts = t0[:, None] + fr * span[:, None]                          # [N,S]
    px = ox[:, None] + ts * dx[:, None]
    py = oy[:, None] + ts * dy[:, None]
    pz = oz[:, None] + ts * dz[:, None]
    idx, ok = L.cell_index(grid, px.reshape(-1), py.reshape(-1),
                           pz.reshape(-1), world)
    comp = span / jnp.maximum(t_hit, 1e-12)        # range compensation
    wv = jnp.broadcast_to((w * alive * comp / S)[:, None],
                          ts.shape).reshape(-1)
    return idx, ok, wv


def _accumulate_segment(grid, ltype, ox, oy, oz, dx, dy, dz, t_hit, w, cr, cg, cb,
                        alive, S, world, shards: int = 1,
                        sorted_deposit: bool = False):
    """Walk each ray's segment [0, t_hit] with S jittered samples and
    scatter color*weight/S into the volume (add_path_to_lmcs)."""
    idx, ok, wv = _segment_samples(grid, ox, oy, oz, dx, dy, dz, t_hit, w,
                                   alive, S, world)
    n = ox.shape[0]
    sshape = (n, S)
    rv = jnp.broadcast_to(cr[:, None], sshape).reshape(-1)
    gv = jnp.broadcast_to(cg[:, None], sshape).reshape(-1)
    bv = jnp.broadcast_to(cb[:, None], sshape).reshape(-1)
    return L.accumulate(grid, ltype, idx, ok, rv, gv, bv, wv, shards=shards,
                        sorted_deposit=sorted_deposit)


def _accumulate_segment_wonly(wbuf, grid, ox, oy, oz, dx, dy, dz, t_hit, w,
                              alive, S, world, shards: int = 1,
                              sorted_deposit: bool = False):
    """Weight-only segment deposit into a flat [n_cells] buffer: when
    every ray in the batch carries the SAME color (always true at
    bounce 0 — sky/sun/point-light sources are uniform), the three
    color channels are color * (weight sum), recovered by one multiply
    at the end of the batch.  ONE scatter instead of four on the
    batch's largest deposit (bounce 0 is ~2/3 of all samples; channel
    scatters don't fuse on TPU — measured 4x the per-index cost)."""
    idx, ok, wv = _segment_samples(grid, ox, oy, oz, dx, dy, dz, t_hit, w,
                                   alive, S, world)
    n_cells = wbuf.shape[0]
    idxd = jnp.where(ok, idx, n_cells)
    if sorted_deposit:
        si, sw = jax.lax.sort([idxd, wv], num_keys=1)
        return wbuf.at[si].add(sw, mode="drop", indices_are_sorted=True)
    m = idxd.shape[0]
    if shards > 1 and m % shards == 0:
        idx_s = idxd.reshape(shards, -1)
        wv_s = wv.reshape(shards, -1)
        parts = [jnp.zeros((n_cells,), wbuf.dtype)
                 .at[idx_s[g]].add(wv_s[g], mode="drop")
                 for g in range(shards)]
        return wbuf + sum(parts)
    return wbuf.at[idxd].add(wv, mode="drop")


@functools.partial(jax.jit, static_argnames=("ltype", "params", "world"))
def trace_batch(
    grid: L.LightGrid,
    cobjs: CobjSet,
    mesh: jax.Array,
    ox, oy, oz, dx, dy, dz,        # [N] ray origins + unit directions
    w0, cr, cg, cb,                # [N] initial weight and color
    key,
    ltype: int = L.LIGHTING_SKY,
    params: TraceParams = TraceParams(),
    world: WorldConst = DEFAULT_WORLD,
    land_color=None,               # [my,mx,3] landscape albedo (else const)
    snow_depth=None,               # [my,mx] snow cover (enables snow coll)
) -> L.LightGrid:
    """Trace one flat ray batch to completion, accumulating into `grid`.

    Surface interaction chain matches cast_light_ray
    (ray_trace.cpp:256-490): water attenuation / ice / snow overrides,
    landscape-texture albedo for mesh hits, cobj color + specular, and
    Fresnel-weighted transmission through alpha<1 cobjs.  The reference
    forks reflected + transmitted recursions; this lockstep tracer keeps
    one ray per slot and picks a branch stochastically with
    importance-compensated weights (unbiased in expectation), after
    depositing the interior chord segment deterministically."""
    N = ox.shape[0]
    LL = params.line_length
    frozen = params.temperature <= W_FREEZE_POINT
    # static gate: a water plane far below any scene content can't be
    # crossed — compile the whole water/ice branch out (the plane z is a
    # static param, so this costs nothing at runtime)
    water_on = params.water_plane_z > -1.0e8
    state = dict(ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                 w=w0, w0=w0, r=cr, g=cg, b=cb,
                 alive=jnp.ones((N,), bool), grid=grid)

    def _mesh_cell(hx, hy):
        my, mx = mesh.shape
        gx = jnp.clip(jnp.round(hx * world.dx_inv + mx // 2), 0, mx - 1)
        gy = jnp.clip(jnp.round(hy * world.dy_inv + my // 2), 0, my - 1)
        return gy.astype(jnp.int32), gx.astype(jnp.int32)

    def bounce(st, key_d, S=params.samples_per_segment, w_only=False):
        ox, oy, oz = st["ox"], st["oy"], st["oz"]
        dx, dy, dz = st["dx"], st["dy"], st["dz"]
        N = ox.shape[0]          # may shrink between bounces (compact)
        # measured in-graph: shards=4 on the big deposits is ~10% faster
        # than unsharded (54.6 vs 60.2 ms/batch); more shards flat
        dep_shards = params.deposit_shards or (4 if N * S >= 262144 else 1)
        w_init = st["w0"]
        tmax = jnp.full((N,), LL)
        present = params.cobj_types or None
        if params.transmission:
            chit, ct, cnx, cny, cnz, coh, ct_exit = R.ray_cobjs_nearest(
                ox, oy, oz, dx, dy, dz, tmax, cobjs, with_exit=True,
                present=present)
        else:
            # exit-t feeds only the transmission chord; skip its
            # per-shape far-hit math when the branch is gated off
            chit, ct, cnx, cny, cnz, coh = R.ray_cobjs_nearest(
                ox, oy, oz, dx, dy, dz, tmax, cobjs, with_exit=False,
                present=present)
            ct_exit = ct
        if params.exact_mesh:
            mhit, mt = R.ray_heightfield_dda(ox, oy, oz, dx, dy, dz, tmax,
                                             mesh, world,
                                             max_cells=4 * params.mesh_steps)
        else:
            mhit, mt = R.ray_heightfield(ox, oy, oz, dx, dy, dz, tmax, mesh,
                                         world, num_steps=params.mesh_steps)
        use_mesh = mhit & (~chit | (mt < ct))
        hit = chit | mhit
        t = jnp.where(use_mesh, mt, ct)
        t = jnp.where(hit, t, LL)

        # water / ice crossing (ray_trace.cpp:296-309): a hit below the
        # water plane from above either stops at the ice surface (frozen)
        # or attenuates through the water volume
        wpz = params.water_plane_z
        if not water_on:
            ice_coll = jnp.zeros((N,), bool)
            water_coll = jnp.zeros((N,), bool)
        else:
            hz0 = oz + t * dz
            crossed = hit & (oz >= wpz) & (hz0 < wpz)
            if frozen:
                t_ice = (wpz - oz) / jnp.where(jnp.abs(dz) < 1e-9, -1e-9, dz)
                t = jnp.where(crossed, t_ice, t)
                ice_coll = crossed
                water_coll = jnp.zeros((N,), bool)
            else:
                ice_coll = jnp.zeros((N,), bool)
                water_coll = crossed

        alive = st["alive"]
        contrib = alive & hit    # un-hit rays deposit nothing (ray_trace.cpp:341)
        if w_only:
            st["wbuf"] = _accumulate_segment_wonly(
                st["wbuf"], st["grid"], ox, oy, oz, dx, dy, dz, t,
                st["w"] * contrib.astype(jnp.float32),
                jnp.ones((N,), jnp.float32), S, world, shards=dep_shards,
                sorted_deposit=params.sorted_deposit)
            grid2 = st["grid"]
        else:
            grid2 = _accumulate_segment(
                st["grid"], ltype, ox, oy, oz, dx, dy, dz, t,
                st["w"] * contrib.astype(jnp.float32), st["r"], st["g"],
                st["b"], jnp.ones((N,), jnp.float32), S, world,
                shards=dep_shards, sorted_deposit=params.sorted_deposit)

        # hit point + normal (ice: always +z, ray_trace.cpp:301)
        hx = ox + t * dx
        hy = oy + t * dy
        hz = oz + t * dz
        from ..physics.step import sample_mesh
        _, mx_, my_, mz_ = sample_mesh(mesh, hx, hy, world)
        nx = jnp.where(use_mesh, mx_, cnx)
        ny = jnp.where(use_mesh, my_, cny)
        nz = jnp.where(use_mesh, mz_, cnz)
        nx = jnp.where(ice_coll, 0.0, nx)
        ny = jnp.where(ice_coll, 0.0, ny)
        nz = jnp.where(ice_coll, 1.0, nz)

        # water volume attenuation (ray_trace.cpp:347-365): solid WATER_C
        # * 0.95, channel atten 1 - min(1, uw_scale * 0.8 * dist), dist =
        # 2x the underwater optical path; shallow-angle rays die
        if water_on:
            dzc = jnp.where(jnp.abs(dz) < 1e-6, -1e-6, dz)
            wdist = jnp.where(water_coll, -2.0 * jnp.maximum(wpz - hz, 0.0) / dzc, 0.0)
            wr = WATER_C[0] * 0.95 * (1.0 - jnp.minimum(1.0, UW_ATTEN_SCALE[0] * 0.8 * wdist))
            wg = WATER_C[1] * 0.95 * (1.0 - jnp.minimum(1.0, UW_ATTEN_SCALE[1] * 0.8 * wdist))
            wb = WATER_C[2] * 0.95 * (1.0 - jnp.minimum(1.0, UW_ATTEN_SCALE[2] * 0.8 * wdist))
            too_shallow = water_coll & (dz > -1e-6)
            wlum = jnp.where(water_coll, _luminance(wr, wg, wb), 1.0)
            watt_r = jnp.where(water_coll, wr, 1.0)
            watt_g = jnp.where(water_coll, wg, 1.0)
            watt_b = jnp.where(water_coll, wb, 1.0)
        else:
            too_shallow = jnp.zeros((N,), bool)
            wlum = watt_r = watt_g = watt_b = jnp.float32(1.0)

        # albedo + material attributes: ONE [N,M]@[M,8] matmul instead of
        # 8 matvecs (each re-read the [N,M] one-hot from HBM; fusing
        # them cuts that traffic 8x — part of the measured residual)
        attr = jnp.stack([cobjs.color_r, cobjs.color_g, cobjs.color_b,
                          cobjs.specular, cobjs.shine, cobjs.alpha,
                          cobjs.refract_ix, cobjs.light_atten], axis=1)
        av = coh @ attr                                        # [N, 8]
        acr, acg, acb = av[:, 0], av[:, 1], av[:, 2]
        aspec, ashine = av[:, 3], av[:, 4]
        calpha, cref_ix, catten = av[:, 5], av[:, 6], av[:, 7]
        gy, gx = _mesh_cell(hx, hy)
        if land_color is not None:
            lcr = land_color[gy, gx, 0]
            lcg = land_color[gy, gx, 1]
            lcb = land_color[gy, gx, 2]
        else:
            lcr = jnp.full((N,), MESH_ALBEDO[0])
            lcg = jnp.full((N,), MESH_ALBEDO[1])
            lcb = jnp.full((N,), MESH_ALBEDO[2])
        acr = jnp.where(use_mesh, lcr, acr)
        acg = jnp.where(use_mesh, lcg, acg)
        acb = jnp.where(use_mesh, lcb, acb)
        aspec = jnp.where(use_mesh, 0.0, aspec)

        # ice override (ray_trace.cpp:371-376)
        acr = jnp.where(ice_coll, ICE_ALBEDO * ICE_C[0], acr)
        acg = jnp.where(ice_coll, ICE_ALBEDO * ICE_C[1], acg)
        acb = jnp.where(ice_coll, ICE_ALBEDO * ICE_C[2], acb)
        aspec = jnp.where(ice_coll, 0.5, aspec)
        ashine = jnp.where(ice_coll, 60.0, ashine)

        # snow override (ray_trace.cpp:313-327,366-370): upward-facing
        # hits under snow cover reflect SNOW_ALBEDO white
        if snow_depth is not None:
            snow_coll = hit & ~water_coll & ~ice_coll & (nz > 0.0) & \
                (snow_depth[gy, gx] > 0.0)
            acr = jnp.where(snow_coll, SNOW_ALBEDO, acr)
            acg = jnp.where(snow_coll, SNOW_ALBEDO, acg)
            acb = jnp.where(snow_coll, SNOW_ALBEDO, acb)
            aspec = jnp.where(snow_coll, 0.5, aspec)
            ashine = jnp.where(snow_coll, 50.0, ashine)

        lum = _luminance(acr, acg, acb)
        refl = DIFFUSE_REFL * (1.0 - aspec) + SPEC_REFL * aspec

        # --- transmission through alpha<1 cobjs (ray_trace.cpp:407-458).
        # Straight-through chord approximation: the refracted and
        # re-refracted interior path is replaced by the incident-direction
        # chord [t, t_exit] (the reference itself ignores bending for the
        # weight and notes the chord-distance shortcut), attenuated by
        # get_light_transmit's exp(-light_atten * chord)
        cobj_coll = hit & ~use_mesh & ~ice_coll
        if params.transmission:
            semi = cobj_coll & (calpha < 1.0)
            # Fresnel reflected fraction (get_fresnel_reflection,
            # Math3d.cpp:46-56; n1=1)
            n2 = jnp.maximum(cref_ix, 1.0)
            cos_i = jnp.abs(dx * nx + dy * ny + dz * nz)
            sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
            val = sin_i / n2
            cos_t = jnp.sqrt(jnp.maximum(1.0 - val * val, 0.0))
            rs = (cos_i - n2 * cos_t) / jnp.maximum(cos_i + n2 * cos_t, 1e-9)
            rp = (cos_t - n2 * cos_i) / jnp.maximum(cos_t + n2 * cos_i, 1e-9)
            fres = 0.5 * (rs * rs + rp * rp)
            # get_reflected_weight (Math3d.cpp:58): alpha when ix == 1
            rweight = jnp.where(cref_ix != 1.0,
                                calpha + (1.0 - calpha) * jnp.clip(fres, 0.0, 1.0),
                                calpha)
            chord = jnp.maximum(ct_exit - t, 0.0)
            transmit_atten = jnp.where(semi & (catten > 0.0),
                                       jnp.exp(-catten * chord), 1.0)
            w_lum = st["w"] * lum * wlum        # weight *= cobj luminance
            w_t = jnp.where(semi, (1.0 - rweight) * w_lum * transmit_atten, 0.0)
            w_r = w_lum * jnp.where(semi, rweight, 1.0) * refl
            # deposit the interior chord (add_path_to_lmcs(p2, p_int))
            t_chord = jnp.where(semi, chord, 0.0)
            keep_t = jnp.abs(w_t) > WEIGHT_THRESH * jnp.abs(w_init)
            grid2 = _accumulate_segment(
                grid2, ltype, hx, hy, hz, dx, dy, dz, t_chord,
                w_t * (contrib & keep_t).astype(jnp.float32),
                st["r"] * acr * watt_r, st["g"] * acg * watt_g,
                st["b"] * acb * watt_b,
                jnp.ones((N,), jnp.float32), S,
                world, shards=dep_shards,
                sorted_deposit=params.sorted_deposit)
            # stochastic branch pick, importance-compensated.  When
            # keep_t gates the transmitted branch off entirely, its
            # probability must be zero too — otherwise the reflected
            # branch is divided by (1-p_t) with no transmitted branch to
            # compensate, inflating dim rays at transmissive surfaces by
            # up to 1e6 (biased estimator)
            p_t = jnp.abs(w_t) / jnp.maximum(jnp.abs(w_t) + jnp.abs(w_r), 1e-12)
            p_t = jnp.where(semi & keep_t, p_t, 0.0)
            u_t = jax.random.uniform(jax.random.fold_in(key_d, 7), (N,))
            take_t = semi & keep_t & (u_t < p_t)
            w = jnp.where(take_t, w_t / jnp.maximum(p_t, 1e-6),
                          w_r / jnp.maximum(1.0 - p_t, 1e-6))
        else:
            take_t = jnp.zeros((N,), bool)
            w = st["w"] * lum * refl * wlum
        w = jnp.where(too_shallow, 0.0, w)
        r = st["r"] * acr * watt_r
        g = st["g"] * acg * watt_g
        b = st["b"] * acb * watt_b

        alive = contrib & (jnp.abs(w) >= WEIGHT_THRESH * jnp.abs(w_init))

        # scatter: cosine hemisphere, or shine-blurred mirror for specular
        k1, k2, k3 = jax.random.split(key_d, 3)
        sdx, sdy, sdz = R.cosine_hemisphere_dirs(k1, nx, ny, nz, (N,))
        if params.specular_enabled:
            vdotn = dx * nx + dy * ny + dz * nz
            rx_ = dx - 2.0 * vdotn * nx
            ry_ = dy - 2.0 * vdotn * ny
            rz_ = dz - 2.0 * vdotn * nz
            # random unit vector from 2 draws (cylinder map; same
            # distribution as the normalized gaussian triple, 3x fewer
            # threefry draws and no Box-Muller)
            jz = 2.0 * jax.random.uniform(k2, (N,)) - 1.0
            jang = (2.0 * np.pi) * jax.random.uniform(k3, (N,))
            jr = jnp.sqrt(jnp.maximum(1.0 - jz * jz, 0.0))
            blur = 1.0 / jnp.sqrt(jnp.maximum(ashine, 1.0))
            spx = rx_ + blur * jr * jnp.cos(jang)
            spy = ry_ + blur * jr * jnp.sin(jang)
            spz = rz_ + blur * jz
            spl = jnp.sqrt(spx * spx + spy * spy + spz * spz) + 1e-9
            do_spec = (aspec > 0.0) & (ashine > 1.0) & \
                      (jax.random.uniform(jax.random.fold_in(k3, 2), (N,)) < aspec)
            sdx = jnp.where(do_spec, spx / spl, sdx)
            sdy = jnp.where(do_spec, spy / spl, sdy)
            sdz = jnp.where(do_spec, spz / spl, sdz)

        # transmitted rays continue straight from the chord exit point
        eps = 1e-4
        ex_ = hx + jnp.where(take_t, (jnp.maximum(ct_exit - t, 0.0) + eps) * dx,
                             eps * nx)
        ey_ = hy + jnp.where(take_t, (jnp.maximum(ct_exit - t, 0.0) + eps) * dy,
                             eps * ny)
        ez_ = hz + jnp.where(take_t, (jnp.maximum(ct_exit - t, 0.0) + eps) * dz,
                             eps * nz)
        sdx = jnp.where(take_t, dx, sdx)
        sdy = jnp.where(take_t, dy, sdy)
        sdz = jnp.where(take_t, dz, sdz)
        new = dict(
            ox=ex_, oy=ey_, oz=ez_,
            dx=sdx, dy=sdy, dz=sdz,
            w=w, w0=st["w0"], r=r, g=g, b=b, alive=alive, grid=grid2,
        )
        if "wbuf" in st:
            new["wbuf"] = st["wbuf"]
        return new, None

    if not params.compact:
        keys = jax.random.split(key, params.max_bounces)
        state, _ = jax.lax.scan(bounce, state, keys)
        return state["grid"]

    # --- population-control path: the deposit scatter is serialized at
    # ~28 ns/element on TPU regardless of masking (measured; see
    # docs/DESIGN.md "deposit roofline"), so dead rays must be removed
    # PHYSICALLY.  After each bounce the ray array shrinks on a fixed
    # schedule; when more rays are alive than slots, a random subset
    # survives with weight x (n_alive / kept) — standard Russian-roulette
    # population control, unbiased in expectation.  w0 rides along (and
    # scales with w) so the relative termination threshold is unchanged.
    st = state
    if params.uniform_color0:
        nz_, ny_, nx_ = grid.shape
        st["wbuf"] = jnp.zeros((nz_ * ny_ * nx_,), jnp.float32)
    s_later = params.samples_later or params.samples_per_segment
    sh = params.compact_shift
    for b in range(params.max_bounces):
        s_b = params.samples_per_segment if b == 0 else s_later
        st, _ = bounce(st, jax.random.fold_in(key, b), S=s_b,
                       w_only=params.uniform_color0 and b == 0)
        n_next = max(min(N >> min(b + 1 + sh, 4 + sh),
                         st["ox"].shape[0]), 1024)
        if n_next < st["ox"].shape[0]:
            st = _compact_rays(st, jax.random.fold_in(key, 0x707 + b),
                               n_next)
    g = st["grid"]
    if params.uniform_color0:
        # recover bounce 0's color channels: color x (weight sum)
        wb = st["wbuf"].reshape(g.shape)
        c0r, c0g, c0b = cr[0], cg[0], cb[0]
        if ltype == L.LIGHTING_SKY:
            g = g._replace(sc_r=g.sc_r + c0r * wb, sc_g=g.sc_g + c0g * wb,
                           sc_b=g.sc_b + c0b * wb, sv=g.sv + wb)
        elif ltype == L.LIGHTING_GLOBAL:
            g = g._replace(gc_r=g.gc_r + c0r * wb, gc_g=g.gc_g + c0g * wb,
                           gc_b=g.gc_b + c0b * wb, gv=g.gv + wb)
        else:
            g = g._replace(lc_r=g.lc_r + c0r * wb, lc_g=g.lc_g + c0g * wb,
                           lc_b=g.lc_b + c0b * wb)
    return g


def _compact_rays(st: dict, key, keep: int) -> dict:
    """Shrink the ray state to `keep` slots: a uniformly random subset of
    the alive rays first (dead rays fill any remaining slots), survivors
    upweighted by n_alive/keep when clipping occurred."""
    alive = st["alive"]
    n = alive.shape[0]
    u = jax.random.uniform(key, (n,))
    order = jnp.argsort(jnp.where(alive, u, 2.0))[:keep]
    n_alive = jnp.sum(alive).astype(jnp.float32)
    scale = jnp.maximum(n_alive / keep, 1.0)
    # one packed row-gather instead of 12 independent gathers (gathers
    # serialize per element on TPU like scatters; rows vectorize)
    keys_f = [k for k in st if k not in ("grid", "alive", "wbuf")]
    mat = jnp.stack([st[k] for k in keys_f]
                    + [st["alive"].astype(jnp.float32)], axis=1)
    sel = mat[order]
    out = {k: sel[:, i] for i, k in enumerate(keys_f)}
    out["alive"] = sel[:, len(keys_f)] > 0.5
    out["grid"] = st["grid"]
    if "wbuf" in st:
        out["wbuf"] = st["wbuf"]
    boost = jnp.where(out["alive"], scale, 1.0)
    out["w"] = out["w"] * boost
    out["w0"] = out["w0"] * boost
    return out


# ---------------------------------------------------------------------------
# ray generation for the lighting types (trace_ray_block_* semantics)
# ---------------------------------------------------------------------------

def sky_rays(key, n: int, world: WorldConst, sky_color=(0.7, 0.8, 1.0),
             ray_weight: float = 1.0):
    """Hemisphere dome points aimed at random scene points
    (trace_ray_block_sky, ray_trace.cpp:830+)."""
    ks = jax.random.split(key, 6)
    dome_r = 2.5 * max(world.x_scene, world.y_scene)
    u = jax.random.uniform(ks[0], (n,))
    phi = jax.random.uniform(ks[1], (n,), minval=0.0, maxval=2 * np.pi)
    cos_t = jnp.sqrt(u)  # bias toward zenith
    sin_t = jnp.sqrt(1.0 - u)
    ox = dome_r * sin_t * jnp.cos(phi)
    oy = dome_r * sin_t * jnp.sin(phi)
    oz = dome_r * cos_t + 0.1
    tx = jax.random.uniform(ks[2], (n,), minval=-world.x_scene, maxval=world.x_scene)
    ty = jax.random.uniform(ks[3], (n,), minval=-world.y_scene, maxval=world.y_scene)
    tz = jax.random.uniform(ks[4], (n,), minval=-world.z_scene, maxval=0.5 * world.z_scene)
    dx, dy, dz = tx - ox, ty - oy, tz - oz
    dl = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    w = jnp.full((n,), ray_weight / n)
    c = sky_color
    return (ox, oy, oz, dx / dl, dy / dl, dz / dl, w,
            jnp.full((n,), c[0]), jnp.full((n,), c[1]), jnp.full((n,), c[2]))


def global_rays(key, n: int, sun_dir, world: WorldConst,
                sun_color=(1.0, 0.95, 0.85), ray_weight: float = 1.0):
    """Directional sun/moon rays over the scene footprint
    (trace_ray_block_global)."""
    ks = jax.random.split(key, 2)
    tx = jax.random.uniform(ks[0], (n,), minval=-world.x_scene, maxval=world.x_scene)
    ty = jax.random.uniform(ks[1], (n,), minval=-world.y_scene, maxval=world.y_scene)
    sd = np.asarray(sun_dir, np.float32)
    sd = sd / np.linalg.norm(sd)   # direction FROM sun TOWARD scene
    dome = 4.0 * max(world.x_scene, world.y_scene)
    ox = tx - sd[0] * dome
    oy = ty - sd[1] * dome
    oz = jnp.zeros((n,)) - sd[2] * dome
    w = jnp.full((n,), ray_weight / n)
    return (ox, oy, oz,
            jnp.full((n,), sd[0]), jnp.full((n,), sd[1]), jnp.full((n,), sd[2]),
            w, jnp.full((n,), sun_color[0]), jnp.full((n,), sun_color[1]),
            jnp.full((n,), sun_color[2]))


def local_rays(key, n: int, light_pos, light_color, world: WorldConst,
               ray_weight: float = 1.0):
    """Uniform sphere rays from one point light (trace_ray_block_local)."""
    ks = jax.random.split(key, 3)
    vx = jax.random.normal(ks[0], (n,))
    vy = jax.random.normal(ks[1], (n,))
    vz = jax.random.normal(ks[2], (n,))
    vl = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-9
    p = light_pos
    c = light_color
    w = jnp.full((n,), ray_weight / n)
    return (jnp.full((n,), p[0]), jnp.full((n,), p[1]), jnp.full((n,), p[2]),
            vx / vl, vy / vl, vz / vl, w,
            jnp.full((n,), c[0]), jnp.full((n,), c[1]), jnp.full((n,), c[2]))


def _auto_transmission(params: TraceParams, cobjs) -> TraceParams:
    """Gate the transmission branch off when NO cobj is semi-transparent:
    with every alpha == 1 the branch deposits exact zeros and always
    takes the reflected path, so skipping it is bitwise identical — and
    it halves the scatter-deposit count per bounce (the tracer's
    measured bottleneck)."""
    if params.transmission and not bool((np.asarray(cobjs.alpha) < 1.0).any()):
        return params._replace(transmission=False)
    return params


def _auto_specular(params: TraceParams, cobjs, snow_depth=None) -> TraceParams:
    """Gate the specular-scatter block off when nothing can be specular:
    no cobj with specular > 0, no ice (temperature above freezing), no
    snow cover.  With aspec == 0 everywhere do_spec is all-false and the
    blurred-mirror math contributes nothing — skipping it is bitwise
    identical and saves 3 normal draws + ~20 elementwise ops per bounce."""
    if not params.specular_enabled:
        return params
    if params.temperature <= W_FREEZE_POINT or snow_depth is not None:
        return params
    if bool((np.asarray(cobjs.specular) > 0.0).any()):
        return params
    return params._replace(specular_enabled=False)


def _auto_types(params: TraceParams, cobjs) -> TraceParams:
    """Record the scene's shape-type presence statically so the traced
    intersect compiles out absent formula families (2-3x on the dense
    [N,M] test for typical 2-3-type scenes)."""
    if params.cobj_types:
        return params
    return params._replace(cobj_types=R.present_types(cobjs))


def _auto_gates(params: TraceParams, cobjs, snow_depth=None) -> TraceParams:
    """All static scene-derived gates in one call.  Every driver in this
    module generates UNIFORM-color ray batches (sky dome / sun / point
    lights), so the bounce-0 weight-only deposit is also enabled here
    (compact path only; a no-op otherwise)."""
    params = _auto_transmission(params, cobjs)
    params = _auto_specular(params, cobjs, snow_depth)
    if params.compact:
        params = params._replace(uniform_color0=True)
    return _auto_types(params, cobjs)


@functools.partial(jax.jit, static_argnames=("nfull", "batch", "params",
                                             "world"))
def _trace_sky_batches(grid, cobjs, mesh, seed, nfull: int, batch: int,
                       params: TraceParams, world: WorldConst,
                       land_color, snow_depth):
    """`nfull` full sky batches chained in ONE device program (lax.scan
    over the batch index).  The per-batch key schedule is identical to
    the host-loop path, so results are bitwise the same — this exists
    purely to remove per-batch host dispatch (~30 un-jitted ray-gen ops
    per batch over the device link)."""
    def body(g, i):
        k = w3d_rng.key(seed, 0x5C1, i)
        rays = sky_rays(jax.random.fold_in(k, 1), batch, world,
                        ray_weight=float(batch))
        g = trace_batch(g, cobjs, mesh, *rays, jax.random.fold_in(k, 2),
                        ltype=L.LIGHTING_SKY, params=params, world=world,
                        land_color=land_color, snow_depth=snow_depth)
        return g, None
    grid, _ = jax.lax.scan(body, grid, jnp.arange(nfull))
    return grid


def compute_sky_lighting(grid, cobjs, mesh, num_rays: int, seed: int = 0,
                         params: TraceParams = TraceParams(),
                         world: WorldConst = DEFAULT_WORLD,
                         batch: int = 65536, land_color=None, snow_depth=None):
    """compute_ray_trace_lighting(LIGHTING_SKY) equivalent: batched.

    Every ray carries constant weight 1.0 regardless of batching (a
    partial final batch must not over-weight its rays, and the volume's
    absolute scale must not depend on num_rays).  Returns the RAW
    accumulated grid — `final_color` consumes it directly (its hue
    ratio is scale-invariant) and incremental cobj-accum deltas compose
    linearly on it; call `normalize_sky` only where mean colors are
    explicitly wanted."""
    params = _auto_gates(params, cobjs, snow_depth)
    if params.compact and params.compact_shift == 0:
        # sky-dome populations collapse fast (most rays escape upward);
        # size the RR slots to the measured survivor curve
        params = params._replace(compact_shift=1)
    nfull, rem = divmod(num_rays, batch)
    if nfull >= 2:      # chain full batches in-graph (one dispatch)
        grid = _trace_sky_batches(grid, cobjs, mesh, jnp.int32(seed),
                                  nfull, batch, params, world,
                                  land_color, snow_depth)
    else:
        for i in range(nfull):
            k = w3d_rng.key(seed, 0x5C1, i)
            rays = sky_rays(jax.random.fold_in(k, 1), batch, world,
                            ray_weight=float(batch))
            grid = trace_batch(grid, cobjs, mesh, *rays,
                               jax.random.fold_in(k, 2),
                               ltype=L.LIGHTING_SKY, params=params,
                               world=world, land_color=land_color,
                               snow_depth=snow_depth)
    if rem:
        k = w3d_rng.key(seed, 0x5C1, nfull)
        rays = sky_rays(jax.random.fold_in(k, 1), rem, world,
                        ray_weight=float(rem))
        grid = trace_batch(grid, cobjs, mesh, *rays, jax.random.fold_in(k, 2),
                           ltype=L.LIGHTING_SKY, params=params, world=world,
                           land_color=land_color, snow_depth=snow_depth)
    return grid


def compute_local_lighting(grid, cobjs, mesh, lights, rays_per_light: int,
                           seed: int = 0, params: TraceParams = TraceParams(),
                           world: WorldConst = DEFAULT_WORLD,
                           land_color=None, snow_depth=None):
    """LIGHTING_LOCAL: one batch per configured light source."""
    params = _auto_gates(params, cobjs, snow_depth)
    for li, (pos, color) in enumerate(lights):
        k = w3d_rng.key(seed, 0x10CA1, li)
        rays = local_rays(jax.random.fold_in(k, 1), rays_per_light, pos, color,
                          world, ray_weight=float(rays_per_light))
        grid = trace_batch(grid, cobjs, mesh, *rays, jax.random.fold_in(k, 2),
                           ltype=L.LIGHTING_LOCAL, params=params, world=world,
                           land_color=land_color, snow_depth=snow_depth)
    return grid


def scene_light_rays(key, spec, n: int, world: WorldConst):
    """Rays for one scene-DSL LightSpec ('L'/'V'/'U' commands) —
    ray_trace_local_light_source equivalent (ray_trace.cpp:889-981):
    point / line / spot / cube lights.

    ray weight = 1000 * alpha * radius / N (ray_trace.cpp:897);
    spotlights modulate per-ray weight by get_dir_intensity
    (light_source.cpp:86-92); line lights space origins along the
    segment; r_inner offsets the origin along a random direction."""
    ks = jax.random.split(key, 8)
    cr, cg, cb = spec.color[0], spec.color[1], spec.color[2]
    alpha = spec.color[3] if len(spec.color) > 3 else 1.0
    radius = max(spec.size, 1e-3)
    ray_wt = 1000.0 * alpha * radius / n

    vx = jax.random.normal(ks[0], (n,))
    vy = jax.random.normal(ks[1], (n,))
    vz = jax.random.normal(ks[2], (n,))
    vl = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-9
    dx, dy, dz = vx / vl, vy / vl, vz / vl

    if getattr(spec, "is_cube_light", False):
        # emit outward from the faces of the cube [pos, pos2]
        lo = jnp.minimum(jnp.asarray(spec.pos), jnp.asarray(spec.pos2))
        hi = jnp.maximum(jnp.asarray(spec.pos), jnp.asarray(spec.pos2))
        u = jax.random.uniform(ks[3], (n, 3))
        p = lo + u * (hi - lo)
        face = jax.random.randint(ks[4], (n,), 0, 6)
        axis = face // 2
        sgn = jnp.where(face % 2 == 1, 1.0, -1.0)
        fpos = jnp.where(sgn > 0, hi[axis], lo[axis])
        p = p.at[jnp.arange(n), axis].set(fpos + 1e-5 * radius * sgn)
        nrm = jnp.zeros((n, 3)).at[jnp.arange(n), axis].set(sgn)
        flip = (dx * nrm[:, 0] + dy * nrm[:, 1] + dz * nrm[:, 2]) < 0
        dx = jnp.where(flip, -dx, dx)
        dy = jnp.where(flip, -dy, dy)
        dz = jnp.where(flip, -dz, dz)
        ox_, oy_, oz_ = p[:, 0], p[:, 1], p[:, 2]
        w = jnp.full((n,), ray_wt)
    else:
        p0 = jnp.asarray(spec.pos, jnp.float32)
        ox_ = jnp.full((n,), p0[0])
        oy_ = jnp.full((n,), p0[1])
        oz_ = jnp.full((n,), p0[2])
        if getattr(spec, "is_line", False):
            fr = jnp.arange(n, dtype=jnp.float32) / max(n - 1, 1)
            p1 = jnp.asarray(spec.pos2, jnp.float32)
            ox_ = p0[0] + fr * (p1[0] - p0[0])
            oy_ = p0[1] + fr * (p1[1] - p0[1])
            oz_ = p0[2] + fr * (p1[2] - p0[2])
        if spec.r_inner > 0.0:
            mx = jax.random.normal(ks[5], (n,))
            my = jax.random.normal(ks[6], (n,))
            mz = jax.random.normal(ks[7], (n,))
            ml = jnp.sqrt(mx * mx + my * my + mz * mz) + 1e-9
            inv = (dx * mx + dy * my + dz * mz) < 0
            s = jnp.where(inv, -spec.r_inner, spec.r_inner)
            ox_ = ox_ + s * mx / ml
            oy_ = oy_ + s * my / ml
            oz_ = oz_ + s * mz / ml
        w = jnp.full((n,), ray_wt)
        bw = float(spec.beamwidth)
        ld = np.asarray(spec.dir, np.float32)
        if bw < 1.0 and float(np.linalg.norm(ld)) > 1e-6:
            # get_dir_intensity(-dir): dp in [-1,1] -> dp_norm [0,1]
            ld = ld / np.linalg.norm(ld)
            dp = dx * ld[0] + dy * ld[1] + dz * ld[2]
            dp_norm = 0.5 * (dp + 1.0)
            inten = jnp.clip(2.0 * (dp_norm + bw + LT_DIR_FALLOFF - 1.0)
                             / LT_DIR_FALLOFF, 0.0, 1.0)
            w = w * inten
    return (ox_, oy_, oz_, dx, dy, dz, w,
            jnp.full((n,), cr), jnp.full((n,), cg), jnp.full((n,), cb))


def compute_scene_lighting(grid, cobjs, mesh, light_specs, rays_per_light: int,
                           seed: int = 0, params: TraceParams = TraceParams(),
                           world: WorldConst = DEFAULT_WORLD,
                           land_color=None, snow_depth=None):
    """LIGHTING_LOCAL over the scene-DSL light list (SceneParse.lights +
    .cube_lights): the end-to-end path from 'L'/'V'/'U' commands to the
    lighting volume."""
    params = _auto_gates(params, cobjs, snow_depth)
    for li, spec in enumerate(light_specs):
        if getattr(spec, "kind", "diffuse") == "ambient":
            continue   # ambient lights tint the base lmap, not ray-traced
        n = spec.num_dlight_rays or rays_per_light
        k = w3d_rng.key(seed, 0x5CE7E, li)
        rays = scene_light_rays(jax.random.fold_in(k, 1), spec, n, world)
        grid = trace_batch(grid, cobjs, mesh, *rays, jax.random.fold_in(k, 2),
                           ltype=L.LIGHTING_LOCAL, params=params, world=world,
                           land_color=land_color, snow_depth=snow_depth)
    return grid
