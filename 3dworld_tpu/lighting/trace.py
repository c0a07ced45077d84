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
SNOW_ALBEDO = 0.9
MESH_ALBEDO = (0.55, 0.45, 0.30)  # approx landscape texture color (the
# reference samples the generated terrain texture; get_landscape_texture_color)


class TraceParams(NamedTuple):
    max_bounces: int = 8
    samples_per_segment: int = 16
    line_length: float = 32.0
    water_plane_z: float = -1.0e9
    specular_enabled: bool = True
    mesh_steps: int = 24           # heightfield-march samples per ray
    exact_mesh: bool = False       # DDA cell-walking intersect (exact,
                                   # ~2x the cost of the sampled march)


def _luminance(r, g, b):
    return 0.299 * r + 0.587 * g + 0.114 * b  # colorRGBA::get_luminance


def _accumulate_segment(grid, ltype, ox, oy, oz, dx, dy, dz, t_hit, w, cr, cg, cb,
                        alive, S, world):
    """Walk each ray's segment [0, t_hit] with S jittered samples and
    scatter color*weight/S into the volume (add_path_to_lmcs)."""
    fr = (jnp.arange(S, dtype=jnp.float32)[None, :] + 0.5) / S     # [1,S]
    ts = fr * t_hit[:, None]                                       # [N,S]
    px = ox[:, None] + ts * dx[:, None]
    py = oy[:, None] + ts * dy[:, None]
    pz = oz[:, None] + ts * dz[:, None]
    idx, ok = L.cell_index(grid, px.reshape(-1), py.reshape(-1), pz.reshape(-1), world)
    wv = jnp.broadcast_to((w * alive / S)[:, None], ts.shape).reshape(-1)
    rv = jnp.broadcast_to(cr[:, None], ts.shape).reshape(-1)
    gv = jnp.broadcast_to(cg[:, None], ts.shape).reshape(-1)
    bv = jnp.broadcast_to(cb[:, None], ts.shape).reshape(-1)
    return L.accumulate(grid, ltype, idx, ok, rv, gv, bv, wv)


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
) -> L.LightGrid:
    """Trace one flat ray batch to completion, accumulating into `grid`."""
    N = ox.shape[0]
    LL = params.line_length
    state = dict(ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                 w=w0, r=cr, g=cg, b=cb,
                 alive=jnp.ones((N,), bool), grid=grid)
    w_init = w0

    def bounce(st, key_d):
        ox, oy, oz = st["ox"], st["oy"], st["oz"]
        dx, dy, dz = st["dx"], st["dy"], st["dz"]
        tmax = jnp.full((N,), LL)
        chit, ct, cnx, cny, cnz, coh = R.ray_cobjs_nearest(
            ox, oy, oz, dx, dy, dz, tmax, cobjs)
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

        alive = st["alive"]
        contrib = alive & hit    # un-hit rays deposit nothing (ray_trace.cpp:341)
        grid2 = _accumulate_segment(
            st["grid"], ltype, ox, oy, oz, dx, dy, dz, t,
            st["w"] * contrib.astype(jnp.float32), st["r"], st["g"], st["b"],
            jnp.ones((N,), jnp.float32), params.samples_per_segment, world)

        # hit point + normal
        hx = ox + t * dx
        hy = oy + t * dy
        hz = oz + t * dz
        mnh, mnx, mny, mnz = None, None, None, None
        from ..physics.step import sample_mesh
        _, mx_, my_, mz_ = sample_mesh(mesh, hx, hy, world)
        nx = jnp.where(use_mesh, mx_, cnx)
        ny = jnp.where(use_mesh, my_, cny)
        nz = jnp.where(use_mesh, mz_, cnz)

        # water crossing attenuation (ray_trace.cpp:347-365 simplified):
        wpz = params.water_plane_z
        crossed = hit & (oz >= wpz) & (hz < wpz)
        wdepth = jnp.maximum(wpz - hz, 0.0)
        awater = jnp.exp(-2.0 * wdepth)  # depth attenuation
        watt = jnp.where(crossed, 0.95 * awater, 1.0)

        # albedo: cobj color (one-hot reduce) or mesh landscape color
        acr = coh @ cobjs.color_r
        acg = coh @ cobjs.color_g
        acb = coh @ cobjs.color_b
        aspec = coh @ cobjs.specular
        ashine = coh @ cobjs.shine
        acr = jnp.where(use_mesh, MESH_ALBEDO[0], acr)
        acg = jnp.where(use_mesh, MESH_ALBEDO[1], acg)
        acb = jnp.where(use_mesh, MESH_ALBEDO[2], acb)
        aspec = jnp.where(use_mesh, 0.0, aspec)
        lum = _luminance(acr, acg, acb)
        refl = DIFFUSE_REFL * (1.0 - aspec) + SPEC_REFL * aspec
        w = st["w"] * lum * refl * watt
        r = st["r"] * acr * watt
        g = st["g"] * acg * watt
        b = st["b"] * acb * watt

        alive = contrib & (jnp.abs(w) >= WEIGHT_THRESH * jnp.abs(w_init))

        # scatter: cosine hemisphere, or shine-blurred mirror for specular
        k1, k2, k3 = jax.random.split(key_d, 3)
        sdx, sdy, sdz = R.cosine_hemisphere_dirs(k1, nx, ny, nz, (N,))
        if params.specular_enabled:
            vdotn = dx * nx + dy * ny + dz * nz
            rx_ = dx - 2.0 * vdotn * nx
            ry_ = dy - 2.0 * vdotn * ny
            rz_ = dz - 2.0 * vdotn * nz
            jx = jax.random.normal(k2, (N,))
            jy = jax.random.normal(k3, (N,))
            jz = jax.random.normal(jax.random.fold_in(k2, 1), (N,))
            jl = jnp.sqrt(jx * jx + jy * jy + jz * jz) + 1e-9
            blur = 1.0 / jnp.sqrt(jnp.maximum(ashine, 1.0))
            spx = rx_ + blur * jx / jl
            spy = ry_ + blur * jy / jl
            spz = rz_ + blur * jz / jl
            spl = jnp.sqrt(spx * spx + spy * spy + spz * spz) + 1e-9
            do_spec = (aspec > 0.0) & (ashine > 1.0) & \
                      (jax.random.uniform(jax.random.fold_in(k3, 2), (N,)) < aspec)
            sdx = jnp.where(do_spec, spx / spl, sdx)
            sdy = jnp.where(do_spec, spy / spl, sdy)
            sdz = jnp.where(do_spec, spz / spl, sdz)

        eps = 1e-4
        new = dict(
            ox=hx + eps * nx, oy=hy + eps * ny, oz=hz + eps * nz,
            dx=sdx, dy=sdy, dz=sdz,
            w=w, r=r, g=g, b=b, alive=alive, grid=grid2,
        )
        return new, None

    keys = jax.random.split(key, params.max_bounces)
    state, _ = jax.lax.scan(bounce, state, keys)
    return state["grid"]


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


def compute_sky_lighting(grid, cobjs, mesh, num_rays: int, seed: int = 0,
                         params: TraceParams = TraceParams(),
                         world: WorldConst = DEFAULT_WORLD,
                         batch: int = 65536):
    """compute_ray_trace_lighting(LIGHTING_SKY) equivalent: batched."""
    nb = -(-num_rays // batch)
    for i in range(nb):
        k = w3d_rng.key(seed, 0x5C1, i)
        rays = sky_rays(jax.random.fold_in(k, 1), min(batch, num_rays - i * batch),
                        world, ray_weight=float(num_rays))
        grid = trace_batch(grid, cobjs, mesh, *rays, jax.random.fold_in(k, 2),
                           ltype=L.LIGHTING_SKY, params=params, world=world)
    return L.normalize_sky(grid)


def compute_local_lighting(grid, cobjs, mesh, lights, rays_per_light: int,
                           seed: int = 0, params: TraceParams = TraceParams(),
                           world: WorldConst = DEFAULT_WORLD):
    """LIGHTING_LOCAL: one batch per configured light source."""
    for li, (pos, color) in enumerate(lights):
        k = w3d_rng.key(seed, 0x10CA1, li)
        rays = local_rays(jax.random.fold_in(k, 1), rays_per_light, pos, color,
                          world, ray_weight=float(rays_per_light))
        grid = trace_batch(grid, cobjs, mesh, *rays, jax.random.fold_in(k, 2),
                           ltype=L.LIGHTING_LOCAL, params=params, world=world)
    return grid
