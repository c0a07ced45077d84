"""Dense directional-sweep sky lighting: the TPU-native reformulation of
the indirect sky precompute.

The reference (and `lighting/trace.py`, which matches it) estimates the
sky term by Monte Carlo: millions of rays scattered into the lmap volume
(ray_trace.cpp:300+, compute_ray_trace_lighting LIGHTING_SKY).  On TPU
that deposit is scatter-latency bound (~42 ns/element — see
docs/DESIGN.md "Path-tracer throughput").  This module computes the SAME
integral densely: voxelize the scene once, then for D cosine-weighted
sky directions run a sheared transmittance scan over the whole volume
(the 3D analog of ops/shadows.py's prefix scan — dense [ny, nx] layer
ops, no gathers, no scatters).  A second sweep pass gathers one diffuse
bounce from lit surfaces (full-sphere directions, emission-weighted).

Result: an exact D-direction quadrature of direct sky visibility (the
dominant term) plus an approximate single diffuse bounce, deterministic,
with no Monte Carlo noise and volume-independent cost (see
scripts/lighting_bench.py for the measured throughput ratio).  The MC
tracer remains the reference-parity path for the full 8-bounce
recursion, specular, and transmission.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst, DEFAULT_WORLD
from ..physics.cobjs import CobjSet, sphere_cobj_test
from . import lmap as L


@functools.partial(jax.jit, static_argnames=("world", "shape"))
def voxelize_scene(cobjs: CobjSet, mesh, grid_z0, grid_dz,
                   shape: tuple, world: WorldConst = DEFAULT_WORLD,
                   land_color=(0.45, 0.42, 0.38)):
    """Scene -> per-cell occupancy + surface albedo.

    Cell centers are tested against every cobj with the narrow-phase
    formulas (a [C, M] pass, chunked by z-layer); cells below the mesh
    surface are solid with the landscape albedo (the tracer's mesh-hit
    albedo, trace.py landscape_color_map)."""
    nz, ny, nx = shape
    xs = (jnp.arange(nx, dtype=jnp.float32) - nx // 2 + 0.5) * world.dx
    ys = (jnp.arange(ny, dtype=jnp.float32) - ny // 2 + 0.5) * world.dy
    X, Y = jnp.meshgrid(xs, ys)                      # [ny, nx]
    mh = None
    if mesh is not None:
        my, mx = mesh.shape
        gx = jnp.clip(X * world.dx_inv + mx // 2, 0, mx - 1.001)
        gy = jnp.clip(Y * world.dy_inv + my // 2, 0, my - 1.001)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        fx = gx - x0
        fy = gy - y0
        mh = ((mesh[y0, x0] * (1 - fx) + mesh[y0, x0 + 1] * fx) * (1 - fy)
              + (mesh[y0 + 1, x0] * (1 - fx) + mesh[y0 + 1, x0 + 1] * fx)
              * fy)

    def layer(zi):
        z = grid_z0 + (zi.astype(jnp.float32) + 0.5) * grid_dz
        px = X.reshape(-1)
        py = Y.reshape(-1)
        pz = jnp.full_like(px, 0.0) + z
        pen, cnx, cny, cnz = sphere_cobj_test(px, py, pz,
                                              jnp.zeros_like(px), cobjs)
        hit = pen > 0.0                              # [C, M]
        occ = jnp.any(hit, axis=1)
        deep = jnp.argmax(jnp.where(hit, pen, -jnp.inf), axis=1)
        cr = cobjs.color_r[deep]
        cg = cobjs.color_g[deep]
        cb = cobjs.color_b[deep]
        cr = jnp.where(occ, cr, 0.0)
        cg = jnp.where(occ, cg, 0.0)
        cb = jnp.where(occ, cb, 0.0)
        if mh is not None:
            below = (z < mh).reshape(-1)
            cr = jnp.where(below & ~occ, land_color[0], cr)
            cg = jnp.where(below & ~occ, land_color[1], cg)
            cb = jnp.where(below & ~occ, land_color[2], cb)
            occ = occ | below
        sh = (ny, nx)
        return (occ.reshape(sh), cr.reshape(sh), cg.reshape(sh),
                cb.reshape(sh))

    # lax.map bounds memory to one layer's [ny*nx, M] narrow-phase
    # intermediates; vmap would materialize all nz layers at once
    occ, ar, ag, ab = jax.lax.map(layer, jnp.arange(nz))
    return occ.astype(jnp.float32), ar, ag, ab


def _ishift(p, k: int, axis: int, fill: float):
    """Integer shift that FILLS the vacated edge instead of wrapping —
    a periodic roll would carry a building's shadow (or its open-sky
    transmittance) across the scene to the opposite edge on oblique
    directions."""
    if k == 0:
        return p
    rolled = jnp.roll(p, k, axis=axis)
    n = p.shape[axis]
    idx = jnp.arange(n)
    mask = (idx < k) if k > 0 else (idx >= n + k)
    shape = [1, 1]
    shape[axis] = n
    return jnp.where(mask.reshape(shape), jnp.float32(fill), rolled)


def _shift2(plane, sx: float, sy: float, fill: float = 0.0):
    """Fractional 2D shift (bilinear), matching ops/shadows.py's shear.
    Cells shifted in from outside the volume take `fill` (1.0 for
    transmittance — the sides see open sky; 0.0 for emission)."""
    def sh(p, s, axis):
        si = int(np.floor(s))
        f = s - si
        a = _ishift(p, si, axis, fill)
        b = _ishift(p, si + 1, axis, fill)
        return a * (1.0 - f) + b * f
    return sh(sh(plane, sx, 1), sy, 0)


def hemisphere_dirs(n: int):
    """Cosine-weighted fixed quadrature over the upper hemisphere
    (Fibonacci spiral in sqrt-cos space); returns unit dirs + weights
    summing to 1 (the tracer's cosine-weighted sky_rays density)."""
    k = np.arange(n) + 0.5
    phi = 2.0 * np.pi * k * 0.6180339887498949
    cos2 = 1.0 - k / n                 # cos^2(theta) uniform -> cosine pdf
    ct = np.sqrt(cos2)
    st = np.sqrt(1.0 - cos2)
    d = np.stack([st * np.cos(phi), st * np.sin(phi), ct], 1)
    w = np.full(n, 1.0 / n)
    return d.astype(np.float32), w.astype(np.float32)


def _sweep_dir(occ, emis_r, emis_g, emis_b, d, world, dz_cell,
               gather_emission: bool):
    """One direction's transmittance (and optional emission-gather) scan.

    Layers scan from the sky down (d points TOWARD the sky): the carry
    is (T, Lr, Lg, Lb) on the current layer's xy grid; each step shears
    the carry by the direction's horizontal run per layer and attenuates
    by the layer passed through."""
    nz = occ.shape[0]
    dzc = max(abs(float(d[2])), 1e-3)
    sx = -float(d[0]) / dzc * float(dz_cell) * float(world.dx_inv)
    sy = -float(d[1]) / dzc * float(dz_cell) * float(world.dy_inv)
    downward = float(d[2]) < 0.0       # source below: scan bottom-up

    def step(carry, zi):
        T, lr, lg, lb = carry
        # pass through layer zi (top -> bottom): shear, attenuate by the
        # crossed layer, and pick up its emission (volume-marching
        # recurrence: L_below = L_above*(1-occ) + emis — each emitter is
        # attenuated by exactly the layers between it and the receiver)
        o = occ[zi]
        T2 = _shift2(T, sx, sy, fill=1.0) * (1.0 - o)   # sides: open sky
        lr2 = _shift2(lr, sx, sy) * (1.0 - o)
        lg2 = _shift2(lg, sx, sy) * (1.0 - o)
        lb2 = _shift2(lb, sx, sy) * (1.0 - o)
        if gather_emission:
            lr2 = lr2 + emis_r[zi]
            lg2 = lg2 + emis_g[zi]
            lb2 = lb2 + emis_b[zi]
        return (T2, lr2, lg2, lb2), (T2, lr2, lg2, lb2)

    ny, nx = occ.shape[1:]
    one = jnp.ones((ny, nx), jnp.float32)
    zero = jnp.zeros((ny, nx), jnp.float32)
    order = (jnp.arange(nz) if downward
             else jnp.arange(nz - 1, -1, -1))
    _, (T, lr, lg, lb) = jax.lax.scan(step, (one, zero, zero, zero),
                                      order)
    if downward:
        return (T, lr, lg, lb)
    return (T[::-1], lr[::-1], lg[::-1], lb[::-1])


def voxelize_for_grid(grid: L.LightGrid, cobjs: CobjSet, mesh,
                      world: WorldConst = DEFAULT_WORLD):
    """Precompute the (occ, ar, ag, ab) voxelization once for a scene;
    pass it as `vox=` to BOTH sweep solvers — the dense [cells x cobjs]
    narrow-phase pass is the dominant cost and need not run twice."""
    return voxelize_scene(cobjs, mesh, grid.z0, grid.dz, grid.shape, world)


def compute_sky_lighting_sweep(grid: L.LightGrid, cobjs: CobjSet, mesh,
                               ndirs: int = 32,
                               sky_color=(0.7, 0.8, 1.0),
                               world: WorldConst = DEFAULT_WORLD,
                               bounce: bool = True,
                               vox=None) -> L.LightGrid:
    """Dense replacement for `compute_sky_lighting` (direct + one diffuse
    bounce): fills the sky channels so `final_color` reads identically
    (sv = visibility weight, sc = mean arriving color).  The cell height
    is read eagerly (it parameterizes the static shear), then the whole
    solve runs as one jitted program.  `vox`: optional precomputed
    `voxelize_for_grid` result shared with the global sweep."""
    dzf = float(jax.device_get(grid.dz))
    return _sweep_impl(grid, cobjs, mesh, dzf, ndirs, tuple(sky_color),
                       world, bounce, vox)


@functools.partial(jax.jit, static_argnames=("dzf", "ndirs", "sky_color",
                                             "world", "bounce"))
def _sweep_impl(grid: L.LightGrid, cobjs: CobjSet, mesh, dzf: float,
                ndirs: int, sky_color, world: WorldConst,
                bounce: bool, vox=None) -> L.LightGrid:
    occ, ar, ag, ab = vox if vox is not None else voxelize_scene(
        cobjs, mesh, grid.z0, grid.dz, grid.shape, world)
    dirs, w = hemisphere_dirs(ndirs)
    air = 1.0 - occ

    V = jnp.zeros_like(occ)
    Varr = jnp.zeros_like(occ)          # irradiance ARRIVING at a cell
    # (transmittance before the cell's own layer attenuates it) — this
    # is what a solid cell's surface receives and re-emits
    for k in range(ndirs):
        T, _, _, _ = _sweep_dir(occ, None, None, None, dirs[k], world,
                                dzf, gather_emission=False)
        V = V + w[k] * T
        Varr = Varr + w[k] * jnp.concatenate(
            [T[1:], jnp.ones_like(T[:1])], axis=0)
    sr = V * sky_color[0]
    sg = V * sky_color[1]
    sb = V * sky_color[2]
    sv = V

    if bounce:
        # surface cells re-emit received sky light diffusely: emission =
        # albedo * visibility at the cell (the tracer's first-bounce
        # weight cr*albedo), gathered along the same direction set both
        # up and down (surfaces radiate into the full sphere)
        er = ar * Varr * sky_color[0]
        eg = ag * Varr * sky_color[1]
        eb = ab * Varr * sky_color[2]
        br = jnp.zeros_like(V)
        bg = jnp.zeros_like(V)
        bb = jnp.zeros_like(V)
        for k in range(ndirs):
            for sgn in (1.0, -1.0):
                d = dirs[k] * np.float32(sgn)
                if abs(float(d[2])) < 1e-3:
                    continue
                _, lr, lg, lb = _sweep_dir(occ, er, eg, eb, d, world,
                                           dzf, gather_emission=True)
                br = br + 0.5 * w[k] * lr
                bg = bg + 0.5 * w[k] * lg
                bb = bb + 0.5 * w[k] * lb
        lum = jnp.maximum(jnp.maximum(br, bg), bb)
        sr = sr + br
        sg = sg + bg
        sb = sb + bb
        sv = sv + lum

    # air cells only (the lmap stores lighting for open cells)
    return grid._replace(sc_r=grid.sc_r + air * sr,
                         sc_g=grid.sc_g + air * sg,
                         sc_b=grid.sc_b + air * sb,
                         sv=grid.sv + air * sv)


def compute_global_lighting_sweep(grid: L.LightGrid, cobjs: CobjSet, mesh,
                                  sun_dir, sun_color=(1.0, 0.95, 0.85),
                                  world: WorldConst = DEFAULT_WORLD,
                                  bounce: bool = True,
                                  vox=None) -> L.LightGrid:
    """Dense replacement for `compute_global_lighting` (the sun/moon
    term, trace_ray_block_global): the directional transmittance is ONE
    exact sweep — no rays at all — plus the optional diffuse bounce
    gather.  Fills the global channels (gv weight, gc mean color).
    `vox`: optional precomputed `voxelize_for_grid` result shared with
    the sky sweep."""
    dzf = float(jax.device_get(grid.dz))
    sd = np.asarray(sun_dir, np.float64)
    sd = (sd / np.linalg.norm(sd)).astype(np.float32)  # sun -> scene
    return _global_impl(grid, cobjs, mesh, dzf, tuple(float(v) for v in sd),
                        tuple(sun_color), world, bounce, vox)


@functools.partial(jax.jit, static_argnames=("dzf", "sun_dir", "sun_color",
                                             "world", "bounce"))
def _global_impl(grid: L.LightGrid, cobjs: CobjSet, mesh, dzf: float,
                 sun_dir, sun_color, world: WorldConst,
                 bounce: bool, vox=None) -> L.LightGrid:
    occ, ar, ag, ab = vox if vox is not None else voxelize_scene(
        cobjs, mesh, grid.z0, grid.dz, grid.shape, world)
    air = 1.0 - occ
    # direction from a cell TOWARD the sun.  A near-horizontal sun has
    # no vertical transmittance path through the volume (and the shear
    # would wrap around the periodic roll) — treat it as below-horizon:
    # zero direct light
    d = np.asarray([-sun_dir[0], -sun_dir[1], -sun_dir[2]], np.float32)
    if abs(float(d[2])) < 0.02:
        return grid
    T, _, _, _ = _sweep_dir(occ, None, None, None, d, world, dzf,
                            gather_emission=False)
    Tarr = jnp.concatenate([T[1:], jnp.ones_like(T[:1])], axis=0) \
        if d[2] >= 0 else \
        jnp.concatenate([jnp.ones_like(T[:1]), T[:-1]], axis=0)
    gr = T * sun_color[0]
    gg = T * sun_color[1]
    gb = T * sun_color[2]
    gv = T
    if bounce:
        er = ar * Tarr * sun_color[0]
        eg = ag * Tarr * sun_color[1]
        eb = ab * Tarr * sun_color[2]
        dirs, w = hemisphere_dirs(8)
        br = jnp.zeros_like(T)
        bg = jnp.zeros_like(T)
        bb = jnp.zeros_like(T)
        for k in range(len(w)):
            for sgn in (1.0, -1.0):
                dk = dirs[k] * np.float32(sgn)
                if abs(float(dk[2])) < 1e-3:
                    continue
                _, lr, lg, lb = _sweep_dir(occ, er, eg, eb, dk, world,
                                           dzf, gather_emission=True)
                br = br + 0.5 * w[k] * lr
                bg = bg + 0.5 * w[k] * lg
                bb = bb + 0.5 * w[k] * lb
        lum = jnp.maximum(jnp.maximum(br, bg), bb)
        gr = gr + br
        gg = gg + bg
        gb = gb + bb
        gv = gv + lum
    return grid._replace(gc_r=grid.gc_r + air * gr,
                         gc_g=grid.gc_g + air * gg,
                         gc_b=grid.gc_b + air * gb,
                         gv=grid.gv + air * gv)
