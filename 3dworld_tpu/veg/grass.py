"""Grass: per-blade tile blocks with wind animation and burn/cut state.

The reference generates per-blade grass quads in tile blocks with density
maps, wind sway, and burnable/cuttable per-blade state (grass.cpp:1141,
grass_tile_manager_t grass.h:58).  TPU form: a tile's blades are hashed
SoA arrays (position/dir/height), wind sway is one fused elementwise
program over all blades, and burn/cut state is a per-blade scalar.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import rng as w3d_rng


class GrassBlock(NamedTuple):
    """SoA blades for one tile block."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    dir_x: jax.Array    # blade lean direction
    dir_y: jax.Array
    height: jax.Array
    width: jax.Array
    burn: jax.Array     # 0 = green, 1 = fully burned
    cut: jax.Array      # remaining height fraction (cuttable state)


def gen_grass_block(seed: int, tile_x0: float, tile_y0: float,
                    zvals, grass_weight, world, blades_per_cell: int = 4,
                    grass_length: float = 0.02) -> GrassBlock:
    """Blades for a tile: positions hashed per (cell, blade); density
    gated by the biome grass weight (grass density maps)."""
    my, mx = zvals.shape
    n = my * mx * blades_per_cell
    idx = jnp.arange(n, dtype=jnp.uint32)
    cell = idx // blades_per_cell
    h1 = w3d_rng.xxhash_u32(idx, seed=seed)
    h2 = w3d_rng.xxhash_u32(idx, seed=seed + 1)
    h3 = w3d_rng.xxhash_u32(idx, seed=seed + 2)
    u1 = (h1 >> 8).astype(jnp.float32) / (1 << 24)
    u2 = (h2 >> 8).astype(jnp.float32) / (1 << 24)
    u3 = (h3 >> 8).astype(jnp.float32) / (1 << 24)
    cy = (cell // mx).astype(jnp.float32)
    cx = (cell % mx).astype(jnp.float32)
    gx = tile_x0 + cx + u1
    gy = tile_y0 + cy + u2
    x = gx * world.dx
    y = gy * world.dy
    z = jnp.take(zvals.reshape(-1), cell)
    gw = jnp.take(grass_weight.reshape(-1), cell)
    keep = u3 < gw  # density by grass biome weight
    ang = 2 * np.pi * ((h1 ^ h2).astype(jnp.float32) % 1024) / 1024.0
    height = grass_length * (0.7 + 0.6 * u2) * keep.astype(jnp.float32)
    return GrassBlock(
        x=x, y=y, z=z,
        dir_x=jnp.cos(ang), dir_y=jnp.sin(ang),
        height=height, width=jnp.full((n,), 0.1 * grass_length),
        burn=jnp.zeros((n,)), cut=jnp.ones((n,)),
    )


@jax.jit
def wind_sway(block: GrassBlock, wind_x, wind_y, time):
    """Per-blade wind offset at the blade tip (grass wind animation):
    phase from position, amplitude from wind speed and blade height."""
    phase = 2.3 * block.x + 1.7 * block.y + 2.0 * time
    amp = 0.35 * jnp.sqrt(wind_x * wind_x + wind_y * wind_y)
    sway = amp * (0.6 + 0.4 * jnp.sin(phase)) * block.height * block.cut
    return block.x + sway * wind_x, block.y + sway * wind_y, \
        block.z + block.height * block.cut


@jax.jit
def burn_grass_at(block: GrassBlock, cx, cy, radius, amount=1.0):
    """Ground-fire burn (enable_grass_fire / burn_grass semantics)."""
    d2 = (block.x - cx) ** 2 + (block.y - cy) ** 2
    f = jnp.maximum(1.0 - d2 / jnp.maximum(radius * radius, 1e-9), 0.0)
    return block._replace(burn=jnp.clip(block.burn + amount * f, 0.0, 1.0))


@jax.jit
def cut_grass_at(block: GrassBlock, cx, cy, radius, height_frac=0.25):
    """Mow grass in a radius (modify_grass_at cut path)."""
    d2 = (block.x - cx) ** 2 + (block.y - cy) ** 2
    inside = d2 <= radius * radius
    return block._replace(cut=jnp.where(inside, jnp.minimum(block.cut, height_frac),
                                        block.cut))


# ---------------------------------------------------------------------------
# flowers (flower_manager_t::add_flowers, grass.cpp:813-839): per-cell
# flower_density * grass_density flowers, a sine-noise density test, and
# colors {WHITE, YELLOW, LT_BLUE} from a second noise field
# ---------------------------------------------------------------------------

FLOWER_COLORS = ((1.0, 1.0, 1.0),     # WHITE
                 (1.0, 1.0, 0.0),     # YELLOW
                 (0.6, 0.8, 1.0))     # LT_BLUE


class FlowerSet(NamedTuple):
    """SoA flowers for one tile block (flower_t fields)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    nx: jax.Array       # facing normal (mostly +z)
    ny: jax.Array
    nz: jax.Array
    radius: jax.Array
    height: jax.Array
    color: jax.Array    # [N, 3]
    alive: jax.Array    # density-gated mask


def gen_flowers(seed: int, tile_x0: float, tile_y0: float, zvals,
                grass_weight, world, flower_density: float = 1.0,
                grass_length: float = 0.02, grass_width: float = 0.002,
                max_per_cell: int = 2) -> FlowerSet:
    """Flowers for a tile: cells with grass density >= 0.5 spawn up to
    round(flower_density * density) flowers, gated by a hashed noise
    test (the reference's two force_sine density_gen fields are stood in
    by two xxhash-derived fields; same mechanism: one gates placement,
    one picks the color)."""
    my, mx = zvals.shape
    n = my * mx * max_per_cell
    idx = jnp.arange(n, dtype=jnp.uint32)
    cell = idx // max_per_cell
    slot = (idx % max_per_cell).astype(jnp.float32)
    h1 = w3d_rng.xxhash_u32(idx, seed=seed + 0xF10)
    h2 = w3d_rng.xxhash_u32(idx, seed=seed + 0xF11)
    h3 = w3d_rng.xxhash_u32(idx, seed=seed + 0xF12)
    h4 = w3d_rng.xxhash_u32(cell.astype(jnp.uint32), seed=seed + 0xF13)
    h5 = w3d_rng.xxhash_u32(cell.astype(jnp.uint32), seed=seed + 0xF14)
    u = lambda h: (h >> 8).astype(jnp.float32) / (1 << 24)
    u1, u2, u3, dval, cval = u(h1), u(h2), u(h3), u(h4), u(h5)
    gden = jnp.take(grass_weight.reshape(-1), cell)
    num_per_bin = jnp.round(flower_density * gden)
    keep = (gden >= 0.5) & (slot < num_per_bin)
    # density-function test (dval + jitter > hthresh -> skip)
    keep = keep & ((dval + 0.2 * (u1 - 0.5)) <= 0.75)
    cy = (cell // mx).astype(jnp.float32)
    cx = (cell % mx).astype(jnp.float32)
    x = (tile_x0 + cx + u1) * world.dx
    y = (tile_y0 + cy + u2) * world.dy
    z = jnp.take(zvals.reshape(-1), cell)
    height = grass_length * (0.85 + 0.15 * u2)
    radius = grass_width * (1.5 + 1.0 * u3)
    # normal: +z with +-0.2 jitter
    jx = 0.2 * (2.0 * u1 - 1.0)
    jy = 0.2 * (2.0 * u3 - 1.0)
    nl = jnp.sqrt(jx * jx + jy * jy + 1.0)
    cols = jnp.asarray(FLOWER_COLORS, jnp.float32)
    cidx = (0.5 * 3 * (cval + 0.25 * (2.0 * u3 - 1.0))).astype(jnp.int32) % 3
    return FlowerSet(
        x=x, y=y, z=z + height,
        nx=jx / nl, ny=jy / nl, nz=1.0 / nl,
        radius=radius, height=height,
        color=cols[cidx], alive=keep)


# ---------------------------------------------------------------------------
# ground fire spread (enable_grass_fire / add_ground_fire: fire creeps
# across grass cells, biased downwind, consuming fuel)
# ---------------------------------------------------------------------------

class GroundFire(NamedTuple):
    """Cell grids: fire intensity [my, mx] and remaining fuel [my, mx]
    (fuel ~ unburned grass density)."""

    intensity: jax.Array
    fuel: jax.Array


def make_ground_fire(fuel_map) -> GroundFire:
    f = jnp.asarray(fuel_map, jnp.float32)
    return GroundFire(intensity=jnp.zeros_like(f), fuel=f)


def ignite_at(gf: GroundFire, gx: int, gy: int, amount: float = 1.0):
    return gf._replace(intensity=gf.intensity.at[gy, gx].add(amount))


@functools.partial(jax.jit, static_argnames=())
def step_ground_fire(gf: GroundFire, wind_x, wind_y,
                     spread: float = 0.35, burn_rate: float = 0.15,
                     decay: float = 0.9, ignite_thresh: float = 0.05
                     ) -> GroundFire:
    """One spread tick: intensity diffuses to the 4-neighborhood with a
    downwind bias, ignites cells with fuel, consumes fuel, and decays
    where fuel is gone — the reference's creeping grass fire as a
    cellular automaton (one fused stencil, no scatter)."""
    I = gf.intensity
    wxp = jnp.clip(wind_x, 0.0, 10.0)
    wxn = jnp.clip(-wind_x, 0.0, 10.0)
    wyp = jnp.clip(wind_y, 0.0, 10.0)
    wyn = jnp.clip(-wind_y, 0.0, 10.0)
    # neighbor inflow, upwind neighbors contribute more downwind
    inflow = (jnp.roll(I, 1, 1) * (1.0 + wxp) + jnp.roll(I, -1, 1) * (1.0 + wxn)
              + jnp.roll(I, 1, 0) * (1.0 + wyp) + jnp.roll(I, -1, 0) * (1.0 + wyn))
    catch = (inflow * spread * 0.25 > ignite_thresh) & (gf.fuel > 0.05)
    intensity = jnp.where(catch, jnp.maximum(I, inflow * spread * 0.25), I)
    burning = intensity > ignite_thresh
    burn = jnp.minimum(gf.fuel, burn_rate * intensity) * burning
    fuel = gf.fuel - burn
    # fire feeds on fuel (front self-sustains) and decays on spent cells
    intensity = jnp.where(burning & (fuel > 0.05),
                          jnp.minimum(intensity * 1.4, 1.5),
                          intensity * decay)
    intensity = jnp.where(intensity < 1e-3, 0.0, intensity)
    return GroundFire(intensity=intensity, fuel=fuel)


def scorch_grass(block: GrassBlock, gf: GroundFire, world,
                 rate: float = 0.3) -> GrassBlock:
    """Apply the fire grid to per-blade burn state (bilinear sample of
    intensity at each blade, like burn_grass_at but field-driven)."""
    my, mx = gf.intensity.shape
    gx = jnp.clip(block.x * world.dx_inv + mx // 2, 0, mx - 1).astype(jnp.int32)
    gy = jnp.clip(block.y * world.dy_inv + my // 2, 0, my - 1).astype(jnp.int32)
    inten = gf.intensity[gy, gx]
    return block._replace(burn=jnp.clip(block.burn + rate * inten, 0.0, 1.0))
