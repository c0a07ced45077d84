"""Building indirect lighting manager.

building_indir_light_mgr_t (building_lighting.cpp:837-1110): one room
light is traced at a time on a background thread fed by a job queue;
each light's rays accumulate into the building-local light map, merged
incrementally so gameplay sees lighting appear light-by-light; toggling
or moving a light invalidates and re-enqueues it.

TPU port: the "background thread" is simply the async device — each
`process_one` call launches one light's batched trace (cosine-weighted
rays from the light, lighting/trace.py) into that light's own cached
volume; `composite` sums the enabled lights' volumes (linear, so
per-light caching gives exact incremental updates and instant
enable/disable).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst, DEFAULT_WORLD
from . import lmap as L
from . import trace as TR


@dataclass
class BuildingIndirManager:
    """Queue-driven per-room-light indirect volumes."""

    world: WorldConst = DEFAULT_WORLD
    rays_per_light: int = 1024
    params: TR.TraceParams = TR.TraceParams(max_bounces=3,
                                            samples_per_segment=8,
                                            mesh_steps=8)
    lights: dict = field(default_factory=dict)    # ix -> (pos, color)
    enabled: dict = field(default_factory=dict)   # ix -> bool
    volumes: dict = field(default_factory=dict)   # ix -> LightGrid
    queue: deque = field(default_factory=deque)

    def register_light(self, ix: int, pos, color, enabled: bool = True):
        """Add/replace a room light; a changed light drops its cached
        volume and re-enqueues (the reference's invalidation path)."""
        changed = ix in self.lights and self.lights[ix] != (tuple(pos),
                                                           tuple(color))
        self.lights[ix] = (tuple(pos), tuple(color))
        self.enabled[ix] = enabled
        if changed or ix not in self.volumes:
            self.volumes.pop(ix, None)
            self.enqueue(ix)

    def enqueue(self, ix: int):
        if ix not in self.queue:
            self.queue.append(ix)

    def set_enabled(self, ix: int, enabled: bool):
        """Toggling costs nothing — the cached volume just joins/leaves
        the composite."""
        self.enabled[ix] = enabled

    @property
    def pending(self) -> int:
        return len(self.queue)

    def process_one(self, cobjs, mesh, seed: int = 0) -> int | None:
        """Trace the next queued light into its own volume; returns the
        light ix processed (None if idle)."""
        while self.queue:
            ix = self.queue.popleft()
            if ix in self.lights:
                break
        else:
            return None
        pos, color = self.lights[ix]
        key = jax.random.key(seed * 7919 + ix)
        ox, oy, oz, dx, dy, dz, w, cr, cg, cb = TR.local_rays(
            key, self.rays_per_light, pos, color, self.world)
        grid = L.make_light_grid(self.world)
        grid = TR.trace_batch(grid, cobjs, mesh, ox, oy, oz, dx, dy, dz,
                              w, cr, cg, cb, key, ltype=L.LIGHTING_LOCAL,
                              params=self.params, world=self.world)
        self.volumes[ix] = grid
        return ix

    def composite(self) -> L.LightGrid:
        """Sum of all enabled lights' cached volumes."""
        out = L.make_light_grid(self.world)
        lr, lg, lb = out.lc_r, out.lc_g, out.lc_b
        for ix, vol in self.volumes.items():
            if self.enabled.get(ix, False):
                lr = lr + vol.lc_r
                lg = lg + vol.lc_g
                lb = lb + vol.lc_b
        return out._replace(lc_r=lr, lc_g=lg, lc_b=lb)
