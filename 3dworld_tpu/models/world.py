"""World-mode frame orchestration: the three top-level loops.

The reference's `display()` branches on world mode (3DWorld.h:1360):
WMODE_GROUND runs physics + water + smoke + draw (display_world.cpp:768),
WMODE_INF_TERRAIN streams tiles + city sim across 3 OMP threads (:1219),
WMODE_UNIVERSE pages cells + steps ships on 2 threads
(Universe_control.cpp:278).

Here each mode's per-frame compute is a composition of the jitted
subsystem steps; the OMP functional splits disappear — the device
pipeline runs them as one program (ground) or host-orchestrated jitted
calls (tiled/universe, whose host sides stream content)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import WorldConst
from ..physics import step as PS
from ..water import ripples as WR, smoke as WSM
from ..scene.loader import GroundScene

WMODE_GROUND = 0
WMODE_UNIVERSE = 1
WMODE_INF_TERRAIN = 2


# ---------------------------------------------------------------------------
# ground mode
# ---------------------------------------------------------------------------

def with_valley_water(scene: GroundScene, volumes_per_basin) -> GroundScene:
    """Fill terrain basins and feed the per-cell water surface into the
    physics env (water_matrix wiring: valleys -> check_water_collision)."""
    from ..water import valleys as WV

    _labels, _zv, water, _wet = WV.fill_valleys(
        scene.env.mesh_height, volumes_per_basin, scene.world)
    scene.env = scene.env._replace(water_height=water)
    return scene


def ground_frame(scene: GroundScene, substeps: int = 4,
                 obj_collisions: bool = True) -> GroundScene:
    """One WMODE_GROUND frame: platforms + process_groups + ripples
    (display() loop; platform/trigger pass = display_world.cpp:889)."""
    from ..physics import platforms as PP

    if scene.platforms is not None and scene.platforms.size > 0:
        st0 = scene.objects
        trig = None
        if scene.triggers is not None and scene.triggers.x.shape[0] > 0:
            trig = PP.eval_triggers(scene.triggers, st0.px, st0.py, st0.pz,
                                    scene.platforms)
        plats, mx, my, mz = PP.advance_platforms(scene.platforms, trig)
        rad = scene.table.radius[st0.otype]
        dx, dy, dz = PP.rider_deltas(st0.px, st0.py, st0.pz, st0.status,
                                     scene.cobjs, plats, mx, my, mz, rad)
        scene.cobjs = PP.apply_platform_motion(scene.cobjs, plats, mx, my, mz)
        scene.objects = st0._replace(px=st0.px + dx, py=st0.py + dy,
                                     pz=st0.pz + dz)
        scene.platforms = plats
    st = PS.step_objects(scene.objects, scene.env, scene.cobjs, scene.table,
                         substeps=substeps, world=scene.world,
                         obj_collisions=obj_collisions)
    wpz = scene.env.water_plane_z
    inside = wpz > scene.terrain.mesh_height
    depth = jnp.maximum(wpz - scene.terrain.mesh_height, 0.0)
    ripples, _ = WR.step_ripples(scene.ripples, inside, depth)
    scene.objects = st
    scene.ripples = ripples
    return scene


import functools


@functools.partial(jax.jit, static_argnames=("frames", "substeps",
                                             "obj_collisions", "world"))
def ground_frames_chained(objects, env, cobjs, table, ripples, player,
                          move_xy, world: WorldConst, frames: int,
                          substeps: int = 4, obj_collisions: bool = True):
    """K ground frames in ONE dispatch (lax.scan): physics + ripples +
    player per frame, chained on-device so the live app loop amortizes
    the per-dispatch relay/host round trip (~28 ms on the axon tunnel)
    instead of paying it every frame — the same trick bench.py uses.

    `move_xy` is [frames, 2] per-frame player input.  Platforms (host
    branch in ground_frame) are not chained; scenes with platforms use
    the per-frame path.  Returns (objects, ripples, player, live[frames]).
    """
    from ..gameplay import player as PL

    wpz = env.water_plane_z
    inside = wpz > env.mesh_height
    depth = jnp.maximum(wpz - env.mesh_height, 0.0)

    def body(carry, mv):
        st, rip, ply = carry
        st = PS.step_objects(st, env, cobjs, table, substeps=substeps,
                             world=world, obj_collisions=obj_collisions)
        rip, _ = WR.step_ripples(rip, inside, depth)
        ply = PL.step_player(ply, env.mesh_height, cobjs, mv[0], mv[1],
                             False, world=world)
        return (st, rip, ply), jnp.sum(st.status > 0)

    (st, rip, ply), live = jax.lax.scan(
        body, (objects, ripples, player), move_xy, length=frames)
    return st, rip, ply, live


# ---------------------------------------------------------------------------
# tiled-terrain mode
# ---------------------------------------------------------------------------

@dataclass
class TiledWorld:
    """WMODE_INF_TERRAIN session: streamed tiles + city + traffic."""

    tile_mgr: object
    road_graph: object = None
    cars: object = None
    peds: object = None
    stoplights: object = None
    ped_nav: object = None
    building_people: list = field(default_factory=list)  # BuildingPeopleSim
    frame: int = 0
    key: object = field(default_factory=lambda: jax.random.key(0))

    def step(self, cam_x: float, cam_y: float):
        """display_inf_terrain: tile streaming + stoplight/car/ped
        updates + building AI (the reference's 3-thread city frame
        covers cars, peds AND building people together,
        display_world.cpp:1295-1309; the OMP split becomes sequential
        jitted dispatches; next_city_frame, city_gen.cpp:3801)."""
        from ..city import traffic as CT

        created, deleted = self.tile_mgr.update(cam_x, cam_y)
        if self.stoplights is not None:
            self.stoplights = CT.step_stoplights(self.stoplights)
        if self.cars is not None:
            self.cars = CT.step_cars(self.cars, self.road_graph,
                                     jax.random.fold_in(self.key, self.frame),
                                     stoplights=self.stoplights)
        if self.peds is not None:
            self.peds = CT.step_peds(self.peds,
                                     jax.random.fold_in(self.key, 1 << 20 | self.frame),
                                     nav=self.ped_nav,
                                     stoplights=self.stoplights)
        for sim in self.building_people:
            sim.step()       # walkers + elevator cars + re-routing
        self.frame += 1
        return created, deleted


# ---------------------------------------------------------------------------
# universe mode
# ---------------------------------------------------------------------------

@dataclass
class UniverseWorld:
    """WMODE_UNIVERSE session: cell paging + fleet combat + the
    player-controlled ship."""

    state: object
    fleet: object = None
    fleet_tbl: object = None      # 40-class table from parsed ship defs
    player_ship: object = None
    frame: int = 0
    key: object = field(default_factory=lambda: jax.random.key(1))

    def step(self, player_pos, controls=()):
        """draw_universe: player thrust commands + process_ships + lazy
        cell gen.  `controls` = [(tdir, speed, hyperspeed), ...] for this
        frame (u_ship::thrust inputs)."""
        from ..universe import ships as USH

        if self.player_ship is not None:
            for (tdir, speed, hyper) in controls:
                self.player_ship = USH.player_thrust(
                    self.player_ship, tdir, speed, hyper)
            self.player_ship = USH.player_ship_frame(self.player_ship)
            player_pos = (float(self.player_ship.px),
                          float(self.player_ship.py),
                          float(self.player_ship.pz))
        created, freed = self.state.update(player_pos)
        if self.fleet is not None:
            if self.fleet_tbl is not None:
                self.fleet = USH.step_fleet(
                    self.fleet, jax.random.fold_in(self.key, self.frame),
                    tbl=jnp.asarray(self.fleet_tbl),
                    abomin_id=USH.USC_ABOMIN_ID,
                    reaper_id=USH.USC_REAPER_ID)
            else:
                self.fleet = USH.step_fleet(
                    self.fleet, jax.random.fold_in(self.key, self.frame))
        self.frame += 1
        return created, freed
