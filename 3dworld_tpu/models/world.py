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
    # smoke diffusion over the lmcell grid every frame
    # (distribute_smoke, smoke.cpp:184; stored in lmcell.smoke).  Gated
    # by the HOST flag (set by whoever injects smoke) — probing the
    # device array per frame would cost a blocking round trip
    if getattr(scene, "smoke_active", False) and scene.light_grid is not None:
        scene.light_grid = scene.light_grid._replace(
            smoke=WSM.diffuse_smoke(scene.light_grid.smoke))
    scene.objects = st
    scene.ripples = ripples
    return scene


import functools


@functools.partial(jax.jit, static_argnames=("frames", "substeps",
                                             "obj_collisions", "world"))
def ground_frames_chained(objects, env, cobjs, table, ripples, player,
                          move_xy, world: WorldConst, frames: int,
                          substeps: int = 4, obj_collisions: bool = True,
                          smoke=None):
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
        st, rip, ply, smk = carry
        st = PS.step_objects(st, env, cobjs, table, substeps=substeps,
                             world=world, obj_collisions=obj_collisions)
        rip, _ = WR.step_ripples(rip, inside, depth)
        ply = PL.step_player(ply, env.mesh_height, cobjs, mv[0], mv[1],
                             False, world=world)
        if smk is not None:       # distribute_smoke each frame
            smk = WSM.diffuse_smoke(smk)
        return (st, rip, ply, smk), jnp.sum(st.status > 0)

    (st, rip, ply, smoke), live = jax.lax.scan(
        body, (objects, ripples, player, smoke), move_xy, length=frames)
    if smoke is None:
        return st, rip, ply, live
    return st, rip, ply, live, smoke


# ---------------------------------------------------------------------------
# tiled-terrain mode
# ---------------------------------------------------------------------------

@dataclass
class TiledWorld:
    """WMODE_INF_TERRAIN session: streamed tiles + one fused city sim.

    The whole per-frame city compute — stoplights, cars, pedestrians,
    helicopters, birds, elevator cars, building people — lives in ONE
    device CityState advanced by `city_step.city_frames_chained`, K
    frames per dispatch.  Host work per chunk: tile streaming (already
    async/double-buffered in TileManager) + building-people goal
    re-routing.  This realizes the reference's 4.65 ms 3-thread city
    frame (display_world.cpp:1295-1309) as an amortized chained
    dispatch instead of ~10 un-chained ones per frame."""

    tile_mgr: object
    road_graph: object = None
    ped_nav: object = None
    city: object = None          # city_step.CityState
    bldg: object = None          # city_step.MergedBuildingPeople
    pads: object = None          # [P, 3] heli pads (device)
    perches: object = None       # [P, 3] bird perches (device)
    rail: object = None          # traffic.RailLine (trains ride it)
    chunk: int = 16
    frame: int = 0
    last_probe: object = None    # latest people_probe fetch (host numpy)

    def step_chunk(self, cam_x: float, cam_y: float,
                   frames: int | None = None):
        """Advance K frames: tiles (host, overlapped) + one chained
        city dispatch + the per-chunk host re-route phase."""
        from ..city import city_step as CS

        k = self.chunk if frames is None else frames
        created, deleted = self.tile_mgr.update(cam_x, cam_y)
        if self.city is not None:
            self.city = CS.city_frames_chained(
                self.city, self.road_graph, self.ped_nav,
                self.pads, self.perches, k, rail=self.rail)
            if self.bldg is not None and self.city.people is not None:
                # single packed fetch; reroute decisions + display stats
                # both come from it (no per-field device pulls)
                self.last_probe = np.asarray(
                    CS.people_probe(self.city.people))
                self.city = self.city._replace(
                    people=self.bldg.reroute(self.city.people,
                                             probe=self.last_probe))
        self.frame += k
        return created, deleted

    def step(self, cam_x: float, cam_y: float):
        """One un-chained frame (compat/debug path)."""
        return self.step_chunk(cam_x, cam_y, frames=1)

    # convenience views
    @property
    def cars(self):
        return self.city.cars if self.city is not None else None

    @property
    def peds(self):
        return self.city.peds if self.city is not None else None

    @property
    def stoplights(self):
        return self.city.stoplights if self.city is not None else None


def make_tiled_world(tile_mgr, city_world=None, builders=(), seed: int = 0,
                     chunk: int = 16, num_birds: int = 0,
                     num_trains: int = 0) -> TiledWorld:
    """Assemble a TiledWorld from a `city.assemble.CityWorld` plus
    furnished interiors (`builders` = [(interior, n_people, room_objs)])."""
    from ..city import city_step as CS
    from ..city import traffic as CT
    import jax.numpy as jnp

    if city_world is None:
        return TiledWorld(tile_mgr=tile_mgr, chunk=chunk)
    bldg = CS.MergedBuildingPeople(builders, seed=seed) if builders else None
    birds = None
    perches = None
    if num_birds > 0:
        perches = jnp.asarray(CT.bird_perches(None, city_world.buildings))
        birds = CT.make_birds(num_birds, np.asarray(perches), seed=seed)
    rail = None
    trains = None
    if num_trains > 0 and city_world.net.blocks:
        # rail line along the city's -y edge (railroad segments along
        # the connector route, roads.cpp railroads)
        xs = [b[0] for b in city_world.net.blocks] + \
            [b[2] for b in city_world.net.blocks]
        ys = [b[1] for b in city_world.net.blocks]
        y = min(ys) - 1.0
        rail = CT.gen_railroad([(min(xs), y), (max(xs), y)])
        trains = CT.make_trains(num_trains, 1, seed=seed)
    cs = CS.CityState(
        stoplights=city_world.stoplights, cars=city_world.cars,
        peds=city_world.peds,
        people=bldg.people if bldg is not None else None,
        elev=bldg.elev if bldg is not None else CS.make_elevator_bank(1),
        helis=city_world.helis, birds=birds,
        key=jax.random.key(seed), trains=trains)
    return TiledWorld(tile_mgr=tile_mgr, road_graph=city_world.graph,
                      ped_nav=city_world.ped_nav, city=cs, bldg=bldg,
                      pads=city_world.helipads, perches=perches,
                      rail=rail, chunk=chunk)


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
    combat: object = None         # combat.CombatState (full weapon model)
    combat_tables: object = None  # combat.CombatTables
    player_ship: object = None
    black_holes: list = field(default_factory=list)  # [(pos, radius)]
    # ($BLACK_HOLE rows, ship_config.cpp; plus generated collapsed stars)
    frame: int = 0
    key: object = field(default_factory=lambda: jax.random.key(1))
    _HAZARD_PAD = 64              # fixed star-array size (no recompiles)

    def _hazards(self):
        """Star/black-hole bodies near the fleet: generated systems'
        stars + configured $BLACK_HOLE entries, padded to a fixed
        shape.  Returns None when nothing is generated."""
        pos, rad, bh = [], [], []
        for (p, r) in self.black_holes:
            pos.append(tuple(p))
            rad.append(float(r))
            bh.append(True)
        for cell in self.state.cells.values():
            for g in cell.galaxies:
                if not g.generated:
                    continue
                for sy in g.systems:
                    pos.append(tuple(cell.pos[d] + sy.pos[d]
                                     for d in range(3)))
                    rad.append(float(sy.star.radius))
                    bh.append(bool(sy.star.is_black_hole))
        if not pos:
            return None
        n = self._HAZARD_PAD
        pos = pos[:n]
        rad = rad[:n]
        bh = bh[:n]
        pad = n - len(pos)
        pos += [(1e9, 1e9, 1e9)] * pad
        rad += [0.0] * pad
        bh += [False] * pad
        return (jnp.asarray(pos, jnp.float32), jnp.asarray(rad, jnp.float32),
                jnp.asarray(bh))

    def step_chunk(self, player_pos, frames: int = 1, controls=()):
        """draw_universe: player thrust commands + process_ships + lazy
        cell gen.  `controls` = [(tdir, speed, hyperspeed), ...] applied
        before the chunk (u_ship::thrust inputs).  The fleet advances
        `frames` steps in ONE chained dispatch
        (ships.fleet_frames_chained); cell paging runs at chunk
        granularity — cells span 10 units, so a sub-chunk camera move
        never crosses more cells than the endpoint check sees."""
        from ..universe import ships as USH

        if self.player_ship is not None:
            for (tdir, speed, hyper) in controls:
                self.player_ship = USH.player_thrust(
                    self.player_ship, tdir, speed, hyper)
            for _ in range(frames):
                self.player_ship = USH.player_ship_frame(self.player_ship)
            player_pos = (float(self.player_ship.px),
                          float(self.player_ship.py),
                          float(self.player_ship.pz))
        created, freed = self.state.update(player_pos)
        if self.combat is not None:
            # full weapon model (universe.combat): projectiles, beams,
            # bays, point defense, boarding — one chained dispatch
            from ..universe import combat as UCB
            key = jax.random.fold_in(self.key, self.frame)
            self.combat = UCB.combat_frames_chained(
                self.combat, key, frames, self.combat_tables)
            hz = self._hazards()
            if hz is not None:
                tblh = jnp.asarray(self.combat_tables.cls_tbl)
                self.combat = self.combat._replace(fleet=USH.avoid_hazards(
                    self.combat.fleet, *hz, tbl=tblh))
            self.fleet = self.combat.fleet
            self.frame += frames
            return created, freed
        if self.fleet is not None:
            key = jax.random.fold_in(self.key, self.frame)
            if self.fleet_tbl is not None:
                self.fleet = USH.fleet_frames_chained(
                    self.fleet, key, frames, tbl=jnp.asarray(self.fleet_tbl),
                    abomin_id=USH.USC_ABOMIN_ID,
                    reaper_id=USH.USC_REAPER_ID)
            else:
                self.fleet = USH.fleet_frames_chained(self.fleet, key, frames)
            # star-heat / black-hole avoidance once per chunk
            # (u_ship::ai_action hazard branch, u_ship.cpp:995-1012);
            # hazards only exist where systems have generated
            hz = self._hazards()
            if hz is not None:
                tblh = (jnp.asarray(self.fleet_tbl)
                        if self.fleet_tbl is not None else None)
                self.fleet = USH.avoid_hazards(self.fleet, *hz, tbl=tblh)
        self.frame += frames
        return created, freed

    def step(self, player_pos, controls=()):
        return self.step_chunk(player_pos, frames=1, controls=controls)
