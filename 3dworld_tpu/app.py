"""Application entry: config -> world mode -> frame loop.

The reference's `main` (3DWorld.cpp) reads the three-tier config,
selects the world mode (ground / infinite tiled terrain / universe),
builds the scene, and runs the display loop.  This is that path
without the GL window: frames run headless, and per-frame metrics
print as JSON lines (the framerate HUD / onscreen stats analog).

    python -m 3dworld_tpu.app --config scene_config/config_spheres.txt \
        --mode ground --frames 10
    python -m 3dworld_tpu.app --mode tiled --frames 5
    python -m 3dworld_tpu.app --mode universe --frames 5
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_ground(config: str, frames: int, num_objects: int,
               chain: int = 32, game: bool = False, num_smileys: int = 8):
    """Ground-mode loop.  Scenes without platforms chain `chain` frames
    per device dispatch (models.world.ground_frames_chained) so the live
    rate approaches the on-device rate instead of paying the relay
    round trip per frame; platform scenes run the per-frame path.

    `game` enables FPS game mode (init_game_mode, 3DWorld.cpp): smiley
    AI agents target/fire each frame (gameplay.ai), their shots spawn
    projectiles or hitscan rays, and explosions feed back blast damage
    into both the object pool and the smiley population."""
    import jax.numpy as jnp
    from .scene.loader import load_scene
    from .models.world import ground_frame, ground_frames_chained
    from .gameplay import player as PL
    scene = load_scene(config, num_objects=num_objects)
    ply = PL.make_player(0.0, 0.0, 1.0)
    if game:
        return _run_ground_game(scene, ply, frames, num_smileys)
    has_platforms = scene.platforms is not None and scene.platforms.size > 0
    if has_platforms or chain <= 1:
        for i in range(frames):
            t0 = time.perf_counter()
            scene = ground_frame(scene)
            # the player walks a small circle through the scene
            ply = PL.step_player(ply, scene.env.mesh_height, scene.cobjs,
                                 np.cos(0.2 * i), np.sin(0.2 * i), False)
            live = int((np.asarray(scene.objects.status) > 0).sum())
            print(json.dumps({"frame": i, "mode": "ground", "live": live,
                              "player_z": round(float(ply.z[0]), 3),
                              "ms": round((time.perf_counter() - t0) * 1e3, 1)}))
        return scene
    smoke = (scene.light_grid.smoke if scene.smoke_active else None)
    i = 0
    while i < frames:
        k = min(chain, frames - i)
        t0 = time.perf_counter()
        mv = jnp.stack([jnp.cos(0.2 * (i + jnp.arange(k))),
                        jnp.sin(0.2 * (i + jnp.arange(k)))], axis=-1)
        out = ground_frames_chained(
            scene.objects, scene.env, scene.cobjs, scene.table,
            scene.ripples, ply, mv, scene.world, k, smoke=smoke)
        if smoke is None:
            st, rip, ply, live = out
        else:
            st, rip, ply, live, smoke = out
            scene.light_grid = scene.light_grid._replace(smoke=smoke)
        live_last = int(np.asarray(live)[-1])
        scene.objects, scene.ripples = st, rip
        dt = (time.perf_counter() - t0) / k
        print(json.dumps({"frame": i + k - 1, "mode": "ground",
                          "chained": k, "live": live_last,
                          "player_z": round(float(ply.z[0]), 3),
                          "ms": round(dt * 1e3, 1)}))
        i += k
    return scene


def _run_ground_game(scene, ply, frames: int, num_smileys: int = 8,
                     seed: int = 11):
    """FPS game-mode frame loop: physics frame + deep smiley AI +
    weapon fire + explosion feedback (update_game_frame +
    advance_smiley per frame, 3DWorld.cpp display loop with
    game_mode=1)."""
    import jax
    from .models.world import ground_frame
    from .gameplay import ai as AI
    from .gameplay import game as GG
    from .gameplay import frame as GF
    from .physics import destroy as PD
    key = jax.random.key(seed)
    sm = AI.make_ai_smileys(jax.random.fold_in(key, 0), num_smileys)
    ds = PD.make_destroy_state(scene.cobjs)
    shots = 0
    for i in range(frames):
        t0 = time.perf_counter()
        scene = ground_frame(scene)
        sm, fire, _ = AI.step_smileys_ai(sm, jax.random.fold_in(key, 100 + i),
                                         scene.cobjs)
        fi = np.where(np.asarray(fire))[0]
        if len(fi):
            st = scene.objects
            free = np.where(np.asarray(st.status) == 0)[0]
            fptr = 0
            smx, smy, smz = (np.asarray(sm.x), np.asarray(sm.y),
                             np.asarray(sm.z))
            ltx, lty, ltz = (np.asarray(sm.ltx), np.asarray(sm.lty),
                             np.asarray(sm.ltz))
            wsel = np.asarray(sm.weapon)
            for si in fi:
                wi = int(wsel[si])
                w = GG.WEAPONS[wi]
                origin = (float(smx[si]), float(smy[si]),
                          float(smz[si]) + 0.05)
                d = (float(ltx[si] - smx[si]), float(lty[si] - smy[si]),
                     float(ltz[si] - smz[si]))
                if w[1] is None:    # hitscan (m16/shotgun/laser/melee)
                    st, _, _ = GG.fire_hitscan(st, scene.cobjs, origin, d,
                                               wi, scene.table)
                else:
                    ns = w[5]
                    st = GG.fire_weapon(st, free[fptr:fptr + ns].tolist(),
                                        wi, origin, d, scene.table)
                    fptr += ns
                shots += 1
            scene.objects = st
        res = GF.update_game_frame(scene.objects, scene.cobjs, ds,
                                   scene.table,
                                   key=jax.random.fold_in(key, 500 + i))
        scene.objects, scene.cobjs = res.state, res.cobjs
        # blast damage reaches the smiley population too (Gameplay.cpp
        # blast_radius smiley damage)
        for (ex, ey, ez, er) in res.explosions:
            d2 = ((sm.x - ex) ** 2 + (sm.y - ey) ** 2 + (sm.z - ez) ** 2)
            f = np.maximum(1.0 - np.sqrt(np.asarray(d2)) / max(er, 1e-6),
                           0.0)
            sm = sm._replace(health=sm.health - 100.0 * f)
        alive = int((np.asarray(sm.health) > 0).sum())
        print(json.dumps({
            "frame": i, "mode": "ground-game", "smileys": alive,
            "shots": shots, "explosions": int(len(res.explosions)),
            "live": int((np.asarray(scene.objects.status) > 0).sum()),
            "ms": round((time.perf_counter() - t0) * 1e3, 1)}))
    return scene


def _world_hash(w, tm) -> str:
    """Deterministic digest of the live tiled-world state (cars, peds,
    building people, tile keys) — the replay-equality check target."""
    import hashlib
    h = hashlib.sha256()
    for a in (w.cars.seg, w.cars.t, w.peds.x, w.peds.y):
        h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
    if w.last_probe is not None:
        h.update(np.ascontiguousarray(np.asarray(w.last_probe)).tobytes())
    h.update(",".join(map(str, sorted(tm.tiles))).encode())
    return h.hexdigest()[:16]


def run_tiled(frames: int, seed: int, chunk: int = 16,
              record: str | None = None, replay: str | None = None,
              spectate: bool = False):
    """Tiled-city loop with session record/replay (`-uel` semantics,
    u_event.cpp:23-60): `record` writes an event journal (srand seed +
    per-chunk camera inputs) plus per-chunk state hashes; `replay`
    drives the loop from a journal instead of the default camera path
    and must reproduce the hashes bit-identically.  `spectate` follows
    the closest city agent with the camera (city_interact.cpp
    city_spectate_manager_t) instead of the default camera path."""
    import numpy as np
    from .models.world import make_tiled_world
    from .terrain.tiles import TileManager
    from .terrain.mesh import TerrainConfig
    from .utils.constants import WorldConst
    from .city import assemble as CA
    from .utils import events as EV

    journal = rp = None
    if replay:
        rp = EV.Replay(EV.EventJournal.load(replay))
        for (_f, kind, payload) in rp.events_for_frame(0):
            if kind == EV.EV_SRAND:
                seed = int(payload[0])
    if record:
        journal = EV.EventJournal()
        journal.record(0, EV.EV_SRAND, seed)
    tm = TileManager(cfg=TerrainConfig(mesh_seed=seed),
                     world=WorldConst(mesh_x=64, mesh_y=64), tile_size=64)
    # full live city over a flat region (gen_cities + traffic init)
    cw = CA.build_city(np.zeros((128, 128), np.float32), num_cities=1,
                       num_cars=64, num_peds=128, seed=seed)
    # building AI in the same fused frame (the reference's city frame
    # covers cars+peds+building people): one furnished tower with
    # people riding its stairs/elevators
    from .city import floorplan as CF
    from .city import room_content as CRC
    interior = CF.gen_interior((0.0, 0.0, 0.0, 1.2, 0.9, 0.4), 3, 0.08,
                               seed=seed)
    objs = CRC.furnish_rooms(interior, 0.08, seed=seed)
    w = make_tiled_world(tm, cw, builders=[(interior, 48, objs)],
                         seed=seed, chunk=chunk, num_birds=8,
                         num_trains=2)
    # tiled-terrain fauna (animals.cpp): terrain bird flock + butterflies
    # + fish, chained on-device per chunk over the camera tile's mesh
    # (separate from the city's perch birds above)
    import jax
    from .veg import animals as VA
    wl = WorldConst(mesh_x=64, mesh_y=64)
    fk = jax.random.key(seed ^ 0xFA0A)
    fauna_birds = VA.make_animals(fk, 16, VA.A_BIRD, center=(0.0, 0.0, 1.0))
    fauna_bfly = VA.make_butterflies(jax.random.fold_in(fk, 1), 16, wl)
    fauna_water_z = -0.4
    fauna_fish = None    # spawned from the first camera tile's mesh
    cam, cam_y = 0.0, 0.0
    spec = None
    if spectate:
        from types import SimpleNamespace
        from .city import spectate as CSP
        shim = SimpleNamespace(cars=w.cars, peds=w.peds,
                               graph=w.road_graph)
        # toggle from the starting camera; wide radius so the demo city
        # always yields a followed agent
        spec = CSP.toggle(CSP.Spectate(), cam, cam_y, shim,
                          camera_radius=25.0)
    hashes = []
    i = 0
    while i < frames:
        k = min(chunk, frames - i)
        if spec is not None and spec.mode != CSP.SPEC_NONE:
            shim = SimpleNamespace(cars=w.cars, peds=w.peds,
                                   graph=w.road_graph)
            eye = CSP.camera_state(spec, shim)
            if eye is not None:
                cam, cam_y = eye[0], eye[1]
        if rp is not None:
            # recorded camera input for this chunk (EV_CAMERA rows)
            for (_f, kind, payload) in rp.events_for_frame(i):
                if kind == EV.EV_CAMERA:
                    cam, cam_y, k = payload[0], payload[1], int(payload[2])
        if journal is not None:
            journal.record(i, EV.EV_CAMERA, cam, cam_y, k)
        t0 = time.perf_counter()
        created, deleted = w.step_chunk(cam, cam_y, frames=k)
        # fauna over the camera tile's mesh, chained the same k frames
        ct = tm.tiles.get(tm.camera_tile(cam, cam_y))
        if ct is not None:
            import jax.numpy as jnp
            mesh_t = jnp.asarray(ct.zvals[:64, :64])
            if fauna_fish is None:
                fauna_fish = VA.gen_fish(jax.random.fold_in(fk, 2), 32,
                                         mesh_t, fauna_water_z, wl)
            fauna_birds, fauna_bfly, fauna_fish = VA.step_tiled_fauna(
                fauna_birds, fauna_bfly, fauna_fish,
                jax.random.fold_in(fk, 100 + i), mesh_t, wl,
                fauna_water_z, cam, cam_y, frames=k)
        cam += 0.8 * k
        acts = (np.bincount(w.last_probe[:, 4].astype(np.int32),
                            minlength=5).tolist()
                if w.last_probe is not None else [])
        dt = (time.perf_counter() - t0) / k
        hashes.append(_world_hash(w, tm))
        print(json.dumps({"frame": i + k - 1, "mode": "tiled",
                          "chained": k,
                          "tiles": len(tm.tiles),
                          "cars": int(w.cars.seg.shape[0]),
                          "peds": int(w.peds.x.shape[0]),
                          "bldg_people_acts": acts,
                          "fauna": [int(fauna_birds.px.shape[0]),
                                    int(fauna_bfly.px.shape[0]),
                                    int((np.asarray(fauna_fish.kind) >= 0
                                         ).sum()) if fauna_fish is not None
                                    else 0],
                          "created": len(created), "deleted": len(deleted),
                          "hash": hashes[-1],
                          "ms": round(dt * 1e3, 1)}))
        i += k
    if journal is not None:
        journal.save(record)
        with open(record + ".hashes.json", "w") as f:
            json.dump(hashes, f)
    w.frame_hashes = hashes
    return w


def run_universe(frames: int, seed: int, ship_defs: str | None = None,
                 chunk: int = 32):
    import os
    import jax
    if ship_defs is None:   # asset tree (W3D_ASSET_ROOT) when available
        from .universe.ship_config import shipped_defs_path
        ship_defs = shipped_defs_path()
    from .models.world import UniverseWorld
    from .universe.gen import UniverseState
    from .universe import ships as USH
    from .universe.ships import make_fleet

    fleet = None
    tbl = None
    # honor config_universe.txt's ship_def_file when present
    # (3DWorld.cpp binds "ship_def_file"; the shipped config points at
    # universe/ship_defs_fight.txt)
    ucfg = os.path.join(os.path.dirname(ship_defs), "config_universe.txt")
    if os.path.exists(ucfg):
        from .utils import config as C
        try:
            cfg = C.load_config(ucfg)
            if cfg.ship_def_file:
                cand = cfg.ship_def_file
                if not os.path.exists(cand):
                    cand = os.path.join(os.path.dirname(
                        os.path.dirname(ship_defs)), cfg.ship_def_file)
                if os.path.exists(cand):
                    ship_defs = cand
        except Exception:
            pass
    defs = None
    if os.path.exists(ship_defs):
        # the reference config drive: ship classes/weapons/fleets from
        # the shipped ship_def_file (ship_config.cpp)
        from .universe import ship_config as SCfg
        try:
            defs = SCfg.parse_ship_defs(ship_defs)
            fleet, tbl, _offs, _np = USH.fleet_from_defs(
                defs, jax.random.key(seed))
        except Exception as e:
            print(json.dumps({"warn": f"ship defs gave no fleet: {e}"}))
    if fleet is None:
        # fleets live in the assault/teams variants; default combat sim
        alt = os.path.join(os.path.dirname(ship_defs),
                           "ship_defs_assault.txt")
        if os.path.exists(alt):
            from .universe import ship_config as SCfg
            defs = SCfg.parse_ship_defs(alt)
            fleet, tbl, _offs, _np = USH.fleet_from_defs(
                defs, jax.random.key(seed))
        else:
            fleet = make_fleet(jax.random.key(seed), 64)
    combat = ctbl = None
    if defs is not None:
        # full weapon model: projectiles/beams/bays/PD/boarding driven
        # by the parsed tables, with reserve slots for bay launches
        from .universe import combat as UCB
        ctbl = UCB.build_combat_tables(defs)
        n0 = int(np.asarray(fleet.px).shape[0])
        fleet = UCB.pad_fleet(fleet, n0 + max(16, n0 // 4))
        combat = UCB.make_combat_state(fleet, ctbl, pool_size=1024)
    w = UniverseWorld(state=UniverseState(), fleet=fleet, fleet_tbl=tbl,
                      combat=combat, combat_tables=ctbl)
    pos = [0.0, 0.0, 0.0]
    i = 0
    while i < frames:
        k = min(chunk, frames - i)
        t0 = time.perf_counter()
        created, freed = w.step_chunk(tuple(pos), frames=k)
        pos[0] += 0.5 * k
        alive = int(np.asarray(w.fleet.alive).sum())
        dt = (time.perf_counter() - t0) / k
        print(json.dumps({"frame": i + k - 1, "mode": "universe",
                          "chained": k,
                          "cells_created": len(created),
                          "cells_freed": len(freed),
                          "ships_alive": alive,
                          "ms": round(dt * 1e3, 1)}))
        i += k
    return w


def main(argv=None):
    # the axon sitecustomize pins JAX_PLATFORMS; honor an explicit
    # override for headless/CPU runs (W3D_PLATFORM=cpu)
    import os
    plat = os.environ.get("W3D_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default="scene_config/config_spheres.txt",
                    help="scene config (ground mode)")
    ap.add_argument("--mode", choices=("ground", "tiled", "universe"),
                    default="ground")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=32,
                    help="frames chained per device dispatch (tiled mode)")
    ap.add_argument("--objects", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--game", action="store_true",
                    help="FPS game mode: smiley AI + weapons (ground)")
    ap.add_argument("--smileys", type=int, default=8)
    ap.add_argument("--record", default=None,
                    help="write a session event journal (tiled mode)")
    ap.add_argument("--replay", default=None,
                    help="replay a recorded session journal (tiled mode)")
    ap.add_argument("--spectate", action="store_true",
                    help="follow the closest city agent (tiled mode)")
    args = ap.parse_args(argv)
    if args.mode == "ground":
        run_ground(args.config, args.frames, args.objects,
                   game=args.game, num_smileys=args.smileys)
    elif args.mode == "tiled":
        run_tiled(args.frames, args.seed, chunk=args.chunk,
                  record=args.record, replay=args.replay,
                  spectate=args.spectate)
    else:
        run_universe(args.frames, args.seed, chunk=args.chunk)


if __name__ == "__main__":
    main()
