"""End-to-end world build: the whole framework composed in one run.

Generates eroded terrain, founds cities (plots -> roads with bridges and
tunnels -> shaped buildings with interiors, furniture, and people),
plants trees, bakes a small indirect-lighting volume, runs physics +
traffic + pedestrians + building AI for a few frames, and exports a
heightmap PNG plus an overhead map view — the reference's startup path
(3DWorld.cpp init -> gen scene -> display loop) as one script.

Run: python examples/full_world.py [out_dir]
Prints one JSON summary line; artifacts land in out_dir (default /tmp).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.utils.constants import WorldConst
from w3d.terrain import mesh as TM
from w3d.city import plots as CP, roads as CR, buildings as CB
from w3d.city import floorplan as CF, room_content as RC, people as CPE
from w3d.city import traffic as TF
from w3d.veg.trees import place_trees_on_tile
from w3d.models import physics_model as PM
from w3d.lighting import lmap as L, trace as TR
from w3d.export import heightmap_io as HIO, map_view as MV


def main(out_dir="/tmp"):
    t0 = time.time()
    world = WorldConst(mesh_x=128, mesh_y=128)
    stats = {}

    # --- terrain with erosion ---
    cfg = TM.TerrainConfig(mesh_seed=7, erosion_iters=20000)
    ts = TM.gen_terrain(cfg, world)
    hm = ts.mesh_height
    stats["terrain"] = {"z_range": [round(float(hm.min()), 3),
                                    round(float(hm.max()), 3)],
                        "water_z": round(float(ts.water_plane_z), 3)}

    # --- cities: plots -> flatten -> roads (+bridges/tunnels) -> buildings
    hm, plots = CP.gen_cities(hm, ts.water_plane_z, num_cities=2,
                              city_size=20)
    net = CR.gen_city_roads(plots)
    routes = CR.gen_connector_roads(plots, net)
    hm, bridges, tunnels = CR.carve_roads_with_structures(hm, routes, plots)
    blocks = [(p.x1 + 2, p.y1 + 2, p.x2 - 2, p.y2 - 2, i)
              for i, p in enumerate(plots)]
    hm_np = np.asarray(hm)

    def elev(x, y):
        return float(hm_np[min(int(y), world.mesh_y - 1),
                           min(int(x), world.mesh_x - 1)])

    bl = CB.place_buildings_in_blocks(blocks, elev, CB.BuildingParams(),
                                      seed=3, cell_w=1.0)
    n_round = sum(b.is_round for b in bl)
    # interiors + furniture + people for the first building
    interiors = 0
    people = None
    for b in bl:
        (x1, y1, z1, x2, y2, z2) = b.parts[0]
        if x2 - x1 < 3 or y2 - y1 < 3:
            continue
        i = CF.gen_interior((x1, y1, z1, x2, y2, z2), 3, 0.8, seed=11,
                            has_basement=(people is None))
        b.interior = i
        interiors += 1
        if people is None and i.rooms:
            ro = RC.furnish_rooms(i, 0.8, 11)
            g = CPE.build_nav_graph(i)
            people = CPE.make_people(g, 8, seed=4)
            for _ in range(30):
                people = CPE.step_people(people)
            labels, signs = RC.label_objects(i, ro, seed=4)
            stats["first_building"] = {
                "rooms": len(i.rooms), "furniture": len(ro.cubes),
                "people_walking": int(8),
                "name": RC.building_name(RC.BT_OFFICE, 4),
                "door_signs": len(signs), "book_titles": len(labels)}
    # basement tunnel network under the first (basement) building
    # (building_tunnels.cpp) + clocks placed by the furnishing pass
    from w3d.city import tunnels as TN
    bsegs = []
    for b in bl:
        inter = getattr(b, "interior", None)
        if inter is not None and any(r.floor < 0 for r in inter.rooms):
            bsegs = TN.gen_tunnels(b, bl, 0.8, seed=11)
            if bsegs:
                p0 = b.parts[0]
                TN.add_tunnel_objects(bsegs, (p0[0], p0[1], p0[3], p0[4]),
                                      seed=11, ground_z=p0[2])
                break
    stats["city"] = {"plots": len(plots), "road_segs": len(net.segs),
                     "bridges": len(bridges), "tunnels": len(tunnels),
                     "buildings": len(bl), "round_buildings": int(n_round),
                     "interiors": interiors,
                     "basement_tunnel_segs": len(bsegs),
                     "basement_tunnel_gates": sum(
                         1 for s in bsegs if s.has_gate)}

    # --- traffic: cars + trains + helicopters
    graph = TF.build_road_graph(net)
    cars = TF.make_cars(32, graph, seed=5)
    key = jax.random.key(0)
    for i in range(30):
        cars = TF.step_cars(cars, graph, jax.random.fold_in(key, i))
    trains = 0
    if routes:
        line = TF.gen_railroad([(routes[0][0], routes[0][1]),
                                (routes[0][2], routes[0][3])])
        tr = TF.make_trains(2, 1, seed=6)
        for _ in range(40):
            tr = TF.step_trains(tr, line)
        trains = 2
    pads = TF.make_helipads(bl)
    helis = TF.make_helis(4, pads, seed=2) if len(pads) else None
    if helis is not None:
        for i in range(60):
            helis = TF.step_helis(helis, jnp.asarray(pads),
                                  jax.random.fold_in(key, 100 + i))
    stats["traffic"] = {"cars": 32, "trains": trains,
                        "helipads": int(len(pads))}

    # --- fused live city frame (one chained dispatch) + instanced
    #     model export driven by the sim (round-4 path)
    from w3d.city import city_step as CS
    from w3d.city import model_instances as MIN
    sl = TF.build_stoplights(net, seed=5)
    nav = TF.build_ped_nav(net)
    peds = TF.make_peds(64, net.blocks, seed=7)
    cstate = CS.CityState(stoplights=sl, cars=cars, peds=peds,
                          people=None, elev=CS.make_elevator_bank(1),
                          helis=None, birds=None, key=jax.random.key(4))
    cstate = CS.city_frames_chained(cstate, graph, nav, None, None, 16)
    spec_path = "/root/reference/scene_config/config_city.txt"
    specs = (MIN.parse_city_models(spec_path)
             if os.path.exists(spec_path) else {})
    inst = MIN.city_instances(cars=cstate.cars, graph=graph,
                              peds=cstate.peds, specs=specs, seed=4)
    stats["city_frame"] = {
        "chained": 16, "instanced_models": len(inst),
        "instances": int(sum(s.transforms.shape[0] for s in inst))}

    # --- vegetation on one tile
    from w3d.terrain import biomes as B
    tile_z = hm[:64, :64]
    # band biomes over this terrain's own relief (the absolute bands put
    # low-lying beach terrain all in sand, which is correct but treeless)
    wts = B.biome_weights(tile_z, jnp.ones_like(tile_z),
                          float(hm.min()), float(hm.max()))
    norm_z = jnp.ones_like(tile_z)
    tx, ty, tz, ttype, tvalid = place_trees_on_tile(
        9, -2.0, -2.0, tile_z, norm_z, wts, world)
    stats["vegetation"] = {"trees": int(np.asarray(tvalid).sum())}

    # --- physics world a few frames
    sw = PM.build_spheres_world(num_objects=2000, world=world)
    st = sw.state
    for _ in range(5):
        sw = sw._replace(state=st)
        st = PM.frame_step(sw, substeps=4, world=world).state
    stats["physics"] = {"objects": 2000,
                        "live": int((np.asarray(st.status) > 0).sum())}

    # --- small lighting bake
    grid = L.make_light_grid(world)
    cobjs = sw.cobjs.cobjs if hasattr(sw.cobjs, "cobjs") else sw.cobjs
    mesh128 = jnp.asarray(hm, jnp.float32)
    rays = TR.sky_rays(key, 512, world)
    grid = TR.trace_batch(grid, cobjs, mesh128, *rays, key,
                          params=TR.TraceParams(max_bounces=2,
                                                samples_per_segment=4,
                                                mesh_steps=8), world=world)
    stats["lighting"] = {"sky_energy": round(float(grid.sc_r.sum()), 4)}

    # --- dense sweep lighting (scan-based solver) + named universe
    from w3d.lighting import sweep as SW
    sgrid = L.make_light_grid(world, nz=16)
    sgrid = SW.compute_sky_lighting_sweep(sgrid, cobjs, mesh128, ndirs=8,
                                          world=world, bounce=False)
    stats["sweep_lighting"] = {
        "mean_visibility": round(float(np.asarray(sgrid.sv).mean()), 3)}
    from w3d.universe import gen as UG
    from w3d.utils.rng import RandGen as URand
    sy = UG.gen_system(URand(3, 5), (1.0, 2.0, 3.0))
    stats["universe"] = {
        "system": UG.system_name(sy),
        "planets": [UG.planet_name(p) for p in sy.planets]}

    # --- exports
    os.makedirs(out_dir, exist_ok=True)
    hm16 = HIO.heights_to_pixels(np.asarray(hm), bit_depth=16)
    HIO.write_png_gray(os.path.join(out_dir, "world_height.png"), hm16)
    img = MV.terrain_map(hm, ts.water_plane_z, float(hm.min()),
                         float(hm.max()))
    img = MV.overlay_roads_buildings(img, net.seg_array(),
                                     CB.building_part_array(bl), world)
    rgb = np.transpose(np.asarray(jnp.clip(jnp.asarray(img) * 255, 0, 255)
                                  .astype(jnp.uint8)), (1, 2, 0))
    HIO.write_png_rgb(os.path.join(out_dir, "world_map.png"), rgb)
    stats["artifacts"] = ["world_height.png", "world_map.png"]
    stats["seconds"] = round(time.time() - t0, 1)
    print(json.dumps(stats))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp")
