"""Scene assembly: config -> a runnable world (gen_scene equivalent).

The reference's `gen_scene` (3DWorld.cpp:2460 + build_world.cpp) loads
the config, generates the terrain, reads coll objects, creates object
groups and initializes lighting.  `load_scene` performs the same
orchestration against our subsystems and returns a `GroundScene` bundle
the frame loop (models/world.py) steps.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..utils.config import Config, load_config
from ..utils.constants import WorldConst
from ..terrain import mesh as TM
from ..physics import types as PT, step as PS, cobjs as PC
from ..physics import platforms as PP
from ..lighting import lmap as LM
from ..water import ripples as WR
from . import cobj as SC
from .sphere_materials import parse_sphere_materials, SphereMaterials


@dataclass
class GroundScene:
    cfg: Config
    world: WorldConst
    terrain: TM.TerrainState
    cobjs: PC.CobjSet
    table: PT.ObjTypeTable
    objects: PS.ObjectState
    env: PS.PhysicsEnv
    ripples: WR.RippleState
    light_grid: LM.LightGrid
    sphere_mats: SphereMaterials
    mat_first: int = -1   # first material type id (-1: no material spheres)
    # full scene-DSL entities (build_world.cpp parser outputs)
    parse: SC.SceneParse = None
    platforms: PP.PlatformSet = None
    triggers: PP.TriggerSet = None
    voxel: object = None        # VoxelGrid for voxel-landscape scenes
    smoke_active: bool = False  # host flag: smoke exists in light_grid
    trees: object = None        # (x, y, z, trunk_r, height) arrays
    scenery: object = None      # veg.scenery.ScenerySet
    # (set by the code that injects smoke; gates per-frame diffusion
    # without a device probe)


def voxel_params_from_config(cfg):
    """`voxel <param> <val>` sub-config rows -> VoxelParams
    (voxel_params_t keyword block, 3DWorld.cpp voxel kwm)."""
    from ..voxel import grid as VG
    v = cfg.voxel

    def num(k, d):
        try:
            return float(v[k])
        except (KeyError, ValueError):
            return d

    return VG.VoxelParams(
        xsize=int(num("xsize", 64)), ysize=int(num("ysize", 64)),
        zsize=int(num("zsize", 32)),
        num_blocks=int(num("num_blocks", 12)),
        isolevel=num("isolevel", 0.0),
        elasticity=num("elasticity", 0.5),
        mag=num("mag", 1.0), freq=num("freq", 1.0),
        atten_thresh=num("atten_thresh", 1.0),
        z_gradient=num("z_gradient", 0.0),
        radius_val=num("radius_val", 0.5),
        invert=bool(int(num("invert", 0))),
        normalize_to_1=bool(int(num("normalize_to_1", 1))),
        make_closed_surface=bool(int(num("make_closed_surface", 1))),
        remove_unconnected=int(num("remove_unconnected", 1)),
        atten_at_edges=int(num("atten_at_edges", 0)),
        atten_top_mode=int(num("atten_top_mode", 0)),
        geom_rseed=int(num("geom_rseed", 123)),
    )


def load_scene(config_path: str, num_objects: int = 0,
               search_dirs: tuple = ()) -> GroundScene:
    """Load a config_*.txt scene end to end."""
    cfg = load_config(config_path)
    world = cfg.world_const()
    tcfg = cfg.terrain_config()
    if cfg.rand_seed and tcfg.mesh_seed == 0:
        tcfg = tcfg._replace(mesh_seed=cfg.rand_seed)

    # image-driven mesh (read_mesh_height_image, mesh_gen.cpp:135-160):
    # mesh_height_image + read_heightmap 1 replaces procedural generation,
    # with the brush-journal modmap replayed on load (heightmap.cpp)
    terrain = None
    if cfg.read_heightmap and cfg.mh_filename:
        from ..utils.checkpoint import ModmapJournal
        for d in (os.path.dirname(os.path.abspath(config_path)),
                  os.path.dirname(os.path.dirname(os.path.abspath(config_path))),
                  *search_dirs):
            p = os.path.join(d, cfg.mh_filename)
            if os.path.exists(p):
                modmap = None
                if cfg.read_hmap_modmap_filename:
                    mp = os.path.join(d, cfg.read_hmap_modmap_filename)
                    if os.path.exists(mp):
                        modmap = ModmapJournal.load(mp)
                terrain = TM.terrain_from_heightmap(p, tcfg, world,
                                                    modmap=modmap)
                break
    if terrain is None:
        terrain = TM.gen_terrain(tcfg, world)

    # voxel landscape (create_voxel_landscape, 3DWorld.cpp:2178 +
    # gen_voxel_landscape): the procedural voxel terrain generates from
    # the scene's `voxel` sub-config and its top surface fuses into the
    # physics heightfield (the reference adds voxel cobjs; the ball/mesh
    # interaction path here collides with the column-top surface —
    # VoxelCollider serves exact triangle queries for gameplay/edits)
    voxel = None
    if cfg.create_voxel_landscape and cfg.voxel:
        from ..voxel import grid as VG
        vp = voxel_params_from_config(cfg)
        voxel = VG.make_voxel_grid(vp, world)
        vsurf = VG.top_surface(voxel, vp.isolevel,
                               out_shape=terrain.mesh_height.shape)
        fused = jnp.maximum(terrain.mesh_height,
                            jnp.where(jnp.isfinite(vsurf), vsurf,
                                      terrain.mesh_height))
        terrain = terrain._replace(mesh_height=fused)

    # ground-mode trees (regen_trees at gen_scene, Tree.cpp): ntrees
    # seeded placements above water; each tree's TRUNK registers as a
    # collision cylinder (the reference's tree cobjs) appended to the
    # scene's cobj set below
    trees = None
    tree_cobjs = []
    if cfg.ntrees > 0:
        from ..utils.rng import RandGen
        trg = RandGen((cfg.rand_seed or 1) + 43, (cfg.rand_seed or 1) * 3 + 7)
        hm_np = np.asarray(terrain.mesh_height)
        my, mx = hm_np.shape
        wz = -1e9 if cfg.disable_water else float(terrain.water_plane_z)
        tx, ty, tz, tr, th = [], [], [], [], []
        for _ in range(cfg.ntrees):
            gx = trg.rand() % mx
            gy = trg.rand() % my
            z = float(hm_np[gy, gx])
            if z <= wz:
                continue          # no trees under water
            x = (gx - mx // 2) * world.dx
            y = (gy - my // 2) * world.dy
            h = (0.04 + 0.04 * trg.randd()) * world.z_scene
            r = 0.08 * h
            tx.append(x)
            ty.append(y)
            tz.append(z)
            tr.append(r)
            th.append(h)
        trees = (np.asarray(tx, np.float32), np.asarray(ty, np.float32),
                 np.asarray(tz, np.float32), np.asarray(tr, np.float32),
                 np.asarray(th, np.float32))
        lay = SC.CobjLayer(elasticity=0.4, color=(0.45, 0.33, 0.2, 1.0))
        for (x, y, z, r, h) in zip(*trees):
            tree_cobjs.append(SC.RawCobj(
                SC.COLL_CYLINDER, (float(x), float(y), float(z)),
                (float(x), float(y), float(z + h)),
                r1=float(r), r2=float(0.7 * r), layer=lay))

    # scenery (gen_scenery, scenery.cpp): rocks/boulders/logs/stumps
    # placed over the mesh unless disabled; ROCK kinds register sphere
    # cobjs (the reference's scenery rock cobjs)
    scenery = None
    scenery_cobjs = []
    if not cfg.disable_scenery:
        from ..veg import scenery as VS
        dzdx = np.gradient(np.asarray(terrain.mesh_height), axis=1) / world.dx
        dzdy = np.gradient(np.asarray(terrain.mesh_height), axis=0) / world.dy
        norm_z = 1.0 / np.sqrt(dzdx ** 2 + dzdy ** 2 + 1.0)
        scenery = VS.place_scenery(
            (cfg.rand_seed or 1) + 101,
            -(world.mesh_x // 2), -(world.mesh_y // 2),
            jnp.asarray(terrain.mesh_height), jnp.asarray(norm_z), world)
        lay_r = SC.CobjLayer(elasticity=0.6, color=(0.5, 0.5, 0.5, 1.0))
        sx = np.asarray(scenery.x)
        sy = np.asarray(scenery.y)
        sz = np.asarray(scenery.z)
        sk = np.asarray(scenery.kind)
        ss = np.asarray(scenery.size)
        sv = np.asarray(scenery.valid)
        wz = -1e9 if cfg.disable_water else float(terrain.water_plane_z)
        for i in range(len(sx)):
            # rock-ish kinds (0/1 of the 5-kind table) get cobjs
            if sv[i] and sk[i] <= 1 and sz[i] > wz:
                scenery_cobjs.append(SC.RawCobj(
                    SC.COLL_SPHERE,
                    (float(sx[i]), float(sy[i]), float(sz[i])),
                    r1=float(ss[i]), layer=lay_r))

    # coll objects (resolved against the config dir + search dirs)
    cobjs = None
    parse = SC.SceneParse()
    if cfg.load_coll_objs and cfg.coll_obj_file:
        for d in (os.path.dirname(os.path.abspath(config_path)),
                  os.path.dirname(os.path.dirname(os.path.abspath(config_path))),
                  *search_dirs):
            p = os.path.join(d, cfg.coll_obj_file)
            if os.path.exists(p):
                parse = SC.parse_coll_obj_file(p, sphere_gen_seed=cfg.rand_seed,
                                               sphere_gen=cfg.sphere_gen)
                break
    if tree_cobjs:
        parse.cobjs.extend(tree_cobjs)   # trunk cylinders join the scene
    if scenery_cobjs:
        parse.cobjs.extend(scenery_cobjs)  # scenery rock cobjs
    if parse.cobjs:
        cobjs = SC.pack_cobjs(parse)
    if cobjs is None:
        cobjs = PC.empty_cobjs(128)
    platforms = PP.build_platforms(parse.platforms)
    triggers = PP.triggers_from_specs(parse.platforms)

    sphere_mats = SphereMaterials()
    if cfg.sphere_materials_fn:
        for d in (os.path.dirname(os.path.abspath(config_path)),
                  os.path.dirname(os.path.dirname(os.path.abspath(config_path))),
                  *search_dirs):
            p = os.path.join(d, cfg.sphere_materials_fn)
            if os.path.exists(p):
                sphere_mats = parse_sphere_materials(p)
                break

    table = PT.make_type_table(z_scene=world.z_scene)
    n = num_objects or max(cfg.num_dodgeballs, 1)
    rng = np.random.default_rng(cfg.rand_seed or 1)
    pos = np.stack([
        rng.uniform(-0.8 * world.x_scene, 0.8 * world.x_scene, n),
        rng.uniform(-0.8 * world.y_scene, 0.8 * world.y_scene, n),
        rng.uniform(0.3 * world.z_scene, 0.9 * world.z_scene, n)], 1)
    mat_first = -1
    if sphere_mats.materials:
        # thrown spheres ARE material spheres in this scene
        # (throw_sphere spawns MAT_SPHERE with obj.direction = mat_ix,
        # sphere_materials.cpp:352-395): each material gets its own type
        # row (density/hardness/radius), objects cycle the material list
        table, mat_first = PT.extend_table_with_materials(
            table, sphere_mats.materials)
        otypes = mat_first + (np.arange(n) % len(sphere_mats.materials))
    else:
        otypes = np.full(n, PT.type_id("BALL"))
    objects = PS.make_state(pos, np.zeros((n, 3), np.float32),
                            otypes, table)

    wind = jnp.asarray(cfg.wind_velocity, jnp.float32)
    wpz = jnp.float32(-1e9 if cfg.disable_water else float(terrain.water_plane_z))
    env = PS.PhysicsEnv(
        mesh_height=terrain.mesh_height, water_plane_z=wpz, wind=wind,
        temperature=jnp.float32(cfg.temperature),
        base_gravity=jnp.float32(cfg.gravity),
        zmin=jnp.float32(float(terrain.zmin)),
    )
    return GroundScene(
        cfg=cfg, world=world, terrain=terrain, cobjs=cobjs, table=table,
        objects=objects, env=env,
        ripples=WR.make_ripples(world.mesh_y, world.mesh_x),
        light_grid=LM.make_light_grid(world),
        sphere_mats=sphere_mats,
        mat_first=mat_first,
        parse=parse, platforms=platforms, triggers=triggers,
        voxel=voxel, trees=trees, scenery=scenery,
    )
