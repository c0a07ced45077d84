"""Config-file parser compatible with the reference's `config_*.txt` format.

The reference binds hundreds of text keywords to typed globals through
`kw_to_val_map_t` maps (`file_utils.h:88-104`, populated in
`load_config`, 3DWorld.cpp:1763-2270) with recursive `include`
(3DWorld.cpp:2077) and a three-tier load order
config_pre.txt -> files in defaults.txt -> config_post.txt
(3DWorld.cpp:1650-1665).

Here: a token stream (whitespace-separated, `#` comments to end-of-line)
feeding a typed keyword registry on a `Config` object.  Keywords we don't
model are preserved in `cfg.extra` (value = next raw token) so shipped
scene configs parse cleanly end-to-end.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


def tokenize(text: str):
    """Whitespace token stream with # comments (matches fscanf-style reads)."""
    for line in text.splitlines():
        hash_pos = line.find("#")
        if hash_pos >= 0:
            line = line[:hash_pos]
        yield from line.split()


@dataclass
class Config:
    """Engine configuration: the subset of reference keywords our systems
    consume, with reference defaults (3DWorld.cpp globals)."""

    # world / mesh (matrix_ops.cpp:9-16, 3DWorld.cpp kwm)
    mesh_size: tuple = (128, 128, 32)          # "mesh_size x y z"
    scene_size: tuple = (4.0, 4.0, 4.0)        # "scene_size x y z"
    mesh_height: float = 0.1                   # fraction of Z_SCENE (MESH_HEIGHT)
    mesh_scale: float = 1.0
    mesh_z_cutoff: float = -1e9
    mesh_seed: int = 0
    mesh_gen_mode: int = 0                     # MGEN_*
    mesh_gen_shape: int = 0
    mesh_freq_filter: int = 2
    glaciate: int = 1
    glaciate_exp: float = 0.0                  # 0 => cubed
    erosion_iters: int = 0
    erosion_iters_tt: int = 0
    erode_amount: float = 1.0
    water_h_off: tuple = (0.0, 0.0)            # "water_h_off rel abs"
    temperature: float = 20.0
    gravity: float = 1.0                       # base_gravity
    rand_seed: int = 0
    rand_gen_index: int = 0
    srand: int = 0
    disable_water: int = 0
    disable_scenery: int = 0
    disable_universe: int = 0
    read_landscape: int = 0
    read_heightmap: int = 0
    ntrees: int = 0
    nsmileys: int = 0
    num_items: tuple = ()
    num_dodgeballs: int = 1
    load_coll_objs: int = 0
    coll_obj_file: str = ""
    state_file: str = ""
    mesh_file: str = ""
    mh_filename: str = ""                      # "mesh_height_image"
    sphere_materials_fn: str = ""
    ship_def_file: str = ""
    num_threads: int = 0
    num_light_rays: tuple = ()                 # npts nrays local [global [dynamic]]
    lighting_file_local: tuple = ()
    lighting_file_sky: tuple = ()
    lighting_file_global: tuple = ()
    shadow_map_sz: int = 2048
    voxel: dict = field(default_factory=dict)  # "voxel <param> <val>" sub-config
    buildings: dict = field(default_factory=dict)
    sphere_gen: dict = field(default_factory=dict)
    city: dict = field(default_factory=dict)
    tree_mode: int = 1
    vegetation: float = 1.0
    relh_adj_tex: float = 0.0
    camera_radius: float = 0.06
    player_start: tuple = (0.0, 0.0, 0.0)
    wind_velocity: tuple = (0.4, 0.2, 0.0)
    extra: dict = field(default_factory=dict)  # unmodeled keyword -> raw token(s)
    include_dirs: tuple = ()

    def world_const(self):
        from .constants import WorldConst
        mx, my, mz = self.mesh_size
        sx, sy, sz = self.scene_size
        return WorldConst(mesh_x=int(mx), mesh_y=int(my), mesh_z=int(mz),
                          x_scene=float(sx), y_scene=float(sy), z_scene=float(sz))

    def terrain_config(self):
        from ..terrain.mesh import TerrainConfig
        return TerrainConfig(
            mode=self.mesh_gen_mode, shape=self.mesh_gen_shape,
            mesh_seed=self.mesh_seed, mesh_scale=self.mesh_scale,
            glaciate=bool(self.glaciate),
            glaciate_exp=(self.glaciate_exp if self.glaciate_exp != 0.0 else 3.0),
            erosion_iters=self.erosion_iters, erode_amount=self.erode_amount,
            water_h_off_rel=self.water_h_off[0], water_h_off=self.water_h_off[1],
            relh_adj_tex=self.relh_adj_tex,
            mesh_freq_filter=self.mesh_freq_filter,
        )


# keyword -> (field, arity, type); arity "rest_of_config" handled specially
_INT = int
_FLT = float
_STR = str
_KEYWORDS = {
    "mesh_size": ("mesh_size", 3, _INT),
    "scene_size": ("scene_size", 3, _FLT),
    "mesh_height": ("mesh_height", 1, _FLT),
    "mesh_scale": ("mesh_scale", 1, _FLT),
    "mesh_z_cutoff": ("mesh_z_cutoff", 1, _FLT),
    "mesh_seed": ("mesh_seed", 1, _INT),
    "mesh_gen_mode": ("mesh_gen_mode", 1, _INT),
    "mesh_gen_shape": ("mesh_gen_shape", 1, _INT),
    "mesh_freq_filter": ("mesh_freq_filter", 1, _INT),
    "glaciate": ("glaciate", 1, _INT),
    "glaciate_exp": ("glaciate_exp", 1, _FLT),
    "erosion_iters": ("erosion_iters", 1, _INT),
    "erosion_iters_tt": ("erosion_iters_tt", 1, _INT),
    "erode_amount": ("erode_amount", 1, _FLT),
    "water_h_off": ("water_h_off", 2, _FLT),
    "init_temperature": ("temperature", 1, _FLT),
    "temperature": ("temperature", 1, _FLT),
    "gravity": ("gravity", 1, _FLT),
    "rand_seed": ("rand_seed", 1, _INT),
    "rand_gen_index": ("rand_gen_index", 1, _INT),
    "srand": ("srand", 1, _INT),
    "disable_water": ("disable_water", 1, _INT),
    "disable_scenery": ("disable_scenery", 1, _INT),
    "disable_universe": ("disable_universe", 1, _INT),
    "read_landscape": ("read_landscape", 1, _INT),
    "read_heightmap": ("read_heightmap", 1, _INT),
    "ntrees": ("ntrees", 1, _INT),
    "nsmileys": ("nsmileys", 1, _INT),
    "num_items": ("num_items", 5, _INT),
    "num_dodgeballs": ("num_dodgeballs", 1, _INT),
    "load_coll_objs": ("load_coll_objs", 1, _INT),
    "coll_obj_file": ("coll_obj_file", 1, _STR),
    "state_file": ("state_file", 1, _STR),
    "mesh_file": ("mesh_file", 2, _STR),          # filename + zval scale
    "mesh_height_image": ("mh_filename", 1, _STR),
    "sphere_materials_fn": ("sphere_materials_fn", 1, _STR),
    "ship_def_file": ("ship_def_file", 1, _STR),
    "num_threads": ("num_threads", 1, _INT),
    "num_light_rays": ("num_light_rays", -1, _INT),   # 3-5 ints (rest of line)
    "lighting_file_local": ("lighting_file_local", 4, _STR),
    "lighting_file_sky": ("lighting_file_sky", 4, _STR),
    "lighting_file_global": ("lighting_file_global", 4, _STR),
    "shadow_map_sz": ("shadow_map_sz", 1, _INT),
    "tree_mode": ("tree_mode", 1, _INT),
    "vegetation": ("vegetation", 1, _FLT),
    "relh_adj_tex": ("relh_adj_tex", 1, _FLT),
    "camera_radius": ("camera_radius", 1, _FLT),
    "player_start": ("player_start", 3, _FLT),
    "wind_velocity": ("wind_velocity", 3, _FLT),
}
_SUBCONFIG = {"voxel", "buildings", "sphere_gen", "city_params", "tree"}


class _TokenStream:
    def __init__(self, tokens):
        self._it = iter(tokens)
        self._peeked = []

    def next(self, default=None):
        if self._peeked:
            return self._peeked.pop()
        return next(self._it, default)

    def push(self, tok):
        self._peeked.append(tok)


def _parse_stream(ts: _TokenStream, cfg: Config, base_dir: str):
    while True:
        kw = ts.next()
        if kw is None:
            return cfg
        if kw == "include":
            fn = ts.next()
            load_config_file(_resolve(fn, base_dir, cfg), cfg)
            continue
        if kw in _SUBCONFIG:
            name = "city" if kw == "city_params" else kw
            sub = getattr(cfg, name, None)
            key = ts.next()
            val = ts.next()
            if isinstance(sub, dict) and key is not None:
                sub[key] = val
            continue
        if kw in _KEYWORDS:
            fname, arity, typ = _KEYWORDS[kw]
            if arity == 1:
                setattr(cfg, fname, typ(ts.next()))
            elif arity == -1:  # greedy ints (num_light_rays: 3-5 values)
                vals = []
                while True:
                    tok = ts.next()
                    if tok is None:
                        break
                    try:
                        vals.append(typ(tok))
                    except ValueError:
                        ts.push(tok)
                        break
                setattr(cfg, fname, tuple(vals))
            else:
                vals = tuple(typ(ts.next()) for _ in range(arity))
                setattr(cfg, fname, vals)
        else:
            # unmodeled: store the following token as its raw value (most
            # reference keywords are "name value" pairs); flag-style
            # keywords (toggle_*) store None
            if kw.startswith("toggle_") or kw.startswith("enable_") or kw.startswith("disable_only_"):
                cfg.extra[kw] = None
            else:
                cfg.extra[kw] = ts.next()


def _resolve(fn: str, base_dir: str, cfg: Config) -> str:
    for d in (base_dir, *cfg.include_dirs):
        p = os.path.join(d, fn)
        if os.path.exists(p):
            return p
    return fn


def load_config_file(path: str, cfg: Config | None = None) -> Config:
    if cfg is None:
        cfg = Config()
    if not os.path.exists(path):
        return cfg  # nonfatal, like the reference's missing optional files
    with open(path) as f:
        text = f.read()
    base = os.path.dirname(os.path.abspath(path))
    if base not in cfg.include_dirs:
        cfg.include_dirs = (*cfg.include_dirs, base)
    return _parse_stream(_TokenStream(tokenize(text)), cfg, base)


def load_config(path: str) -> Config:
    """Load one scene config (the equivalent of a defaults.txt entry)."""
    return load_config_file(path)
