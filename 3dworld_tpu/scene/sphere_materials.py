"""Material-sphere definitions (`sphere_materials.txt`).

The reference's throwable PBR spheres: a keyword/value file sets the
current material state; `add_material <name>` snapshots it
(sphere_mat_t, parser sphere_materials.cpp:158+; config hook
`sphere_materials_fn`).  Same format parsed here into a material list
feeding physics (density/hardness -> elasticity/mass) and lighting
(emissive/light_radius -> local light sources).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass
class SphereMat:
    name: str = ""
    shadows: bool = False
    emissive: bool = False
    reflective: bool = False
    destroyable: int = 0
    radius_scale: float = 1.0
    light_radius: float = 0.0
    hardness: float = 0.8
    refract_ix: float = 1.0
    light_atten: float = 0.0
    alpha: float = 1.0
    metalness: float = 0.0
    specular_mag: float = 0.2
    specular_exp: float = 32.0
    density: float = 1.0
    diffuse_color: tuple = (1.0, 1.0, 1.0)
    specular_color: tuple = (1.0, 1.0, 1.0)
    texture: str = ""
    normal_map: str = ""


@dataclass
class SphereMaterials:
    materials: list = field(default_factory=list)
    max_num_spheres: int = 20
    fire_delay: float = 0.5


_BOOL = {"shadows", "emissive", "reflective"}
_INT = {"destroyable"}
_FLOAT = {"radius_scale", "light_radius", "hardness", "refract_ix",
          "light_atten", "alpha", "metalness", "specular_mag", "specular_exp",
          "density"}
_COLOR = {"diffuse_color", "specular_color"}
_STR = {"texture", "normal_map"}


def parse_sphere_materials(path: str) -> SphereMaterials:
    out = SphereMaterials()
    cur = SphereMat()
    try:
        lines = open(path).read().splitlines()
    except OSError:
        return out
    for line in lines:
        h = line.find("#")
        if h >= 0:
            line = line[:h]
        t = line.split()
        if not t:
            continue
        kw, args = t[0], t[1:]
        if kw == "max_num_spheres":
            out.max_num_spheres = int(args[0])
        elif kw == "fire_delay":
            out.fire_delay = float(args[0])
        elif kw == "add_material":
            cur.name = " ".join(args)
            out.materials.append(replace(cur))
            cur = replace(cur)
        elif kw in _BOOL:
            setattr(cur, kw, bool(int(args[0])))
        elif kw in _INT:
            setattr(cur, kw, int(args[0]))
        elif kw in _FLOAT:
            setattr(cur, kw, float(args[0]))
        elif kw in _COLOR:
            setattr(cur, kw, tuple(float(a) for a in args[:3]))
        elif kw in _STR:
            setattr(cur, kw, "" if args[0] == "none" else args[0])
    return out
