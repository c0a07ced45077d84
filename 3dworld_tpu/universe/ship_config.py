"""Ship class definition file parsing.

The reference reads ship classes & weapons from a `ship_def_file`
(ship_config.cpp:1171, `us_class` ship.h:503): per-class physical and
combat parameters plus global settings.  This parser accepts a
keyword/value format covering the parameters our fleet sim consumes
(the reference's $-sectioned file carries many render-only fields; the
subset here is the simulation surface) and produces the SHIP_CLASSES
table used by `universe.ships`.

Format:
    ship <name>
      accel <f>  max_speed <f>  armor <f>  shields <f>
      weapon_range <f>  weapon_damage <f>  weapon_cooldown <f>  radius <f>
    end_ship
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class ShipClassDef:
    name: str = ""
    accel: float = 0.001
    max_speed: float = 0.01
    armor: float = 100.0
    shields: float = 50.0
    weapon_range: float = 0.5
    weapon_damage: float = 5.0
    weapon_cooldown: float = 20.0
    radius: float = 0.02


_FIELDS = {"accel", "max_speed", "armor", "shields", "weapon_range",
           "weapon_damage", "weapon_cooldown", "radius"}


def parse_ship_defs(path: str) -> list[ShipClassDef]:
    out = []
    cur = None
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
        i = 0
        while i < len(t):
            kw = t[i]
            if kw == "ship":
                cur = ShipClassDef(name=t[i + 1])
                i += 2
            elif kw == "end_ship":
                if cur is not None:
                    out.append(cur)
                cur = None
                i += 1
            elif kw in _FIELDS and cur is not None:
                setattr(cur, kw, float(t[i + 1]))
                i += 2
            else:
                i += 2 if i + 1 < len(t) else 1
    return out


def ship_class_table(defs: list[ShipClassDef]) -> np.ndarray:
    """Build the SHIP_CLASSES array consumed by universe.ships."""
    if not defs:
        from .ships import SHIP_CLASSES
        return SHIP_CLASSES
    return np.array([(d.accel, d.max_speed, d.armor, d.shields,
                      d.weapon_range, d.weapon_damage, d.weapon_cooldown,
                      d.radius) for d in defs], np.float32)
