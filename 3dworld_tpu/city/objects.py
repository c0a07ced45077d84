"""City street objects: benches, hydrants, streetlights, trashcans, ...

The reference places dozens of detail object types in city plots and
along sidewalks (`city_obj_placer.cpp` 3586 LoC, city_objects.cpp) with
per-type spacing/orientation rules.

Here: a seeded placer emitting a typed SoA set — roadside objects
(streetlights, hydrants, signs) spaced along road segments; plot objects
(benches, trashcans, fountains, planters) scattered inside blocks with
overlap rejection against buildings.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..utils.rng import RandGen

(OBJ_BENCH, OBJ_TRASHCAN, OBJ_FOUNTAIN, OBJ_PLANTER, OBJ_STREETLIGHT,
 OBJ_HYDRANT, OBJ_SIGN, OBJ_POWER_POLE) = range(8)

_ROADSIDE = (OBJ_STREETLIGHT, OBJ_HYDRANT, OBJ_SIGN, OBJ_POWER_POLE)
_PLOT = (OBJ_BENCH, OBJ_TRASHCAN, OBJ_FOUNTAIN, OBJ_PLANTER)


class CityObjects(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    kind: np.ndarray
    rot: np.ndarray


def place_city_objects(net, buildings, seed: int = 1,
                       roadside_spacing: float = 6.0,
                       per_block: int = 3) -> CityObjects:
    """Place detail objects along roads + inside blocks."""
    rg = RandGen(seed + 21, 2 * seed + 5)
    xs, ys, kinds, rots = [], [], [], []
    bparts = [b.parts[0] for b in buildings] if buildings else []

    def hits_building(x, y):
        return any(p[0] <= x <= p[3] and p[1] <= y <= p[4] for p in bparts)

    for s in net.segs:
        length = max(abs(s.x2 - s.x1), abs(s.y2 - s.y1))
        n = int(length // roadside_spacing)
        for i in range(n):
            t = (i + 0.5) / max(n, 1)
            x = s.x1 + t * (s.x2 - s.x1)
            y = s.y1 + t * (s.y2 - s.y1)
            side = 1.0 if rg.rand_bool() else -1.0
            if s.dim == 0:
                y += side * (s.width * 0.8)
            else:
                x += side * (s.width * 0.8)
            xs.append(x)
            ys.append(y)
            kinds.append(_ROADSIDE[rg.rand() % len(_ROADSIDE)])
            rots.append(0.0 if s.dim == 0 else np.pi / 2)
    for (x1, y1, x2, y2, city) in net.blocks:
        for _ in range(per_block):
            x = x1 + rg.randd() * max(x2 - x1, 0.1)
            y = y1 + rg.randd() * max(y2 - y1, 0.1)
            if hits_building(x, y):
                continue
            xs.append(x)
            ys.append(y)
            kinds.append(_PLOT[rg.rand() % len(_PLOT)])
            rots.append(2 * np.pi * rg.randd())
    return CityObjects(
        x=np.asarray(xs, np.float32), y=np.asarray(ys, np.float32),
        kind=np.asarray(kinds, np.int32), rot=np.asarray(rots, np.float32))
