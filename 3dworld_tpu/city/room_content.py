"""Room content generation: furnishing rooms by assigned type.

The reference has ~30 specialized room generators (kitchens, bathrooms,
offices, retail, malls, jails, hospitals, ... —
building_room_obj_place.cpp 5145 LoC, building_room_geom.cpp 8229 LoC).
This module provides the same *mechanism* at smaller catalog size: rooms
get types assigned by floor/size heuristics, then a per-type generator
places furniture boxes (SoA cubes + type ids) with wall-alignment and
clearance rules — deterministic from the building seed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..utils.rng import RandGen

# room types
(R_HALL, R_BEDROOM, R_BATHROOM, R_KITCHEN, R_LIVING, R_OFFICE, R_DINING,
 R_STORAGE, R_LIBRARY, R_RETAIL, R_SERVER, R_LAUNDRY, R_UTILITY,
 R_CONFERENCE, R_CLASSROOM, R_CAFETERIA, R_GAME, R_JAIL, R_HOSPITAL,
 R_FACTORY, R_DATACENTER, R_RESTAURANT, R_PARKING) = range(23)

# furniture kinds
(F_BED, F_TOILET, F_SINK, F_TUB, F_COUNTER, F_FRIDGE, F_STOVE, F_TABLE,
 F_CHAIR, F_COUCH, F_TV, F_DESK, F_BOOKCASE, F_SHELF, F_RACK, F_LAMP,
 F_RUG, F_PLANT, F_WARDROBE, F_NIGHTSTAND, F_DRESSER, F_MICROWAVE,
 F_WASHER, F_DRYER, F_WATER_HEATER, F_FURNACE, F_POOL_TABLE,
 F_WHITEBOARD, F_CONF_TABLE, F_VENDING, F_JAIL_BARS, F_HOSPITAL_BED,
 F_MACHINE, F_SERVER_RACK_ROW, F_BOOTH, F_PARK_SPACE) = range(36)

# per-room-type furniture recipes: (kind, count, against_wall, w, d, h)
_RECIPES = {
    R_BEDROOM: [(F_BED, 1, True, 0.45, 0.3, 0.12), (F_DESK, 1, True, 0.25, 0.15, 0.15),
                (F_CHAIR, 1, False, 0.1, 0.1, 0.15), (F_LAMP, 1, True, 0.06, 0.06, 0.25)],
    R_BATHROOM: [(F_TOILET, 1, True, 0.12, 0.16, 0.12), (F_SINK, 1, True, 0.14, 0.1, 0.18),
                 (F_TUB, 1, True, 0.35, 0.16, 0.1)],
    R_KITCHEN: [(F_COUNTER, 2, True, 0.3, 0.12, 0.18), (F_FRIDGE, 1, True, 0.14, 0.14, 0.35),
                (F_STOVE, 1, True, 0.14, 0.12, 0.18), (F_TABLE, 1, False, 0.2, 0.2, 0.14)],
    R_LIVING: [(F_COUCH, 1, True, 0.4, 0.16, 0.14), (F_TV, 1, True, 0.3, 0.06, 0.2),
               (F_TABLE, 1, False, 0.2, 0.12, 0.08), (F_RUG, 1, False, 0.4, 0.3, 0.01),
               (F_PLANT, 1, True, 0.08, 0.08, 0.2)],
    R_OFFICE: [(F_DESK, 2, True, 0.25, 0.15, 0.15), (F_CHAIR, 2, False, 0.1, 0.1, 0.15),
               (F_BOOKCASE, 1, True, 0.2, 0.08, 0.3)],
    R_DINING: [(F_TABLE, 1, False, 0.3, 0.2, 0.14), (F_CHAIR, 4, False, 0.1, 0.1, 0.15)],
    R_STORAGE: [(F_SHELF, 3, True, 0.3, 0.1, 0.3)],
    R_LIBRARY: [(F_BOOKCASE, 4, True, 0.25, 0.08, 0.3), (F_TABLE, 1, False, 0.25, 0.15, 0.14),
                (F_CHAIR, 2, False, 0.1, 0.1, 0.15)],
    R_RETAIL: [(F_COUNTER, 1, True, 0.3, 0.12, 0.18), (F_RACK, 4, False, 0.15, 0.15, 0.25)],
    R_SERVER: [(F_RACK, 6, True, 0.15, 0.2, 0.4)],
    # extended catalog (building_room_obj_place.cpp generators)
    R_LAUNDRY: [(F_WASHER, 1, True, 0.12, 0.12, 0.16), (F_DRYER, 1, True, 0.12, 0.12, 0.16),
                (F_COUNTER, 1, True, 0.25, 0.1, 0.18)],
    R_UTILITY: [(F_WATER_HEATER, 1, True, 0.1, 0.1, 0.3), (F_FURNACE, 1, True, 0.14, 0.12, 0.3),
                (F_SHELF, 1, True, 0.25, 0.08, 0.3)],
    R_CONFERENCE: [(F_CONF_TABLE, 1, False, 0.45, 0.2, 0.14), (F_CHAIR, 6, False, 0.1, 0.1, 0.15),
                   (F_WHITEBOARD, 1, True, 0.3, 0.02, 0.2), (F_TV, 1, True, 0.25, 0.05, 0.18)],
    R_CLASSROOM: [(F_DESK, 6, False, 0.14, 0.1, 0.14), (F_CHAIR, 6, False, 0.08, 0.08, 0.14),
                  (F_WHITEBOARD, 1, True, 0.35, 0.02, 0.2)],
    R_CAFETERIA: [(F_TABLE, 3, False, 0.2, 0.2, 0.14), (F_CHAIR, 8, False, 0.08, 0.08, 0.14),
                  (F_VENDING, 2, True, 0.12, 0.1, 0.3), (F_COUNTER, 1, True, 0.35, 0.12, 0.18)],
    R_GAME: [(F_POOL_TABLE, 1, False, 0.35, 0.2, 0.14), (F_COUCH, 1, True, 0.4, 0.16, 0.14),
             (F_TV, 1, True, 0.3, 0.06, 0.2)],
    # specialized building types (building_jail/hospital/factory/
    # datacenter/restaurant/parking .cpp generators, structural subset)
    R_JAIL: [(F_JAIL_BARS, 3, True, 0.3, 0.02, 0.3), (F_BED, 2, True, 0.3, 0.2, 0.1),
             (F_TOILET, 2, True, 0.1, 0.12, 0.1)],
    R_HOSPITAL: [(F_HOSPITAL_BED, 3, True, 0.3, 0.18, 0.12), (F_COUNTER, 1, True, 0.3, 0.1, 0.18),
                 (F_SINK, 1, True, 0.1, 0.08, 0.16), (F_CHAIR, 2, False, 0.08, 0.08, 0.14)],
    R_FACTORY: [(F_MACHINE, 4, False, 0.25, 0.2, 0.3), (F_SHELF, 2, True, 0.3, 0.1, 0.3),
                (F_COUNTER, 1, True, 0.25, 0.1, 0.18)],
    R_DATACENTER: [(F_SERVER_RACK_ROW, 6, False, 0.5, 0.12, 0.35),
                   (F_DESK, 1, True, 0.2, 0.12, 0.14)],
    R_RESTAURANT: [(F_BOOTH, 4, True, 0.25, 0.15, 0.12), (F_TABLE, 3, False, 0.15, 0.15, 0.12),
                   (F_CHAIR, 6, False, 0.08, 0.08, 0.12), (F_COUNTER, 1, True, 0.35, 0.12, 0.18)],
    R_PARKING: [(F_PARK_SPACE, 8, False, 0.22, 0.45, 0.005)],
}

# bedroom upgrades: wardrobe/nightstand/dresser join the base recipe
_RECIPES[R_BEDROOM] = _RECIPES[R_BEDROOM] + [
    (F_WARDROBE, 1, True, 0.2, 0.1, 0.3), (F_NIGHTSTAND, 1, True, 0.08, 0.08, 0.1),
    (F_DRESSER, 1, True, 0.18, 0.1, 0.14)]
_RECIPES[R_KITCHEN] = _RECIPES[R_KITCHEN] + [
    (F_MICROWAVE, 1, True, 0.08, 0.06, 0.06)]


@dataclass
class RoomObjects:
    cubes: list = field(default_factory=list)   # (x1,y1,z1,x2,y2,z2)
    kinds: list = field(default_factory=list)
    rooms: list = field(default_factory=list)   # room index per object
    room_types: list = field(default_factory=list)


def assign_room_types(interior, rg: RandGen, is_office_bldg: bool = False):
    """Type assignment heuristics (~ assign_special_room_types): hallways
    stay halls; ground floor gets kitchen/living; small rooms become
    bathrooms; office buildings get offices/server rooms."""
    types = []
    per_floor_kitchen = {}
    for r in interior.rooms:
        if r.is_hallway:
            types.append(R_HALL)
            continue
        area = r.area
        if is_office_bldg:
            roll = rg.rand() % 16
            types.append({0: R_SERVER, 1: R_STORAGE, 2: R_CONFERENCE,
                          3: R_CLASSROOM, 4: R_CAFETERIA, 5: R_DATACENTER,
                          6: R_RESTAURANT,
                          7: R_HOSPITAL}.get(roll, R_OFFICE))
            continue
        if area < 0.02:
            types.append(R_BATHROOM)
        elif r.floor == 0 and not per_floor_kitchen.get(0):
            per_floor_kitchen[0] = True
            types.append(R_KITCHEN)
        elif r.floor == 0 and area > 0.04:
            types.append(R_LIVING if rg.rand_bool() else R_DINING)
        else:
            roll = rg.rand() % 12
            types.append({0: R_LIBRARY, 1: R_STORAGE, 2: R_LAUNDRY,
                          3: R_UTILITY, 4: R_GAME}.get(roll, R_BEDROOM))
    return types


def furnish_rooms(interior, floor_height: float, seed: int,
                  is_office_bldg: bool = False) -> RoomObjects:
    """Place furniture in every room per its type recipe."""
    rg = RandGen(seed + 31, seed * 5 + 17)
    out = RoomObjects()
    out.room_types = assign_room_types(interior, rg, is_office_bldg)
    # recipe dims are in units of 2.5 floor heights (a bed ~ 1.1 fh wide),
    # so furniture fits rooms whose min span is MIN_ROOM_F=1.4 fh
    scale = floor_height / 0.2
    for ri, (room, rtype) in enumerate(zip(interior.rooms, out.room_types)):
        recipe = _RECIPES.get(rtype, [])
        z0 = room.floor * floor_height
        placed = []
        for (kind, count, against_wall, w, d, h) in recipe:
            w *= scale
            d *= scale
            h *= scale
            if w > (room.x2 - room.x1) - 0.02 or d > (room.y2 - room.y1) - 0.02:
                continue  # furniture doesn't fit this room
            for _ in range(count):
                ok = False
                for _attempt in range(8):
                    if against_wall:
                        wall = rg.rand() % 4
                        if wall == 0:
                            x = room.x1 + 0.01
                            y = room.y1 + rg.randd() * max(room.y2 - room.y1 - d, 0.01)
                        elif wall == 1:
                            x = room.x2 - w - 0.01
                            y = room.y1 + rg.randd() * max(room.y2 - room.y1 - d, 0.01)
                        elif wall == 2:
                            x = room.x1 + rg.randd() * max(room.x2 - room.x1 - w, 0.01)
                            y = room.y1 + 0.01
                        else:
                            x = room.x1 + rg.randd() * max(room.x2 - room.x1 - w, 0.01)
                            y = room.y2 - d - 0.01
                    else:
                        x = room.x1 + rg.randd() * max(room.x2 - room.x1 - w, 0.01)
                        y = room.y1 + rg.randd() * max(room.y2 - room.y1 - d, 0.01)
                    if x < room.x1 or y < room.y1 or x + w > room.x2 \
                            or y + d > room.y2:
                        continue
                    if any(x < px2 and x + w > px1 and y < py2 and y + d > py1
                           for (px1, py1, px2, py2) in placed):
                        continue
                    ok = True
                    break
                if not ok:
                    continue
                placed.append((x, y, x + w, y + d))
                out.cubes.append((x, y, z0, x + w, y + d, z0 + h))
                out.kinds.append(kind)
                out.rooms.append(ri)
    return out


def furnish_buildings(buildings, params, seed: int = 1):
    """Furnish every floorplanned building (the room-content pass of
    gen_buildings)."""
    results = []
    for bi, b in enumerate(buildings):
        if b.interior is None:
            results.append(None)
            continue
        office = (len(b.parts) > 0 and (b.parts[0][5] - b.parts[0][2])
                  > 4 * params.floor_height)
        results.append(furnish_rooms(b.interior, params.floor_height,
                                     seed + 7 * bi, office))
    return results
