"""Building interiors: walls / rooms / hallways / doors / stairs.

The reference splits each building part into rooms via wall placement
with hallways in large parts, connecting doors, stairwells and elevators
(`gen_interior_int`, building_floorplan.cpp:325-1313), then ~30 room
content generators.

Here: a seeded recursive-split floorplanner per part per floor — hallway
down the long axis when wide enough, rooms along both sides, doors cut
between adjacent rooms and into hallways, one stairwell per multi-floor
part placed in a consistent location across floors.  Pure host generation
(irregular/discrete), emitting fixed-form arrays for physics/lighting/AI.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..utils.rng import RandGen

# scale factors relative to floor_height (room proportions track the
# building scale, as the reference's wall_thick/doorway_width do)
WALL_THICK_F = 0.12
DOOR_WIDTH_F = 0.8
MIN_ROOM_F = 1.4        # min room span, in floor heights
HALL_MIN_SPAN_F = 4.0   # need this much width for a hallway
HALL_HALF_F = 0.6


@dataclass
class Room:
    x1: float
    y1: float
    x2: float
    y2: float
    floor: int
    is_hallway: bool = False

    @property
    def area(self):
        return (self.x2 - self.x1) * (self.y2 - self.y1)


@dataclass
class Interior:
    rooms: list = field(default_factory=list)
    walls: list = field(default_factory=list)   # (x1,y1,z1,x2,y2,z2)
    doors: list = field(default_factory=list)   # (x, y, z, dim)
    stairs: list = field(default_factory=list)  # (x1,y1,x2,y2,floor)
    elevators: list = field(default_factory=list)  # (x1,y1,x2,y2) shafts (all floors)
    num_floors: int = 1


def _split_rooms(rg: RandGen, x1, y1, x2, y2, min_room, depth=0):
    """Recursive split into rooms; returns list of (x1,y1,x2,y2)."""
    w = x2 - x1
    h = y2 - y1
    if depth > 4 or (w < 2 * min_room and h < 2 * min_room):
        return [(x1, y1, x2, y2)]
    if w >= h and w >= 2 * min_room:
        cut = x1 + rg.rand_uniform(0.35, 0.65) * w
        return (_split_rooms(rg, x1, y1, cut, y2, min_room, depth + 1)
                + _split_rooms(rg, cut, y1, x2, y2, min_room, depth + 1))
    if h >= 2 * min_room:
        cut = y1 + rg.rand_uniform(0.35, 0.65) * h
        return (_split_rooms(rg, x1, y1, x2, cut, min_room, depth + 1)
                + _split_rooms(rg, x1, cut, x2, y2, min_room, depth + 1))
    return [(x1, y1, x2, y2)]


def gen_interior(part, num_floors: int, floor_height: float, seed: int,
                 has_basement: bool = False, has_attic: bool = False) -> Interior:
    """Floorplan one building part (x1,y1,z1,x2,y2,z2); optional basement
    level (floor -1, one storage room) and attic (single room at the top)
    ~ the reference's basements/attics (building_floorplan.cpp)."""
    x1, y1, z1, x2, y2, z2 = part
    rg = RandGen(seed + 11, 3 * seed + 7)
    out = Interior(num_floors=num_floors)
    if has_basement:
        out.rooms.append(Room(x1, y1, x2, y2, -1))
        out.stairs.append((x1 + 0.1 * (x2 - x1), y1 + 0.1 * (y2 - y1),
                           x1 + 0.1 * (x2 - x1) + 2 * floor_height,
                           y1 + 0.1 * (y2 - y1) + 2 * floor_height, -1))
    if has_attic:
        out.rooms.append(Room(x1, y1, x2, y2, num_floors))
    w = x2 - x1
    h = y2 - y1
    long_x = w >= h
    span = h if long_x else w
    fh = floor_height
    min_room = MIN_ROOM_F * fh
    hall_min = HALL_MIN_SPAN_F * fh
    wall_t = WALL_THICK_F * fh

    # consistent stairwell location across floors (building_floorplan
    # keeps stacked stairwells)
    sx = x1 + rg.rand_uniform(0.1, 0.7) * w
    sy = y1 + rg.rand_uniform(0.1, 0.7) * h
    s_sz = 3.0 * floor_height
    # elevator shaft next to the stairwell in buildings tall enough
    # (building_floorplan adds stacked elevators; >= 3 floors here)
    if num_floors >= 3:
        ex = min(sx + s_sz + wall_t, x2 - 1.5 * fh)
        out.elevators.append((ex, sy, min(ex + 1.2 * fh, x2),
                              min(sy + 1.2 * fh, y2)))

    for fl in range(num_floors):
        z = z1 + fl * floor_height
        if span >= hall_min:  # hallway down the long axis
            mid = 0.5 * ((y1 + y2) if long_x else (x1 + x2))
            hw = HALL_HALF_F * fh
            if long_x:
                hall = Room(x1, mid - hw, x2, mid + hw, fl, is_hallway=True)
                sides = [(x1, y1, x2, mid - hw), (x1, mid + hw, x2, y2)]
            else:
                hall = Room(mid - hw, y1, mid + hw, y2, fl, is_hallway=True)
                sides = [(x1, y1, mid - hw, y2), (mid + hw, y1, x2, y2)]
            out.rooms.append(hall)
            for (a1, b1, a2, b2) in sides:
                for (rx1, ry1, rx2, ry2) in _split_rooms(rg, a1, b1, a2, b2, min_room):
                    out.rooms.append(Room(rx1, ry1, rx2, ry2, fl))
                    # door from each room into the hallway
                    if long_x:
                        dx = 0.5 * (rx1 + rx2)
                        dy = mid + (-hw if b2 <= mid else hw)
                    else:
                        dx = mid + (-hw if a2 <= mid else hw)
                        dy = 0.5 * (ry1 + ry2)
                    out.doors.append((dx, dy, z, 0 if long_x else 1))
        else:
            rooms = _split_rooms(rg, x1, y1, x2, y2, min_room)
            for i, (rx1, ry1, rx2, ry2) in enumerate(rooms):
                out.rooms.append(Room(rx1, ry1, rx2, ry2, fl))
                if i > 0:  # door to the previous room (shared wall)
                    px1, py1, px2, py2 = rooms[i - 1]
                    out.doors.append((max(rx1, px1) + 0.5 * min(rx2 - rx1, 0.2),
                                      max(ry1, py1), z, 0))

        # walls: room boundaries not on the part exterior
        for r in [r for r in out.rooms if r.floor == fl]:
            for (wx1, wy1, wx2, wy2) in (
                    (r.x1, r.y1, r.x2, r.y1), (r.x1, r.y2, r.x2, r.y2),
                    (r.x1, r.y1, r.x1, r.y2), (r.x2, r.y1, r.x2, r.y2)):
                on_ext = (abs(wy1 - y1) < 1e-6 and abs(wy2 - y1) < 1e-6) or \
                         (abs(wy1 - y2) < 1e-6 and abs(wy2 - y2) < 1e-6) or \
                         (abs(wx1 - x1) < 1e-6 and abs(wx2 - x1) < 1e-6) or \
                         (abs(wx1 - x2) < 1e-6 and abs(wx2 - x2) < 1e-6)
                if not on_ext:
                    out.walls.append((wx1 - wall_t / 2, wy1 - wall_t / 2, z,
                                      wx2 + wall_t / 2, wy2 + wall_t / 2,
                                      z + floor_height))
        if num_floors > 1 and fl < num_floors - 1:
            out.stairs.append((sx, sy, min(sx + s_sz, x2), min(sy + s_sz, y2), fl))
    return out


def gen_building_interiors(buildings, params, seed: int = 1):
    """Floorplan all buildings' ground parts (gen_buildings interior pass)."""
    for bi, b in enumerate(buildings):
        if not b.parts:
            continue
        p = b.parts[0]
        nf = max(1, int(round((p[5] - p[2]) / params.floor_height)))
        rg = RandGen(seed + bi, 2 * seed + 3)
        b.interior = gen_interior(p, nf, params.floor_height, seed + bi,
                                  has_basement=(rg.randd() < 0.3),
                                  has_attic=(b.roof_type == 1))
    return buildings


# ---------------------------------------------------------------------------
# elevator car state machine (the reference's elevator_t + the
# player_in_elevator states 0=out 1=in 2=doors closed 3=moving,
# building_gameplay.cpp:17)
# ---------------------------------------------------------------------------

@dataclass
class ElevatorCar:
    """One car in a shaft: floor-to-floor travel with door timing."""

    z: float = 0.0               # car height in floor units
    target: int = 0              # destination floor
    state: int = 0               # 0 idle(open), 1 closing, 2 moving, 3 opening
    timer: int = 0
    DOOR_TICKS: int = 20
    SPEED: float = 0.05          # floors per tick

    def call(self, floor: int):
        if self.state == 0 and floor != round(self.z):
            self.target = floor
            self.state = 1
            self.timer = self.DOOR_TICKS

    def step(self):
        if self.state == 1:          # doors closing
            self.timer -= 1
            if self.timer <= 0:
                self.state = 2
        elif self.state == 2:        # moving
            d = self.target - self.z
            if abs(d) <= self.SPEED:
                self.z = float(self.target)
                self.state = 3
                self.timer = self.DOOR_TICKS
            else:
                self.z += self.SPEED if d > 0 else -self.SPEED
        elif self.state == 3:        # doors opening
            self.timer -= 1
            if self.timer <= 0:
                self.state = 0
        return self.state
