"""City street objects: the detail-object catalog + placer.

The reference places ~40 detail object types in city plots, along
sidewalks and on the road surface (`city_obj_placer.cpp` 3586 LoC,
city_objects.h:92-493) with per-type spacing/orientation rules and
blocker-based rejection (`check_pt_and_place_blocker`,
city_obj_placer.cpp:525-537).

Here: a seeded placer emitting a typed SoA set over a kind catalog that
mirrors the reference's object breadth — roadside objects spaced along
segments, road-surface objects on the centerline, plot objects
scattered with blocker rejection, residential-yard objects, and plot
dividers along block edges.  Each kind carries a footprint radius +
height for collision/export.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..utils.rng import RandGen

# kind catalog (city_objects.h structs); (name, radius, height, category)
# categories: road = sidewalk edge, surf = road surface, plot = public
# block, yard = residential block, edge = along plot boundary
KIND_TABLE = (
    ("bench",         0.25, 0.30, "plot"),    # bench_t
    ("trashcan",      0.15, 0.40, "plot"),    # trashcan_t
    ("fountain",      0.60, 0.80, "plot"),    # fountain_t
    ("planter",       0.30, 0.25, "plot"),    # tree_planter_t
    ("streetlight",   0.08, 1.60, "road"),
    ("hydrant",       0.10, 0.35, "road"),    # fire_hydrant_t
    ("sign",          0.06, 1.00, "road"),
    ("power_pole",    0.10, 2.00, "road"),    # power_pole_t
    ("mailbox",       0.10, 0.45, "road"),    # mailbox_t
    ("manhole",       0.20, 0.01, "surf"),    # manhole_t
    ("street_sewer",  0.20, 0.02, "surf"),    # street_sewer_t
    ("traffic_cone",  0.08, 0.20, "surf"),    # traffic_cone_t
    ("substation",    0.50, 0.60, "plot"),    # substation_t
    ("statue",        0.40, 1.00, "plot"),    # statue_t
    ("sculpture",     0.40, 1.20, "plot"),    # sculpture_t
    ("wfountain",     0.12, 0.35, "plot"),    # drinking wfountain_t
    ("bicycle",       0.15, 0.30, "road"),    # bicycle_t
    ("dumpster",      0.45, 0.50, "plot"),    # dumpster_t
    ("picnic_table",  0.45, 0.30, "plot"),    # picnic_t
    ("bb_hoop",       0.15, 1.20, "yard"),    # bb_hoop_t
    ("swingset",      0.60, 0.90, "yard"),    # swingset_t
    ("trampoline",    0.55, 0.30, "yard"),    # trampoline_t
    ("swimming_pool", 0.90, 0.15, "yard"),    # swimming_pool_t
    ("deck_chair",    0.25, 0.20, "yard"),    # deck_chair_t
    ("beach_ball",    0.10, 0.10, "yard"),    # beach_ball_t
    ("umbrella",      0.35, 0.80, "yard"),    # umbrella_t
    ("potted_plant",  0.12, 0.30, "yard"),    # potted_plant_t
    ("flower_bed",    0.25, 0.10, "yard"),    # flower_t
    ("pond",          0.80, 0.05, "plot"),    # pond_t
    ("divider",       0.06, 0.40, "edge"),    # divider_t (fence/hedge/wall)
    ("pillar",        0.12, 1.50, "plot"),    # pillar_t (walkway support)
    ("parking_solar", 0.70, 0.70, "plot"),    # parking_solar_t canopy
)
KIND_NAMES = tuple(k[0] for k in KIND_TABLE)
KIND_INDEX = {k[0]: i for i, k in enumerate(KIND_TABLE)}
NUM_KINDS = len(KIND_TABLE)
KIND_RADIUS = np.asarray([k[1] for k in KIND_TABLE], np.float32)
KIND_HEIGHT = np.asarray([k[2] for k in KIND_TABLE], np.float32)

# backwards-compatible aliases for the original 8-kind API
(OBJ_BENCH, OBJ_TRASHCAN, OBJ_FOUNTAIN, OBJ_PLANTER) = (
    KIND_INDEX["bench"], KIND_INDEX["trashcan"], KIND_INDEX["fountain"],
    KIND_INDEX["planter"])
(OBJ_STREETLIGHT, OBJ_HYDRANT, OBJ_SIGN, OBJ_POWER_POLE) = (
    KIND_INDEX["streetlight"], KIND_INDEX["hydrant"], KIND_INDEX["sign"],
    KIND_INDEX["power_pole"])

_ROAD = tuple(i for i, k in enumerate(KIND_TABLE) if k[3] == "road")
_SURF = tuple(i for i, k in enumerate(KIND_TABLE) if k[3] == "surf")
_PLOT = tuple(i for i, k in enumerate(KIND_TABLE) if k[3] == "plot")
_YARD = tuple(i for i, k in enumerate(KIND_TABLE) if k[3] == "yard")


class CityObjects(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    kind: np.ndarray
    rot: np.ndarray

    @property
    def radius(self):
        return KIND_RADIUS[self.kind]

    @property
    def height(self):
        return KIND_HEIGHT[self.kind]


def place_city_objects(net, buildings, seed: int = 1,
                       roadside_spacing: float = 6.0,
                       per_block: int = 6,
                       residential_frac: float = 0.4) -> CityObjects:
    """Place detail objects: roadside kinds spaced along segments
    (alternating sides), road-surface kinds sparsely on centerlines,
    plot/yard kinds inside blocks with blocker rejection against
    buildings and each other, dividers along residential block edges
    (city_obj_placer::place_detail_objects semantics)."""
    rg = RandGen(seed + 21, 2 * seed + 5)
    xs, ys, kinds, rots = [], [], [], []
    bparts = [b.parts[0] for b in buildings] if buildings else []
    blockers = []

    def hits_building(x, y, r):
        return any(p[0] - r <= x <= p[3] + r and p[1] - r <= y <= p[4] + r
                   for p in bparts)

    def blocked(x, y, r):
        # check_pt_and_place_blocker: keep objects apart
        return any((x - bx) ** 2 + (y - by) ** 2 < (r + br) ** 2
                   for (bx, by, br) in blockers)

    def try_place(x, y, kind):
        r = float(KIND_RADIUS[kind])
        if hits_building(x, y, r) or blocked(x, y, r):
            return False
        xs.append(x)
        ys.append(y)
        kinds.append(kind)
        rots.append(2 * np.pi * rg.randd())
        blockers.append((x, y, r))
        return True

    for s in net.segs:
        length = max(abs(s.x2 - s.x1), abs(s.y2 - s.y1))
        n = int(length // roadside_spacing)
        for i in range(n):
            t = (i + 0.5) / max(n, 1)
            x = s.x1 + t * (s.x2 - s.x1)
            y = s.y1 + t * (s.y2 - s.y1)
            side = 1.0 if (i % 2 == 0) else -1.0   # alternate sides
            kind = _ROAD[rg.rand() % len(_ROAD)]
            if s.dim == 0:
                yy, xx = y + side * (s.width * 0.8), x
            else:
                xx, yy = x + side * (s.width * 0.8), y
            if try_place(xx, yy, kind):
                rots[-1] = 0.0 if s.dim == 0 else np.pi / 2
            # occasional road-surface object on the centerline
            if rg.rand() % 5 == 0:
                try_place(x, y, _SURF[rg.rand() % len(_SURF)])

    for (x1, y1, x2, y2, city) in net.blocks:
        residential = rg.randd() < residential_frac
        pool = _YARD if residential else _PLOT
        for _ in range(per_block):
            x = x1 + rg.randd() * max(x2 - x1, 0.1)
            y = y1 + rg.randd() * max(y2 - y1, 0.1)
            try_place(x, y, pool[rg.rand() % len(pool)])
        if residential:
            # dividers (fence/hedge) along the block's -y edge
            n = max(int((x2 - x1) / 1.0), 1)
            for i in range(n):
                try_place(x1 + (i + 0.5) * (x2 - x1) / n, y1 + 0.2,
                          KIND_INDEX["divider"])
    return CityObjects(
        x=np.asarray(xs, np.float32), y=np.asarray(ys, np.float32),
        kind=np.asarray(kinds, np.int32), rot=np.asarray(rots, np.float32))


def objects_to_cobjs(objs: CityObjects, ground_z: float = 0.0):
    """Register objects as collision cylinders (the reference adds each
    placed object to `colliders`)."""
    from ..scene import cobj as SC
    from ..physics.cobjs import COLL_CYLINDER
    sp = SC.SceneParse()
    for i in range(len(objs.x)):
        r = float(KIND_RADIUS[objs.kind[i]])
        h = float(KIND_HEIGHT[objs.kind[i]])
        sp.cobjs.append(SC.RawCobj(
            COLL_CYLINDER,
            (float(objs.x[i]), float(objs.y[i]), ground_z),
            (float(objs.x[i]), float(objs.y[i]), ground_z + h),
            r1=r, r2=r))
    return SC.pack_cobjs(sp)
