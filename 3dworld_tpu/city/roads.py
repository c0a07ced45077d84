"""Road networks: city grid roads, connector roads, intersections.

The reference builds per-city grid road networks plus global connector
roads with legal-grade search, bridges/tunnels and stoplight
intersections (`road_network_t`, city_gen.cpp:440-1099, roads.cpp).

Here: grid roads subdivide each city plot into blocks; intersections are
the grid crossings with 2-phase stoplight cycles; connector roads join
city pairs with an L-shaped path (grade-legalized by flattening along the
route).  Everything is emitted as SoA arrays usable by the traffic sim
and heightmap carving.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np

from .plots import CityPlot


class RoadSeg(NamedTuple):
    x1: float
    y1: float
    x2: float
    y2: float
    width: float
    city: int       # -1 for connector roads
    dim: int        # 0 = x-aligned, 1 = y-aligned


class Intersection(NamedTuple):
    x: float
    y: float
    city: int
    roads: tuple    # road segment indices meeting here
    has_stoplight: bool


@dataclass
class RoadNetwork:
    segs: list = field(default_factory=list)
    isecs: list = field(default_factory=list)
    blocks: list = field(default_factory=list)  # (x1,y1,x2,y2,city) building plots

    def seg_array(self):
        if not self.segs:
            return np.zeros((0, 5), np.float32)
        return np.array([(s.x1, s.y1, s.x2, s.y2, s.width) for s in self.segs],
                        np.float32)


def gen_city_roads(plots: list[CityPlot], block_size: int = 8,
                   road_width: float = 1.0) -> RoadNetwork:
    """Grid roads inside each city plot; blocks between roads become
    building plots (road_network_t::gen_roads semantics)."""
    net = RoadNetwork()
    for ci, p in enumerate(plots):
        xs = list(range(p.x1, p.x2 + 1, block_size)) + [p.x2]
        ys = list(range(p.y1, p.y2 + 1, block_size)) + [p.y2]
        xs = sorted(set(xs))
        ys = sorted(set(ys))
        for y in ys:  # x-aligned roads
            net.segs.append(RoadSeg(p.x1, y, p.x2, y, road_width, ci, 0))
        for x in xs:  # y-aligned roads
            net.segs.append(RoadSeg(x, p.y1, x, p.y2, road_width, ci, 1))
        base = len(net.segs) - len(xs) - len(ys)
        for yi_, y in enumerate(ys):
            for xi_, x in enumerate(xs):
                net.isecs.append(Intersection(
                    float(x), float(y), ci,
                    (base + yi_, base + len(ys) + xi_),
                    has_stoplight=(0 < yi_ < len(ys) - 1 and 0 < xi_ < len(xs) - 1)))
        for yi_ in range(len(ys) - 1):
            for xi_ in range(len(xs) - 1):
                net.blocks.append((xs[xi_] + 1, ys[yi_] + 1,
                                   xs[xi_ + 1] - 1, ys[yi_ + 1] - 1, ci))
    return net


def gen_connector_roads(plots: list[CityPlot], net: RoadNetwork,
                        road_width: float = 1.0) -> list[tuple]:
    """L-shaped connector between each consecutive city pair
    (simplified legal-grade search); returns flatten routes
    [(x1,y1,x2,y2), ...] for heightmap carving."""
    routes = []
    for i in range(len(plots) - 1):
        a, b = plots[i], plots[i + 1]
        ax = (a.x1 + a.x2) // 2
        ay = (a.y1 + a.y2) // 2
        bx = (b.x1 + b.x2) // 2
        by = (b.y1 + b.y2) // 2
        # horizontal leg then vertical leg
        net.segs.append(RoadSeg(min(ax, bx), ay, max(ax, bx), ay, road_width, -1, 0))
        net.segs.append(RoadSeg(bx, min(ay, by), bx, max(ay, by), road_width, -1, 1))
        routes.append((min(ax, bx), ay, max(ax, bx), ay))
        routes.append((bx, min(ay, by), bx, max(ay, by)))
    return routes


def carve_roads(heightmap, routes, plots, width: int = 1):
    """Flatten connector routes into the heightmap (road grading along the
    path; bridges/tunnels are a later round)."""
    import jax.numpy as jnp
    from .plots import flatten_region

    hm = jnp.asarray(heightmap)
    for (x1, y1, x2, y2) in routes:
        elev = 0.5 * (float(hm[int(y1), int(x1)]) + float(hm[int(y2), int(x2)]))
        hm = flatten_region(hm, min(x1, x2) - width, min(y1, y2) - width,
                            max(x1, x2) + width, max(y1, y2) + width, elev,
                            slope_width=3)
    return hm
