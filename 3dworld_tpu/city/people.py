"""Building people AI: room nav graph + batched walkers.

The reference builds a nav graph over rooms/stairs/doors
(`building_nav_graph_t`, building_navigation.cpp:283), finds routes with
A* (`find_route_to_point` :1931) and updates each person's state machine
per frame (`ai_room_update` :2864).

Split here: graph + routing on host (irregular, low-frequency — goals
change every few hundred frames), movement of ALL people as one vmapped
step over padded waypoint paths (high-frequency).  Edges are DOOR-KEYED:
each room-to-room edge carries the connecting door's position (stair
edges carry the stair center), and routes expand to door-waypoint paths
— walkers pass through doorways, never through wall segments
(building_navigation.cpp's point_in_room/door checks).  The batched step
adds pairwise separation avoidance (ai_room_update's person-person
collision, building_navigation.cpp:2689).
"""

from __future__ import annotations

import functools
from collections import deque
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.rng import RandGen

MAX_PATH = 32           # waypoints: door + room-center per hop
AVOID_RADIUS = 0.06     # personal space, world units
AVOID_PUSH = 0.35       # max fraction of a step spent dodging


@dataclass
class NavGraph:
    """Rooms as nodes; door/stair adjacency as edges with waypoints."""

    centers: np.ndarray     # [R, 3] room centers (x, y, floor)
    adj: list               # adjacency lists
    waypoints: dict         # (a, b) -> (x, y) door/stair crossing point

    def route(self, a: int, b: int) -> list[int]:
        """BFS route (A* reduces to BFS on the unweighted room graph)."""
        if a == b:
            return [a]
        prev = {a: -1}
        q = deque([a])
        while q:
            u = q.popleft()
            for v in self.adj[u]:
                if v not in prev:
                    prev[v] = u
                    if v == b:
                        path = [b]
                        while path[-1] != a:
                            path.append(prev[path[-1]])
                        return path[::-1]
                    q.append(v)
        return [a]

    def expand(self, rooms: list[int]) -> list[tuple]:
        """Room route -> (x, y, floor) waypoints through each connecting
        door (then the next room's center)."""
        wps = []
        for k in range(len(rooms) - 1):
            a, b = rooms[k], rooms[k + 1]
            wp = self.waypoints.get((a, b)) or self.waypoints.get((b, a))
            fa = self.centers[a, 2]
            fb = self.centers[b, 2]
            if wp is not None:
                # cross the door at the SOURCE room's floor, then step to
                # the destination floor (stairs change floor mid-crossing)
                wps.append((wp[0], wp[1], fa if fa == fb else fb))
            wps.append((self.centers[b, 0], self.centers[b, 1], fb))
        if not wps:
            a = rooms[0]
            wps.append((self.centers[a, 0], self.centers[a, 1],
                        self.centers[a, 2]))
        return wps


def build_nav_graph(interior) -> NavGraph:
    """Nav graph from a floorplanned Interior: rooms connect via doors
    (the door's z names its floor: floor = round((z - z1) / fh)) and
    stairwells (between floors); each edge stores its crossing point."""
    rooms = interior.rooms
    R = len(rooms)
    centers = np.array([[0.5 * (r.x1 + r.x2), 0.5 * (r.y1 + r.y2), r.floor]
                        for r in rooms], np.float32)
    adj = [[] for _ in range(R)]
    waypoints = {}

    by_floor = {}
    for i, r in enumerate(rooms):
        by_floor.setdefault(r.floor, []).append(i)

    def room_at(x, y, fl):
        for i in by_floor.get(fl, ()):
            r = rooms[i]
            if r.x1 - 1e-6 <= x <= r.x2 + 1e-6 \
                    and r.y1 - 1e-6 <= y <= r.y2 + 1e-6:
                return i
        return -1

    def connect(a, b, wx, wy):
        if b not in adj[a]:
            adj[a].append(b)
            adj[b].append(a)
        waypoints.setdefault((a, b), (wx, wy))

    fh = getattr(interior, "floor_height", 1.0) or 1.0
    z1 = getattr(interior, "z1", 0.0)
    for (dx, dy, dz, dim) in interior.doors:
        fl0 = int(round((dz - z1) / fh))
        eps = 0.05 * fh
        # try the z-derived floor first; interiors built without z1/fh
        # metadata (mall/backrooms floors) fall back to a floor scan
        floors = [fl0] if fl0 in by_floor else sorted(by_floor)
        for fl in floors:
            a = room_at(dx, dy - eps, fl) if dim == 0 else \
                room_at(dx - eps, dy, fl)
            b = room_at(dx, dy + eps, fl) if dim == 0 else \
                room_at(dx + eps, dy, fl)
            if a >= 0 and b >= 0 and a != b:
                connect(a, b, dx, dy)
                break

    # stairs connect the rooms containing them across floors
    for (sx1, sy1, sx2, sy2, fl) in interior.stairs:
        cx = 0.5 * (sx1 + sx2)
        cy = 0.5 * (sy1 + sy2)
        a = room_at(cx, cy, fl)
        b = room_at(cx, cy, fl + 1)
        if a >= 0 and b >= 0:
            connect(a, b, cx, cy)
    return NavGraph(centers=centers, adj=adj, waypoints=waypoints)


class PeopleState(NamedTuple):
    """Batched walkers following padded waypoint paths."""

    x: jax.Array
    y: jax.Array
    floor: jax.Array
    path_x: jax.Array     # [N, MAX_PATH]
    path_y: jax.Array
    path_f: jax.Array
    path_len: jax.Array   # [N]
    path_pos: jax.Array   # [N] current waypoint index
    speed: jax.Array


def make_people(graph: NavGraph, n: int, seed: int = 0) -> PeopleState:
    rg = RandGen(seed + 5, seed * 3 + 1)
    R = len(graph.centers)
    starts = [rg.rand() % R for _ in range(n)]
    st = PeopleState(
        x=jnp.asarray(graph.centers[starts, 0]),
        y=jnp.asarray(graph.centers[starts, 1]),
        floor=jnp.asarray(graph.centers[starts, 2]),
        path_x=jnp.zeros((n, MAX_PATH)), path_y=jnp.zeros((n, MAX_PATH)),
        path_f=jnp.zeros((n, MAX_PATH)),
        path_len=jnp.zeros((n,), jnp.int32),
        path_pos=jnp.zeros((n,), jnp.int32),
        speed=jnp.asarray([0.002 + 0.002 * rg.randd() for _ in range(n)],
                          jnp.float32),
    )
    return assign_goals(st, graph, [int(s) for s in starts], rg)


def assign_goals(st: PeopleState, graph: NavGraph, cur_rooms, rg: RandGen,
                 forced_dest: int | None = None):
    """Host: route each person to a random destination room (the ai state
    machine's choose-destination step), expanded to door waypoints.
    `forced_dest` routes everyone to one room — the ai_target_player /
    zombie mode (building_navigation.cpp:1216-1255)."""
    n = len(cur_rooms)
    R = len(graph.centers)
    px = np.zeros((n, MAX_PATH), np.float32)
    py = np.zeros((n, MAX_PATH), np.float32)
    pf = np.zeros((n, MAX_PATH), np.float32)
    plen = np.zeros(n, np.int32)
    for i, cur in enumerate(cur_rooms):
        dest = forced_dest if forced_dest is not None else rg.rand() % R
        wps = graph.expand(graph.route(cur, dest))[:MAX_PATH]
        for k, (wx, wy, wf) in enumerate(wps):
            px[i, k], py[i, k], pf[i, k] = wx, wy, wf
        plen[i] = len(wps)
    return st._replace(path_x=jnp.asarray(px), path_y=jnp.asarray(py),
                       path_f=jnp.asarray(pf), path_len=jnp.asarray(plen),
                       path_pos=jnp.zeros((n,), jnp.int32))


@jax.jit
def step_people(st: PeopleState) -> PeopleState:
    """Advance every walker toward its current waypoint; waypoint reached
    -> next path entry (vmapped ai_room_update movement), with pairwise
    separation so people avoid each other (:2689)."""
    n = st.x.shape[0]
    oh = jax.nn.one_hot(jnp.minimum(st.path_pos, MAX_PATH - 1), MAX_PATH,
                        dtype=jnp.float32)
    tx = jnp.sum(st.path_x * oh, -1)
    ty = jnp.sum(st.path_y * oh, -1)
    tf = jnp.sum(st.path_f * oh, -1)
    dx = tx - st.x
    dy = ty - st.y
    d = jnp.sqrt(dx * dx + dy * dy) + 1e-9
    step = jnp.minimum(st.speed, d)
    mx = step * dx / d
    my = step * dy / d

    # separation: same-floor neighbors within AVOID_RADIUS push apart,
    # capped at AVOID_PUSH of the step so door funnels still pass
    ex = st.x[:, None] - st.x[None, :]
    ey = st.y[:, None] - st.y[None, :]
    same = (st.floor[:, None] == st.floor[None, :]) & \
        ~jnp.eye(n, dtype=bool)
    d2 = ex * ex + ey * ey
    near = same & (d2 < AVOID_RADIUS * AVOID_RADIUS)
    inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
    push = jnp.where(near, (AVOID_RADIUS * inv - 1.0), 0.0)
    ax = jnp.sum(push * ex, -1)
    ay = jnp.sum(push * ey, -1)
    al = jnp.sqrt(ax * ax + ay * ay) + 1e-9
    amax = AVOID_PUSH * st.speed
    scale = jnp.minimum(1.0, amax / al)
    x = st.x + mx + ax * scale
    y = st.y + my + ay * scale

    floor = jnp.where(d < 0.02, tf, st.floor)  # floor switches at waypoints
    reached = d < 0.01
    pos = jnp.where(reached & (st.path_pos < st.path_len - 1),
                    st.path_pos + 1, st.path_pos)
    return st._replace(x=x, y=y, floor=floor, path_pos=pos)


def people_need_goals(st: PeopleState) -> np.ndarray:
    """Host check: who finished their path (triggers re-routing)."""
    return np.asarray((st.path_pos >= st.path_len - 1))
