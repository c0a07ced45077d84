"""Building people AI: room nav graph + batched walkers.

The reference builds a nav graph over rooms/stairs/doors
(`building_nav_graph_t`, building_navigation.cpp:283), finds routes with
A* (`find_route_to_point` :1931) and updates each person's state machine
per frame (`ai_room_update` :2864).

Split here: graph + routing on host (irregular, low-frequency — goals
change every few hundred frames), movement of ALL people as one vmapped
step over padded waypoint paths (high-frequency).
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

MAX_PATH = 8


@dataclass
class NavGraph:
    """Rooms as nodes; door/stair adjacency as edges."""

    centers: np.ndarray     # [R, 3] room centers (x, y, floor)
    adj: list               # adjacency lists

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


def build_nav_graph(interior) -> NavGraph:
    """Nav graph from a floorplanned Interior: rooms connect via shared
    doors (same floor) and stairwells (between floors)."""
    rooms = interior.rooms
    R = len(rooms)
    centers = np.array([[0.5 * (r.x1 + r.x2), 0.5 * (r.y1 + r.y2), r.floor]
                        for r in rooms], np.float32)
    adj = [[] for _ in range(R)]

    def room_at(x, y, fl):
        for i, r in enumerate(rooms):
            if r.floor == fl and r.x1 - 1e-6 <= x <= r.x2 + 1e-6 \
                    and r.y1 - 1e-6 <= y <= r.y2 + 1e-6:
                return i
        return -1

    for (dx, dy, dz, dim) in interior.doors:
        # the two rooms on either side of the door
        eps = 0.02
        fl = min(int(round((dz - (interior.rooms[0].floor if False else 0)))), 0)
        # find floor by z is ambiguous here; doors store z — match by nearest floor
        for fl in set(r.floor for r in rooms):
            a = room_at(dx, dy - eps, fl) if dim == 0 else room_at(dx - eps, dy, fl)
            b = room_at(dx, dy + eps, fl) if dim == 0 else room_at(dx + eps, dy, fl)
            if a >= 0 and b >= 0 and a != b:
                if b not in adj[a]:
                    adj[a].append(b)
                    adj[b].append(a)
    # hallway adjacency: rooms touching a hallway connect to it
    for i, r in enumerate(rooms):
        if not r.is_hallway:
            continue
        for j, s in enumerate(rooms):
            if j == i or s.floor != r.floor:
                continue
            touch_x = s.x1 <= r.x2 + 1e-6 and s.x2 >= r.x1 - 1e-6
            touch_y = s.y1 <= r.y2 + 1e-6 and s.y2 >= r.y1 - 1e-6
            if touch_x and touch_y and j not in adj[i]:
                adj[i].append(j)
                adj[j].append(i)
    # stairs connect the rooms containing them across floors
    for (sx1, sy1, sx2, sy2, fl) in interior.stairs:
        cx = 0.5 * (sx1 + sx2)
        cy = 0.5 * (sy1 + sy2)
        a = room_at(cx, cy, fl)
        b = room_at(cx, cy, fl + 1)
        if a >= 0 and b >= 0 and b not in adj[a]:
            adj[a].append(b)
            adj[b].append(a)
    return NavGraph(centers=centers, adj=adj)


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
    machine's choose-destination step).  `forced_dest` routes everyone to
    one room — the ai_target_player / zombie mode
    (building_navigation.cpp:1216-1255)."""
    n = len(cur_rooms)
    R = len(graph.centers)
    px = np.zeros((n, MAX_PATH), np.float32)
    py = np.zeros((n, MAX_PATH), np.float32)
    pf = np.zeros((n, MAX_PATH), np.float32)
    plen = np.zeros(n, np.int32)
    for i, cur in enumerate(cur_rooms):
        dest = forced_dest if forced_dest is not None else rg.rand() % R
        path = graph.route(cur, dest)[:MAX_PATH]
        for k, room in enumerate(path):
            px[i, k], py[i, k], pf[i, k] = graph.centers[room]
        plen[i] = len(path)
    return st._replace(path_x=jnp.asarray(px), path_y=jnp.asarray(py),
                       path_f=jnp.asarray(pf), path_len=jnp.asarray(plen),
                       path_pos=jnp.zeros((n,), jnp.int32))


@jax.jit
def step_people(st: PeopleState) -> PeopleState:
    """Advance every walker toward its current waypoint; waypoint reached
    -> next path entry (vmapped ai_room_update movement)."""
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
    x = st.x + step * dx / d
    y = st.y + step * dy / d
    floor = jnp.where(d < 0.02, tf, st.floor)  # floor switches at waypoints
    reached = d < 0.01
    pos = jnp.where(reached & (st.path_pos < st.path_len - 1),
                    st.path_pos + 1, st.path_pos)
    return st._replace(x=x, y=y, floor=floor, path_pos=pos)


def people_need_goals(st: PeopleState) -> np.ndarray:
    """Host check: who finished their path (triggers re-routing)."""
    return np.asarray((st.path_pos >= st.path_len - 1))
