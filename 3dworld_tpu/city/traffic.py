"""City traffic: cars on the road graph + pedestrian crowds.

The reference simulates config-driven cars with path following,
intersections/stoplights and parked cars (`car_manager_t`, cars.cpp:1855)
and a pedestrian crowd with plot navigation + collision avoidance
(`ped_manager_t`, pedestrians.cpp:2550), dispatched across 3 OMP threads
per frame (`next_city_frame`, city_gen.cpp:3801).

TPU form: cars and pedestrians are SoA populations advanced by vmapped
state machines in one jitted step each; road topology is padded arrays
(per segment-end: up to 4 candidate next segments); stoplights are a
deterministic time-phase function; car headway and pedestrian separation
use dense masked pair math (populations are O(100-10K)).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import rng as w3d_rng
from ..utils.rng import RandGen
from .roads import RoadNetwork

STOPLIGHT_PERIOD = 120.0  # frames per light phase


class RoadGraph(NamedTuple):
    """Padded device-side road topology."""

    x1: jax.Array
    y1: jax.Array
    x2: jax.Array
    y2: jax.Array
    length: jax.Array
    dim: jax.Array           # 0 x-aligned, 1 y-aligned
    # next-segment candidates per (segment, end): [S, 2, K]
    next_seg: jax.Array
    next_end: jax.Array      # which end of the next segment we enter at
    num_next: jax.Array      # [S, 2]
    isec_id: jax.Array       # [S, 2] intersection id at each end (-1 none)
    has_light: jax.Array     # [S, 2] bool


def build_road_graph(net: RoadNetwork, k: int = 4) -> RoadGraph:
    segs = net.segs
    S = max(len(segs), 1)
    x1 = np.zeros(S, np.float32)
    y1 = np.zeros(S, np.float32)
    x2 = np.zeros(S, np.float32)
    y2 = np.zeros(S, np.float32)
    dim = np.zeros(S, np.int32)
    for i, s in enumerate(segs):
        x1[i], y1[i], x2[i], y2[i], dim[i] = s.x1, s.y1, s.x2, s.y2, s.dim
    length = np.maximum(np.hypot(x2 - x1, y2 - y1), 1e-6).astype(np.float32)

    # endpoints -> connectivity
    ends = {}
    for i, s in enumerate(segs):
        for e, (ex, ey) in enumerate(((s.x1, s.y1), (s.x2, s.y2))):
            ends.setdefault((round(ex, 4), round(ey, 4)), []).append((i, e))
    next_seg = -np.ones((S, 2, k), np.int32)
    next_end = np.zeros((S, 2, k), np.int32)
    num_next = np.zeros((S, 2), np.int32)
    isec_id = -np.ones((S, 2), np.int32)
    has_light = np.zeros((S, 2), bool)
    isec_pos = {(round(it.x, 4), round(it.y, 4)): (j, it.has_stoplight)
                for j, it in enumerate(net.isecs)}
    for key, lst in ends.items():
        for (i, e) in lst:
            cands = [(j, je) for (j, je) in lst if j != i][:k]
            num_next[i, e] = len(cands)
            for c, (j, je) in enumerate(cands):
                next_seg[i, e, c] = j
                next_end[i, e, c] = je
            if key in isec_pos:
                isec_id[i, e], has_light[i, e] = isec_pos[key]
    J = jnp.asarray
    return RoadGraph(x1=J(x1), y1=J(y1), x2=J(x2), y2=J(y2), length=J(length),
                     dim=J(dim), next_seg=J(next_seg), next_end=J(next_end),
                     num_next=J(num_next), isec_id=J(isec_id),
                     has_light=J(has_light))


class CarState(NamedTuple):
    seg: jax.Array       # [C] current segment
    end: jax.Array       # [C] destination end (0 = toward (x1,y1), 1 = toward (x2,y2))
    t: jax.Array         # [C] param in [0,1] measured toward `end`
    speed: jax.Array     # [C]
    frame: jax.Array     # scalar


def make_cars(n: int, graph: RoadGraph, seed: int = 0) -> CarState:
    h = w3d_rng.xxhash_u32(jnp.arange(n, dtype=jnp.uint32), seed=seed)
    S = graph.x1.shape[0]
    return CarState(
        seg=(h % S).astype(jnp.int32),
        end=((h >> 8) % 2).astype(jnp.int32),
        t=((h >> 16).astype(jnp.float32) % 256) / 256.0,
        # cells/frame (road coords are heightmap cells)
        speed=0.06 + 0.06 * ((h >> 4).astype(jnp.float32) % 256) / 256.0,
        frame=jnp.int32(0),
    )


def car_positions(cars: CarState, graph: RoadGraph):
    oh = jax.nn.one_hot(cars.seg, graph.x1.shape[0], dtype=jnp.float32)
    sx1 = oh @ graph.x1
    sy1 = oh @ graph.y1
    sx2 = oh @ graph.x2
    sy2 = oh @ graph.y2
    toward1 = cars.end == 0
    ax = jnp.where(toward1, sx2, sx1)
    ay = jnp.where(toward1, sy2, sy1)
    bx = jnp.where(toward1, sx1, sx2)
    by = jnp.where(toward1, sy1, sy2)
    return ax + cars.t * (bx - ax), ay + cars.t * (by - ay)


@functools.partial(jax.jit, static_argnames=())
def step_cars(cars: CarState, graph: RoadGraph, key) -> CarState:
    """One traffic frame: advance along segments, stop at red lights,
    keep headway, turn at intersections (car_manager_t::next_frame)."""
    S = graph.x1.shape[0]
    oh = jax.nn.one_hot(cars.seg, S, dtype=jnp.float32)
    length = oh @ graph.length
    dim = (oh @ graph.dim.astype(jnp.float32)).astype(jnp.int32)
    end_light = (oh @ graph.has_light[:, 0].astype(jnp.float32)) * (cars.end == 0) + \
                (oh @ graph.has_light[:, 1].astype(jnp.float32)) * (cars.end == 1)
    # stoplight: x-roads (dim 0) green on phase 0, y-roads on phase 1
    phase = (cars.frame // STOPLIGHT_PERIOD).astype(jnp.int32) % 2
    red = (end_light > 0.5) & (dim != phase)
    near_end = cars.t > 0.92

    # headway: same segment+direction, ahead within gap -> brake
    same = (cars.seg[:, None] == cars.seg[None, :]) & \
           (cars.end[:, None] == cars.end[None, :])
    ahead = (cars.t[None, :] > cars.t[:, None]) & \
            ((cars.t[None, :] - cars.t[:, None]) * length[:, None] < 0.35)
    blocked = jnp.any(same & ahead & (jnp.arange(cars.t.shape[0])[:, None]
                                      != jnp.arange(cars.t.shape[0])[None, :]), axis=1)

    v = jnp.where(blocked | (red & near_end), 0.0, cars.speed)
    t = cars.t + v / jnp.maximum(length, 1e-6)

    # segment end: pick a next segment by hash (turn choice)
    done = (t >= 1.0) & ~red
    hsel = jax.random.randint(key, cars.t.shape, 0, 1 << 30)
    nn = (oh @ graph.num_next[:, 0].astype(jnp.float32)) * (cars.end == 0) + \
         (oh @ graph.num_next[:, 1].astype(jnp.float32)) * (cars.end == 1)
    nn_i = jnp.maximum(nn.astype(jnp.int32), 1)
    choice = hsel % nn_i
    end_oh = jax.nn.one_hot(cars.end, 2, dtype=jnp.float32)
    ns_all = jnp.einsum("cs,sek->cek", oh, graph.next_seg.astype(jnp.float32))
    ne_all = jnp.einsum("cs,sek->cek", oh, graph.next_end.astype(jnp.float32))
    ns_e = jnp.einsum("cek,ce->ck", ns_all, end_oh)
    ne_e = jnp.einsum("cek,ce->ck", ne_all, end_oh)
    ch_oh = jax.nn.one_hot(choice, ns_e.shape[1], dtype=jnp.float32)
    new_seg = jnp.sum(ns_e * ch_oh, -1).astype(jnp.int32)
    new_from_end = jnp.sum(ne_e * ch_oh, -1).astype(jnp.int32)
    has_next = (nn > 0.5) & (new_seg >= 0)
    # entering at end e means traveling toward the opposite end
    seg = jnp.where(done & has_next, new_seg, cars.seg)
    end = jnp.where(done & has_next, 1 - new_from_end, cars.end)
    t = jnp.where(done & has_next, 0.0,
                  jnp.where(done, 0.999, jnp.minimum(t, 0.999)))
    return CarState(seg=seg, end=end, t=t, speed=cars.speed,
                    frame=cars.frame + 1)


class PedState(NamedTuple):
    x: jax.Array
    y: jax.Array
    gx: jax.Array    # goal
    gy: jax.Array
    speed: jax.Array


def make_peds(n: int, blocks, seed: int = 0) -> PedState:
    """Spawn pedestrians in city blocks with in-block goals."""
    rg = np.random.default_rng(seed)
    blk = np.asarray(blocks, np.float32)
    bi = rg.integers(0, len(blk), n)
    u1, u2, u3, u4 = rg.random((4, n)).astype(np.float32)
    x = blk[bi, 0] + u1 * (blk[bi, 2] - blk[bi, 0])
    y = blk[bi, 1] + u2 * (blk[bi, 3] - blk[bi, 1])
    gx = blk[bi, 0] + u3 * (blk[bi, 2] - blk[bi, 0])
    gy = blk[bi, 1] + u4 * (blk[bi, 3] - blk[bi, 1])
    return PedState(x=jnp.asarray(x), y=jnp.asarray(y),
                    gx=jnp.asarray(gx), gy=jnp.asarray(gy),
                    speed=jnp.asarray(0.002 + 0.002 * rg.random(n).astype(np.float32)))


@functools.partial(jax.jit, static_argnames=())
def step_peds(p: PedState, key, sep_radius: float = 0.15) -> PedState:
    """Goal steering + neighbor separation (ped_manager_t crowd update)."""
    dx = p.gx - p.x
    dy = p.gy - p.y
    d = jnp.sqrt(dx * dx + dy * dy) + 1e-9
    sx = dx / d
    sy = dy / d
    # separation: repulsion from nearby peds (dense masked pair pass)
    ex = p.x[:, None] - p.x[None, :]
    ey = p.y[:, None] - p.y[None, :]
    d2 = ex * ex + ey * ey
    n = p.x.shape[0]
    near = (d2 < sep_radius ** 2) & (jnp.arange(n)[:, None] != jnp.arange(n)[None, :])
    w = jnp.where(near, 1.0 / jnp.maximum(d2, 1e-4), 0.0)
    rx = jnp.sum(w * ex, 1)
    ry = jnp.sum(w * ey, 1)
    rl = jnp.sqrt(rx * rx + ry * ry) + 1e-9
    mx = sx + 0.5 * rx / rl
    my = sy + 0.5 * ry / rl
    ml = jnp.sqrt(mx * mx + my * my) + 1e-9
    x = p.x + p.speed * mx / ml
    y = p.y + p.speed * my / ml
    # reached goal -> new goal nearby (hash walk)
    reached = d < 0.05
    k1, k2 = jax.random.split(key)
    ngx = p.gx + jax.random.uniform(k1, p.x.shape, minval=-2.0, maxval=2.0)
    ngy = p.gy + jax.random.uniform(k2, p.x.shape, minval=-2.0, maxval=2.0)
    return PedState(x=x, y=y,
                    gx=jnp.where(reached, ngx, p.gx),
                    gy=jnp.where(reached, ngy, p.gy), speed=p.speed)


# ---------------------------------------------------------------------------
# railroads (roads.cpp railroad segments) + trains
# ---------------------------------------------------------------------------

class RailLine(NamedTuple):
    """One polyline rail line: padded waypoint arrays + cumulative arc
    length (trains parameterize by distance along the line)."""

    wx: jax.Array       # [W]
    wy: jax.Array
    cum: jax.Array      # [W] cumulative length, cum[0]=0
    length: jax.Array   # scalar total


def gen_railroad(route_pts, jitter: float = 0.0, seed: int = 0) -> RailLine:
    """Rail line along a connector-route polyline ([(x, y), ...])."""
    pts = np.asarray(route_pts, np.float32)
    d = np.sqrt(((pts[1:] - pts[:-1]) ** 2).sum(1))
    cum = np.concatenate([[0.0], np.cumsum(d)]).astype(np.float32)
    return RailLine(wx=jnp.asarray(pts[:, 0]), wy=jnp.asarray(pts[:, 1]),
                    cum=jnp.asarray(cum), length=jnp.float32(cum[-1]))


class TrainState(NamedTuple):
    s: jax.Array        # [N] arc position along the line
    speed: jax.Array    # [N] signed (bounces between the ends)
    line: jax.Array     # [N] int32 rail line index


def make_trains(n: int, num_lines: int, seed: int = 0) -> TrainState:
    rg = RandGen(seed + 2, 5 * seed + 9)
    return TrainState(
        s=jnp.asarray([rg.randd() for _ in range(n)], jnp.float32),
        speed=jnp.asarray([0.02 + 0.02 * rg.randd() for _ in range(n)],
                          jnp.float32),
        line=jnp.asarray([rg.rand() % num_lines for _ in range(n)],
                         jnp.int32))


@jax.jit
def step_trains(t: TrainState, line: RailLine) -> TrainState:
    """Advance along arc length; reverse at the ends (out-and-back
    service along the connector, like the reference's track-bound cars)."""
    s = t.s + t.speed
    over = (s >= line.length) | (s <= 0.0)
    speed = jnp.where(over, -t.speed, t.speed)
    s = jnp.clip(s, 0.0, line.length)
    return t._replace(s=s, speed=speed)


def train_positions(t: TrainState, line: RailLine):
    """[N] world xy by piecewise-linear interpolation of arc position
    (one-hot over segments — no gathers)."""
    W = line.wx.shape[0]
    seg_lo = line.cum[:-1][None, :]            # [1, W-1]
    seg_hi = line.cum[1:][None, :]
    s = t.s[:, None]
    in_seg = ((s >= seg_lo) & (s < seg_hi)).astype(jnp.float32)
    frac = jnp.where(seg_hi > seg_lo, (s - seg_lo) / jnp.maximum(
        seg_hi - seg_lo, 1e-9), 0.0)
    x = jnp.sum(in_seg * (line.wx[:-1][None, :] * (1 - frac)
                          + line.wx[1:][None, :] * frac), 1)
    y = jnp.sum(in_seg * (line.wy[:-1][None, :] * (1 - frac)
                          + line.wy[1:][None, :] * frac), 1)
    # past the last segment (s == length): clamp to the final waypoint
    past = (t.s >= line.cum[-1]).astype(jnp.float32)
    return x * (1 - past) + line.wx[-1] * past, \
        y * (1 - past) + line.wy[-1] * past


# ---------------------------------------------------------------------------
# helicopters (city helicopters: fly between building-roof helipads)
# ---------------------------------------------------------------------------

HELI_CRUISE_Z = 0.6
HELI_SPEED = 0.02
HELI_VSPEED = 0.01


class HeliState(NamedTuple):
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    pad: jax.Array      # [N] int32 target helipad index
    phase: jax.Array    # 0 parked, 1 takeoff, 2 cruise, 3 landing
    wait: jax.Array     # parked frames remaining


def make_helipads(buildings, max_pads: int = 8):
    """Helipads on the tallest buildings' top parts: [P, 3] (x, y, roof_z)."""
    tops = []
    for b in buildings:
        (x1, y1, _z1, x2, y2, z2) = b.parts[-1]
        tops.append((0.5 * (x1 + x2), 0.5 * (y1 + y2), z2))
    tops.sort(key=lambda p: -p[2])
    return np.asarray(tops[:max_pads], np.float32).reshape(-1, 3)


def make_helis(n: int, pads: np.ndarray, seed: int = 0) -> HeliState:
    rg = RandGen(seed + 3, seed + 13)
    start = np.asarray([rg.rand() % len(pads) for _ in range(n)])
    p = pads[start]
    return HeliState(
        px=jnp.asarray(p[:, 0]), py=jnp.asarray(p[:, 1]),
        pz=jnp.asarray(p[:, 2]),
        pad=jnp.asarray([rg.rand() % len(pads) for _ in range(n)], jnp.int32),
        phase=jnp.zeros((n,), jnp.int32),
        wait=jnp.asarray([rg.rand() % 60 for _ in range(n)], jnp.int32))


@jax.jit
def step_helis(h: HeliState, pads, key) -> HeliState:
    """Parked -> takeoff (climb to cruise) -> cruise (fly over the city
    toward the target pad) -> land (descend) -> parked; new destination
    chosen on touchdown."""
    P = pads.shape[0]
    oh = jax.nn.one_hot(h.pad, P, dtype=jnp.float32)
    tx = oh @ pads[:, 0]
    ty = oh @ pads[:, 1]
    tz = oh @ pads[:, 2]
    parked = h.phase == 0
    takeoff = h.phase == 1
    cruise = h.phase == 2
    landing = h.phase == 3

    wait = jnp.maximum(h.wait - parked.astype(jnp.int32), 0)
    launch = parked & (wait == 0)

    pz = jnp.where(takeoff, jnp.minimum(h.pz + HELI_VSPEED, HELI_CRUISE_Z),
                   h.pz)
    at_cruise = takeoff & (pz >= HELI_CRUISE_Z)

    dx = tx - h.px
    dy = ty - h.py
    d = jnp.sqrt(dx * dx + dy * dy) + 1e-9
    stepc = jnp.minimum(HELI_SPEED, d)
    px = jnp.where(cruise, h.px + stepc * dx / d, h.px)
    py = jnp.where(cruise, h.py + stepc * dy / d, h.py)
    over_pad = cruise & (d < 0.01)

    pz = jnp.where(landing, jnp.maximum(pz - HELI_VSPEED, tz), pz)
    touched = landing & (pz <= tz + 1e-6)

    phase = jnp.where(launch, 1, h.phase)
    phase = jnp.where(at_cruise, 2, phase)
    phase = jnp.where(over_pad, 3, phase)
    phase = jnp.where(touched, 0, phase)
    # new destination + wait on touchdown
    new_pad = jax.random.randint(key, h.pad.shape, 0, P)
    new_wait = jax.random.randint(jax.random.fold_in(key, 1), h.wait.shape,
                                  30, 120)
    return HeliState(
        px=px, py=py, pz=pz,
        pad=jnp.where(touched, new_pad, h.pad),
        phase=phase,
        wait=jnp.where(touched, new_wait, wait))
