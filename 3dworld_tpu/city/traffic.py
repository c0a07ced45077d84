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

STOPLIGHT_PERIOD = 120.0  # frames per light phase (legacy global clock)

# stoplight_t 6-state machine (city.h:365-370):
# {EGL, EGWG, WGL, NGL, NGSG, SGL}; E/W/N/S = travel direction,
# G = straight|right green, L = left-arrow green
ST_TIMES = (5.0, 6.0, 5.0, 5.0, 6.0, 5.0)       # seconds (city.h:368)
ST_R_MASKS = (2, 3, 1, 8, 12, 4)                # straight/right (city.h:369)
LEFT_MASKS = (2, 0, 1, 8, 0, 4)                 # left turns (city.h:370)
TICKS_PER_SECOND = 40.0                          # frame clock
YELLOW_SECS = 2.0                                # roads.cpp:292
TURN_NONE, TURN_LEFT, TURN_RIGHT = 0, 1, 2
# 3-way intersections skip states involving the missing direction
# (advance_state, roads.cpp:205-224); conn bitmask {-x=1,+x=2,-y=4,+y=8}
_ALLOW_BY_CONN = {7: (0, 1, 1, 1, 0, 0),    # no +y
                  11: (1, 1, 0, 0, 0, 1),   # no -y
                  13: (1, 0, 0, 1, 1, 0),   # no +x
                  14: (0, 0, 1, 0, 1, 1),   # no -x
                  15: (1, 1, 1, 1, 1, 1)}   # 4-way: all valid


class StoplightSet(NamedTuple):
    """Batched per-intersection stoplight machines (stoplight_ns)."""

    state: jax.Array       # [I] int32 current state (0..5)
    ticks: jax.Array       # [I] f32 frames in state
    next_state: jax.Array  # [I, 6] int32 precomputed valid-successor table
    state_time: jax.Array  # [I, 6] f32 per-state duration in frames
    num_conn: jax.Array    # [I] int32


def build_stoplights(net: RoadNetwork, seed: int = 0) -> StoplightSet:
    """Per-isec machines; 3-way isecs get successor tables that skip the
    missing direction's states; durations follow state_times with 2x at
    connector roads (get_cur_state_time_secs, city.h:397)."""
    isecs = net.isecs
    I = max(len(isecs), 1)
    nxt = np.zeros((I, 6), np.int32)
    times = np.zeros((I, 6), np.float32)
    nconn = np.full(I, 4, np.int32)
    rg = RandGen(seed + 17, 3 * seed + 5)
    state0 = np.zeros(I, np.int32)
    ticks0 = np.zeros(I, np.float32)
    eps = 1e-4
    for i, it in enumerate(isecs):
        conn = 0
        for si in it.roads:
            s = net.segs[si]
            if s.dim == 0:
                if s.x1 < it.x - eps:
                    conn |= 1    # road extends -x
                if s.x2 > it.x + eps:
                    conn |= 2
            else:
                if s.y1 < it.y - eps:
                    conn |= 4
                if s.y2 > it.y + eps:
                    conn |= 8
        allow = _ALLOW_BY_CONN.get(conn, _ALLOW_BY_CONN[15])
        nconn[i] = bin(conn).count("1")
        for st in range(6):
            n = (st + 1) % 6
            for _ in range(6):
                if allow[n]:
                    break
                n = (n + 1) % 6
            nxt[i, st] = n
        times[i] = np.asarray(ST_TIMES, np.float32) * TICKS_PER_SECOND
        state0[i] = nxt[i, rg.rand() % 6]
        ticks0[i] = (rg.randd()) * times[i, state0[i]]
    return StoplightSet(state=jnp.asarray(state0), ticks=jnp.asarray(ticks0),
                        next_state=jnp.asarray(nxt),
                        state_time=jnp.asarray(times),
                        num_conn=jnp.asarray(nconn))


@jax.jit
def step_stoplights(sl: StoplightSet) -> StoplightSet:
    """stoplight_t::next_frame + run_update_logic: advance when the
    state's time elapses (the waiting-car skip heuristic is omitted —
    it's a latency optimization, not a semantic)."""
    ticks = sl.ticks + 1.0
    oh = jax.nn.one_hot(sl.state, 6, dtype=jnp.float32)
    cur_time = jnp.sum(sl.state_time * oh, -1)
    adv = ticks > cur_time
    nxt = jnp.sum(sl.next_state.astype(jnp.float32) * oh, -1).astype(jnp.int32)
    return sl._replace(state=jnp.where(adv, nxt, sl.state),
                       ticks=jnp.where(adv, 0.0, ticks))


def light_masks(sl: StoplightSet):
    """[I] straight/right + left green orient masks for each isec's
    current state (red_light, roads.cpp:277-284)."""
    oh = jax.nn.one_hot(sl.state, 6, dtype=jnp.float32)
    sr = jnp.sum(oh * jnp.asarray(ST_R_MASKS, jnp.float32), -1)
    lf = jnp.sum(oh * jnp.asarray(LEFT_MASKS, jnp.float32), -1)
    return sr.astype(jnp.int32), lf.astype(jnp.int32)


def red_for(sl: StoplightSet, isec: jax.Array, orient: jax.Array,
            turn_left: jax.Array):
    """Per-car red-light test: orient = 2*dim + dir ({W,E,S,N} bit);
    2-way isecs never stop traffic (roads.cpp:279)."""
    I = sl.state.shape[0]
    ioh = jax.nn.one_hot(jnp.maximum(isec, 0), I, dtype=jnp.float32)
    sr, lf = light_masks(sl)
    mask = jnp.where(turn_left, ioh @ lf.astype(jnp.float32),
                     ioh @ sr.astype(jnp.float32)).astype(jnp.int32)
    nconn = (ioh @ sl.num_conn.astype(jnp.float32)).astype(jnp.int32)
    bit = jnp.left_shift(1, orient)
    red = (mask & bit) == 0
    return jnp.where((isec < 0) | (nconn <= 2), False, red)


def can_cross(sl: StoplightSet, isec: jax.Array, road_dim: jax.Array):
    """Crosswalk gate (stoplight_t::can_walk): crossing a dim-d road is
    allowed while that road's straight traffic has red both ways."""
    I = sl.state.shape[0]
    ioh = jax.nn.one_hot(jnp.maximum(isec, 0), I, dtype=jnp.float32)
    sr, _ = light_masks(sl)
    mask = (ioh @ sr.astype(jnp.float32)).astype(jnp.int32)
    dim_bits = jnp.where(road_dim == 0, 1 | 2, 4 | 8)
    return jnp.where(isec < 0, True, (mask & dim_bits) == 0)


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
    # parked-car pool (car_manager_t parked cars, cars.cpp): each car owns
    # a parking spot; parked cars sit in it until their timer unparks them
    parked: jax.Array    # [C] bool
    spot_x: jax.Array    # [C] owned spot position
    spot_y: jax.Array
    timer: jax.Array     # [C] frames until state flip (park <-> drive)


def gen_parking_spots(blocks, per_block: int = 4, inset: float = 0.6):
    """Parking spots in rows along each block's -y edge
    (parking_lot_t/driveways; cars.cpp parked-car placement)."""
    spots = []
    for (x1, y1, x2, y2, *_c) in blocks:
        w = max(x2 - x1 - 2 * inset, 0.0)
        for i in range(per_block):
            spots.append((x1 + inset + (i + 0.5) * w / per_block,
                          y1 + inset))
    return np.asarray(spots, np.float32).reshape(-1, 2)


def make_cars(n: int, graph: RoadGraph, seed: int = 0,
              spots: np.ndarray | None = None,
              parked_frac: float = 0.0) -> CarState:
    h = w3d_rng.xxhash_u32(jnp.arange(n, dtype=jnp.uint32), seed=seed)
    S = graph.x1.shape[0]
    if spots is None or len(spots) == 0:
        spots = np.zeros((1, 2), np.float32)
    sp = jnp.asarray(spots)[jnp.arange(n) % len(spots)]
    parked = ((h >> 12).astype(jnp.float32) % 256) / 256.0 < parked_frac
    return CarState(
        seg=(h % S).astype(jnp.int32),
        end=((h >> 8) % 2).astype(jnp.int32),
        t=((h >> 16).astype(jnp.float32) % 256) / 256.0,
        # cells/frame (road coords are heightmap cells)
        speed=0.06 + 0.06 * ((h >> 4).astype(jnp.float32) % 256) / 256.0,
        frame=jnp.int32(0),
        parked=parked,
        spot_x=sp[:, 0], spot_y=sp[:, 1],
        timer=((h >> 20) % 600).astype(jnp.int32) + 120,
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
    rx = ax + cars.t * (bx - ax)
    ry = ay + cars.t * (by - ay)
    # parked cars sit in their owned spot
    return (jnp.where(cars.parked, cars.spot_x, rx),
            jnp.where(cars.parked, cars.spot_y, ry))


def _seg_dir_vec(dim, end):
    """Unit travel direction of (segment dim, toward-end)."""
    dx = jnp.where(dim == 0, jnp.where(end == 1, 1.0, -1.0), 0.0)
    dy = jnp.where(dim == 1, jnp.where(end == 1, 1.0, -1.0), 0.0)
    return dx, dy


@functools.partial(jax.jit, static_argnames=())
def step_cars(cars: CarState, graph: RoadGraph, key,
              stoplights: StoplightSet | None = None) -> CarState:
    """One traffic frame: advance along segments, stop at red lights (the
    full per-intersection 6-state machine with left-arrow masks when
    `stoplights` is given; the legacy global 2-phase clock otherwise),
    keep headway, classify and take turns at intersections, park/unpark
    on timers (car_manager_t::next_frame, cars.cpp:1855)."""
    S = graph.x1.shape[0]
    oh = jax.nn.one_hot(cars.seg, S, dtype=jnp.float32)
    length = oh @ graph.length
    dim = (oh @ graph.dim.astype(jnp.float32)).astype(jnp.int32)
    end_oh = jax.nn.one_hot(cars.end, 2, dtype=jnp.float32)
    end_light = jnp.einsum("cs,se,ce->c", oh,
                           graph.has_light.astype(jnp.float32), end_oh)
    isec = jnp.einsum("cs,se,ce->c", oh, graph.isec_id.astype(jnp.float32),
                      end_oh).astype(jnp.int32)

    # choose the next segment first so the turn type gates the light.
    # The choice is a HASH of (car index, current segment), not a
    # per-frame roll: a car's turn intent must persist while it waits at
    # a red arrow (a fresh roll each frame let it abandon a blocked left
    # turn within ~num_next frames, making the arrow phases inert); the
    # hash re-rolls naturally on every segment transition
    car_ix = jnp.arange(cars.t.shape[0], dtype=jnp.uint32)
    hbits = car_ix * jnp.uint32(2654435761) \
        + cars.seg.astype(jnp.uint32) * jnp.uint32(40503)
    hbits = hbits ^ (hbits >> 13)
    hbits = hbits * jnp.uint32(747796405)
    hsel = ((hbits ^ (hbits >> 16)) & jnp.uint32((1 << 30) - 1)) \
        .astype(jnp.int32)
    nn = jnp.einsum("cs,se,ce->c", oh, graph.num_next.astype(jnp.float32),
                    end_oh)
    nn_i = jnp.maximum(nn.astype(jnp.int32), 1)
    choice = hsel % nn_i
    ns_e = jnp.einsum("cs,sek,ce->ck", oh, graph.next_seg.astype(jnp.float32),
                      end_oh)
    ne_e = jnp.einsum("cs,sek,ce->ck", oh, graph.next_end.astype(jnp.float32),
                      end_oh)
    ch_oh = jax.nn.one_hot(choice, ns_e.shape[1], dtype=jnp.float32)
    new_seg = jnp.sum(ns_e * ch_oh, -1).astype(jnp.int32)
    new_from_end = jnp.sum(ne_e * ch_oh, -1).astype(jnp.int32)
    new_end = 1 - new_from_end
    ndim_all = graph.dim.astype(jnp.float32)
    ndim = (jax.nn.one_hot(jnp.maximum(new_seg, 0), S,
                           dtype=jnp.float32) @ ndim_all).astype(jnp.int32)

    # turn classification from travel-direction cross product
    d1x, d1y = _seg_dir_vec(dim, cars.end)
    d2x, d2y = _seg_dir_vec(ndim, new_end)
    cross = d1x * d2y - d1y * d2x
    turn = jnp.where(cross > 0.5, TURN_LEFT,
                     jnp.where(cross < -0.5, TURN_RIGHT, TURN_NONE))

    if stoplights is not None:
        orient = 2 * dim + cars.end        # {W,E,S,N} (roads.cpp:272)
        red = (end_light > 0.5) & red_for(stoplights, isec, orient,
                                          turn == TURN_LEFT)
    else:
        # legacy global clock: x-roads green on phase 0, y on phase 1
        phase = (cars.frame // STOPLIGHT_PERIOD).astype(jnp.int32) % 2
        red = (end_light > 0.5) & (dim != phase)
    near_end = cars.t > 0.92

    # headway: same segment+direction, ahead within gap -> brake
    same = (cars.seg[:, None] == cars.seg[None, :]) & \
           (cars.end[:, None] == cars.end[None, :]) & \
           ~cars.parked[:, None] & ~cars.parked[None, :]
    ahead = (cars.t[None, :] > cars.t[:, None]) & \
            ((cars.t[None, :] - cars.t[:, None]) * length[:, None] < 0.35)
    blocked = jnp.any(same & ahead & (jnp.arange(cars.t.shape[0])[:, None]
                                      != jnp.arange(cars.t.shape[0])[None, :]), axis=1)

    driving = ~cars.parked
    v = jnp.where(driving & ~blocked & ~(red & near_end), cars.speed, 0.0)
    t = cars.t + v / jnp.maximum(length, 1e-6)

    done = (t >= 1.0) & ~red & driving
    has_next = (nn > 0.5) & (new_seg >= 0)
    seg = jnp.where(done & has_next, new_seg, cars.seg)
    end = jnp.where(done & has_next, new_end, cars.end)
    t = jnp.where(done & has_next, 0.0,
                  jnp.where(done, 0.999, jnp.minimum(t, 0.999)))

    # park/unpark on timers: a driving car parks when its timer expires at
    # a segment end; a parked car re-enters at its segment start
    timer = jnp.maximum(cars.timer - 1, 0)
    do_park = driving & (timer == 0) & done
    do_unpark = cars.parked & (timer == 0)
    parked = jnp.where(do_park, True, jnp.where(do_unpark, False, cars.parked))
    t = jnp.where(do_unpark, 0.0, t)
    new_timer = 120 + (hsel >> 8) % 900
    timer = jnp.where(do_park | do_unpark, new_timer, timer)
    return CarState(seg=seg, end=end, t=t, speed=cars.speed,
                    frame=cars.frame + 1, parked=parked,
                    spot_x=cars.spot_x, spot_y=cars.spot_y, timer=timer)


class PedNav(NamedTuple):
    """Block-level ped navigation tables (host-built once).

    Blocks are nodes; edges cross one road to a grid-adjacent block via a
    crosswalk waypoint gated by the nearest intersection's light
    (ped_manager_t plot navigation, pedestrians.cpp:2550)."""

    blk: jax.Array        # [B, 4] x1 y1 x2 y2
    adj: jax.Array        # [B, 4] neighbor block (-1 none): -x +x -y +y
    cross_x: jax.Array    # [B, 4] crossing waypoint (road centerline)
    cross_y: jax.Array
    cross_isec: jax.Array  # [B, 4] gating intersection (-1 ungated)
    cross_dim: jax.Array   # [B, 4] dim of the road being crossed


def build_ped_nav(net: RoadNetwork, max_gap: float = 3.0) -> PedNav:
    blocks = [b for b in net.blocks]
    B = max(len(blocks), 1)
    blk = np.zeros((B, 4), np.float32)
    adj = -np.ones((B, 4), np.int32)
    cx = np.zeros((B, 4), np.float32)
    cy = np.zeros((B, 4), np.float32)
    cisec = -np.ones((B, 4), np.int32)
    cdim = np.zeros((B, 4), np.int32)
    for i, (x1, y1, x2, y2, *c) in enumerate(blocks):
        blk[i] = (x1, y1, x2, y2)
    ipos = np.asarray([(it.x, it.y) for it in net.isecs], np.float32) \
        if net.isecs else np.zeros((0, 2), np.float32)
    for i in range(len(blocks)):
        x1, y1, x2, y2, *ci = blocks[i]
        for j in range(len(blocks)):
            if i == j or blocks[j][4:] != blocks[i][4:]:
                continue
            u1, v1, u2, v2, *cj = blocks[j]
            ovy = min(y2, v2) - max(y1, v1)
            ovx = min(x2, u2) - max(x1, u1)
            mid_y = 0.5 * (max(y1, v1) + min(y2, v2))
            mid_x = 0.5 * (max(x1, u1) + min(x2, u2))
            side = None
            if 0 < x1 - u2 <= max_gap and ovy > 0:     # j is -x neighbor
                side, px, py, dm = 0, 0.5 * (x1 + u2), mid_y, 1
            elif 0 < u1 - x2 <= max_gap and ovy > 0:   # +x
                side, px, py, dm = 1, 0.5 * (u1 + x2), mid_y, 1
            elif 0 < y1 - v2 <= max_gap and ovx > 0:   # -y
                side, px, py, dm = 2, mid_x, 0.5 * (y1 + v2), 0
            elif 0 < v1 - y2 <= max_gap and ovx > 0:   # +y
                side, px, py, dm = 3, mid_x, 0.5 * (v1 + y2), 0
            if side is None or adj[i, side] >= 0:
                continue
            adj[i, side] = j
            cx[i, side] = px
            cy[i, side] = py
            cdim[i, side] = dm
            if len(ipos):
                d2 = (ipos[:, 0] - px) ** 2 + (ipos[:, 1] - py) ** 2
                k = int(np.argmin(d2))
                if net.isecs[k].has_stoplight:
                    cisec[i, side] = k
    J = jnp.asarray
    return PedNav(blk=J(blk), adj=J(adj), cross_x=J(cx), cross_y=J(cy),
                  cross_isec=J(cisec), cross_dim=J(cdim))


class PedState(NamedTuple):
    x: jax.Array
    y: jax.Array
    gx: jax.Array    # goal
    gy: jax.Array
    speed: jax.Array
    blk: jax.Array = None      # [N] int32 current block
    stage: jax.Array = None    # 0 to-crosswalk, 1 crossing, 2 to-goal
    side: jax.Array = None     # [N] chosen crossing side


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
                    speed=jnp.asarray(0.002 + 0.002 * rg.random(n).astype(np.float32)),
                    blk=jnp.asarray(bi.astype(np.int32)),
                    stage=jnp.full((n,), 2, jnp.int32),
                    side=jnp.zeros((n,), jnp.int32))


def _separation(x, y, sep_radius):
    ex = x[:, None] - x[None, :]
    ey = y[:, None] - y[None, :]
    d2 = ex * ex + ey * ey
    n = x.shape[0]
    near = (d2 < sep_radius ** 2) & \
        (jnp.arange(n)[:, None] != jnp.arange(n)[None, :])
    w = jnp.where(near, 1.0 / jnp.maximum(d2, 1e-4), 0.0)
    rx = jnp.sum(w * ex, 1)
    ry = jnp.sum(w * ey, 1)
    rl = jnp.sqrt(rx * rx + ry * ry) + 1e-9
    return rx / rl, ry / rl


@functools.partial(jax.jit, static_argnames=())
def step_peds(p: PedState, key, sep_radius: float = 0.15,
              nav: PedNav | None = None,
              stoplights: StoplightSet | None = None) -> PedState:
    """Goal steering + neighbor separation (ped_manager_t crowd update).
    With `nav`, pedestrians do plot navigation: wander inside their
    block, pick an adjacent block, walk to the crosswalk, wait for the
    light (can_walk via `stoplights`), cross, continue — never roaming
    open road except at crosswalks (pedestrians.cpp:2550)."""
    n = p.x.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    rx, ry = _separation(p.x, p.y, sep_radius)

    if nav is None or p.blk is None:
        dx = p.gx - p.x
        dy = p.gy - p.y
        d = jnp.sqrt(dx * dx + dy * dy) + 1e-9
        mx = dx / d + 0.5 * rx
        my = dy / d + 0.5 * ry
        ml = jnp.sqrt(mx * mx + my * my) + 1e-9
        x = p.x + p.speed * mx / ml
        y = p.y + p.speed * my / ml
        reached = d < 0.05
        ngx = p.gx + jax.random.uniform(k1, p.x.shape, minval=-2.0, maxval=2.0)
        ngy = p.gy + jax.random.uniform(k2, p.x.shape, minval=-2.0, maxval=2.0)
        return p._replace(x=x, y=y,
                          gx=jnp.where(reached, ngx, p.gx),
                          gy=jnp.where(reached, ngy, p.gy))

    B = nav.blk.shape[0]
    boh = jax.nn.one_hot(p.blk, B, dtype=jnp.float32)
    soh = jax.nn.one_hot(p.side, 4, dtype=jnp.float32)
    wx = jnp.einsum("nb,bs,ns->n", boh, nav.cross_x, soh)
    wy = jnp.einsum("nb,bs,ns->n", boh, nav.cross_y, soh)
    isec = jnp.einsum("nb,bs,ns->n", boh, nav.cross_isec.astype(jnp.float32),
                      soh).astype(jnp.int32)
    rdim = jnp.einsum("nb,bs,ns->n", boh, nav.cross_dim.astype(jnp.float32),
                      soh).astype(jnp.int32)
    nblk = jnp.einsum("nb,bs,ns->n", boh, nav.adj.astype(jnp.float32),
                      soh).astype(jnp.int32)

    # stage targets: 0 -> curb point (crosswalk waypoint clipped into the
    # ped's own block, so the light wait happens on the sidewalk), 1 ->
    # across the road, 2 -> in-block goal
    bx1 = boh @ nav.blk[:, 0]
    by1 = boh @ nav.blk[:, 1]
    bx2 = boh @ nav.blk[:, 2]
    by2 = boh @ nav.blk[:, 3]
    curb_x = jnp.clip(wx, bx1, bx2)
    curb_y = jnp.clip(wy, by1, by2)
    crossing = p.stage < 2
    tx = jnp.where(crossing, curb_x, p.gx)
    ty = jnp.where(crossing, curb_y, p.gy)
    dx = tx - p.x
    dy = ty - p.y
    d = jnp.sqrt(dx * dx + dy * dy) + 1e-9

    # light gate at the crosswalk entry (stage 0 arrival)
    if stoplights is not None:
        walk_ok = can_cross(stoplights, isec, rdim)
    else:
        walk_ok = jnp.ones((n,), bool)
    at_entry = (p.stage == 0) & (d < 0.06)
    hold = at_entry & ~walk_ok
    stage = jnp.where(at_entry & walk_ok, 1, p.stage)
    # crossing complete: inside the destination block
    nboh = jax.nn.one_hot(jnp.maximum(nblk, 0), B, dtype=jnp.float32)
    nx1 = nboh @ nav.blk[:, 0]
    ny1 = nboh @ nav.blk[:, 1]
    nx2 = nboh @ nav.blk[:, 2]
    ny2 = nboh @ nav.blk[:, 3]
    in_dest = (p.x >= nx1) & (p.x <= nx2) & (p.y >= ny1) & (p.y <= ny2)
    done_cross = (p.stage == 1) & in_dest
    stage = jnp.where(done_cross, 2, stage)
    blk = jnp.where(done_cross, nblk, p.blk)
    # crossing target past the entry: aim at the dest-block center while
    # on the road
    cxd = 0.5 * (nx1 + nx2)
    cyd = 0.5 * (ny1 + ny2)
    tx = jnp.where(stage == 1, cxd, tx)
    ty = jnp.where(stage == 1, cyd, ty)
    dx = tx - p.x
    dy = ty - p.y
    d = jnp.sqrt(dx * dx + dy * dy) + 1e-9

    mx = dx / d + 0.4 * rx
    my = dy / d + 0.4 * ry
    ml = jnp.sqrt(mx * mx + my * my) + 1e-9
    v = jnp.where(hold, 0.0, p.speed)
    x = p.x + v * mx / ml
    y = p.y + v * my / ml
    # plot containment: off-road stages stay inside their (updated)
    # block — separation pushes never shove a ped into the road
    boh2 = jax.nn.one_hot(blk, B, dtype=jnp.float32)
    cx1 = boh2 @ nav.blk[:, 0]
    cy1 = boh2 @ nav.blk[:, 1]
    cx2 = boh2 @ nav.blk[:, 2]
    cy2 = boh2 @ nav.blk[:, 3]
    # stages 0 AND 2 are off-road (walking within source/destination
    # block); only stage 1 (mid-crossing) is legitimately on the road
    contained = stage != 1
    x = jnp.where(contained, jnp.clip(x, cx1, cx2), x)
    y = jnp.where(contained, jnp.clip(y, cy1, cy2), y)

    # in-block goal reached -> either wander in-block or head for a
    # random valid crossing side
    reached = (p.stage == 2) & (d < 0.05)
    u = jax.random.uniform(k1, (n,))
    pick_cross = reached & (u < 0.4)
    new_side = jax.random.randint(k2, (n,), 0, 4)
    side_ok = jnp.einsum("nb,bs,ns->n", boh, (nav.adj >= 0).astype(jnp.float32),
                         jax.nn.one_hot(new_side, 4, dtype=jnp.float32)) > 0.5
    stage = jnp.where(pick_cross & side_ok, 0, stage)
    side = jnp.where(pick_cross & side_ok, new_side, p.side)
    # new in-block goal for wanderers
    u3 = jax.random.uniform(k3, (n,))
    u4 = jax.random.uniform(jax.random.fold_in(k3, 1), (n,))
    ngx = bx1 + u3 * (bx2 - bx1)
    ngy = by1 + u4 * (by2 - by1)
    # after crossing, the goal must live in the NEW block
    gx = jnp.where(done_cross, nx1 + u3 * (nx2 - nx1),
                   jnp.where(reached, ngx, p.gx))
    gy = jnp.where(done_cross, ny1 + u4 * (ny2 - ny1),
                   jnp.where(reached, ngy, p.gy))
    return PedState(x=x, y=y, gx=gx, gy=gy, speed=p.speed,
                    blk=blk, stage=stage, side=side)


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

    # cruise above the destination pad plus clearance, and never snap
    # DOWN during takeoff (a fixed cruise height sat below the tallest
    # roofs — helipads sit on the tallest buildings — so launching helis
    # were clamped into their own roof; pads higher than the cruise
    # height count as already at altitude)
    cruise_z = jnp.maximum(HELI_CRUISE_Z, tz + 0.08)
    pz = jnp.where(takeoff,
                   jnp.maximum(jnp.minimum(h.pz + HELI_VSPEED, cruise_z),
                               h.pz),
                   h.pz)
    at_cruise = takeoff & (pz >= cruise_z - 1e-6)

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


CAR_LEN = 0.27      # nominal car size (city_params get_nom_car_size)
CAR_WID = 0.12
CAR_HGT = 0.09


def car_geometry(cars: CarState, graph: RoadGraph, ground_z: float = 0.0):
    """Oriented car boxes for export/collision (car_t bcube + dim/dir,
    car_draw in the reference renders models into these): returns
    (cx, cy, cz, half_len_x, half_len_y, half_h, heading) with the long
    axis along the travel direction; parked cars sit in their spots
    aligned to +x."""
    x, y = car_positions(cars, graph)
    oh = jax.nn.one_hot(cars.seg, graph.x1.shape[0], dtype=jnp.float32)
    dim = (oh @ graph.dim.astype(jnp.float32)).astype(jnp.int32)
    along_x = jnp.where(cars.parked, True, dim == 0)
    hx = jnp.where(along_x, 0.5 * CAR_LEN, 0.5 * CAR_WID)
    hy = jnp.where(along_x, 0.5 * CAR_WID, 0.5 * CAR_LEN)
    d1x, d1y = _seg_dir_vec(dim, cars.end)
    heading = jnp.where(cars.parked, 0.0, jnp.arctan2(d1y, d1x))
    return (x, y, jnp.full_like(x, ground_z + 0.5 * CAR_HGT),
            hx, hy, jnp.full_like(x, 0.5 * CAR_HGT), heading)


# ---------------------------------------------------------------------------
# city birds (city_birds.cpp): standing / takeoff / flying / gliding /
# landing between perch points on city objects and roofs
# ---------------------------------------------------------------------------

(BIRD_STANDING, BIRD_TAKEOFF, BIRD_FLYING, BIRD_GLIDING,
 BIRD_LANDING) = range(5)
BIRD_SPEED = 0.012
BIRD_VSPEED = 0.006
BIRD_CRUISE = 0.35


def bird_perches(objs, buildings, max_perches: int = 64):
    """Perch points: tops of perchable city objects (benches, mailboxes,
    streetlights — add_bird_loc, city_obj_placer.cpp:671) + building
    roof centers."""
    from . import objects as CO
    pts = []
    if objs is not None and len(objs.x):
        perchable = {CO.KIND_INDEX[k] for k in
                     ("bench", "mailbox", "streetlight", "hydrant",
                      "power_pole", "statue")}
        for i in range(len(objs.x)):
            if int(objs.kind[i]) in perchable:
                pts.append((float(objs.x[i]), float(objs.y[i]),
                            float(CO.KIND_HEIGHT[objs.kind[i]])))
    for b in buildings or []:
        (x1, y1, _z1, x2, y2, z2) = b.parts[-1]
        pts.append((0.5 * (x1 + x2), 0.5 * (y1 + y2), z2))
    if not pts:
        pts = [(0.0, 0.0, 0.0)]
    return np.asarray(pts[:max_perches], np.float32)


class BirdState(NamedTuple):
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vz_sign: jax.Array   # >0 climbing (flying anim), <0 descending (glide)
    state: jax.Array
    perch: jax.Array     # target perch index
    wait: jax.Array


def make_birds(n: int, perches: np.ndarray, seed: int = 0) -> BirdState:
    rg = RandGen(seed + 9, 2 * seed + 7)
    start = np.asarray([rg.rand() % len(perches) for _ in range(n)])
    p = perches[start]
    return BirdState(
        px=jnp.asarray(p[:, 0]), py=jnp.asarray(p[:, 1]),
        pz=jnp.asarray(p[:, 2]),
        vz_sign=jnp.zeros((n,)),
        state=jnp.zeros((n,), jnp.int32),
        perch=jnp.asarray([rg.rand() % len(perches) for _ in range(n)],
                          jnp.int32),
        wait=jnp.asarray([30 + rg.rand() % 200 for _ in range(n)],
                         jnp.int32))


@jax.jit
def step_birds(b: BirdState, perches, key) -> BirdState:
    """standing -> takeoff (climb to cruise) -> flying toward the target
    perch, switching to GLIDING while descending (city_birds.cpp:173-178)
    -> landing -> standing with a new destination."""
    P = perches.shape[0]
    oh = jax.nn.one_hot(b.perch, P, dtype=jnp.float32)
    tx = oh @ perches[:, 0]
    ty = oh @ perches[:, 1]
    tz = oh @ perches[:, 2]
    standing = b.state == BIRD_STANDING
    takeoff = b.state == BIRD_TAKEOFF
    airborne = (b.state == BIRD_FLYING) | (b.state == BIRD_GLIDING)
    landing = b.state == BIRD_LANDING

    wait = jnp.maximum(b.wait - standing.astype(jnp.int32), 0)
    launch = standing & (wait == 0)

    pz = jnp.where(takeoff, b.pz + BIRD_VSPEED, b.pz)
    up_done = takeoff & (pz >= tz + 0.5 * BIRD_CRUISE)

    dx = tx - b.px
    dy = ty - b.py
    d = jnp.sqrt(dx * dx + dy * dy) + 1e-9
    stepc = jnp.minimum(BIRD_SPEED, d)
    px = jnp.where(airborne, b.px + stepc * dx / d, b.px)
    py = jnp.where(airborne, b.py + stepc * dy / d, b.py)
    # descend toward the perch height while cruising in
    dz_target = tz + jnp.minimum(d * 0.5, BIRD_CRUISE)
    climb = dz_target - pz
    vz = jnp.clip(climb, -BIRD_VSPEED, BIRD_VSPEED)
    pz = jnp.where(airborne, pz + vz, pz)
    over = airborne & (d < 0.02)
    touched = landing & (pz <= tz + 1e-3)
    pz = jnp.where(landing, jnp.maximum(pz - BIRD_VSPEED, tz), pz)

    # flying <-> gliding by vertical velocity sign (city_birds.cpp:173)
    state = jnp.where(launch, BIRD_TAKEOFF, b.state)
    state = jnp.where(up_done, BIRD_FLYING, state)
    state = jnp.where(airborne & (vz < 0), BIRD_GLIDING, state)
    state = jnp.where(airborne & (vz >= 0), BIRD_FLYING, state)
    state = jnp.where(over, BIRD_LANDING, state)
    state = jnp.where(touched, BIRD_STANDING, state)
    new_perch = jax.random.randint(key, b.perch.shape, 0, P)
    new_wait = jax.random.randint(jax.random.fold_in(key, 1), b.wait.shape,
                                  60, 400)
    return BirdState(px=px, py=py, pz=pz, vz_sign=vz,
                     state=state,
                     perch=jnp.where(touched, new_perch, b.perch),
                     wait=jnp.where(touched, new_wait, wait))
