"""Fused live city frame: ONE jitted, chained dispatch per K frames.

The reference's city frame runs cars / pedestrians / building-AI across
3 OMP threads in 4.65 ms (10 ms serial; display_world.cpp:1295-1309,
next_city_frame city_gen.cpp:3801).  The round-3 live TiledWorld paid
~10 un-chained device dispatches plus host-Python building-people loops
per frame (335 ms/frame measured on the relay) against a 0.17 ms
measured kernel cost.

This module closes that gap:

* the elevator cars become a device SoA bank (`ElevatorBank`) with the
  same 4-state door/move machine as `floorplan.ElevatorCar`
  (elevator_t updates, building_interact.cpp) — no host objects in the
  frame loop;
* call-button presses are computed ON DEVICE from the people state
  (`elevator_calls_device` — the batched analog of
  `people.elevator_calls`);
* `city_frames_chained` scans K whole city frames
  (stoplights -> cars -> peds -> helis -> birds -> elevators ->
  building people) inside one jit, so the live loop pays the relay
  round trip once per K frames, exactly like
  `models.world.ground_frames_chained`;
* goal re-routing (irregular BFS, `people.assign_goals`) stays on host
  but runs once per CHUNK, not per frame — matching the reference,
  where destination choice is a low-frequency event against the
  per-frame ai movement (ai_room_update, building_navigation.cpp:2864).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import traffic as CT
from . import people as CPE
from .floorplan import ElevatorCar

# single source of truth: the device bank replays ElevatorCar exactly
DOOR_TICKS = ElevatorCar.DOOR_TICKS
ELEV_SPEED = ElevatorCar.SPEED


class ElevatorBank(NamedTuple):
    """All elevator cars of all simulated buildings as one SoA batch
    (device twin of a list of `floorplan.ElevatorCar`)."""

    z: jax.Array        # [E] f32 car height in floor units
    target: jax.Array   # [E] f32 destination floor
    state: jax.Array    # [E] i32 0 idle(open) 1 closing 2 moving 3 opening
    timer: jax.Array    # [E] i32 door timer


def make_elevator_bank(num_cars: int) -> ElevatorBank:
    e = max(num_cars, 1)
    return ElevatorBank(z=jnp.zeros((e,), jnp.float32),
                        target=jnp.zeros((e,), jnp.float32),
                        state=jnp.zeros((e,), jnp.int32),
                        timer=jnp.zeros((e,), jnp.int32))


def _people_current_wp(st: CPE.PeopleState):
    """Current waypoint's elevator id + the NEXT waypoint's floor for
    every person (the ride destination)."""
    pos_c = jnp.minimum(st.path_pos, CPE.MAX_PATH - 1)
    oh = jax.nn.one_hot(pos_c, CPE.MAX_PATH, dtype=jnp.float32)
    oh1 = jax.nn.one_hot(jnp.minimum(pos_c + 1, CPE.MAX_PATH - 1),
                         CPE.MAX_PATH, dtype=jnp.float32)
    te = jnp.sum(st.path_e.astype(jnp.float32) * oh, -1).astype(jnp.int32)
    tf_next = jnp.sum(st.path_f * oh1, -1)
    return te, tf_next


def elevator_calls_device(st: CPE.PeopleState, num_cars: int):
    """Per-shaft call floor from waiting/riding people — the device twin
    of `people.elevator_calls` (which walked every person in host
    Python).  Selection = lowest person index with a request, matching
    the host version's first-in-list pick.  Returns (call_floor[E],
    has_call[E])."""
    te, tf_next = _people_current_wp(st)
    waiting = st.activity == CPE.ACT_WAIT_ELEVATOR
    riding = st.activity == CPE.ACT_RIDE_ELEVATOR
    req_floor = jnp.where(waiting, jnp.round(st.floor), tf_next)
    has_req = (waiting | riding) & (te >= 0)
    n = st.x.shape[0]
    e = max(num_cars, 1)
    m = has_req[:, None] & \
        (te[:, None] == jnp.arange(e, dtype=jnp.int32)[None, :])
    idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    sel = jnp.argmin(jnp.where(m, idx, n), axis=0)           # [E]
    soh = jax.nn.one_hot(sel, n, dtype=jnp.float32)
    call_floor = soh @ req_floor
    return call_floor, jnp.any(m, axis=0)


def step_elevator_bank(bank: ElevatorBank, call_floor: jax.Array,
                       has_call: jax.Array) -> ElevatorBank:
    """One tick of every car: door close -> move -> door open -> idle,
    accepting a new call only while idle with doors open (the
    `ElevatorCar.call` + `.step` machine, batched)."""
    idle = bank.state == 0

    # accept calls (idle cars only; ignore a call to the current floor);
    # the accepting car starts closing THIS tick, exactly like
    # ElevatorCar.call followed by .step in the same frame
    want = jnp.round(call_floor)
    accept = idle & has_call & (want != jnp.round(bank.z))
    target = jnp.where(accept, want, bank.target)
    state = jnp.where(accept, 1, bank.state)
    timer = jnp.where(accept, DOOR_TICKS, bank.timer)

    closing = state == 1
    moving = state == 2
    opening = state == 3

    # doors closing
    timer = jnp.where(closing, timer - 1, timer)
    state = jnp.where(closing & (timer <= 0), 2, state)

    # moving (1e-4 slack: f32 accumulation of 0.05-steps can leave the
    # remaining distance one ulp above SPEED on the arrival tick)
    d = target - bank.z
    arrive = moving & (jnp.abs(d) <= ELEV_SPEED + 1e-4)
    z = jnp.where(moving,
                  jnp.where(arrive, target,
                            bank.z + jnp.sign(d) * ELEV_SPEED), bank.z)
    state = jnp.where(arrive, 3, state)
    timer = jnp.where(arrive, DOOR_TICKS, timer)

    # doors opening
    timer = jnp.where(opening, timer - 1, timer)
    state = jnp.where(opening & (timer <= 0), 0, state)
    return ElevatorBank(z=z, target=target, state=state, timer=timer)


class CityState(NamedTuple):
    """Everything the fused city frame advances on device."""

    stoplights: CT.StoplightSet
    cars: CT.CarState
    peds: CT.PedState
    people: CPE.PeopleState
    elev: ElevatorBank
    helis: CT.HeliState | None
    birds: CT.BirdState | None
    key: jax.Array
    trains: CT.TrainState | None = None


def _one_frame(cs: CityState, graph, nav, pads, perches,
               rail=None) -> CityState:
    key, k1, k2, k3, k4 = jax.random.split(cs.key, 5)
    sl = CT.step_stoplights(cs.stoplights)
    cars = CT.step_cars(cs.cars, graph, k1, stoplights=sl)
    peds = CT.step_peds(cs.peds, k2, nav=nav, stoplights=sl)
    helis = cs.helis
    if helis is not None:
        helis = CT.step_helis(helis, pads, k3)
    birds = cs.birds
    if birds is not None:
        birds = CT.step_birds(birds, perches, k4)
    trains = cs.trains
    if trains is not None and rail is not None:
        trains = CT.step_trains(trains, rail)
    people, elev = cs.people, cs.elev
    if people is not None:
        call_floor, has_call = elevator_calls_device(people,
                                                     elev.z.shape[0])
        elev = step_elevator_bank(elev, call_floor, has_call)
        people = CPE.step_people(people, elev.z)
    return CityState(stoplights=sl, cars=cars, peds=peds, people=people,
                     elev=elev, helis=helis, birds=birds, key=key,
                     trains=trains)


@functools.partial(jax.jit, static_argnames=("frames",))
def city_frames_chained(cs: CityState, graph: CT.RoadGraph,
                        nav: CT.PedNav, pads, perches,
                        frames: int, rail=None) -> CityState:
    """K city frames in ONE dispatch (lax.scan): the whole 3-thread
    reference city frame — traffic, crowds, building people, elevator
    cars, helicopters, birds, trains — chained on device."""

    def body(c, _):
        return _one_frame(c, graph, nav, pads, perches, rail=rail), None

    out, _ = jax.lax.scan(body, cs, None, length=frames)
    return out


def city_frame_single(cs: CityState, graph, nav, pads, perches,
                      rail=None) -> CityState:
    """One un-chained frame (host-stepping debug path)."""
    return city_frames_chained(cs, graph, nav, pads, perches, 1, rail=rail)


@jax.jit
def people_probe(st: CPE.PeopleState) -> jax.Array:
    """ONE packed [N, 5] array (x, y, floor, path_pos, activity) — the
    only device->host transfer the per-chunk host phase needs.  A
    single fetch replaces the five per-field fetches that cost ~165 ms
    of relay round trips per chunk in round 3's live loop."""
    return jnp.stack([st.x, st.y, st.floor,
                      st.path_pos.astype(jnp.float32),
                      st.activity.astype(jnp.float32)], axis=-1)


@jax.jit
def apply_reroute(st: CPE.PeopleState, mask, px, py, pf, pe, plen,
                  eact, edur) -> CPE.PeopleState:
    """Merge host-planned paths into the device state for masked
    people (one upload + one dispatch; no device fetches)."""
    m = mask[:, None]
    z32 = jnp.zeros((), jnp.int32)
    return st._replace(
        path_x=jnp.where(m, px, st.path_x),
        path_y=jnp.where(m, py, st.path_y),
        path_f=jnp.where(m, pf, st.path_f),
        path_e=jnp.where(m, pe, st.path_e),
        path_len=jnp.where(mask, plen, st.path_len),
        path_pos=jnp.where(mask, z32, st.path_pos),
        activity=jnp.where(mask, z32, st.activity),
        timer=jnp.where(mask, 0.0, st.timer),
        end_act=jnp.where(mask, eact, st.end_act),
        end_dur=jnp.where(mask, edur, st.end_dur))


class MergedBuildingPeople:
    """People of SEVERAL buildings merged into one device batch.

    Each building keeps its own nav graph and room objects; elevator ids
    are offset so every shaft across all buildings maps to one slot of a
    shared `ElevatorBank`.  The per-frame movement of everyone runs in
    the fused device step; this class owns the low-frequency host phase
    (goal re-routing) and a HOST MIRROR of the path arrays — paths are
    host-written/device-read, so rerouting never fetches them back.

    Mirrors the reference's `vect_building_t::ai_room_update` fleet
    entry (building_navigation.cpp:3573), which likewise advances all
    buildings' people in one pass per frame."""

    def __init__(self, builders, seed: int = 0):
        """builders: [(interior, n_people, room_objs), ...]."""
        from ..utils.rng import RandGen
        self.entries = []       # (graph, room_objs, lo, hi)
        self.rg = RandGen(seed + 17, seed * 5 + 3)
        states = []
        ebase = 0
        lo = 0
        for (interior, n_people, room_objs) in builders:
            g = CPE.build_nav_graph(interior)
            ne = len(getattr(interior, "elevators", ()) or ())
            if ebase and g.elev_edges:
                g.elev_edges = {k: (x, y, eid + ebase)
                                for k, (x, y, eid) in g.elev_edges.items()}
            st = CPE.make_people(g, n_people, seed=seed + lo)
            states.append(st)
            self.entries.append((g, room_objs, lo, lo + n_people))
            lo += n_people
            ebase += ne
        self.num_elevators = max(ebase, 1)
        self.people = CPE.PeopleState(*(
            jnp.concatenate([np.asarray(f) for f in fields], axis=0)
            for fields in zip(*states)))
        self.elev = make_elevator_bank(self.num_elevators)
        # host mirror of the host-owned path arrays (single initial
        # fetch; copies — np.asarray of a device array is read-only)
        self.m_px = np.array(self.people.path_x)
        self.m_py = np.array(self.people.path_y)
        self.m_pf = np.array(self.people.path_f)
        self.m_pe = np.array(self.people.path_e)
        self.m_plen = np.array(self.people.path_len)

    def reroute(self, people: CPE.PeopleState,
                probe: np.ndarray | None = None) -> CPE.PeopleState:
        """Host phase per chunk: new goals for every finished walker,
        routed within their own building's graph.  `probe` is the
        fetched people_probe array (fetched here if not given)."""
        if probe is None:
            probe = np.asarray(people_probe(people))
        x, y, fl = probe[:, 0], probe[:, 1], probe[:, 2]
        pos = probe[:, 3].astype(np.int32)
        act = probe[:, 4].astype(np.int32)
        last = np.maximum(self.m_plen - 1, 0)
        wx = np.take_along_axis(self.m_px, last[:, None], 1)[:, 0]
        wy = np.take_along_axis(self.m_py, last[:, None], 1)[:, 0]
        dx = x - wx
        dy = y - wy
        need = (pos >= self.m_plen - 1) & (dx * dx + dy * dy < 1e-4) \
            & (act == CPE.ACT_WALK)
        if not need.any():
            return people
        n = len(need)
        eact_full = np.zeros(n, np.int32)
        edur_full = np.zeros(n, np.float32)
        for (g, room_objs, lo, hi) in self.entries:
            idx = np.where(need[lo:hi])[0] + lo
            if not len(idx):
                continue
            centers = g.centers
            cur = []
            for i in idx:
                d = (centers[:, 0] - x[i]) ** 2 \
                    + (centers[:, 1] - y[i]) ** 2 \
                    + 1e6 * (centers[:, 2] - round(float(fl[i]))) ** 2
                cur.append(int(np.argmin(d)))
            px, py, pf, pe, plen, eact, edur = CPE.plan_paths(
                g, cur, self.rg, room_objs=room_objs)
            self.m_px[idx] = px
            self.m_py[idx] = py
            self.m_pf[idx] = pf
            self.m_pe[idx] = pe
            self.m_plen[idx] = plen
            eact_full[idx] = eact
            edur_full[idx] = edur
        # one masked device update from the full mirrors (uploads only)
        return apply_reroute(
            people, jnp.asarray(need), jnp.asarray(self.m_px),
            jnp.asarray(self.m_py), jnp.asarray(self.m_pf),
            jnp.asarray(self.m_pe), jnp.asarray(self.m_plen),
            jnp.asarray(eact_full), jnp.asarray(edur_full))


