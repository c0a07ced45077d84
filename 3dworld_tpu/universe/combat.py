"""Universe combat driven by the FULL parsed ship/weapon tables.

The reference flies projectiles with travel time and seek
(`u_ship.cpp` fire_weapon -> uobject projectiles; `us_weapon` speed/
seek_dist/lifetime fields, ship.h:562), applies beam weapons as
same-frame ray damage (is_beam + $WBEAM params), launches fighters and
boarding shuttles from bay weapons (UWEAP_FIGHTER/B_BAY/BOARDING...,
is_fighter with a ship-class ammo_type, ship_config.cpp:723-730), shoots
incoming projectiles down with point defense (UWEAP_PT_DEF, point_def
flag), and captures disabled enemies by boarding (`u_ship::board_ship`
u_ship.cpp:2081-2099: shields down + damage >= 0.25 + crew-strength
roll -> `capture_ship` flips alignment).

TPU form: ONE jitted frame over two fixed-capacity SoA pools — the
fleet (universe.ships.FleetState) and a projectile pool — with all
weapon behavior read from gathered table rows:

* per-class weapon SLOTS [C, S]: weapon id / mount count / initial ammo
  / firing point, from the parsed $SHIP_WEAP loadouts;
* hitscan weapons (speed == 0: beams + point defense) resolve the same
  frame; projectile weapons (speed > 0) spawn into the pool with
  velocity, lifetime, seek and blast radius from the weapon row;
* pool slot allocation is a cumsum + searchsorted match (rank of each
  spawner against the running count of free slots) — fixed shapes, no
  host sync;
* fighter bays spawn child ships into dead fleet slots the same way;
* point defense picks each PD ship's nearest interceptable enemy
  projectile (proj_armor > 0) and scatter-adds damage until the
  projectile's armor is depleted (torpedo armor 25 vs PD damage 15:
  two hits to kill, matching the parsed numbers);
* boarding shuttles (class for_boarding) capture an adjacent disabled
  can_board enemy via the reference's crew-strength roll and flip its
  alignment in place.

Everything is a pure function of (state, key, tables); the tables ride
as jit-traced arrays so one compiled program serves any ship_defs file.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .ships import FleetState, AI_IGNORE, AI_NONE, AI_ATT_WAIT, AI_RETREAT, \
    AI_ATT_ENEMY

# ---------------------------------------------------------------------------
# weapon-table columns (values from us_weapon after ship_config's unit
# conversions; see ship_config.WEAP_FIELDS for the source field names)
# ---------------------------------------------------------------------------
WF_DAMAGE = 0          # damage per shot (per frame for fire_delay==0 beams)
WF_FIRE_DELAY = 1      # frames between shots (0 = continuous beam)
WF_RANGE = 2
WF_SPEED = 3           # projectile speed per frame (0 = hitscan)
WF_SEEK_DIST = 4       # seek activation distance (0 = unguided)
WF_LIFETIME = 5        # projectile lifetime in frames
WF_BRADIUS = 6         # blast radius
WF_CRADIUS = 7         # projectile collision radius
WF_PT_DEF = 8          # 1 = point-defense weapon (targets projectiles)
WF_IS_FIGHTER = 9      # 1 = bay weapon (ammo_type is a ship class)
WF_NSHOTS = 10         # shots per fire event (burst -> damage multiplier)
WF_FIRING_ERROR = 11   # direction jitter magnitude
WF_IGNORES_SHIELDS = 12
WF_SHIELD_D_ONLY = 13
WF_PROJ_ARMOR = 14     # projectile hit points (0 = not interceptable)
WF_NO_SHIP_VEL = 15    # 1 = don't inherit the firing ship's velocity
WF_AMMO_CLASS = 16     # ship class spawned by bays (-1 otherwise)
WF_REGEN = 17          # frames per regenerated ammo unit (0 = no regen)
NUM_WF = 18

# class-aux columns (us_class fields the 9-column sim table drops)
CA_NCREW = 0
CA_FOR_BOARDING = 1
CA_CAN_BOARD = 2
CA_FIRE_DIST = 3       # all-weapon engagement gate (world units)
CA_MIN_ATT = 4         # standoff distance in class-radius units
NUM_CA = 5

SEEK_BLEND = 0.3       # per-frame steering blend for seeking projectiles
BOARD_REACH = 1.5      # capture reach in summed-radius units (collision)


class CombatTables(NamedTuple):
    """All parsed parameters the combat step reads (device arrays)."""

    cls_tbl: jax.Array    # [C, 9] ship_config.ship_class_table
    cls_aux: jax.Array    # [C, NUM_CA]
    w_tbl: jax.Array      # [W, NUM_WF]
    slot_wid: jax.Array   # [C, S] weapon id per slot (0 = empty)
    slot_num: jax.Array   # [C, S] mount count
    slot_ammo0: jax.Array  # [C, S] initial ammo (inf = unlimited)
    slot_pt: jax.Array    # [C, S, 3] firing point (class-radius units)


class ProjPool(NamedTuple):
    """Fixed-capacity projectile SoA (~ the reference's uobject
    projectiles, us_weapon ammo objects)."""

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    hp: jax.Array        # remaining projectile armor (PD intercepts)
    ttl: jax.Array       # frames to live
    dmg: jax.Array       # damage on impact (damage * nshots * mounts)
    wid: jax.Array       # weapon class id
    team: jax.Array
    target: jax.Array    # seek target (fleet index)
    alive: jax.Array


class CombatState(NamedTuple):
    fleet: FleetState
    proj: ProjPool
    cool: jax.Array      # [N, S] per-slot cooldown frames
    ammo: jax.Array      # [N, S] remaining ammo (inf = unlimited)
    crew: jax.Array      # [N] crew count (boarding strength)
    captured: jax.Array  # [N] bool: ship was captured this battle


# ---------------------------------------------------------------------------
# host-side table construction from parsed ShipDefs
# ---------------------------------------------------------------------------

def build_combat_tables(defs, max_slots: int = 8) -> CombatTables:
    """ShipDefs -> CombatTables (numpy; jnp-converted on first use)."""
    from . import ship_config as SC

    cls_tbl = SC.ship_class_table(defs)
    C = cls_tbl.shape[0]
    W = len(SC.WEAP_IDS)

    w = np.zeros((W, NUM_WF), np.float32)
    w[:, WF_AMMO_CLASS] = -1.0
    for wid, uw in defs.weapons.items():
        f = uw.fields
        w[wid, WF_DAMAGE] = f["damage"]
        w[wid, WF_FIRE_DELAY] = f["fire_delay"]
        w[wid, WF_RANGE] = f["range"]
        w[wid, WF_SPEED] = f["speed"]
        w[wid, WF_SEEK_DIST] = f["seek_dist"]
        w[wid, WF_LIFETIME] = f["lifetime"]
        w[wid, WF_BRADIUS] = f["bradius"]
        w[wid, WF_CRADIUS] = max(f["c_radius"], f["radius"])
        w[wid, WF_PT_DEF] = f["point_def"]
        w[wid, WF_IS_FIGHTER] = f["is_fighter"]
        w[wid, WF_NSHOTS] = max(f["nshots"], 1.0)
        w[wid, WF_FIRING_ERROR] = f["firing_error"]
        w[wid, WF_IGNORES_SHIELDS] = f["ignores_shields"]
        w[wid, WF_SHIELD_D_ONLY] = f["shield_d_only"]
        w[wid, WF_PROJ_ARMOR] = f["armor"]
        w[wid, WF_NO_SHIP_VEL] = f["no_ship_vel"]
        if f["is_fighter"]:
            w[wid, WF_AMMO_CLASS] = float(uw.ammo_type)
        # regen_time is already in frames (parser multiplies by
        # TICKS_PER_SECOND); 0 disables regeneration
        w[wid, WF_REGEN] = (f["regen_time"]
                            if f["do_regen"] and f["regen_time"] > 0 else 0.0)

    aux = np.zeros((C, NUM_CA), np.float32)
    for sid, c in defs.sclasses.items():
        # boarding shuttles ram their target (min_dist=0, u_ship.cpp:1012)
        boarding = c.fields.get("for_boarding", 0.0)
        aux[sid] = (max(c.fields.get("ncrew", 1.0), 1.0),
                    boarding,
                    c.fields.get("can_board", 0.0),
                    c.fields.get("fire_dist", 0.0),
                    0.0 if boarding else c.fields.get("min_att_dist", 0.0))

    S = max_slots
    slot_wid = np.zeros((C, S), np.int32)
    slot_num = np.zeros((C, S), np.float32)
    slot_ammo0 = np.full((C, S), np.inf, np.float32)
    slot_pt = np.zeros((C, S, 3), np.float32)
    for sid, c in defs.sclasses.items():
        # slots in loadout order; overflow drops the lowest-damage extras
        entries = list(c.weapons)
        if len(entries) > S:
            entries.sort(key=lambda e: -w[e[0], WF_DAMAGE])
            entries = entries[:S]
        for s, (wid, num, ammo, pts) in enumerate(entries):
            slot_wid[sid, s] = wid
            slot_num[sid, s] = max(num, 1)
            # explicit $ADD ammo, else num * def_ammo; 0 = unlimited
            init = ammo if ammo is not None else \
                int(max(num, 1) * defs.weapons[wid].fields["def_ammo"]) \
                if wid in defs.weapons else 0
            slot_ammo0[sid, s] = init if init and init > 0 else np.inf
            if pts:
                slot_pt[sid, s] = pts[0]
    return CombatTables(cls_tbl=cls_tbl, cls_aux=aux, w_tbl=w,
                        slot_wid=slot_wid, slot_num=slot_num,
                        slot_ammo0=slot_ammo0, slot_pt=slot_pt)


def make_combat_state(fleet: FleetState, ct: CombatTables,
                      pool_size: int = 1024) -> CombatState:
    """Wrap a fleet with the combat pools (cooldowns, ammo, crew).
    Optional FleetState fields are materialized so step_combat never
    sees None."""
    n = np.asarray(fleet.px).shape[0]
    if fleet.ai is None:
        fleet = fleet._replace(ai=np.full(n, AI_ATT_ENEMY, np.int32))
    if fleet.attacked is None:
        fleet = fleet._replace(attacked=np.zeros(n, bool))
    if fleet.dx is None:
        z = np.zeros(n, np.float32)
        fleet = fleet._replace(dx=np.ones(n, np.float32), dy=z, dz=z)
    if fleet.state_val is None:
        fleet = fleet._replace(state_val=np.zeros(n, np.float32))
    S = np.asarray(ct.slot_wid).shape[1]
    cls = np.asarray(fleet.cls)
    P = pool_size
    z = np.zeros(P, np.float32)
    proj = ProjPool(px=z, py=z.copy(), pz=z.copy(), vx=z.copy(),
                    vy=z.copy(), vz=z.copy(), hp=z.copy(), ttl=z.copy(),
                    dmg=z.copy(),
                    wid=np.zeros(P, np.int32), team=np.zeros(P, np.int32),
                    target=np.zeros(P, np.int32),
                    alive=np.zeros(P, bool))
    return CombatState(
        fleet=fleet, proj=proj,
        cool=np.zeros((n, S), np.float32),
        ammo=np.asarray(ct.slot_ammo0)[cls],
        crew=np.asarray(ct.cls_aux)[cls, CA_NCREW],
        captured=np.zeros(n, bool))


def pad_fleet(f: FleetState, total: int) -> FleetState:
    """Grow a fleet to `total` slots with dead padding ships (host-side)
    so fighter bays have room to launch into (the reference allocates
    new u_ship objects; fixed shapes need reserve capacity)."""
    n = len(np.asarray(f.px))
    add = total - n
    if add <= 0:
        return f
    zf = np.zeros(add, np.float32)
    zi = np.zeros(add, np.int32)

    def cat(a, pad):
        return np.concatenate([np.asarray(a), pad])

    return FleetState(
        px=cat(f.px, zf), py=cat(f.py, zf), pz=cat(f.pz, zf),
        vx=cat(f.vx, zf), vy=cat(f.vy, zf), vz=cat(f.vz, zf),
        cls=cat(f.cls, zi), align=cat(f.align, zi),
        armor=cat(f.armor, zf), shields=cat(f.shields, zf),
        cooldown=cat(f.cooldown, zf),
        alive=cat(f.alive, np.zeros(add, bool)),
        ai=cat(f.ai, zi) if f.ai is not None else None,
        attacked=(cat(f.attacked, np.zeros(add, bool))
                  if f.attacked is not None else None),
        dx=cat(f.dx, zf + 1) if f.dx is not None else None,
        dy=cat(f.dy, zf) if f.dy is not None else None,
        dz=cat(f.dz, zf) if f.dz is not None else None,
        state_val=(cat(f.state_val, zf)
                   if f.state_val is not None else None))


def _alloc_slots(want_flat, free):
    """Match spawners to free pool slots: the r-th spawner (by cumsum
    rank) gets the r-th free slot (searchsorted over the running free
    count).  Returns (slot index per spawner, valid mask) with invalid
    spawners pointed past the end for mode='drop' scatters."""
    P = free.shape[0]
    rank = jnp.cumsum(want_flat.astype(jnp.int32))        # 1-indexed
    free_cum = jnp.cumsum(free.astype(jnp.int32))
    total_free = free_cum[-1]
    slot = jnp.searchsorted(free_cum, rank)
    ok = want_flat & (rank <= total_free)
    return jnp.where(ok, slot, P), ok


@jax.jit
def step_combat(cs: CombatState, key, ct: CombatTables) -> CombatState:
    """One combat frame honoring the full parsed tables.  Order matches
    the reference's process_ships: ship AI/motion -> weapon fire (beams
    resolve now; projectiles/fighters spawn) -> point defense ->
    projectile flight + impacts -> damage/capture bookkeeping."""
    f = cs.fleet
    n = f.px.shape[0]
    S = cs.cool.shape[1]
    P = cs.proj.px.shape[0]
    k_err, k_spawn, k_board1, k_board2 = jax.random.split(key, 4)

    cls_tbl = ct.cls_tbl
    oh = jax.nn.one_hot(f.cls, cls_tbl.shape[0], dtype=jnp.float32)
    accel = oh @ cls_tbl[:, 0]
    vmax = oh @ cls_tbl[:, 1]
    sh_max = oh @ cls_tbl[:, 3]
    rad = oh @ cls_tbl[:, 7]
    sh_re = oh @ cls_tbl[:, 8]
    aux = ct.cls_aux[f.cls]                      # [N, NUM_CA]

    ai = f.ai if f.ai is not None else jnp.full((n,), AI_ATT_ENEMY, jnp.int32)
    attacked = f.attacked if f.attacked is not None else jnp.zeros((n,), bool)

    # ---- targeting + motion (u_ship::ai_action target select/thrust) ----
    p_sq = f.px ** 2 + f.py ** 2 + f.pz ** 2
    G = (jnp.outer(f.px, f.px) + jnp.outer(f.py, f.py)
         + jnp.outer(f.pz, f.pz))
    d2 = p_sq[:, None] + p_sq[None, :] - 2.0 * G
    enemy = (f.align[:, None] != f.align[None, :]) \
        & f.alive[None, :] & f.alive[:, None]
    d2m = jnp.where(enemy, d2, jnp.inf)
    tgt = jnp.argmin(d2m, axis=1)
    has_tgt = jnp.isfinite(jnp.min(d2m, axis=1))
    passive = (ai == AI_IGNORE) | (ai == AI_NONE)
    waiting = (ai == AI_ATT_WAIT) & ~attacked
    has_tgt = has_tgt & ~passive & ~waiting
    toh = jax.nn.one_hot(tgt, n, dtype=jnp.float32)
    tx, ty, tz = toh @ f.px, toh @ f.py, toh @ f.pz
    dx, dy, dz = tx - f.px, ty - f.py, tz - f.pz
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz) + 1e-9
    fleeing = (ai == AI_RETREAT) & (f.shields < 0.25 * sh_max + 1e-6)
    # standoff controller: close to min_att_dist (radius units,
    # u_ship.cpp:1943 `radius*specs().min_att_dist`) and hold — ships
    # slow on approach instead of ramming/orbiting at vmax
    # (u_ship.cpp:1156-1158), which is what lets slower-than-ship
    # projectiles (torpedo speed < ship max_speed) connect at all
    min_att = rad * aux[:, CA_MIN_ATT]
    # arrival law: approach speed bounded by what accel can brake over
    # the remaining distance (sqrt(2 a s)), else overshoot oscillation
    gap = d - min_att
    appr = jnp.sign(gap) * jnp.minimum(
        vmax, jnp.sqrt(2.0 * accel * jnp.abs(gap)))
    goal = jnp.where(fleeing, -vmax, appr) * has_tgt.astype(jnp.float32)
    gvx = goal * dx / d
    gvy = goal * dy / d
    gvz = goal * dz / d
    a = jnp.where(f.alive, accel, 0.0)
    exv, eyv, ezv = gvx - f.vx, gvy - f.vy, gvz - f.vz
    emag = jnp.sqrt(exv * exv + eyv * eyv + ezv * ezv) + 1e-9
    astep = jnp.minimum(a / emag, 1.0)
    vx = f.vx + astep * exv
    vy = f.vy + astep * eyv
    vz = f.vz + astep * ezv
    sp = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-9
    scl = jnp.minimum(1.0, vmax / sp)
    vx, vy, vz = vx * scl, vy * scl, vz * scl
    px, py, pz = f.px + vx, f.py + vy, f.pz + vz
    ndx = jnp.where(has_tgt, dx / d, f.dx)
    ndy = jnp.where(has_tgt, dy / d, f.dy)
    ndz = jnp.where(has_tgt, dz / d, f.dz)

    # ---- per-slot weapon parameters ----
    wid = ct.slot_wid[f.cls]                     # [N, S]
    wp = ct.w_tbl[wid]                           # [N, S, NUM_WF]
    mounts = ct.slot_num[f.cls]
    is_bay = wp[..., WF_IS_FIGHTER] > 0.5
    is_pd = wp[..., WF_PT_DEF] > 0.5
    speed = wp[..., WF_SPEED]
    # distance from the slot's transformed muzzle point ($WEAP_PT)
    fwd = ct.slot_pt[f.cls][..., 0] * rad[:, None]      # [N, S]
    mxx = px[:, None] + fwd * ndx[:, None]
    myy = py[:, None] + fwd * ndy[:, None]
    mzz = pz[:, None] + fwd * ndz[:, None]
    d_sl = jnp.sqrt((tx[:, None] - mxx) ** 2 + (ty[:, None] - myy) ** 2
                    + (tz[:, None] - mzz) ** 2) + 1e-9
    armed = wid > 0
    ready = armed & f.alive[:, None] & has_tgt[:, None] \
        & ~fleeing[:, None] & (cs.cool <= 0.0) & (cs.ammo > 0.0)
    # the class fire_dist gates ALL weapon fire (u_ship.cpp:1320:
    # `target_dist > specs().fire_dist -> return`); bay weapons have no
    # range row of their own, so the gate is their entire range check
    fire_gate = jnp.where(aux[:, CA_FIRE_DIST] > 0.0,
                          d < aux[:, CA_FIRE_DIST], True)
    in_rng = fire_gate[:, None] & (is_bay | (d_sl < wp[..., WF_RANGE]))
    dmg_slot = wp[..., WF_DAMAGE] * wp[..., WF_NSHOTS] * mounts

    # ---- beams + any hitscan ship weapon (speed == 0) ----
    beam_fire = ready & in_rng & (speed <= 0.0) & ~is_bay & ~is_pd \
        & (dmg_slot > 0.0)
    ig_sh = wp[..., WF_IGNORES_SHIELDS] > 0.5
    sh_only = wp[..., WF_SHIELD_D_ONLY] > 0.5
    b = jnp.where(beam_fire, dmg_slot, 0.0)
    beam_norm = jnp.sum(jnp.where(~ig_sh & ~sh_only, b, 0.0), axis=1)
    beam_arm = jnp.sum(jnp.where(ig_sh, b, 0.0), axis=1)
    beam_sh = jnp.sum(jnp.where(sh_only & ~ig_sh, b, 0.0), axis=1)
    dmg_norm = toh.T @ beam_norm                 # [N] victim channels
    dmg_arm = toh.T @ beam_arm
    dmg_sh = toh.T @ beam_sh

    # ---- projectile spawns (speed > 0) ----
    pj_fire = ready & in_rng & (speed > 0.0) & ~is_bay
    want = pj_fire.reshape(-1)                   # [N*S]
    slot_idx, ok = _alloc_slots(want, ~cs.proj.alive)
    # direction to target with firing error jitter (us_weapon
    # firing_error; rocket 0.25, torpedo 0.10)
    err = wp[..., WF_FIRING_ERROR]
    noise = err[..., None] * jax.random.normal(k_err, (n, S, 3)) * 0.2
    ddx = (tx[:, None] - mxx) / d_sl + noise[..., 0]
    ddy = (ty[:, None] - myy) / d_sl + noise[..., 1]
    ddz = (tz[:, None] - mzz) / d_sl + noise[..., 2]
    dn = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz) + 1e-9
    keep_v = 1.0 - wp[..., WF_NO_SHIP_VEL]
    pvx = speed * ddx / dn + keep_v * vx[:, None]
    pvy = speed * ddy / dn + keep_v * vy[:, None]
    pvz = speed * ddz / dn + keep_v * vz[:, None]

    def put(arr, val):
        return arr.at[slot_idx].set(val.reshape(-1), mode="drop")

    pr = cs.proj
    tgt_ns = jnp.broadcast_to(tgt[:, None], (n, S))
    team_ns = jnp.broadcast_to(f.align[:, None], (n, S))
    pr = pr._replace(
        px=put(pr.px, jnp.broadcast_to(mxx, (n, S))),
        py=put(pr.py, jnp.broadcast_to(myy, (n, S))),
        pz=put(pr.pz, jnp.broadcast_to(mzz, (n, S))),
        vx=put(pr.vx, pvx), vy=put(pr.vy, pvy), vz=put(pr.vz, pvz),
        hp=put(pr.hp, jnp.where(wp[..., WF_PROJ_ARMOR] > 0.0,
                                wp[..., WF_PROJ_ARMOR], 1e9)),
        ttl=put(pr.ttl, jnp.maximum(wp[..., WF_LIFETIME], 1.0)),
        dmg=put(pr.dmg, dmg_slot),
        wid=pr.wid.at[slot_idx].set(wid.reshape(-1), mode="drop"),
        team=pr.team.at[slot_idx].set(team_ns.reshape(-1), mode="drop"),
        target=pr.target.at[slot_idx].set(tgt_ns.reshape(-1), mode="drop"),
        alive=pr.alive.at[slot_idx].set(ok, mode="drop"),
    )

    # ---- fighter/boarding bays spawn child ships into dead slots ----
    bay_fire = ready & in_rng & is_bay
    bwant = bay_fire.reshape(-1)
    ship_slot, bok = _alloc_slots(bwant, ~f.alive)
    child_cls = wp[..., WF_AMMO_CLASS].astype(jnp.int32).reshape(-1)
    child_cls = jnp.maximum(child_cls, 0)
    coh = jax.nn.one_hot(child_cls, cls_tbl.shape[0], dtype=jnp.float32)
    launch_off = 1.5 * jnp.repeat(rad, S)[:, None] \
        * jax.random.normal(k_spawn, (n * S, 3))

    def sput(arr, val):
        return arr.at[ship_slot].set(val, mode="drop")

    parent_flat = jnp.repeat(jnp.arange(n), S)
    newf = f._replace(
        px=sput(px, jnp.repeat(px, S) + launch_off[:, 0]),
        py=sput(py, jnp.repeat(py, S) + launch_off[:, 1]),
        pz=sput(pz, jnp.repeat(pz, S) + launch_off[:, 2]),
        vx=sput(vx, jnp.repeat(vx, S)),
        vy=sput(vy, jnp.repeat(vy, S)),
        vz=sput(vz, jnp.repeat(vz, S)),
        cls=sput(f.cls, child_cls),
        align=sput(f.align, jnp.repeat(f.align, S)),
        armor=sput(f.armor, coh @ cls_tbl[:, 2]),
        shields=sput(f.shields, coh @ cls_tbl[:, 3]),
        alive=sput(f.alive, jnp.ones(n * S, bool)),
        ai=sput(ai, jnp.full(n * S, AI_ATT_ENEMY, jnp.int32)),
        attacked=sput(attacked, jnp.zeros(n * S, bool)),
        dx=sput(ndx, jnp.repeat(ndx, S)),
        dy=sput(ndy, jnp.repeat(ndy, S)),
        dz=sput(ndz, jnp.repeat(ndz, S)),
        state_val=sput(f.state_val, jnp.zeros(n * S)),
        cooldown=f.cooldown,
    )
    cool2 = cs.cool.at[ship_slot].set(jnp.zeros((n * S, S)), mode="drop")
    ammo2 = cs.ammo.at[ship_slot].set(ct.slot_ammo0[child_cls],
                                      mode="drop")
    crew2 = cs.crew.at[ship_slot].set(ct.cls_aux[child_cls, CA_NCREW],
                                      mode="drop")
    cap2 = cs.captured.at[ship_slot].set(jnp.zeros(n * S, bool),
                                         mode="drop")
    # the motion/targeting values computed above remain those of the
    # PRE-SPAWN fleet; spawned ships act from next frame
    f2 = newf
    pxn, pyn, pzn = f2.px, f2.py, f2.pz
    vxn, vyn, vzn = f2.vx, f2.vy, f2.vz

    # ---- point defense: PD-armed ships intercept enemy projectiles ----
    pd_rangev = jnp.where(is_pd, wp[..., WF_RANGE], 0.0).max(axis=1)  # [N]
    pd_dmg = jnp.where(is_pd, dmg_slot, 0.0).max(axis=1)
    pd_ready = (jnp.where(is_pd, (cs.cool <= 0.0), False)).any(axis=1) \
        & f.alive
    exp = pxn[:, None] - pr.px[None, :]
    eyp = pyn[:, None] - pr.py[None, :]
    ezp = pzn[:, None] - pr.pz[None, :]
    d2p = exp * exp + eyp * eyp + ezp * ezp      # [N, P]
    interceptable = pr.alive[None, :] & (pr.hp[None, :] < 1e8) \
        & (pr.team[None, :] != f.align[:, None]) \
        & (d2p < (pd_rangev ** 2)[:, None]) & pd_ready[:, None]
    d2pi = jnp.where(interceptable, d2p, jnp.inf)
    pd_tgt = jnp.argmin(d2pi, axis=1)
    pd_has = jnp.isfinite(jnp.min(d2pi, axis=1))
    pd_hit = jax.nn.one_hot(pd_tgt, P, dtype=jnp.float32) \
        * (pd_has * pd_dmg)[:, None]
    proj_hp = pr.hp - jnp.sum(pd_hit, axis=0)
    pd_fired = pd_has                            # [N] -> cooldown below

    # ---- projectile flight: seek + integrate ----
    pw = ct.w_tbl[pr.wid]                        # [P, NUM_WF]
    ptoh = jax.nn.one_hot(pr.target, n, dtype=jnp.float32)
    tpx, tpy, tpz = ptoh @ pxn, ptoh @ pyn, ptoh @ pzn
    t_alive = (ptoh @ f2.alive.astype(jnp.float32)) > 0.5
    sdx, sdy, sdz = tpx - pr.px, tpy - pr.py, tpz - pr.pz
    sd = jnp.sqrt(sdx * sdx + sdy * sdy + sdz * sdz) + 1e-9
    seeking = (pw[:, WF_SEEK_DIST] > 0.0) & (sd < pw[:, WF_SEEK_DIST]) \
        & t_alive & pr.alive
    pspeed = jnp.sqrt(pr.vx ** 2 + pr.vy ** 2 + pr.vz ** 2) + 1e-9
    bvx = pr.vx / pspeed * (1 - SEEK_BLEND) + SEEK_BLEND * sdx / sd
    bvy = pr.vy / pspeed * (1 - SEEK_BLEND) + SEEK_BLEND * sdy / sd
    bvz = pr.vz / pspeed * (1 - SEEK_BLEND) + SEEK_BLEND * sdz / sd
    bn = jnp.sqrt(bvx * bvx + bvy * bvy + bvz * bvz) + 1e-9
    nvx = jnp.where(seeking, pspeed * bvx / bn, pr.vx)
    nvy = jnp.where(seeking, pspeed * bvy / bn, pr.vy)
    nvz = jnp.where(seeking, pspeed * bvz / bn, pr.vz)
    npx, npy, npz = pr.px + nvx, pr.py + nvy, pr.pz + nvz
    nttl = pr.ttl - 1.0
    p_alive = pr.alive & (nttl > 0.0) & (proj_hp > 0.0)

    # ---- impacts: nearest enemy ship within contact distance of the
    # SWEPT segment old->new (projectiles move ~their own contact radius
    # per frame, so an endpoint test tunnels straight through ships) ----
    wx = pxn[:, None] - pr.px[None, :]           # [N, P] ship - seg start
    wy = pyn[:, None] - pr.py[None, :]
    wz = pzn[:, None] - pr.pz[None, :]
    seg_len2 = nvx * nvx + nvy * nvy + nvz * nvz + 1e-18
    tseg = jnp.clip((wx * nvx[None, :] + wy * nvy[None, :]
                     + wz * nvz[None, :]) / seg_len2[None, :], 0.0, 1.0)
    hx = wx - tseg * nvx[None, :]
    hy = wy - tseg * nvy[None, :]
    hz = wz - tseg * nvz[None, :]
    hd = jnp.sqrt(hx * hx + hy * hy + hz * hz)
    contact = hd < (rad[:, None] + pw[None, :, WF_CRADIUS])
    can_hit = f2.alive[:, None] & p_alive[None, :] \
        & (pr.team[None, :] != f2.align[:, None])
    hit_mat = contact & can_hit
    hit_any = hit_mat.any(axis=0)                # [P]
    hdm = jnp.where(hit_mat, hd, jnp.inf)
    hit_ship = jnp.argmin(hdm, axis=0)           # [P]
    # direct damage to the contact ship + blast falloff around the
    # detonation point (bradius; enemies only — the reference also
    # splashes friendlies, simplified here)
    direct = jax.nn.one_hot(hit_ship, n, dtype=jnp.float32).T \
        * (hit_any * pr.dmg)[None, :]            # [N, P]
    br = pw[:, WF_BRADIUS]
    blast = jnp.where((br[None, :] > 0.0) & hit_any[None, :] & can_hit
                      & (hd < br[None, :]),
                      pr.dmg[None, :] * (1.0 - hd / (br[None, :] + 1e-9)),
                      0.0)
    dmat = jnp.maximum(direct, blast)            # [N, P]
    pig = pw[:, WF_IGNORES_SHIELDS] > 0.5
    psh = pw[:, WF_SHIELD_D_ONLY] > 0.5
    dmg_norm = dmg_norm + jnp.sum(jnp.where((~pig & ~psh)[None, :],
                                            dmat, 0.0), axis=1)
    dmg_arm = dmg_arm + jnp.sum(jnp.where(pig[None, :], dmat, 0.0), axis=1)
    dmg_sh = dmg_sh + jnp.sum(jnp.where((psh & ~pig)[None, :], dmat, 0.0),
                              axis=1)
    p_alive = p_alive & ~hit_any

    # ---- boarding: shuttles capture adjacent disabled enemies ----
    # (board_ship u_ship.cpp:2081: shields down, damage >= 0.25,
    # crew-strength roll; capture_ship flips alignment)
    amax = oh @ cls_tbl[:, 2]
    shuttle = (aux[:, CA_FOR_BOARDING] > 0.5) & f2.alive & has_tgt
    t_can = toh @ aux[:, CA_CAN_BOARD]
    t_sh = toh @ f.shields
    t_arm = toh @ f.armor
    t_amax = toh @ amax
    t_rad = toh @ rad
    t_capd = (toh @ cs.captured.astype(jnp.float32)) > 0.5
    board_ok = shuttle & (t_can > 0.5) & (t_sh <= 1e-3) \
        & (t_arm < 0.75 * t_amax) & ~t_capd \
        & (d < BOARD_REACH * (rad + t_rad) + 1e-6)
    u1 = jax.random.randint(k_board1, (n,), 0, 100).astype(jnp.float32)
    u2 = jax.random.randint(k_board2, (n,), 0, 100).astype(jnp.float32)
    t_crew = toh @ crew2
    win = board_ok & (crew2 * (u1 + 10.0) > t_crew * (u2 + 10.0))
    cap_idx = jnp.where(win, tgt, n)             # mode='drop' sink
    align3 = f2.align.at[cap_idx].set(f2.align, mode="drop")
    cap3 = cap2.at[cap_idx].set(jnp.ones(n, bool), mode="drop")
    crew3 = jnp.where(win, jnp.maximum(crew2 * 0.5, 1.0), crew2)
    # a boarding attempt (successful or not) registers as an attack
    attacked2 = attacked | ((toh.T @ board_ok.astype(jnp.float32)) > 0.5)

    # ---- damage application: shields first, then armor ----
    shd = f2.shields
    shd = jnp.maximum(shd - dmg_sh, 0.0)         # shield-only damage
    over = jnp.maximum(dmg_norm - shd, 0.0)
    shd = jnp.maximum(shd - dmg_norm, 0.0)
    armor3 = f2.armor - over - dmg_arm
    alive3 = f2.alive & (armor3 > 0.0)
    attacked2 = attacked2 | (dmg_norm + dmg_arm + dmg_sh > 0.0)
    shd = jnp.minimum(shd + sh_re * alive3.astype(jnp.float32), sh_max)

    # ---- cooldowns, ammo, regen ----
    fired = beam_fire | pj_fire | bay_fire \
        | (is_pd & pd_fired[:, None] & (cs.cool <= 0.0))
    cool3 = jnp.where(fired, jnp.maximum(wp[..., WF_FIRE_DELAY], 1.0),
                      jnp.maximum(cool2 - 1.0, 0.0))
    ammo0 = ct.slot_ammo0[f2.cls]
    ammo3 = jnp.where(fired, ammo2 - 1.0, ammo2)
    regen = wp[..., WF_REGEN]
    ammo3 = jnp.where((regen > 0.0) & jnp.isfinite(ammo0),
                      jnp.minimum(ammo3 + 1.0 / jnp.maximum(regen, 1.0),
                                  ammo0), ammo3)

    fleet3 = f2._replace(px=pxn, py=pyn, pz=pzn, vx=vxn, vy=vyn, vz=vzn,
                         align=align3, armor=armor3, shields=shd,
                         alive=alive3, ai=f2.ai, attacked=attacked2,
                         cooldown=f2.cooldown)
    proj3 = pr._replace(px=npx, py=npy, pz=npz, vx=nvx, vy=nvy, vz=nvz,
                        hp=proj_hp, ttl=nttl, alive=p_alive)
    return CombatState(fleet=fleet3, proj=proj3, cool=cool3, ammo=ammo3,
                       crew=crew3, captured=cap3)


@functools.partial(jax.jit, static_argnames=("frames",))
def combat_frames_chained(cs: CombatState, key, frames: int,
                          ct: CombatTables) -> CombatState:
    """K combat frames in ONE dispatch (lax.scan over step_combat);
    tables ride as loop-invariant closures."""
    def body(c, k):
        return step_combat(c, k, ct), None

    keys = jax.random.split(key, frames)
    out, _ = jax.lax.scan(body, cs, keys)
    return out
