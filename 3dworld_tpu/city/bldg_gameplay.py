"""Building gameplay: room-object pickup/inventory, consumables, sound
alerts, and zombie mode (people hunt the player).

Re-designed equivalent of the reference's building gameplay layer
(building_gameplay.cpp:11-1510 — bldg_obj_type table, player_inventory_t
with health/drunkenness/weight, do_room_obj_pickup, consumables,
register_building_sound; building_navigation.cpp:1216-1410 and :2842-2979
— ai_target_player routing, zombie_in_attack_range damage).

Host-side state machine by design: inventory and alert bookkeeping are
O(1) per event; the batched parts (people stepping, thrown-object
physics) ride the existing vmapped walkers (city/people.py) and the
object SoA (physics/step.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import room_content as RC
from . import people as PP

THROW_VELOCITY = 0.0050        # building_gameplay.cpp:11
ALERT_THRESH = 0.08            # building_gameplay.cpp:12
PLAYER_RESPAWN = 5.0           # seconds, building_gameplay.cpp:13
ZOMBIE_ATTACK_RANGE = 0.6      # in room-grid units (person radius scale)
ZOMBIE_ATTACK_DAMAGE = 0.04    # health per attack tick
DRUNK_MAX_DAMAGE_REDUCTION = 0.75  # building_gameplay.cpp:821
SOUND_DECAY = 0.92             # per-frame alert decay


# per-furniture-kind gameplay properties, mirroring setup_bldg_obj_types
# (building_gameplay.cpp:56-318): (value $, weight lbs, pickupable,
# consumable, heal amount).  Kind ids from room_content.py.
_PROPS = {
    RC.F_BED:      (120.0, 80.0, False, False, 0.0),
    RC.F_TOILET:   (120.0, 88.0, False, False, 0.0),
    RC.F_SINK:     (80.0, 55.0, False, False, 0.0),
    RC.F_TUB:      (250.0, 200.0, False, False, 0.0),
    RC.F_COUNTER:  (0.0, 0.0, False, False, 0.0),
    RC.F_FRIDGE:   (700.0, 300.0, False, False, 0.0),
    RC.F_STOVE:    (400.0, 150.0, False, False, 0.0),
    RC.F_TABLE:    (70.0, 40.0, True, False, 0.0),
    RC.F_CHAIR:    (50.0, 25.0, True, False, 0.0),
    RC.F_COUCH:    (600.0, 150.0, False, False, 0.0),
    RC.F_TV:       (400.0, 70.0, True, False, 0.0),
    RC.F_DESK:     (100.0, 80.0, False, False, 0.0),
    RC.F_BOOKCASE: (150.0, 100.0, False, False, 0.0),
    RC.F_SHELF:    (75.0, 80.0, False, False, 0.0),
    RC.F_RACK:     (150.0, 100.0, False, False, 0.0),
    RC.F_LAMP:     (45.0, 12.0, True, False, 0.0),
    RC.F_RUG:      (50.0, 16.0, True, False, 0.0),
    RC.F_PLANT:    (18.0, 8.0, True, True, 0.25),  # ~healing food stand-in
    RC.F_WARDROBE: (200.0, 120.0, False, False, 0.0),
    RC.F_NIGHTSTAND: (60.0, 25.0, True, False, 0.0),
    RC.F_DRESSER:  (130.0, 110.0, False, False, 0.0),
    RC.F_MICROWAVE: (100.0, 30.0, True, False, 0.0),
    RC.F_WASHER:   (300.0, 160.0, False, False, 0.0),
    RC.F_DRYER:    (300.0, 160.0, False, False, 0.0),
    RC.F_WATER_HEATER: (500.0, 280.0, False, False, 0.0),
    RC.F_FURNACE:  (600.0, 300.0, False, False, 0.0),
    RC.F_POOL_TABLE: (1500.0, 500.0, False, False, 0.0),
    RC.F_WHITEBOARD: (50.0, 15.0, True, False, 0.0),
    RC.F_CONF_TABLE: (250.0, 120.0, False, False, 0.0),
    RC.F_VENDING:  (2000.0, 400.0, False, False, 0.0),
    RC.F_JAIL_BARS: (0.0, 0.0, False, False, 0.0),
    RC.F_HOSPITAL_BED: (900.0, 180.0, False, False, 0.0),
    RC.F_MACHINE:  (5000.0, 800.0, False, False, 0.0),
    RC.F_SERVER_RACK_ROW: (8000.0, 600.0, False, False, 0.0),
    RC.F_BOOTH:    (400.0, 150.0, False, False, 0.0),
    RC.F_PARK_SPACE: (0.0, 0.0, False, False, 0.0),
}
MAX_CARRY_WEIGHT = 200.0  # lbs, reference player_inventory weight limit


@dataclass
class PlayerInventory:
    """player_inventory_t (building_gameplay.cpp:729-830): carried value
    and weight, lifetime totals, and survival stats."""

    carried: list = field(default_factory=list)   # kind ids
    cur_value: float = 0.0
    cur_weight: float = 0.0
    tot_value: float = 0.0
    tot_weight: float = 0.0
    best_value: float = 0.0
    damage_done: float = 0.0
    health: float = 1.0
    drunkenness: float = 0.0
    oxygen: float = 1.0
    thirst: float = 1.0
    respawn_timer: float = 0.0    # >0 while waiting to respawn

    @property
    def dead(self) -> bool:
        return self.respawn_timer > 0.0

    def adjust_health(self, dh: float):
        """building_gameplay.cpp:761-777 (+ drunk damage reduction :821)."""
        if dh < 0.0:
            dh *= 1.0 - DRUNK_MAX_DAMAGE_REDUCTION * min(self.drunkenness, 1.0)
        self.health = min(1.0, self.health + dh)
        if self.health <= 0.0:
            self.respawn_timer = PLAYER_RESPAWN

    def tick(self, dt: float):
        if self.respawn_timer > 0.0:
            self.respawn_timer -= dt
            if self.respawn_timer <= 0.0:   # respawn with empty hands
                self.respawn_timer = 0.0
                self.health = 1.0
                self.drunkenness = 0.0
                self.carried.clear()
                self.cur_value = self.cur_weight = 0.0


def can_pickup(kind: int, inv: PlayerInventory) -> bool:
    val, wt, pick, _cons, _heal = _PROPS[kind]
    return pick and not inv.dead and inv.cur_weight + wt <= MAX_CARRY_WEIGHT


def do_pickup(kind: int, inv: PlayerInventory) -> bool:
    """do_room_obj_pickup: consumable heal-food is eaten immediately when
    hurt, otherwise carried (building_gameplay.cpp:573)."""
    val, wt, pick, cons, heal = _PROPS[kind]
    if not can_pickup(kind, inv):
        return False
    if cons and heal > 0.0 and inv.health < 1.0:
        inv.adjust_health(heal)
        inv.tot_value += val
        return True
    inv.carried.append(kind)
    inv.cur_value += val
    inv.cur_weight += wt
    inv.tot_value += val
    inv.tot_weight += wt
    inv.best_value = max(inv.best_value, inv.cur_value)
    return True


def drop_last(inv: PlayerInventory):
    """use_last_pickup_object: drop/throw the most recent item; returns
    (kind, throw_velocity) or None."""
    if not inv.carried:
        return None
    kind = inv.carried.pop()
    val, wt, _p, _c, _h = _PROPS[kind]
    inv.cur_value -= val
    inv.cur_weight -= wt
    return kind, THROW_VELOCITY


# ---------------------------------------------------------------------------
# sound alerts
# ---------------------------------------------------------------------------

@dataclass
class SoundAlert:
    """cur_building_sound_level with decay; zombies hear above
    ALERT_THRESH (building_gameplay.cpp:12,587-650)."""

    level: float = 0.0
    pos: tuple = (0.0, 0.0, 0.0)

    def register(self, level: float, pos):
        if level >= self.level * SOUND_DECAY:
            self.pos = tuple(float(v) for v in pos)
        self.level = min(1.0, self.level + level)

    def tick(self):
        self.level *= SOUND_DECAY

    @property
    def alerted(self) -> bool:
        return self.level >= ALERT_THRESH


# ---------------------------------------------------------------------------
# zombie mode
# ---------------------------------------------------------------------------

def retarget_zombies(st: PP.PeopleState, graph: PP.NavGraph,
                     player_room: int, alert: SoundAlert,
                     cur_rooms, rg) -> PP.PeopleState:
    """ai_target_player retarget (building_navigation.cpp:1216-1278):
    when alerted (or sharing the player's room), every person re-routes
    to the player's room; otherwise normal wandering goals."""
    if player_room < 0:
        return PP.assign_goals(st, graph, cur_rooms, rg)
    n = len(cur_rooms)
    same_room = [r == player_room for r in cur_rooms]
    if not (alert.alerted or any(same_room)):
        return PP.assign_goals(st, graph, cur_rooms, rg)
    return PP.assign_goals(st, graph, cur_rooms, rg,
                           forced_dest=player_room)


def zombies_in_attack_range(st: PP.PeopleState, player_xy, player_floor,
                            attack_range: float = ZOMBIE_ATTACK_RANGE):
    """zombie_in_attack_range (building_navigation.cpp:2842): boolean [N]
    mask of people close enough to damage the player this tick."""
    px, py = float(player_xy[0]), float(player_xy[1])
    dx = np.asarray(st.x) - px
    dy = np.asarray(st.y) - py
    same_floor = np.asarray(st.floor).astype(np.int32) == int(player_floor)
    return same_floor & ((dx * dx + dy * dy) < attack_range * attack_range)


def zombie_attack_tick(st: PP.PeopleState, inv: PlayerInventory,
                       player_xy, player_floor) -> int:
    """Apply contact damage from all in-range zombies; returns count."""
    if inv.dead:
        return 0
    hits = int(zombies_in_attack_range(st, player_xy, player_floor).sum())
    if hits:
        inv.adjust_health(-ZOMBIE_ATTACK_DAMAGE * hits)
    return hits


# ---------------------------------------------------------------------------
# achievements (building_gameplay.cpp:694-715 achievement_tracker_t)
# ---------------------------------------------------------------------------

@dataclass
class AchievementTracker:
    """NUM_ACHIEVEMENTS named one-shot flags; register returns True only
    the first time (the reference shows an onscreen message then)."""

    unlocked: set = field(default_factory=set)

    NAMES = (
        "first_pickup", "kleptomaniac", "big_spender", "full_inventory",
        "first_kill", "zombie_slayer", "survivor", "night_owl",
        "deep_diver", "high_climber", "fire_starter", "rat_whisperer",
        "spider_squisher", "snake_charmer", "mall_rat", "backrooms_escapee",
        "teetotaler", "drunkard", "marathon", "completionist",
    )

    def register(self, name: str) -> bool:
        if name not in self.NAMES or name in self.unlocked:
            return False
        self.unlocked.add(name)
        return True

    @property
    def count(self) -> int:
        return len(self.unlocked)
