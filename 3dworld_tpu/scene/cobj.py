"""Collision-object (cobj) scene file parser.

The reference's scene DSL (`read_coll_obj_file`, build_world.cpp:1186-2080)
uses single-char and long keywords: shapes B(cube) S(sphere) C(cylinder)
k(capsule) P(polygon) c(points) z(torus), materials l/r/y, transforms
t/m/M, platforms Q, triggers K, lights L/V/U, `rand_spheres`, etc.

This module parses the subset exercised by the shipped scene configs into a
host-side list, then packs it into the fixed-shape `CobjSet` SoA used by
the TPU physics step.  Unknown commands are skipped line-wise (the shipped
files are one command per line), recorded in `SceneParse.skipped`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..utils.rng import RandGen
from ..physics.cobjs import (
    CobjSet, COLL_CUBE, COLL_SPHERE, COLL_CYLINDER, COLL_CYLINDER_ROT,
    COLL_POLYGON, COLL_CAPSULE, COLL_TORUS,
)


@dataclass
class CobjLayer:
    """Current material ('l' command, build_world.cpp:1950)."""

    elasticity: float = 0.5
    color: tuple = (1.0, 1.0, 1.0, 1.0)
    tid: int = -1
    draw: bool = True
    specular: float = 0.0
    shininess: float = 1.0
    friction: float = 0.0  # not in the 'l' layer; per-surface default


@dataclass
class RawCobj:
    shape: int
    p1: tuple = (0.0, 0.0, 0.0)
    p2: tuple = (0.0, 0.0, 0.0)
    r1: float = 0.0
    r2: float = 0.0
    pts: tuple = ()
    layer: CobjLayer = field(default_factory=CobjLayer)


@dataclass
class SceneParse:
    cobjs: list = field(default_factory=list)
    skipped: dict = field(default_factory=dict)  # command -> count
    layers: list = field(default_factory=list)


def _poly_normal(pts):
    a, b, c = (np.asarray(p) for p in pts[:3])
    n = np.cross(b - a, c - a)
    l = np.linalg.norm(n)
    return tuple(n / l) if l > 0 else (0.0, 0.0, 1.0)


def parse_coll_obj_file(path: str, sphere_gen_seed: int = 0) -> SceneParse:
    sp = SceneParse()
    layer = CobjLayer()
    if not os.path.exists(path):
        return sp
    with open(path) as f:
        lines = f.read().splitlines()
    for line in lines:
        h = line.find("#")
        if h >= 0:
            line = line[:h]
        toks = line.split()
        if not toks:
            continue
        cmd, args = toks[0], toks[1:]
        try:
            if cmd == "l":  # elasticity R G B A tid [draw ...]
                layer = CobjLayer(
                    elasticity=float(args[0]),
                    color=tuple(float(x) for x in args[1:5]),
                    tid=int(args[5]) if args[5].lstrip("-").isdigit() else -1,
                    draw=bool(int(args[6])) if len(args) > 6 else True,
                )
                sp.layers.append(layer)
            elif cmd == "r":  # specular shininess [R G B]
                layer.specular = float(args[0])
                layer.shininess = float(args[1])
            elif cmd == "B":  # xmin xmax ymin ymax zmin zmax [corner_radius]
                x1, x2, y1, y2, z1, z2 = (float(a) for a in args[:6])
                sp.cobjs.append(RawCobj(COLL_CUBE, (x1, y1, z1), (x2, y2, z2),
                                        layer=layer))
            elif cmd == "S":  # x y z radius
                x, y, z, r = (float(a) for a in args[:4])
                sp.cobjs.append(RawCobj(COLL_SPHERE, (x, y, z), r1=r, layer=layer))
            elif cmd == "C":  # x1 y1 z1 x2 y2 z2 r1 r2
                v = [float(a) for a in args[:8]]
                vertical = abs(v[0] - v[3]) < 1e-9 and abs(v[1] - v[4]) < 1e-9
                sp.cobjs.append(RawCobj(
                    COLL_CYLINDER if vertical else COLL_CYLINDER_ROT,
                    tuple(v[0:3]), tuple(v[3:6]), v[6], v[7], layer=layer))
            elif cmd == "k":  # capsule: x1 y1 z1 x2 y2 z2 r1 r2
                v = [float(a) for a in args[:8]]
                sp.cobjs.append(RawCobj(COLL_CAPSULE, tuple(v[0:3]), tuple(v[3:6]),
                                        v[6], v[7], layer=layer))
            elif cmd == "z":  # torus: x y z dir_x dir_y dir_z ro ri
                v = [float(a) for a in args[:8]]
                sp.cobjs.append(RawCobj(COLL_TORUS, tuple(v[0:3]), tuple(v[3:6]),
                                        v[6], v[7], layer=layer))
            elif cmd == "P":  # polygon: npts (x y z)*npts thickness
                n = int(args[0])
                vals = [float(a) for a in args[1:1 + 3 * n + 1]]
                pts = tuple(tuple(vals[3 * i:3 * i + 3]) for i in range(n))
                thick = vals[3 * n]
                sp.cobjs.append(RawCobj(COLL_POLYGON, pts[0], r1=thick, pts=pts,
                                        layer=layer))
            elif cmd == "rand_spheres":
                # num cx cy cz place_radius min_r max_r
                # (sphere_materials.cpp:490-525): uniform radius, xy-disc
                # rejection placement at z = center.z + radius, no overlap
                num = int(args[0])
                cx, cy, cz, pr, rmin, rmax = (float(a) for a in args[1:7])
                rg = RandGen()
                if sphere_gen_seed != 0:
                    rg.set_state(sphere_gen_seed, 123)
                placed = []
                for _ in range(num):
                    r = rg.rand_uniform(rmin, rmax)
                    for _attempt in range(1000):
                        while True:
                            vx = 2.0 * rg.randd() - 1.0
                            vy = 2.0 * rg.randd() - 1.0
                            if vx * vx + vy * vy < 1.0:
                                break
                        pos = (cx + pr * vx, cy + pr * vy, cz + r)
                        if all((pos[0] - q[0]) ** 2 + (pos[1] - q[1]) ** 2
                               + (pos[2] - q[2]) ** 2 >= (r + q[3]) ** 2
                               for q in placed):
                            break
                    placed.append((*pos, r))
                    sp.cobjs.append(RawCobj(COLL_SPHERE, pos, r1=r, layer=layer))
            elif cmd == "include":
                sub = parse_coll_obj_file(
                    os.path.join(os.path.dirname(path), args[0]), sphere_gen_seed)
                sp.cobjs.extend(sub.cobjs)
                for k, v in sub.skipped.items():
                    sp.skipped[k] = sp.skipped.get(k, 0) + v
            else:
                sp.skipped[cmd] = sp.skipped.get(cmd, 0) + 1
        except (ValueError, IndexError):
            sp.skipped[cmd] = sp.skipped.get(cmd, 0) + 1
    return sp


def pack_cobjs(parse: SceneParse, capacity: int | None = None) -> CobjSet:
    """Pack parsed cobjs into the padded SoA (pad to a multiple of 128 for
    TPU lane alignment)."""
    n = len(parse.cobjs)
    if capacity is None:
        capacity = max(128, -(-n // 128) * 128)
    shape = np.zeros(capacity, np.int32)
    p1 = np.zeros((capacity, 3), np.float32)
    p2 = np.zeros((capacity, 3), np.float32)
    r1 = np.zeros(capacity, np.float32)
    r2 = np.zeros(capacity, np.float32)
    npts = np.zeros(capacity, np.int32)
    pts = np.zeros((capacity, 4, 3), np.float32)
    pnorm = np.zeros((capacity, 3), np.float32)
    elas = np.zeros(capacity, np.float32)
    fric = np.zeros(capacity, np.float32)
    col = np.ones((capacity, 4), np.float32)
    spec = np.zeros(capacity, np.float32)
    shine = np.ones(capacity, np.float32)
    for i, c in enumerate(parse.cobjs[:capacity]):
        shape[i] = c.shape
        p1[i] = c.p1
        r1[i] = c.r1
        r2[i] = c.r2
        elas[i] = c.layer.elasticity
        fric[i] = c.layer.friction
        col[i] = c.layer.color
        spec[i] = c.layer.specular
        shine[i] = c.layer.shininess
        if c.shape == COLL_POLYGON:
            npts[i] = len(c.pts)
            for k, p in enumerate(c.pts[:4]):
                pts[i, k] = p
            pnorm[i] = _poly_normal(c.pts)
        elif c.shape == COLL_TORUS:
            d = np.asarray(c.p2)
            l = np.linalg.norm(d)
            p2[i] = d / l if l > 0 else (0.0, 0.0, 1.0)
        else:
            p2[i] = c.p2
    return CobjSet(
        shape=jnp.asarray(shape), p1=jnp.asarray(p1), p2=jnp.asarray(p2),
        r1=jnp.asarray(r1), r2=jnp.asarray(r2), npts=jnp.asarray(npts),
        pts=jnp.asarray(pts), pnorm=jnp.asarray(pnorm),
        elasticity=jnp.asarray(elas), friction=jnp.asarray(fric),
        is_movable=jnp.zeros(capacity, bool),
        color_r=jnp.asarray(col[:, 0]), color_g=jnp.asarray(col[:, 1]),
        color_b=jnp.asarray(col[:, 2]), alpha=jnp.asarray(col[:, 3]),
        specular=jnp.asarray(spec), shine=jnp.asarray(shine),
    )


def load_cobjs(path: str, sphere_gen_seed: int = 0) -> CobjSet:
    return pack_cobjs(parse_coll_obj_file(path, sphere_gen_seed))
