"""Scalar physics oracle: a declared line-faithful transcription of the
reference's object integrator, used ONLY as a test oracle (never in any
production path) — the physics counterpart of ops/erosion.erode_reference.

Transcribed control flow, constants and operation order:
  dwobject::advance_object        /root/reference/src/Physics.cpp:716-960
  get_obj_zval                    Physics.cpp:942-957
  dwobject::check_water_collision Physics.cpp:1082-1180
  dwobject::object_bounce         Physics.cpp:1349-1409
  dwobject::surface_advance       Physics.cpp:980-1037

Scope (matches the batched step's environment model): ground mode, flat
water plane (water_matrix -> water_plane_z), global wind only (no flow
source), temperature above freezing, no cobjs (pass the trajectory through
cobj-free scenes).  Mesh height/normal sampling is parameterized by the
framework's bilinear sampler so the comparison isolates the INTEGRATION
semantics (the reference uses per-vertex quad normals; the framework
defines central-difference normals — an intentional redesign).

All arithmetic in np.float32 to match the TPU path, except where the
reference itself promotes to double (the `double gscale` gravity chain,
Physics.cpp:800-810), mirrored here in float64.

VALIDATED AGAINST THE COMPILED REFERENCE: tests/test_cpp_golden.py
builds Physics.cpp with stub surroundings (tests/cpp/physics_harness.cpp)
and pins this oracle bit-for-bit on flat-mesh dry + water scenarios, and
to bounded drift on slopes (the normal-model redesign).  That pass found
and fixed two transcription bugs: OBJ_COLLIDED was wrongly set on mesh
contact, and SMALL_NUMBER was transcribed as 1e-5 instead of 0.001.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

import w3d
from w3d.physics import types as T

F = np.float32
SMALL = F(0.001)                     # SMALL_NUMBER (3DWorld.h:62)

# flags (physics_objects.h)
FL_Z_STOPPED = T.FL_Z_STOPPED
FL_XY_STOPPED = T.FL_XY_STOPPED
FL_IN_WATER = T.FL_IN_WATER
FL_UNDERWATER = T.FL_UNDERWATER
FL_FLOATING = T.FL_FLOATING
FL_COLLIDED = T.FL_COLLIDED
FL_STATIC_COBJ_COLL = T.FL_STATIC_COBJ_COLL
ALL_COLL_STOPPED = FL_Z_STOPPED | FL_XY_STOPPED | FL_STATIC_COBJ_COLL


@dataclass
class OracleObj:
    pos: np.ndarray
    vel: np.ndarray
    status: int = 1
    flags: int = 0
    time: int = 0

    def mag_sq(self):
        v = self.vel
        return F(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])


@dataclass
class OracleEnv:
    wind: np.ndarray
    water_plane_z: float
    base_gravity: float = 1.0
    zmin: float = -4.0


@dataclass
class TypeParams:
    radius: float
    air_factor: float
    friction: float
    gravity: float
    elasticity: float
    density: float
    terminal_vel: float
    lifetime: int

    @classmethod
    def from_table(cls, table, type_id: int):
        g = lambda a: float(np.asarray(a)[type_id])
        return cls(radius=g(table.radius), air_factor=g(table.air_factor),
                   friction=g(table.friction), gravity=g(table.gravity),
                   elasticity=g(table.elasticity), density=g(table.density),
                   terminal_vel=g(table.terminal_vel),
                   lifetime=int(g(table.lifetime)))


def _mesh_sample(mesh: np.ndarray, x: float, y: float, world):
    """The framework's bilinear height + central-difference normal
    (physics/step.sample_mesh), scalar."""
    my, mx = mesh.shape
    gx = F(x) * F(world.dx_inv) + mx // 2
    gy = F(y) * F(world.dy_inv) + my // 2
    x0 = int(np.clip(np.floor(gx), 0, mx - 2))
    y0 = int(np.clip(np.floor(gy), 0, my - 2))
    fx = F(np.clip(gx - x0, 0.0, 1.0))
    fy = F(np.clip(gy - y0, 0.0, 1.0))
    dzdx = (np.roll(mesh, -1, 1) - np.roll(mesh, 1, 1)) * F(0.5 * world.dx_inv)
    dzdy = (np.roll(mesh, -1, 0) - np.roll(mesh, 1, 0)) * F(0.5 * world.dy_inv)

    def bil(m):
        return F((m[y0, x0] * (1 - fx) + m[y0, x0 + 1] * fx) * (1 - fy)
                 + (m[y0 + 1, x0] * (1 - fx) + m[y0 + 1, x0 + 1] * fx) * fy)

    h = bil(mesh)
    sx = bil(dzdx)
    sy = bil(dzdy)
    inv = F(1.0) / F(math.sqrt(sx * sx + sy * sy + 1.0))
    return h, F(-sx * inv), F(-sy * inv), F(inv)


def _outside(x, y, world):
    mx, my = world.mesh_x, world.mesh_y
    gx = F(x) * F(world.dx_inv) + mx // 2
    gy = F(y) * F(world.dy_inv) + my // 2
    return gx < 0 or gx >= mx or gy < 0 or gy >= my


def object_bounce(o: OracleObj, coll_type: int, norm, tp: TypeParams,
                  z_offset: float, mesh, world) -> bool:
    """dwobject::object_bounce (Physics.cpp:1349-1409)."""
    elasticity = F(tp.elasticity)
    if elasticity == 0.0:
        return False
    if o.mag_sq() == 0.0:
        return False
    if coll_type == 0:      # mesh surface
        mh, nx, ny, nz = _mesh_sample(mesh, o.pos[0], o.pos[1], world)
        norm = (nx, ny, nz)
        o.pos[2] = max(o.pos[2], F(mh + z_offset))
        elasticity = F(elasticity * T.LAND_ELASTICITY)
    elif coll_type == 2:    # water (norm sign is irrelevant to reflection)
        norm = (F(0.0), F(0.0), F(-1.0))
        elasticity = F(elasticity * T.WATER_ELASTIC)
    elasticity = F(np.clip(elasticity, 0.0, 1.0))
    nx, ny, nz = norm
    v = o.vel
    vdn = F(v[0] * nx + v[1] * ny + v[2] * nz)
    b = np.array([v[0] - 2 * vdn * nx, v[1] - 2 * vdn * ny,
                  v[2] - 2 * vdn * nz], F)
    xy_e = F(elasticity * (1.0 - tp.air_factor))
    new_v = np.array([xy_e * b[0], xy_e * b[1], elasticity * b[2]], F)
    if float(new_v @ new_v) >= T.BOUNCE_CUTOFF:
        o.vel = new_v
        return True
    return False


def check_water_collision(o: OracleObj, vz_old: float, env: OracleEnv,
                          tp: TypeParams, mesh, world, tstep) -> bool:
    """dwobject::check_water_collision (Physics.cpp:1082-1180), flat-water
    form (water_matrix == water_plane_z everywhere it exists)."""
    radius = F(tp.radius)
    wpz = F(env.water_plane_z)
    if (o.pos[2] - radius) > wpz:           # max_water_height quick check
        return False
    if _outside(o.pos[0], o.pos[1], world):
        return False
    mh, _, _, _ = _mesh_sample(mesh, o.pos[0], o.pos[1], world)
    if wpz < mh:                            # not over water
        return False
    if not (o.flags & FL_IN_WATER) and (o.pos[2] - radius) > wpz:
        return False
    if (o.pos[2] + radius + SMALL) < mh:
        return False
    o.flags |= FL_IN_WATER
    density = F(tp.density)
    v_tot_sq = o.mag_sq()
    ground_height = F(mh + radius)

    if v_tot_sq < T.BOUNCE_CUTOFF or (o.flags & FL_Z_STOPPED):
        if density < T.WATER_DENSITY or (density == T.WATER_DENSITY
                                         and o.vel[2] >= 0):  # floats
            zpos = F(max(wpz + radius * (1.0 - 2.0 * density), ground_height))
            if (zpos - o.pos[2]) > 2.0 * radius:    # under the surface
                o.vel[2] = F(vz_old)
                o.vel[2] = F(o.vel[2] - ((density - T.WATER_DENSITY) / density)
                             * env.base_gravity * T.GRAVITY * tstep)
                o.flags |= FL_Z_STOPPED
            else:
                o.pos[2] = F(zpos + SMALL)
                o.vel[:] = 0.0
                o.flags |= FL_FLOATING
            if o.pos[2] > ground_height:
                o.status = 1                        # floating on water
            else:
                if o.status in (1, 2):
                    o.status = 3
                    return False
                o.status = 4
        elif v_tot_sq < T.BOUNCE_CUTOFF:            # sinks
            if o.pos[2] > (ground_height + 1e-5):
                o.vel *= F(density / (density + T.WATER_DENSITY))
            else:
                o.pos[2] = ground_height
                o.vel[:] = 0.0
                o.status = 3
                return False
    else:   # collision with water
        surf_coll = (o.pos[2] > (wpz - radius - T.MAX_SPLASH_DEPTH)
                     and not (o.flags & (FL_UNDERWATER | FL_Z_STOPPED)))
        vmag = F(math.sqrt(max(float(v_tot_sq), 1e-12)))
        coll_angle = (F(math.acos(np.clip(-o.vel[2] / vmag, -1.0, 1.0)))
                      if surf_coll else F(0.0))
        den_ratio = F(T.WATER_DENSITY / (density + T.WATER_DENSITY))
        zpos = F(max(wpz + radius * (1.0 - 2.0 * density), ground_height))
        if (coll_angle < T.CRITICAL_ANGLE / den_ratio
                or (zpos - o.pos[2]) > 6.0 * radius
                or not object_bounce(o, 2, None, tp, 0.0, mesh, world)):
            # object enters water
            o.vel *= F(1.0 - T.WATER_DAMPING * den_ratio)
            if density >= T.WATER_DENSITY:
                o.flags |= FL_UNDERWATER
                if o.pos[2] <= (ground_height + 1e-5):
                    o.status = 3
                    return False
            else:
                o.vel[2] = 0.0
                o.flags |= (FL_Z_STOPPED | FL_FLOATING)
    return True


def surface_advance(o: OracleObj, tp: TypeParams, mesh, world, tstep) -> int:
    """dwobject::surface_advance (Physics.cpp:980-1037): 0=bad position,
    1=stopped, 2=moved.  No grass friction (grass density 0)."""
    friction = F(tp.friction)
    if friction >= T.STICK_THRESHOLD or (o.flags & FL_XY_STOPPED):
        o.vel[:] = 0.0
        return 1
    radius = F(tp.radius)
    if _outside(o.pos[0], o.pos[1], world):
        return 0
    mh, nx, ny, nz = _mesh_sample(mesh, o.pos[0], o.pos[1], world)
    if o.pos[2] < (mh - T.KILL_DEPTH * radius):
        return 0
    if o.pos[2] < (mh - T.RECOVER_DEPTH * radius):
        o.pos[2] = mh
    dzn = F(math.sqrt(nx * nx + ny * ny))
    mesh_vel = np.zeros(3, F)
    val = 0
    if dzn > 1e-12 and dzn > friction:
        vel = F((T.SURF_ADV_STEP / world.x_scene) * dzn * (1.0 - 0.5 * friction)
                / T.DEF_TIMESTEP)
        if (o.flags & FL_IN_WATER) and tp.density >= T.WATER_DENSITY:
            vel = F(vel * (tp.density - T.WATER_DENSITY) / tp.density)
        if vel > 1e-12:
            mesh_vel[0] = F(vel * world.dx * nx / dzn)
            mesh_vel[1] = F(vel * world.dy * ny / dzn)
            val = 1
    vmult = F(max(1.0 - friction, 0.0))     # (1-friction)^fticks, fticks=1
    o.vel = (mesh_vel * (1.0 - vmult) + o.vel * vmult).astype(F)
    o.pos[0] = F(o.pos[0] + o.vel[0] * tstep)
    o.pos[1] = F(o.pos[1] + o.vel[1] * tstep)
    o.pos[2] = F(mh + radius)
    return val + 1


def advance_object(o: OracleObj, env: OracleEnv, tp: TypeParams, mesh,
                   world, tstep=T.DEF_TIMESTEP) -> None:
    """dwobject::advance_object (Physics.cpp:716-960), one call = one
    substep (iter==0 semantics; no cobjs/fsource/ice)."""
    tstep = F(tstep)
    if o.status == 0:
        return
    if (o.pos[2] < env.zmin
            or (tp.lifetime > 0 and o.time > tp.lifetime)):
        o.status = 0
        return
    coll_last = bool(o.flags & FL_COLLIDED)
    o.flags &= ~FL_COLLIDED
    o.time += 1
    radius = F(tp.radius)
    friction = F(tp.friction)

    if o.status == 1:       # airborne (Physics.cpp:755-900)
        air_factor = F(0.0)
        if not (o.flags & FL_UNDERWATER):
            if o.flags & FL_FLOATING:
                air_factor = F((1.0 - T.WATER_SURF_FRICTION) * tp.air_factor)
            else:
                air_factor = F(tp.air_factor)
        if o.flags & FL_Z_STOPPED:
            if ((o.pos[2] - radius) > env.water_plane_z
                    and friction < 2.0 * T.STICK_THRESHOLD):
                o.flags &= ~FL_Z_STOPPED
            else:
                o.vel[2] = 0.0
        collided = coll_last or abs(o.vel[2]) < 1.0e-6
        vz_old = F(o.vel[2])
        wind = env.wind.astype(F)
        vtot = o.vel.astype(F).copy()
        if collided:
            vtot[2] = F(vtot[2] + wind[2])
        else:
            vtot = (vtot + wind).astype(F)
        if not (o.flags & FL_Z_STOPPED):
            # `double gscale` in the reference (Physics.cpp:800) promotes
            # the whole gravity chain to float64 before the f32 store;
            # pinned bitwise by tests/test_cpp_golden.py
            gscale = np.float64(1.0)
            if (o.flags & FL_IN_WATER) and tp.density > T.WATER_DENSITY:
                dens = F(tp.density)
                gscale = np.float64(F((dens - F(T.WATER_DENSITY)) / dens))
            if -o.vel[2] < tp.terminal_vel:
                o.vel[2] = F(np.float64(o.vel[2])
                             - np.float64(env.base_gravity) * gscale
                             * np.float64(F(T.GRAVITY)) * np.float64(tstep)
                             * np.float64(F(tp.gravity)))
                o.vel[2] = F(-min(-float(o.vel[2]), tp.terminal_vel))
            if (abs(air_factor * wind[2]) > abs(o.vel[2])
                    or ((wind[2] < 0) != (o.vel[2] < 0))):
                o.vel[2] = F(o.vel[2] + air_factor * wind[2])
        if not (o.flags & FL_XY_STOPPED):
            for d in (0, 1):
                if (abs(air_factor * vtot[d]) > abs(o.vel[d])
                        or ((vtot[d] < 0) != (o.vel[d] < 0))):
                    o.vel[d] = F((1.0 - air_factor) * o.vel[d]
                                 + air_factor * vtot[d])
                # static-friction block is dead code in the reference
                # (condition `!(flags | IN_WATER)`, Physics.cpp:826-829)
                o.pos[d] = F(o.pos[d] + tstep * o.vel[d])
        o.pos[2] = F(o.pos[2] + tstep * o.vel[2])

        # get_obj_zval (Physics.cpp:942-957)
        if _outside(o.pos[0], o.pos[1], world):
            o.status = 0
            return
        mh, _, _, _ = _mesh_sample(mesh, o.pos[0], o.pos[1], world)
        if (o.pos[2] - radius) > mh:
            val = 1
        else:
            val = 2
            o.pos[2] = F(mh + radius)
        wcoll = check_water_collision(o, vz_old, env, tp, mesh, world, tstep)
        if o.status == 0:
            return
        if wcoll:
            o.status = 1
            o.flags &= ~ALL_COLL_STOPPED
            return
        if val == 2:        # mesh surface, no cobj collision
            # NOTE: the reference does NOT set OBJ_COLLIDED on mesh
            # contact — only cobj collisions set it
            # (collision_detect.cpp:1561, build_world.cpp:292); the
            # `collided` wind gate therefore reengages only via
            # |vz| < 1e-6.  Pinned bitwise by tests/test_cpp_golden.py.
            if object_bounce(o, 0, None, tp, radius, mesh, world):
                o.status = 1
                return
            stopped = (friction >= T.STICK_THRESHOLD
                       or (o.flags & FL_XY_STOPPED)
                       or o.mag_sq() < T.BOUNCE_CUTOFF)
            o.vel *= F(0.0 if stopped else 0.95)
        o.status = val
    else:                   # on the ground (Physics.cpp:901-938)
        if _outside(o.pos[0], o.pos[1], world):
            o.status = 0
            return
        if o.flags & FL_STATIC_COBJ_COLL:
            return
        if (check_water_collision(o, o.vel[2], env, tp, mesh, world, tstep)
                and tp.density < T.WATER_DENSITY):
            return
        val = surface_advance(o, tp, mesh, world, tstep)
        if val == 2:
            o.status = 3
        elif val == 1:
            if o.status != 4:
                o.vel[:] = 0.0
                o.status = 4
        else:
            o.status = 0
