"""Flagship physics model: the `config_spheres.txt`-class scenario — N
dynamic balls over a static cobj scene — as one jitted frame step,
optionally sharded over a device mesh on the object axis.

This is the TPU re-expression of `process_groups` (build_world.cpp:310-600)
at the reference's ">10K dynamic objects" scale (README.md:18).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.constants import WorldConst, DEFAULT_WORLD
from ..utils import config as CFG
from ..utils.rng import RandGen
from ..physics import types as PT, step as PS, cobjs as PC
from ..scene import cobj as SC


class SpheresWorld(NamedTuple):
    state: PS.ObjectState
    env: PS.PhysicsEnv
    cobjs: PC.CobjSet
    table: PT.ObjTypeTable


def build_spheres_world(
    num_objects: int = 10000,
    world: WorldConst = DEFAULT_WORLD,
    coll_obj_path: str | None = None,
    seed: int = 1,
    obj_type: str = "BALL",
    mesh_height: jnp.ndarray | None = None,
    group_shapes: bool = True,
) -> SpheresWorld:
    """Assemble the scenario: flat-ish mesh (config_spheres disables the
    drawn mesh and uses a ground-plane cube), static cobjs, N balls spawned
    in a column of random positions above the scene."""
    table = PT.make_type_table(z_scene=world.z_scene)
    if coll_obj_path:
        cobjs = SC.load_cobjs(coll_obj_path)
    else:
        # default scene ~ coll_objs/spheres.txt: ground cube + random spheres
        sp = SC.SceneParse()
        lay = SC.CobjLayer(elasticity=0.9)
        sp.cobjs.append(SC.RawCobj(SC.COLL_CUBE, (-4.0, -4.0, -0.7), (4.0, 4.0, 0.0),
                                   layer=lay))
        rg = RandGen(7, 3)
        for _ in range(100):
            r = rg.rand_uniform(0.1, 0.25)
            x = rg.rand_uniform(-2.5, 2.5)
            y = rg.rand_uniform(-2.5, 2.5)
            sp.cobjs.append(SC.RawCobj(SC.COLL_SPHERE, (x, y, r), r1=r, layer=lay))
        cobjs = SC.pack_cobjs(sp)

    if mesh_height is None:
        mesh_height = jnp.full((world.mesh_y, world.mesh_x), -0.7, jnp.float32)
    env = PS.PhysicsEnv(
        mesh_height=mesh_height,
        water_plane_z=jnp.float32(-100.0),  # disable_water 1
        wind=jnp.asarray([0.4, 0.2, 0.0], jnp.float32),
        temperature=jnp.float32(20.0),
        base_gravity=jnp.float32(1.0),
        zmin=jnp.float32(-world.z_scene),
    )
    k = jax.random.key(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    pos = jnp.stack([
        jax.random.uniform(k1, (num_objects,), jnp.float32, -3.0, 3.0),
        jax.random.uniform(k2, (num_objects,), jnp.float32, -3.0, 3.0),
        jax.random.uniform(k3, (num_objects,), jnp.float32, 0.5, 3.5),
    ], axis=-1)
    vel = jax.random.normal(jax.random.fold_in(k, 9), (num_objects, 3)) * 0.5
    st = PS.make_state(pos, vel, np.full(num_objects, PT.type_id(obj_type)), table)
    if group_shapes:
        # shape-grouped narrow phase: ~6x less VPU work on mixed scenes,
        # identical collision results (cobjs.GroupedCobjs)
        cobjs = PC.group_cobjs(cobjs)
    return SpheresWorld(state=st, env=env, cobjs=cobjs, table=table)


@functools.partial(jax.jit, static_argnames=("substeps", "world",
                                             "obj_collisions", "pair_every",
                                             "water"))
def frame_step(w: SpheresWorld, substeps: int = 4,
               world: WorldConst = DEFAULT_WORLD,
               obj_collisions: bool = True,
               pair_every: int = 1,
               water: bool = True) -> SpheresWorld:
    st = PS.step_objects(w.state, w.env, w.cobjs, w.table,
                         substeps=substeps, world=world,
                         obj_collisions=obj_collisions,
                         pair_every=pair_every, water=water)
    return w._replace(state=st)


def make_sharded_frame_step(mesh: Mesh, substeps: int, world: WorldConst,
                            obj_collisions: bool = True,
                            pair_window: int | None = None,
                            pair_method: str = "auto"):
    """Object-axis data parallelism: object state shards over 'objs'; the
    mesh/cobj scene replicates.  With collisions on (the default), the
    EXACT banded pair pass runs domain-decomposed: per-device x-slabs of
    the globally sorted order with a PAIR_WINDOW-rank ppermute halo
    (parallel/pairs.py)."""
    obj_sh = NamedSharding(mesh, P("objs"))

    if obj_collisions:
        from ..parallel.pairs import make_step_objects_sharded
        inner = make_step_objects_sharded(
            mesh, axis=mesh.axis_names[0], substeps=substeps, world=world,
            window=pair_window or PS.PAIR_WINDOW, method=pair_method)

        @jax.jit
        def step(w: SpheresWorld) -> SpheresWorld:
            return w._replace(state=inner(w.state, w.env, w.cobjs, w.table))

        return step

    @jax.jit
    def step(w: SpheresWorld) -> SpheresWorld:
        st = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, obj_sh), w.state)
        out = PS.step_objects(st, w.env, w.cobjs, w.table,
                              substeps=substeps, world=world,
                              obj_collisions=False)
        return w._replace(state=out)

    return step
