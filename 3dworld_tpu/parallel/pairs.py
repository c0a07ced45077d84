"""Multi-chip EXACT pair collisions: x-slab domain decomposition with a
PAIR_WINDOW-rank halo over ICI.

The single-chip design (physics/step.py, DESIGN.md "Sort, don't hash")
sorts the whole object population by x once per frame; every contact then
lies within PAIR_WINDOW ranks of the sorted order (audited bound, 247 at
10K pile density).  That same bound is exactly the halo size a domain
decomposition needs: shard the SORTED order into contiguous per-device
slabs, and every cross-device pair straddles one slab boundary by fewer
than PAIR_WINDOW ranks.

Per substep, inside `shard_map`:

  1. each device ppermutes the FIRST `window` ranks of its slab to its
     left neighbor (one ICI hop);
  2. the local banded pass runs over [local | halo] with
     ``i_limit = n_local`` — halo rows participate only as the j side, so
     no pair is ever evaluated twice across devices;
  3. the j-side deltas accumulated into halo rows ppermute BACK to the
     right neighbor and add onto its first `window` ranks.

The global x-sort runs once per frame outside `shard_map` (XLA's
distributed sort — the "occasional re-partition" step); positions drift
less than the window slack within one frame, matching the single-chip
staleness.  This is the reference's one shared-memory hot loop
(build_world.cpp:310-600, collision re-registration :526-543) laid out
for a pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..physics import step as PS
from ..physics import types as T
from ..utils.constants import WorldConst, DEFAULT_WORLD


def make_halo_pair_fn(axis: str, n_devices: int, window: int = PS.PAIR_WINDOW,
                      method: str = "auto"):
    """Pair-delta function for use INSIDE shard_map over `axis`: local
    slab + `window`-rank halo from the next device, banded pass with
    i_limit, j-side halo deltas returned to the owner.

    The object axis must be globally x-sorted and sharded into contiguous
    rank slabs (with_sharding_constraint after spatial_sort does this).
    Requires window <= local slab size (one-neighbor halo).
    """
    if method not in ("auto", "pallas", "banded"):
        raise ValueError(
            f"sharded pair pass supports method 'auto'/'pallas'/'banded', "
            f"got {method!r} (the single-chip 'block'/'rowblock' forms "
            "have no halo formulation)")
    fwd = [(s, s - 1) for s in range(1, n_devices)]    # head -> left neighbor
    back = [(s, s + 1) for s in range(n_devices - 1)]  # deltas -> right owner

    def pair_fn(px, py, pz, vx, vy, vz, rad, mass, elas, act):
        nl = px.shape[0]
        assert window <= nl, (
            f"halo pair pass needs window ({window}) <= local slab ({nl}); "
            "use fewer devices or more objects")
        actf = act.astype(px.dtype)
        cols = (px, py, pz, vx, vy, vz, rad, mass, elas, actf)
        if n_devices > 1:
            # ONE stacked ppermute for the whole halo (10 columns in a
            # single ICI collective instead of 10)
            stacked = jnp.stack([c[:window] for c in cols])
            halos = jax.lax.ppermute(stacked, axis, fwd)
            ext = [jnp.concatenate([c, halos[i]])
                   for i, c in enumerate(cols)]
        else:
            ext = list(cols)
        ext[9] = ext[9] > 0
        # the last device's halo arrives zero-filled (its fwd ppermute
        # has no source).  act=0 masks those rows out of every HIT, but
        # a halo-vs-halo row pair would still compute mw = m/(0+0) = NaN
        # before masking — pad inactive-row masses to 1.0 so the masked
        # arithmetic stays finite even if halo deltas are ever read
        ext[7] = jnp.where(ext[9], ext[7], 1.0)
        if method == "pallas" or (method == "auto" and PS._on_tpu()):
            from ..ops.pallas.pairs_kernel import banded_pairs_pallas
            deltas = banded_pairs_pallas(*ext[:9], ext[9], window=window,
                                         i_limit=nl)
        else:
            deltas = PS.banded_pair_collisions(*ext[:9], ext[9],
                                               window=window, i_limit=nl)
        if n_devices == 1:
            return deltas
        local = [d[:nl] for d in deltas]
        returned = jax.lax.ppermute(jnp.stack([d[nl:] for d in deltas]),
                                    axis, back)
        return tuple(l.at[:window].add(returned[i])
                     for i, l in enumerate(local))

    return pair_fn


def make_step_objects_sharded(mesh: Mesh, axis: str = "objs",
                              substeps: int = 4,
                              world: WorldConst = DEFAULT_WORLD,
                              tstep: float = T.DEF_TIMESTEP,
                              window: int = PS.PAIR_WINDOW,
                              method: str = "auto",
                              pair_every: int = 1,
                              water: bool = True):
    """Full multi-chip frame step WITH pair collisions on.

    Returns jitted ``step(state, env, cobjs, table) -> state``: global
    x-sort + slab re-partition, then `substeps` substeps under shard_map
    with the halo pair pass; scene (mesh/cobjs/type table) replicates,
    object state shards on `axis`.  `pair_every`/`water` mirror
    step_objects (reference pair cadence, dry-scene water elision).
    """
    nd = mesh.shape[axis]
    obj_sh = NamedSharding(mesh, P(axis))
    dt = tstep / substeps
    pair_fn = make_halo_pair_fn(axis, nd, window=window, method=method)

    @jax.jit
    def step(state: PS.ObjectState, env: PS.PhysicsEnv, cobjs,
             table: T.ObjTypeTable) -> PS.ObjectState:
        # frame-level re-partition: global sort, contiguous rank slabs
        state = PS.spatial_sort(state, world)
        state = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, obj_sh), state)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(), P(), P()),
            out_specs=P(axis),
            check_vma=False,
        )
        def run(st, env_, cobjs_, table_):
            dtc = jnp.asarray(dt, jnp.float32)

            def body(s, k):
                if pair_every <= 1:
                    return PS._substep(s, env_, cobjs_, table_, dtc, world,
                                       True, pair_fn=pair_fn,
                                       water=water), None
                return jax.lax.cond(
                    k % pair_every == 0,
                    lambda ss: PS._substep(ss, env_, cobjs_, table_, dtc,
                                           world, True, pair_fn=pair_fn,
                                           water=water),
                    lambda ss: PS._substep(ss, env_, cobjs_, table_, dtc,
                                           world, False, water=water),
                    s), None

            st, _ = jax.lax.scan(body, st, jnp.arange(substeps),
                                 length=substeps)
            return st

        state = run(state, env, cobjs, table)
        return PS._frame_bookkeeping(state, table)

    return step
