"""Multi-device tests (8 virtual CPU devices from conftest)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.parallel import mesh as PM, halo as PH
from w3d.ops import shadows as SH


def _mesh8():
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    return PM.make_mesh(8, axis="tiles")


@pytest.mark.slow
def test_sharded_shadow_chain_matches_single_device():
    m = _mesh8()
    T, n = 16, 32
    z = np.zeros((T, n, n), np.float32)
    z[2, :, 16] = 3.0  # wall inside shard 1 — shadow must cross shards 0-1
    for light in ((1.0, 0.0, 0.3), (-1.0, 0.0, 0.3)):
        strip = np.concatenate([z[i] for i in range(T)], axis=1)
        ref, _ = SH.mesh_shadows(jnp.asarray(strip), light, cell_w=0.0625)
        run = PH.make_sharded_shadow_scan(m, light, 0.0625)
        init = jnp.full((n,), SH.MESH_MIN_Z)
        with m:
            zs = jax.device_put(jnp.asarray(z), PM.shard_leading(m))
            out = np.asarray(run(zs, init))
        strip_out = np.concatenate([out[i] for i in range(T)], axis=1)
        np.testing.assert_array_equal(strip_out, np.asarray(ref))


def test_halo_context_assembly():
    m = _mesh8()
    T, n, halo = 16, 16, 4
    z = np.arange(T * n * n, dtype=np.float32).reshape(T, n, n)
    ctx_fn = PH.make_halo_context(m, halo=halo)
    with m:
        zs = jax.device_put(jnp.asarray(z), PM.shard_leading(m))
        ctx = np.asarray(ctx_fn(zs))
    assert ctx.shape == (T, n, n + 2 * halo)
    # interior: the center block is the tile itself
    np.testing.assert_array_equal(ctx[:, :, halo:halo + n], z)
    # in-shard neighbor halo: tile 1's left halo = tile 0's right edge
    np.testing.assert_array_equal(ctx[1, :, :halo], z[0, :, -halo:])
    # cross-shard halo: tile 2 is shard 1's first tile; its left halo must
    # come from shard 0's last tile (tile 1)
    np.testing.assert_array_equal(ctx[2, :, :halo], z[1, :, -halo:])


@pytest.mark.slow
def test_sharded_tile_batch_and_physics():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(min(8, len(jax.devices())))


@pytest.mark.slow
def test_flagship_entry_step_over_8cpu_mesh():
    """The FULL flagship entry() step (production shapes: 8x128^2 tiles with
    erosion + 2048-object physics frame with pair collisions) jitted over
    the 8-device mesh with tile/object axes sharded."""
    m = _mesh8()
    from __graft_entry__ import entry
    from jax.sharding import NamedSharding, PartitionSpec as P

    fn, args = entry()
    sh1 = NamedSharding(m, P("tiles"))

    @jax.jit
    def sharded_fn(table_arrs, x0, y0, zmax_est, wpz, state):
        x0 = jax.lax.with_sharding_constraint(x0, sh1)
        y0 = jax.lax.with_sharding_constraint(y0, sh1)
        sh = lambda a: jax.lax.with_sharding_constraint(a, sh1)
        state = state._replace(px=sh(state.px), py=sh(state.py),
                               pz=sh(state.pz), vx=sh(state.vx),
                               vy=sh(state.vy), vz=sh(state.vz))
        return fn(table_arrs, x0, y0, zmax_est, wpz, state)

    with m:
        tiles, st = sharded_fn(*args)
        tiles.block_until_ready()
    assert tiles.shape[0] == 8
    assert bool(jnp.isfinite(tiles).all())
    assert bool(jnp.isfinite(st.pz).all())


def test_sharded_shadow_carry_mode_axis_aligned_bitwise():
    """mode='carry' (pod-scale edge-only propagation, 2 local scans
    instead of D) is BIT-identical to mode='exact' for axis-aligned
    lights (no lateral drift: the pure-carry operator is exact)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from w3d.parallel import halo as PH
    from w3d.parallel import mesh as PMM
    from w3d.ops import shadows as SH

    devs = np.array(jax.devices()[:8])
    hmesh = Mesh(devs, axis_names=("tiles",))
    T, n = 16, 16
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.uniform(0.0, 2.0, (T, n, n)).astype(np.float32))
    init = jnp.full((n,), SH.MESH_MIN_Z)
    light = (-1.0, 0.0, 0.3)                      # axis-aligned
    with hmesh:
        zs = jax.device_put(z, PMM.shard_leading(hmesh))
        a = PH.make_sharded_shadow_scan(hmesh, light, 0.0625)(zs, init)
        b = PH.make_sharded_shadow_scan(hmesh, light, 0.0625,
                                        mode="carry")(zs, init)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sharded_shadow_carry_mode_drift_close():
    """With lateral drift the carry mode's edge interpolation reorders
    max/interp; the shadow masks still agree except at a small fraction
    of boundary-grazing cells."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from w3d.parallel import halo as PH
    from w3d.parallel import mesh as PMM
    from w3d.ops import shadows as SH

    devs = np.array(jax.devices()[:8])
    hmesh = Mesh(devs, axis_names=("tiles",))
    T, n = 16, 16
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.uniform(0.0, 2.0, (T, n, n)).astype(np.float32))
    init = jnp.full((n,), SH.MESH_MIN_Z)
    light = (-1.0, 0.35, 0.3)                     # lateral drift
    with hmesh:
        zs = jax.device_put(z, PMM.shard_leading(hmesh))
        a = PH.make_sharded_shadow_scan(hmesh, light, 0.0625)(zs, init)
        b = PH.make_sharded_shadow_scan(hmesh, light, 0.0625,
                                        mode="carry")(zs, init)
    diff = (np.asarray(a) != np.asarray(b)).mean()
    assert diff < 0.02, diff
