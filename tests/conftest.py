"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests run anywhere (the driver separately dry-runs the multi-chip path).

Note: the axon sitecustomize pins JAX_PLATFORMS=axon, so the env var alone
is not enough — we must update the config after importing jax.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: compile time dominates the quick
# tier (most tests trace large programs on tiny data), and the cache
# survives across runs so repeat CI passes skip the compiles entirely.
# Lives inside the repo tree (gitignored) so a checkout keeps its cache.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass    # older jax without these options: cold compiles only

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (>10s); `pytest -m 'not slow'` is the "
        "quick pass, the full suite runs everything")
