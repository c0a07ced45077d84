"""Deterministic random-number streams.

Two layers:

1. **Reference-compatible generators** — the reference drives all procedural
   generation from a small stateful combined LCG (Stephen Derenzo's
   two-seed generator, rand_gen.h:19-34) plus xxHash-style position hashing
   (rand_gen.h:125-138).  Scene content (sine-table coefficients, droplet
   start cells, object spawns, universe seeds) depends on the *sequence* of
   draws, so we re-implement the same published generators, vectorized:
   `lcg_*` run the Schrage-decomposed update either on host (numpy) or
   batched on device (jnp int32 — the decomposition keeps every intermediate
   inside int32 range, which is exactly why the reference uses it).

2. **TPU-native counter-based streams** — for everything new (batched kernel
   randomness, per-entity streams) we use `jax.random` threefry keys derived
   from `(seed, stream-id, entity-id)`, which is stateless, order-independent
   and reproducible under any sharding.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Derenzo combined LCG constants (rand_gen.h:22-26)
_M1 = 2147483563
_M2 = 2147483399
_A1, _Q1, _R1 = 40014, 53668, 12211
_A2, _Q2, _R2 = 40692, 52774, 3791
_RANGE = 2147483562  # max output of rand(); randd() divides by _M1


def _schrage(s, a, q, r, m, xp):
    """One Schrage-decomposed LCG step: s <- a*(s%q) - r*(s//q) (+m if <0).

    The decomposition keeps every intermediate within int32, so this runs
    natively on TPU (no 64-bit integer ops required).
    """
    s = a * (s % q) - r * (s // q)
    # add m only where negative (avoids evaluating an overflowing branch)
    return s + (s < 0).astype(s.dtype) * m


def lcg_init(rs1, rs2, xp=np):
    """State tuple from two seeds (rand_gen.h set_state). Accepts arrays."""
    return (xp.asarray(rs1, dtype=xp.int32), xp.asarray(rs2, dtype=xp.int32))


def lcg_next(state, xp=np):
    """Advance; returns (new_state, value) with value in [1, 2147483562].

    Matches rgen_core_t::randome_int (rand_gen.h:22-26): both seeds step,
    output = rseed1 - rseed2 wrapped into [1, 2147483562].
    """
    s1, s2 = state
    s1 = _schrage(s1, _A1, _Q1, _R1, _M1, xp)
    s2 = _schrage(s2, _A2, _Q2, _R2, _M2, xp)
    r = s1 - s2
    r = r + (r < 1).astype(r.dtype) * _RANGE
    return (s1, s2), r


def lcg_rand_float(state, xp=np):
    """rand_float() = 1e-6 * (rand() % 1000000)  (rand_gen.h:86)."""
    state, r = lcg_next(state, xp)
    return state, 1.0e-6 * (r % 1000000).astype(xp.float32)


def lcg_randd(state, xp=np):
    """randd() = rand()/2147483563 as double (gen_object.cpp:377-381)."""
    state, r = lcg_next(state, xp)
    return state, r.astype(xp.float64 if xp is np else xp.float32) / _M1


def lcg_rand_uniform(state, lo, hi, xp=np):
    """rand_uniform(lo, hi) = lo + (hi-lo)*randd()  (rand_gen.h:90)."""
    state, d = lcg_randd(state, xp)
    return state, lo + (hi - lo) * d


class RandGen:
    """Convenience scalar host-side generator mirroring `rand_gen_t`.

    Used by host-side scene generation (config-driven placement etc.) where
    the draw *sequence* defines the content; heavy batched draws should use
    the vectorized `lcg_*` functions or threefry streams instead.
    """

    def __init__(self, rs1: int = 1, rs2: int = 1):
        self.set_state(rs1, rs2)

    def set_state(self, rs1: int, rs2: int) -> None:
        self.s1 = int(rs1)
        self.s2 = int(rs2)

    def rand(self) -> int:
        s1 = _A1 * (self.s1 % _Q1) - _R1 * (self.s1 // _Q1)
        if s1 < 0:
            s1 += _M1
        s2 = _A2 * (self.s2 % _Q2) - _R2 * (self.s2 // _Q2)
        if s2 < 0:
            s2 += _M2
        self.s1, self.s2 = s1, s2
        r = s1 - s2
        if r < 1:
            r += _RANGE
        return r

    def randd(self) -> float:
        return self.rand() / _M1

    def rand_float(self) -> float:
        return 1.0e-6 * (self.rand() % 1000000)

    def rand_uniform(self, lo: float, hi: float) -> float:
        return lo + (hi - lo) * self.randd()

    def rand_int(self, lo: int, hi: int) -> int:
        return self.rand() % (hi - lo + 1) + lo

    def rand_bool(self) -> bool:
        return (self.rand() & 1) != 0

    def rand_mix(self) -> None:
        self.rand()
        self.s1, self.s2 = self.s2, self.s1


def xxhash_u32(buf, seed=0, xp=jnp):
    """xxHash-style position hash (rand_gen.h:127-138); vectorized uint32."""
    buf = xp.asarray(buf, dtype=xp.uint32)
    h = xp.uint32(seed) + xp.uint32(374761393)
    h = h + xp.uint32(4)
    h = h + buf * xp.uint32(3266489917)
    h = ((h << 17) | (h >> 15)) * xp.uint32(668265263)
    h = h ^ (h >> 15)
    h = h * xp.uint32(2246822519)
    h = h ^ (h >> 13)
    h = h * xp.uint32(3266489917)
    h = h ^ (h >> 16)
    return h


# ---- TPU-native streams ----

def key(seed: int, *stream_ids: int) -> jax.Array:
    """Counter-based key for (seed, stream...) — stable across shardings."""
    k = jax.random.key(seed)
    for sid in stream_ids:
        k = jax.random.fold_in(k, sid)
    return k
