"""Random number generation.

Two generators:

1. ``mwc_*`` — a vectorized, bit-exact re-implementation of the reference's
   two-stream multiply-with-carry generator (smallptgpu-v1.6/simplernd.h:34-48
   ``GetRandom``). State is a pair of uint32 arrays threaded through the
   integrator exactly like the reference threads ``seed0/seed1`` through the
   bounce loop. Because the reference draws a *variable* number of samples
   per bounce (per material / per light — geomfunc.h:138,242-243,323), the
   vectorized integrator advances the state under a mask: lanes that would
   not have drawn keep their old state. This reproduces the reference's RNG
   stream exactly per pixel.

2. ``fold_key`` — counter-based stateless keying on top of ``jax.random``
   (threefry), keyed by absolute pixel id so sharded multi-host rendering is
   bitwise shard-invariant. Used when ``RenderConfig.rng == "counter"``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MWCState = Tuple[jnp.ndarray, jnp.ndarray]  # (seed0, seed1) uint32 arrays


def mwc_next(state: MWCState) -> Tuple[jnp.ndarray, MWCState]:
    """One draw of the reference RNG (simplernd.h:34-48), vectorized.

    seed0' = 36969 * (seed0 & 0xffff) + (seed0 >> 16)
    seed1' = 18000 * (seed1 & 0xffff) + (seed1 >> 16)
    ires   = (seed0' << 16) + seed1'            (mod 2^32)
    float  = bits[(ires & 0x007fffff) | 0x40000000]  in [2, 4)
    result = (float - 2) / 2                    in [0, 1)
    """
    s0, s1 = state
    s0 = jnp.uint32(36969) * (s0 & jnp.uint32(0xFFFF)) + (s0 >> 16)
    s1 = jnp.uint32(18000) * (s1 & jnp.uint32(0xFFFF)) + (s1 >> 16)
    ires = (s0 << 16) + s1
    bits = (ires & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x40000000)
    f = jax.lax.bitcast_convert_type(bits, jnp.float32)
    value = (f - jnp.float32(2.0)) * jnp.float32(0.5)
    return value, (s0, s1)


def mwc_next_masked(state: MWCState, mask: jnp.ndarray) -> Tuple[jnp.ndarray, MWCState]:
    """Draw, but only advance state on lanes where ``mask`` is True.

    This is the key device for replicating the reference's data-dependent
    draw counts inside lockstep vectorized code: every lane computes the
    draw, but a lane's seed state only moves forward if the reference would
    actually have consumed a sample there.
    """
    value, (n0, n1) = mwc_next(state)
    s0, s1 = state
    return value, (jnp.where(mask, n0, s0), jnp.where(mask, n1, s1))


def init_mwc_state(shape, seed: int = 0) -> MWCState:
    """Per-pixel seed pairs, >= 2 like the reference's AllocateBuffers
    (smallptCPU.cpp:59-75: ``seeds[i] = rand(); if (seeds[i] < 2) seeds[i]=2``).

    Uses numpy's PCG so seed initialization is host-reproducible; any value
    >= 2 is a valid reference seed.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    s = rng.integers(2, 2**31 - 1, size=(2,) + tuple(shape), dtype=np.uint32)
    return jnp.asarray(s[0]), jnp.asarray(s[1])


def counter_next(state: MWCState) -> Tuple[jnp.ndarray, MWCState]:
    """Counter-based stateless draw (SplitMix32-style mixer).

    State reuses the two-word layout: ``state[0]`` is a per-pixel key
    derived from the *absolute* pixel id (shard-invariant — SURVEY.md §7
    hard part 6), ``state[1]`` is the draw counter. Each draw hashes
    (key, counter) and increments the counter; masked advancement works
    exactly like the MWC mode, so the integrators are generator-agnostic.
    """
    key, ctr = state
    x = key ^ (ctr * jnp.uint32(0x9E3779B9))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x21F0AAAD)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x735A2D97)
    x = x ^ (x >> 15)
    value = (x >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    return value, (key, ctr + jnp.uint32(1))


def counter_next_masked(state: MWCState, mask: jnp.ndarray) -> Tuple[jnp.ndarray, MWCState]:
    value, (key, ctr) = counter_next(state)
    return value, (key, jnp.where(mask, ctr, state[1]))


def init_counter_state(shape, seed: int = 0, pixel_offset: int = 0) -> MWCState:
    """Per-pixel counter-RNG state keyed by absolute pixel id."""
    n = int(np.prod(shape))
    pid = jnp.arange(pixel_offset, pixel_offset + n, dtype=jnp.uint32).reshape(shape)
    seed_word = (seed * 0x85EBCA6B + 0x165667B1) & 0xFFFFFFFF
    key = pid * jnp.uint32(0x9E3779B1) ^ jnp.uint32(seed_word)
    # one mixing round so adjacent pixels decorrelate
    key = key ^ (key >> 16)
    key = key * jnp.uint32(0x7FEB352D)
    key = key ^ (key >> 15)
    return key, jnp.zeros(shape, jnp.uint32)


def next_masked(rng_kind: str):
    """Draw-function lookup used by the integrators."""
    if rng_kind == "mwc":
        return mwc_next_masked
    if rng_kind == "counter":
        return counter_next_masked
    raise ValueError(f"unknown rng kind {rng_kind!r}")


def init_state(rng_kind: str, shape, seed: int = 0) -> MWCState:
    if rng_kind == "mwc":
        return init_mwc_state(shape, seed)
    if rng_kind == "counter":
        return init_counter_state(shape, seed)
    raise ValueError(f"unknown rng kind {rng_kind!r}")


def fold_key(key: jax.Array, pixel_id: jnp.ndarray) -> jax.Array:
    """Counter-based per-pixel key derived from the *absolute* pixel id.

    Deriving from absolute id (not shard-local) makes multi-host output
    bitwise identical to single-device output (SURVEY.md §7 hard part 6).
    """
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(pixel_id)


def mwc_next_host(s0: int, s1: int) -> Tuple[float, int, int]:
    """Scalar host-side reference draw (for oracle/tests)."""
    s0 = (36969 * (s0 & 0xFFFF) + (s0 >> 16)) & 0xFFFFFFFF
    s1 = (18000 * (s1 & 0xFFFF) + (s1 >> 16)) & 0xFFFFFFFF
    ires = ((s0 << 16) + s1) & 0xFFFFFFFF
    bits = np.uint32((ires & 0x007FFFFF) | 0x40000000)
    f = float(bits.view(np.float32)) if hasattr(bits, "view") else 0.0
    f = float(np.frombuffer(np.uint32(bits).tobytes(), dtype=np.float32)[0])
    return (f - 2.0) / 2.0, s0, s1
