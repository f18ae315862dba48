"""MT19937 — the raytracer5 quality RNG (twister.{h,cpp}).

The reference's ``Twister`` (raytracer5/trunk/twister.cpp:22-64) is a
standard MT19937 generator — 624-word state, M=397 twist, the classic
u/s/t/l tempering — with a NON-standard seed expansion: a 69069
multiplicative LCG fill (twister.cpp:24-25) followed by an XOR whitening
sweep with the (5531, 81547) LCG + xorshift stream seeded at 373737
(twister.cpp:26-32). SURVEY §2d marks it "no parity needed" (the
framework's integrators use the counter/MWC generators in core/rng.py,
which shard and vectorize); this module carries it for capability
completeness, bit-exactly.

Shapes are TPU-idiomatic: the twist regenerates all 624 words at once as
a vector recurrence (the reference's kk-loop is inherently sequential in
appearance but each output word depends only on PRE-twist words for
kk < N-M and on already-regenerated words for kk >= N-M, which a
two-block vectorized update reproduces exactly), so draws amortize to
one vector op sequence per 624 outputs. A jnp twin of the twist is
provided for on-device block generation.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

N = 624
M = 397
MATRIX_A = np.uint32(0x9908B0DF)
UPPER_MASK = np.uint32(0x80000000)
LOWER_MASK = np.uint32(0x7FFFFFFF)
DEFAULT_SEED = 0xF2710812  # Twister::Twister() (twister.h:14-17)
# float scale, (float)y * 2.3283064370807974e-10f (twister.cpp:63)
FLOAT_SCALE = np.float32(2.3283064370807974e-10)


class MTState(NamedTuple):
    mt: np.ndarray  # [624] uint32
    mti: int


def seed_ref(seed: int = DEFAULT_SEED) -> MTState:
    """Twister::Seed (twister.cpp:22-33): 69069-LCG fill + XOR whitening.

    A zero constructor argument falls back to 0xf2710812 (twister.h:14)."""
    if seed == 0:
        seed = DEFAULT_SEED
    mt = np.empty(N, np.uint64)
    mt[0] = seed & 0xFFFFFFFF
    for i in range(1, N):
        mt[i] = (69069 * mt[i - 1]) & 0xFFFFFFFF
    s = 373737
    for i in range(1, N):
        mt[i] ^= s
        s = (s * 5531 + 81547) & 0xFFFFFFFF
        s = (s ^ (s >> 9) ^ ((s << 19) & 0xFFFFFFFF)) & 0xFFFFFFFF
    # mti = N after seeding: first draw triggers a full twist
    # (twister.cpp:27 leaves mti == mtRand_N).
    return MTState(mt.astype(np.uint32), N)


def _twist_np(mt: np.ndarray) -> np.ndarray:
    """One full 624-word regeneration (twister.cpp:39-55), vectorized.

    The reference's loop reads mt[kk+M] where kk+M wraps: for
    kk < N-M it reads PRE-twist words; for kk >= N-M it reads words the
    same loop already REGENERATED. Concatenating [new_low, old_high]
    reproduces that read pattern without sequential scalar code."""
    y = (mt & UPPER_MASK) | (np.roll(mt, -1) & LOWER_MASK)
    mag = np.where((y & np.uint32(1)).astype(bool), MATRIX_A, np.uint32(0))
    shifted = (y >> np.uint32(1)) ^ mag
    out = np.empty_like(mt)
    # kk in [0, N-M): mt[kk+M] is pre-twist.
    out[: N - M] = mt[M:] ^ shifted[: N - M]
    # kk in [N-M, N): mt[kk+M-N] = out[kk-(N-M)], already written this
    # pass (each index steps DOWN by N-M).
    for kk in range(N - M, N):
        out[kk] = out[kk + M - N] ^ shifted[kk]
    # The reference twists IN PLACE (twister.cpp:53-54), so the final
    # word's y reads mt[0] AFTER iteration 0 overwrote it — the one
    # place the pre-twist roll above is wrong. Redo word N-1 with the
    # regenerated mt[0].
    y_last = (mt[N - 1] & UPPER_MASK) | (out[0] & LOWER_MASK)
    mag_last = MATRIX_A if (y_last & np.uint32(1)) else np.uint32(0)
    out[N - 1] = out[M - 1] ^ (y_last >> np.uint32(1)) ^ mag_last
    return out


def temper(y: np.ndarray) -> np.ndarray:
    """The u/s/t/l tempering chain (twister.cpp:57-61)."""
    y = y ^ (y >> np.uint32(11))
    y = y ^ ((y << np.uint32(7)) & np.uint32(0x9D2C5680))
    y = y ^ ((y << np.uint32(15)) & np.uint32(0xEFC60000))
    y = y ^ (y >> np.uint32(18))
    return y


def rand_u32(state: MTState, n: int = 1) -> Tuple[np.ndarray, MTState]:
    """``n`` draws of Twister::RandL (twister.cpp:66-92)."""
    mt, mti = np.array(state.mt, np.uint32), state.mti
    out = np.empty(n, np.uint32)
    for i in range(n):
        if mti >= N:
            mt = _twist_np(mt)
            mti = 0
        out[i] = temper(mt[mti])
        mti += 1
    return out, MTState(mt, mti)


def rand_float(state: MTState, n: int = 1) -> Tuple[np.ndarray, MTState]:
    """``n`` draws of Twister::Rand (twister.cpp:36-64): uint32 draw
    scaled by 2.3283064370807974e-10f in float32."""
    u, state = rand_u32(state, n)
    return (u.astype(np.float32) * FLOAT_SCALE).astype(np.float32), state


def twist_jnp(mt):
    """jnp twin of ``_twist_np`` for on-device block generation — the
    second (regenerated-reads) region is a 227-step wrap chain; rather
    than a scalar loop, it resolves in ceil(N/(N-M)) = 3 passes of the
    same vector update (each pass fixes the words whose mt[kk+M-N]
    source was produced by the previous pass)."""
    import jax.numpy as jnp

    mt = jnp.asarray(mt, jnp.uint32)
    y = (mt & jnp.uint32(0x80000000)) | (
        jnp.roll(mt, -1) & jnp.uint32(0x7FFFFFFF)
    )
    mag = jnp.where(
        (y & jnp.uint32(1)) != 0, jnp.uint32(0x9908B0DF), jnp.uint32(0)
    )
    shifted = (y >> jnp.uint32(1)) ^ mag
    out = jnp.roll(mt, -M) ^ shifted  # mt[kk+M] pre-twist everywhere
    # Fixpoint passes: positions kk >= N-M must instead read the
    # REGENERATED word at kk+M-N = kk-(N-M), i.e. roll(out, N-M)[kk].
    # Each pass resolves one dependency level; chains step down by
    # N-M = 227 per level, so depth is at most ceil(N/(N-M)) = 3.
    region_b = jnp.arange(N) >= N - M
    for _ in range(3):
        out = jnp.where(region_b, jnp.roll(out, N - M) ^ shifted, out)
    # In-place quirk (see _twist_np): word N-1's y reads the
    # regenerated mt[0].
    y_last = (mt[N - 1] & jnp.uint32(0x80000000)) | (
        out[0] & jnp.uint32(0x7FFFFFFF)
    )
    mag_last = jnp.where(
        (y_last & jnp.uint32(1)) != 0, jnp.uint32(0x9908B0DF), jnp.uint32(0)
    )
    return out.at[N - 1].set(out[M - 1] ^ (y_last >> jnp.uint32(1)) ^ mag_last)


def temper_jnp(y):
    import jax.numpy as jnp

    y = jnp.asarray(y, jnp.uint32)
    y = y ^ (y >> jnp.uint32(11))
    y = y ^ ((y << jnp.uint32(7)) & jnp.uint32(0x9D2C5680))
    y = y ^ ((y << jnp.uint32(15)) & jnp.uint32(0xEFC60000))
    y = y ^ (y >> jnp.uint32(18))
    return y
