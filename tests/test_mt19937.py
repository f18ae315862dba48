"""MT19937 (raytracer5 twister.cpp) — bit-exactness tests.

The generation core (twist + tempering) is standard MT19937, so it is
validated against numpy's independent MT19937 implementation by
injecting our post-seed state into ``np.random.RandomState`` and
comparing raw 32-bit draws. The reference's NON-standard seed expansion
(69069-LCG fill + whitening sweep, twister.cpp:22-33) is validated
against a direct scalar transliteration.
"""

import numpy as np

from se195_raytracer_tpu.core.mt19937 import (
    DEFAULT_SEED,
    FLOAT_SCALE,
    MTState,
    N,
    rand_float,
    rand_u32,
    seed_ref,
    temper_jnp,
    twist_jnp,
    _twist_np,
)


def _seed_scalar(seed):
    """Line-by-line scalar twin of Twister::Seed (twister.cpp:22-33)."""
    mt = [0] * N
    mt[0] = seed & 0xFFFFFFFF
    for i in range(1, N):
        mt[i] = (69069 * mt[i - 1]) & 0xFFFFFFFF
    s = 373737
    for i in range(1, N):
        mt[i] ^= s
        s = (s * 5531 + 81547) & 0xFFFFFFFF
        s = (s ^ (s >> 9) ^ ((s << 19) & 0xFFFFFFFF)) & 0xFFFFFFFF
    return np.array(mt, np.uint32)


def test_seed_expansion_matches_reference_scheme():
    for seed in (DEFAULT_SEED, 1, 12345, 0xDEADBEEF):
        st = seed_ref(seed)
        np.testing.assert_array_equal(st.mt, _seed_scalar(seed))
        assert st.mti == N  # first draw must trigger a twist


def test_zero_seed_falls_back_to_default():
    np.testing.assert_array_equal(seed_ref(0).mt, seed_ref(DEFAULT_SEED).mt)


def test_generation_matches_numpy_mt19937():
    """Twist + tempering vs numpy's MT19937: same state in, same raw
    32-bit stream out (numpy's randint over the full uint32 range
    consumes exactly one generator word per draw)."""
    st = seed_ref(42)
    rs = np.random.RandomState()
    rs.set_state(("MT19937", st.mt.astype(np.uint32), int(st.mti)))
    want = rs.randint(0, 2**32, size=2000, dtype=np.uint64).astype(np.uint32)
    got, _ = rand_u32(st, 2000)
    np.testing.assert_array_equal(got, want)


def test_float_scale_semantics():
    st = seed_ref(7)
    u, _ = rand_u32(st, 256)
    f, _ = rand_float(st, 256)
    np.testing.assert_array_equal(
        f, (u.astype(np.float32) * FLOAT_SCALE).astype(np.float32)
    )
    assert f.dtype == np.float32
    assert (f >= 0).all() and (f < 1.0).all()


def test_jnp_twist_matches_numpy_twist():
    st = seed_ref(9)
    want = _twist_np(st.mt)
    got = np.asarray(twist_jnp(st.mt))
    np.testing.assert_array_equal(got, want)
    # two consecutive twists as well (exercises the wrap chain again)
    np.testing.assert_array_equal(
        np.asarray(twist_jnp(got)), _twist_np(want)
    )
    # tempering twin
    np.testing.assert_array_equal(
        np.asarray(temper_jnp(want)),
        np.vectorize(lambda y: int(_temper_scalar(y)))(want).astype(np.uint32),
    )


def _temper_scalar(y):
    y = int(y)
    y ^= y >> 11
    y ^= (y << 7) & 0x9D2C5680
    y ^= (y << 15) & 0xEFC60000
    y ^= y >> 18
    return y & 0xFFFFFFFF
