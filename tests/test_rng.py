"""RNG parity: the JAX MWC generator must be bit-identical to the
reference GetRandom (simplernd.h:34-48), including masked advancement."""

import jax.numpy as jnp
import numpy as np

from se195_raytracer_tpu.core.rng import (
    init_mwc_state,
    mwc_next,
    mwc_next_masked,
)
from se195_raytracer_tpu.oracle.smallpt_oracle import get_random


def test_mwc_bit_parity():
    seeds = np.array([12345, 98765], np.uint32)
    ref = [get_random(seeds) for _ in range(64)]
    state = (jnp.array([12345], jnp.uint32), jnp.array([98765], jnp.uint32))
    for i in range(64):
        v, state = mwc_next(state)
        assert np.float32(v[0]) == np.float32(ref[i]), f"draw {i} differs"
    # final states match too
    assert int(state[0][0]) == int(seeds[0])
    assert int(state[1][0]) == int(seeds[1])


def test_mwc_range():
    state = init_mwc_state((1024,), seed=3)
    for _ in range(16):
        v, state = mwc_next(state)
        assert (v >= 0).all() and (v < 1).all()


def test_masked_advancement():
    """Masked lanes keep their state; unmasked lanes advance."""
    s0 = jnp.array([100, 200, 300], jnp.uint32)
    s1 = jnp.array([400, 500, 600], jnp.uint32)
    mask = jnp.array([True, False, True])
    _, (n0, n1) = mwc_next_masked((s0, s1), mask)
    assert int(n0[1]) == 200 and int(n1[1]) == 500
    assert int(n0[0]) != 100 and int(n0[2]) != 300


def test_vectorized_matches_scalar_streams():
    """Each lane of the vectorized generator follows its own scalar stream."""
    rng = np.random.Generator(np.random.PCG64(0))
    s = rng.integers(2, 2**31, size=(2, 8), dtype=np.uint32)
    state = (jnp.asarray(s[0]), jnp.asarray(s[1]))
    refs = [np.array([s[0][l], s[1][l]], np.uint32) for l in range(8)]
    for _ in range(20):
        v, state = mwc_next(state)
        for lane in range(8):
            expected = get_random(refs[lane])
            assert np.float32(v[lane]) == np.float32(expected)
