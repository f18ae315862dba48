"""Intersection op tests: hand values + oracle cross-check (geomfunc.h
SphereIntersect/Intersect/IntersectP semantics)."""

import jax.numpy as jnp
import numpy as np

from se195_raytracer_tpu.core.types import Scene
from se195_raytracer_tpu.ops.intersect import (
    intersect_any,
    intersect_nearest,
    sphere_intersect,
)
from se195_raytracer_tpu.oracle import smallpt_oracle as oracle


def unit_scene():
    return Scene.from_arrays(
        center=[[0.0, 0.0, 0.0], [0.0, 0.0, -5.0]],
        radius=[1.0, 1.0],
        emission=np.zeros((2, 3)),
        color=np.ones((2, 3)) * 0.5,
        refl=[0, 0],
    )


def test_sphere_hit_front():
    sc = unit_scene()
    o = jnp.array([[0.0, 0.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = sphere_intersect(sc, o, d)
    np.testing.assert_allclose(np.asarray(t), [[2.0, 7.0]], rtol=1e-6)


def test_sphere_miss():
    sc = unit_scene()
    o = jnp.array([[0.0, 5.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = sphere_intersect(sc, o, d)
    assert (np.asarray(t) == 0.0).all()


def test_inside_sphere_uses_far_root():
    sc = unit_scene()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = sphere_intersect(sc, o, d)
    np.testing.assert_allclose(np.asarray(t)[0, 0], 1.0, rtol=1e-6)


def test_epsilon_rejects_close_hit():
    """t <= EPSILON (0.01) is rejected, falling through to the far root."""
    sc = unit_scene()
    o = jnp.array([[0.0, 0.0, 1.0 + 0.005]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = sphere_intersect(sc, o, d)
    # near root 0.005 < EPSILON -> far root ~2.005
    np.testing.assert_allclose(np.asarray(t)[0, 0], 2.005, rtol=1e-5)


def test_nearest_tie_break_prefers_larger_index():
    """Reference Intersect iterates N-1..0 with strict <, so equal
    distances resolve to the larger index (geomfunc.h:82-89)."""
    sc = Scene.from_arrays(
        center=[[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
        radius=[1.0, 1.0],
        emission=np.zeros((2, 3)),
        color=np.ones((2, 3)),
        refl=[0, 0],
    )
    o = jnp.array([[0.0, 0.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    _, hid, hit = intersect_nearest(sc, o, d)
    assert bool(hit[0]) and int(hid[0]) == 1


def test_intersect_matches_oracle_random_rays():
    rng = np.random.Generator(np.random.PCG64(7))
    n = 12
    sc = Scene.from_arrays(
        center=rng.uniform(-10, 10, (n, 3)),
        radius=rng.uniform(0.5, 4.0, n),
        emission=np.zeros((n, 3)),
        color=np.ones((n, 3)),
        refl=np.zeros(n, int),
    )
    osc = oracle.OracleScene.from_scene(sc)
    o = rng.uniform(-15, 15, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    t, hid, hit = intersect_nearest(sc, jnp.asarray(o), jnp.asarray(d))
    occ = intersect_any(sc, jnp.asarray(o), jnp.asarray(d), jnp.full((64,), 8.0))
    for i in range(64):
        rhit, rt, rid = oracle.intersect(osc, o[i], d[i])
        assert bool(hit[i]) == rhit
        if rhit:
            np.testing.assert_allclose(float(t[i]), float(rt), rtol=1e-5)
            assert int(hid[i]) == rid
        assert bool(occ[i]) == oracle.intersect_p(osc, o[i], d[i], np.float32(8.0))
