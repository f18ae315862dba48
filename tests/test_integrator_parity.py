"""Integrator parity: the vectorized JAX integrators must match the scalar
float32 CPU oracle per pixel, with identical RNG streams — the framework's
version of the reference's dual-implementation cross-check (SURVEY.md §4.1:
smallptCPU vs smallptGPU compiled from the same geomfunc.h)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.core.rng import init_mwc_state
from se195_raytracer_tpu.driver.render import render
from se195_raytracer_tpu.models.smallpt import radiance
from se195_raytracer_tpu.oracle import smallpt_oracle as oracle
from se195_raytracer_tpu.scenes.registry import get_scene


def _ray_grid(spec, width, height, seeds_np):
    """Scalar oracle camera rays for every pixel, advancing seeds."""
    basis = oracle.update_camera(
        spec.camera_orig, spec.camera_target, width, height
    )
    origins, dirs = [], []
    for row in range(height):
        y = height - 1 - row
        for x in range(width):
            ro, rd = oracle.generate_camera_ray(
                basis, seeds_np[row * width + x], width, height, x, y
            )
            origins.append(ro)
            dirs.append(rd)
    return np.array(origins, np.float32), np.array(dirs, np.float32)


def _compare(jax_img, ref_img, frac_tol=2e-3, close_rtol=2e-3, close_atol=2e-3):
    """Allclose allowing a tiny fraction of divergent pixels (float32
    branch decisions — RR, TIR, near-tangent hits — can flip between
    libm implementations; SURVEY.md §7 hard part 4)."""
    jax_img = np.asarray(jax_img)
    close = np.isclose(jax_img, ref_img, rtol=close_rtol, atol=close_atol)
    frac_bad = 1.0 - close.mean()
    assert frac_bad <= frac_tol, (
        f"{frac_bad:.2%} of components differ; "
        f"max abs diff {np.abs(jax_img - ref_img).max()}"
    )


@pytest.mark.parametrize("scene_name", ["simple", "caustic"])
@pytest.mark.parametrize("direct_only", [False, True])
def test_radiance_matches_oracle(scene_name, direct_only):
    spec = get_scene(scene_name)
    scene = spec.to_scene()
    osc = oracle.OracleScene.from_scene(scene)
    w = h = 16

    n = w * h
    s0, s1 = init_mwc_state((n,), seed=11)
    seeds_np = np.stack([np.asarray(s0), np.asarray(s1)], axis=1).copy()

    # Oracle: camera rays + radiance, threading seeds scalar-wise.
    ro, rd = _ray_grid(spec, w, h, seeds_np)
    ref = np.zeros((n, 3), np.float32)
    for i in range(n):
        ref[i] = oracle.radiance(osc, ro[i], rd[i], seeds_np[i], direct_only)

    # JAX: same camera-ray step then batched radiance.
    from se195_raytracer_tpu.core.types import update_camera
    from se195_raytracer_tpu.models.smallpt import generate_camera_rays
    from se195_raytracer_tpu.driver.render import pixel_coords

    basis = update_camera(spec.to_camera(), w, h)
    xs, ys = pixel_coords(w, h)
    o2, d2, st = generate_camera_rays(basis, (s0, s1), w, h, xs, ys)
    np.testing.assert_allclose(np.asarray(o2), ro, rtol=1e-5, atol=1e-5)
    out, st = radiance(scene, o2, d2, st, direct_only=direct_only)
    _compare(out, ref)
    # seed states must also agree (bit-exact RNG stream consumption)
    mism0 = (np.asarray(st[0]) != seeds_np[:, 0]).mean()
    mism1 = (np.asarray(st[1]) != seeds_np[:, 1]).mean()
    assert mism0 <= 2e-3 and mism1 <= 2e-3, (mism0, mism1)


@pytest.mark.slow
def test_full_render_matches_oracle_simple():
    """End-to-end: render() vs oracle.render, SCENE_SIMPLE 32x32, 2 spp
    (BASELINE config #1 scaled down for CI speed)."""
    spec = get_scene("simple")
    scene = spec.to_scene()
    osc = oracle.OracleScene.from_scene(scene)
    w = h = 32
    spp = 2
    cfg = RenderConfig(width=w, height=h, spp=spp, seed=5)

    state0 = None
    img, state = render(scene, spec.to_camera(), cfg)

    s0, s1 = init_mwc_state((w * h,), seed=5)
    seeds_np = (
        np.stack([np.asarray(s0), np.asarray(s1)], axis=1)
        .reshape(h, w, 2)
        .copy()
    )
    ref = oracle.render(
        osc, spec.camera_orig, spec.camera_target, w, h, spp, seeds_np
    )
    _compare(img, ref.reshape(h, w, 3))


def test_render_progressive_resume():
    """render() twice with carried state == one render with 2x spp."""
    spec = get_scene("simple")
    scene = spec.to_scene()
    cam = spec.to_camera()
    cfg1 = RenderConfig(width=16, height=16, spp=2, seed=9)
    cfg2 = RenderConfig(width=16, height=16, spp=4, seed=9)
    img_a, st = render(scene, cam, cfg1)
    img_a2, st = render(scene, cam, cfg1, state=st)
    img_b, _ = render(scene, cam, cfg2)
    np.testing.assert_allclose(
        np.asarray(img_a2), np.asarray(img_b), rtol=1e-6, atol=1e-6
    )


def test_ray_tile_equivalence():
    """Chunked (ray_tile) rendering must be bitwise identical to unchunked."""
    spec = get_scene("caustic3")
    scene = spec.to_scene()
    cam = spec.to_camera()
    cfg_full = RenderConfig(width=16, height=16, spp=2, seed=4)
    cfg_tile = RenderConfig(width=16, height=16, spp=2, seed=4, ray_tile=64)
    img_a, _ = render(scene, cam, cfg_full)
    img_b, _ = render(scene, cam, cfg_tile)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
