"""Native C++ engine parity: liboracle.so vs the NumPy oracle vs JAX.

The native engine is the framework's equivalent of the reference's
compiled CPU twin (smallptCPU.cpp); remaining differences vs the NumPy
oracle are libm-ulp level (FMA contraction disabled at build)."""

import numpy as np
import pytest

from se195_raytracer_tpu.core.rng import init_mwc_state
from se195_raytracer_tpu.oracle import smallpt_oracle as oracle
from se195_raytracer_tpu.scenes.registry import get_scene

bindings = pytest.importorskip("se195_raytracer_tpu.native.bindings")

if not bindings.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def _seeds(w, h, seed):
    s0, s1 = init_mwc_state((w * h,), seed)
    return np.stack([np.asarray(s0), np.asarray(s1)], 1).reshape(h, w, 2).copy()


@pytest.mark.parametrize("scene_name", ["simple", "cornell"])
@pytest.mark.parametrize("direct_only", [False, True])
def test_native_matches_numpy_oracle(scene_name, direct_only):
    spec = get_scene(scene_name)
    scene = spec.to_scene()
    osc = oracle.OracleScene.from_scene(scene)
    w = h = 12
    seeds = _seeds(w, h, 5)
    img_n, _ = bindings.native_render(
        scene, spec.camera_orig, spec.camera_target, w, h, 2, seeds.copy(),
        direct_only=direct_only,
    )
    ref = oracle.render(
        osc, spec.camera_orig, spec.camera_target, w, h, 2, seeds.copy(),
        direct_only=direct_only,
    )
    close = np.isclose(img_n, ref, rtol=3e-3, atol=3e-3)
    assert 1 - close.mean() <= 0.01, np.abs(img_n - ref).max()


def test_native_matches_jax_render():
    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.render import render

    spec = get_scene("simple")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=16, height=16, spp=2, seed=8)
    img_j, _ = render(scene, cam, cfg)
    seeds = _seeds(16, 16, 8)
    img_n, _ = bindings.native_render(
        scene, spec.camera_orig, spec.camera_target, 16, 16, 2, seeds
    )
    close = np.isclose(np.asarray(img_j), img_n, rtol=2e-3, atol=2e-3)
    assert 1 - close.mean() <= 5e-3


def test_native_progressive_resume():
    spec = get_scene("simple")
    scene = spec.to_scene()
    seeds_a = _seeds(8, 8, 1)
    img1, seeds_a = bindings.native_render(
        scene, spec.camera_orig, spec.camera_target, 8, 8, 2, seeds_a
    )
    img1b, _ = bindings.native_render(
        scene, spec.camera_orig, spec.camera_target, 8, 8, 2, seeds_a,
        sample_start=2, accum=img1,
    )
    seeds_b = _seeds(8, 8, 1)
    img2, _ = bindings.native_render(
        scene, spec.camera_orig, spec.camera_target, 8, 8, 4, seeds_b
    )
    np.testing.assert_array_equal(img1b, img2)


def test_native_bmp_matches_python_writer(tmp_path):
    from se195_raytracer_tpu.io.image import write_bmp

    rng = np.random.Generator(np.random.PCG64(0))
    img = rng.integers(0, 255, (13, 17, 3), dtype=np.uint8)
    py_path = tmp_path / "py.bmp"
    write_bmp(img, str(py_path))
    native_bytes = bindings.native_bmp_bytes(img)
    py_bytes = py_path.read_bytes()
    # Pixel data and geometry must match; reserved header fields may differ.
    assert len(native_bytes) == len(py_bytes)
    assert native_bytes[54:] == py_bytes[54:]
    assert native_bytes[18:26] == py_bytes[18:26]  # width/height
