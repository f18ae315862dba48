"""Pallas fused-kernel parity (interpret mode on CPU): the fast path must
agree with the jnp integrator up to float-reassociation noise — identical
RNG streams, near-identical values, a small fraction of pixels allowed to
flip discrete branch decisions (RR/TIR thresholds)."""

import numpy as np
import pytest

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.driver.render import render
from se195_raytracer_tpu.kernels.pt_kernel import render_pallas
from se195_raytracer_tpu.scenes.registry import get_scene


@pytest.mark.parametrize(
    "scene_name,integrator", [("cornell", "pt"), ("simple", "dl")]
)
def test_pallas_matches_jnp(scene_name, integrator):
    spec = get_scene(scene_name)
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=64, height=32, spp=1, seed=4, integrator=integrator)
    img_ref, st_ref = render(scene, cam, cfg)
    img_pal, st_pal = render_pallas(scene, cam, cfg, interpret=True)
    a, b = np.asarray(img_ref), np.asarray(img_pal)
    close = np.isclose(a, b, rtol=2e-3, atol=2e-3)
    frac = 1 - close.mean()
    assert frac <= 0.03, f"{frac:.3%} components differ"
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=2e-3)
    # RNG stream consumption must match except where a branch flipped.
    r = cfg.width * cfg.height
    s0_ref = np.asarray(st_ref.s0)
    s0_pal = np.asarray(st_pal[0])[:r]
    assert (s0_ref != s0_pal).mean() <= 0.01


def test_pallas_loop_kernel_matches_jnp():
    """Scenes above UNROLL_MAX_SPHERES take the fori_loop kernel (scene
    table in SMEM, hit attributes in the loop carry, block-culled sweep
    over the square-block ray layout) — same contract as the unrolled
    kernel: identical RNG streams, float-reassociation-level value
    agreement. Loop scenes lay rays out in tile-block order
    (pt_kernel.ray_layout), so the per-pixel state comparison maps lanes
    back through the layout's inverse."""
    from se195_raytracer_tpu.kernels.pt_kernel import (
        DEF_SUBLANES,
        UNROLL_MAX_SPHERES,
        ray_layout,
    )
    from se195_raytracer_tpu.scenes.generator import complex_scene

    spec = complex_scene(max_depth=3.0)  # 158 spheres
    scene, cam = spec.to_scene(), spec.to_camera()
    assert scene.num_spheres > UNROLL_MAX_SPHERES
    cfg = RenderConfig(width=32, height=16, spp=1, seed=5, max_depth=3)
    img_ref, st_ref = render(scene, cam, cfg)
    img_pal, st_pal = render_pallas(scene, cam, cfg, interpret=True)
    a, b = np.asarray(img_ref), np.asarray(img_pal)
    close = np.isclose(a, b, rtol=2e-3, atol=2e-3)
    assert 1 - close.mean() <= 0.03
    _, _, inv = ray_layout(cfg.width, cfg.height, DEF_SUBLANES, True)
    s0_ref = np.asarray(st_ref.s0)
    s0_pal = np.asarray(st_pal[0])[inv]
    assert (s0_ref != s0_pal).mean() <= 0.01


def test_pallas_counter_rng_matches_jnp():
    """The shard-invariant counter RNG runs in-kernel too; same contract
    as the MWC mode."""
    spec = get_scene("cornell")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=64, height=32, spp=1, seed=6, rng="counter")
    img_ref, st_ref = render(scene, cam, cfg)
    img_pal, st_pal = render_pallas(scene, cam, cfg, interpret=True)
    a, b = np.asarray(img_ref), np.asarray(img_pal)
    close = np.isclose(a, b, rtol=2e-3, atol=2e-3)
    assert 1 - close.mean() <= 0.03
    r = cfg.width * cfg.height
    # Counter streams: s1 is the per-pixel draw counter.
    s1_ref = np.asarray(st_ref.s1)
    s1_pal = np.asarray(st_pal[1])[:r]
    assert (s1_ref != s1_pal).mean() <= 0.01


def test_whitted_pallas_matches_jnp():
    """The fused Whitted heap kernel must agree with the jnp tree tracer
    (models/whitted.py) up to float reassociation — same tree, heap
    accumulation order instead of depth-first."""
    from se195_raytracer_tpu.kernels.whitted_kernel import render_whitted_pallas
    from se195_raytracer_tpu.models.whitted import render_whitted_scene
    from se195_raytracer_tpu.scenes.whitted_scenes import WHITTED_SCENES

    scene = WHITTED_SCENES["room"]()
    kw = dict(width=40, height=30, supersample=2, trace_depth=3)
    img_ref = np.asarray(render_whitted_scene(scene, **kw))
    img_pal = np.asarray(render_whitted_pallas(scene, interpret=True, **kw))
    np.testing.assert_allclose(img_pal, img_ref, rtol=1e-3, atol=2e-2)


def test_whitted_pallas_moved_camera_matches_jnp():
    """The fused kernel's in-kernel camgen is parameterized by the SMEM
    camera row (whitted_camera_row) — a moved look-at viewpoint must
    match the XLA path on the same row, so the fast path is not locked
    to the reference's hard-coded camera."""
    import jax.numpy as jnp
    import numpy as _np

    from se195_raytracer_tpu.kernels.whitted_kernel import render_whitted_pallas
    from se195_raytracer_tpu.models.whitted import (
        render_whitted_scene,
        whitted_camera_row,
    )
    from se195_raytracer_tpu.scenes.whitted_scenes import WHITTED_SCENES

    scene = WHITTED_SCENES["room"]()
    row = jnp.asarray(
        whitted_camera_row(orig=(1.5, 1.0, -6.0), target=(0.0, 0.0, 2.0))
    )
    kw = dict(width=40, height=30, supersample=2, trace_depth=3)
    img_ref = np.asarray(render_whitted_scene(scene, cam_row=row, **kw))
    img_pal = np.asarray(
        render_whitted_pallas(scene, cam_row=row, interpret=True, **kw)
    )
    assert _np.abs(img_ref).max() > 1.0  # scene visible from new viewpoint
    np.testing.assert_allclose(img_pal, img_ref, rtol=1e-3, atol=2e-2)
    # And the default row IS the reference camera (tiny drift allowed:
    # an explicit row is traced data, so XLA can't constant-fold the
    # 1*sx + 0*sy terms it folds on the None path).
    img_default = np.asarray(render_whitted_scene(scene, **kw))
    img_row = np.asarray(
        render_whitted_scene(scene, cam_row=jnp.asarray(whitted_camera_row()), **kw)
    )
    np.testing.assert_allclose(img_row, img_default, atol=1e-2)


def test_pallas_progressive_resume():
    spec = get_scene("cornell")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=32, height=16, spp=1, seed=9)
    img_a, st = render_pallas(scene, cam, cfg, interpret=True)
    img_a2, st = render_pallas(scene, cam, cfg, state=st, interpret=True)
    cfg4 = RenderConfig(width=32, height=16, spp=2, seed=9)
    img_b, _ = render_pallas(scene, cam, cfg4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(img_a2), np.asarray(img_b), rtol=1e-6, atol=1e-6
    )
