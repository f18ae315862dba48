"""Real-TPU regression gates (skipped unless RUN_TPU_TESTS=1; the CPU
suite pins the platform, so run these as
``RUN_TPU_TESTS=1 python -m pytest tests/test_tpu.py -q`` in an
environment with the TPU attached — serialize with other TPU use).

These exist because interpret-mode Pallas tests validate semantics but
NOT Mosaic lowering, and XLA-TPU itself differs from XLA-CPU (bf16 MXU
dots — the self-shadowing bug PARITY.md documents was invisible to the
CPU suite).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu():
    if not os.environ.get("RUN_TPU_TESTS"):
        pytest.skip("RUN_TPU_TESTS not set")
    import jax

    dev = jax.devices()[0]
    if dev.platform in ("cpu",):
        pytest.skip("no TPU attached")
    return dev


def test_pt_pallas_matches_xla_on_tpu(tpu):
    """Fused PT kernel vs XLA path ON TPU: same contract as the
    interpret-mode test — identical RNG streams up to branch flips."""
    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.render import render
    from se195_raytracer_tpu.kernels.pt_kernel import render_pallas
    from se195_raytracer_tpu.scenes.registry import get_scene

    spec = get_scene("cornell")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=64, height=32, spp=1, seed=4)
    img_x, st_x = render(scene, cam, cfg)
    img_p, st_p = render_pallas(scene, cam, cfg)
    a, b = np.asarray(img_x), np.asarray(img_p)
    close = np.isclose(a, b, rtol=2e-3, atol=2e-3)
    assert 1 - close.mean() <= 0.03
    r = cfg.width * cfg.height
    s0x, s0p = np.asarray(st_x.s0), np.asarray(st_p[0])[:r]
    assert (s0x != s0p).mean() <= 0.01


def test_whitted_pallas_matches_xla_on_tpu(tpu):
    """Whitted heap kernel AND XLA tree path ON TPU, both anchored to the
    committed CPU golden (tests/goldens/whitted_room_gate.npz) — the gate
    that would have caught the bf16 einsum self-shadowing bug.

    Tolerances are from a three-way measurement on the chip (r3): TPU
    float semantics (sqrt/div/rsqrt vs CPU) flip near-tie hit winners on
    ~1.1-1.6% of pixels, and the 31-node reflect/refract tree amplifies a
    flip into a large single-pixel diff (max ~48/255). A real lowering
    bug (e.g. the bf16 self-shadowing regression: every wall black) moves
    the MEAN error by orders of magnitude, far past these bounds."""
    import os

    from se195_raytracer_tpu.kernels.whitted_kernel import render_whitted_pallas
    from se195_raytracer_tpu.models.whitted import render_whitted_scene
    from se195_raytracer_tpu.scenes.whitted_scenes import WHITTED_SCENES

    golden = np.load(
        os.path.join(
            os.path.dirname(__file__), "goldens", "whitted_room_gate.npz"
        )
    )["image"]
    scene = WHITTED_SCENES["room"]()
    kw = dict(width=80, height=60, supersample=2, trace_depth=4)
    a = np.asarray(render_whitted_scene(scene, **kw))
    b = np.asarray(render_whitted_pallas(scene, **kw))
    assert np.isnan(a).sum() == 0 and np.isnan(b).sum() == 0
    for name, x in (("xla", a), ("pallas", b)):
        d = np.abs(x - golden).max(axis=-1)  # 0..255 scale
        assert (d > 1.0).mean() <= 0.03, (name, (d > 1.0).mean())
        assert np.abs(x - golden).mean() <= 0.2, (name, np.abs(x - golden).mean())
    d = np.abs(a - b).max(axis=-1)
    assert (d > 1.0).mean() <= 0.03
    assert np.abs(a - b).mean() <= 0.2


def test_whitted5_room_on_tpu(tpu):
    """raytracer5-family tracer ON TPU vs the committed CPU golden —
    covers the levelwise tree, argmin nearest-hit, per-face box slabs,
    area-light MC shadows, and texture gathers under XLA-TPU float
    semantics. Tolerances from a chip measurement (r3): max drift 0.037
    on one silhouette pixel, mean 4e-5, 0.12% of pixels > 0.02."""
    from se195_raytracer_tpu.models.whitted5 import render_whitted5
    from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene

    golden = np.load(
        os.path.join(
            os.path.dirname(__file__), "goldens", "whitted5_room.npz"
        )
    )["image"]
    img = np.asarray(
        render_whitted5(
            room5_scene(textures="procedural"),
            width=48, height=36, spp=1, seed=3,
        )
    )
    assert np.isfinite(img).all()
    d = np.abs(img - golden)
    assert d.mean() <= 2e-3, d.mean()
    assert (d.max(axis=-1) > 0.05).mean() <= 0.01


def test_large_scene_loop_kernel_on_tpu(tpu):
    """783-sphere complex scene through the SMEM fori_loop kernel."""
    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.render import render
    from se195_raytracer_tpu.scenes.registry import get_scene

    spec = get_scene("complex")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=128, height=96, spp=2, use_pallas=True)
    img, _ = render(scene, cam, cfg)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a.max() > 0.01  # scene is lit


def test_whitted5_pallas_on_tpu(tpu):
    """whitted5 fused level kernels ON TPU (Mosaic lowering + the
    component-plane driver) vs the jnp path on the same chip: identical
    RNG streams, so agreement is reassociation-level except where a
    1-ulp geometric drift flips one MC shadow-sample visibility
    (bounded max, tight p99)."""
    from se195_raytracer_tpu.kernels.whitted5_kernel import (
        render_whitted5_pallas,
    )
    from se195_raytracer_tpu.models.whitted5 import render_whitted5
    from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene

    scene = room5_scene()
    a = np.asarray(render_whitted5(scene, width=64, height=48, spp=1, seed=3))
    b = np.asarray(
        render_whitted5_pallas(scene, width=64, height=48, spp=1, seed=3)
    )
    assert np.isfinite(b).all()
    d = np.abs(a - b)
    assert float(np.percentile(d, 99)) < 1e-4, np.percentile(d, 99)
    assert float(d.max()) < 5e-3, d.max()


def test_whitted5_adaptive_on_tpu(tpu):
    """Adaptive 1-vs-4 supersampling ON TPU — the r3 rows SIGILL'd the
    TPU compiler; the split trace/blend dispatches must now run."""
    from se195_raytracer_tpu.models.whitted5 import (
        render_whitted5,
        render_whitted5_adaptive,
    )
    from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene

    scene = room5_scene()
    img, frac = render_whitted5_adaptive(scene, width=80, height=60, seed=3)
    img = np.asarray(img)
    assert img.shape == (60, 80, 3)
    assert np.isfinite(img).all()
    assert 0.0 < frac < 0.5
    assert img.max() > 0.3 and np.abs(img).mean() > 0.01


def test_texel_mxu_bitwise_equals_gather_on_tpu(tpu):
    """The MXU texel unit (kernels/texel_kernel.py) vs the XLA gather
    path ON CHIP: for the reference's u8/256 TGA texels the one-hot
    matmul fetch must be BITWISE equal (bf16 holds u8/256 exactly; one
    nonzero per contraction; reference blend order) — the whole basis
    for routing whitted5 textures through the MXU."""
    from se195_raytracer_tpu.kernels.whitted5_kernel import (
        render_whitted5_pallas,
    )
    from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene

    scene = room5_scene()
    mxu = np.asarray(render_whitted5_pallas(
        scene, width=160, height=120, spp=2, seed=5, use_mxu_texels=True
    ))
    gat = np.asarray(render_whitted5_pallas(
        scene, width=160, height=120, spp=2, seed=5, use_mxu_texels=False
    ))
    assert np.isfinite(mxu).all()
    assert np.array_equal(mxu, gat), np.abs(mxu - gat).max()
