"""Interactive session (keystroke edit loop) tests."""

import numpy as np

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.driver.session import RenderSession
from se195_raytracer_tpu.scenes.registry import get_scene


def make_session():
    spec = get_scene("simple")
    cfg = RenderConfig(width=16, height=16, spp=1, seed=2)
    return RenderSession(spec.to_scene(), spec.to_camera(), cfg)


def test_progressive_then_edit_resets_accumulation():
    s = make_session()
    s.step(2)
    assert s.current_sample == 2
    img_before = s._image.copy()
    s.key("w")  # move camera forward
    assert s.current_sample == 0
    img_after = s.step(2)
    assert not np.allclose(img_before, img_after)


def test_edit_keeps_seeds_refresh_resets_them():
    s = make_session()
    s.step(1)
    seeds_before = np.asarray(s.state.s0).copy()
    s.key("4")  # move selected sphere: ReInitScene keeps seeds
    np.testing.assert_array_equal(np.asarray(s.state.s0), seeds_before)
    s.key(" ")  # refresh: ReInit(1) reallocates seeds AND they reset to init
    s2 = make_session()
    np.testing.assert_array_equal(np.asarray(s.state.s0), np.asarray(s2.state.s0))


def test_step_for_adaptive_batching():
    """step_for: one pass per call before 20 samples (interactive phase),
    multi-pass batches within the budget after (smallptGPU.cpp:739-755)."""
    s = make_session()
    s.step_for(0.05)
    assert s.current_sample == 1  # below 20: exactly one pass
    s.step(25)
    before = s.current_sample
    img = s.step_for(0.02)
    assert s.current_sample > before  # at least one pass, maybe batches
    assert img.shape == (16, 16, 3)


def test_sphere_selection_and_move():
    s = make_session()
    s.key("+")
    s.key("+")
    assert s.current_sphere == 2
    before = np.asarray(s.scene.center[2]).copy()
    s.key("6")
    after = np.asarray(s.scene.center[2])
    np.testing.assert_allclose(after - before, [5.0, 0.0, 0.0])
    s.key("-")
    assert s.current_sphere == 1


def test_rotation_changes_target_only():
    s = make_session()
    orig = np.asarray(s.camera.orig).copy()
    tgt = np.asarray(s.camera.target).copy()
    s.key("left")
    np.testing.assert_array_equal(np.asarray(s.camera.orig), orig)
    assert not np.allclose(np.asarray(s.camera.target), tgt)


def test_save_image(tmp_path):
    s = make_session()
    s.step(1)
    out = tmp_path / "snap.ppm"
    s.key("p", path=str(out))
    from se195_raytracer_tpu.io.image import read_ppm

    img = read_ppm(str(out))
    assert img.shape == (16, 16, 3)


def test_esc_returns_false():
    s = make_session()
    assert s.key("\x1b") is False


def test_step_for_bounded_compile_churn(monkeypatch):
    """The wall-clock batching loop may only ever request spp values from
    the fixed STEP_LADDER — at most 3 distinct render programs per session
    (each distinct spp jits one program)."""
    s = make_session()
    requested = set()
    orig_step = RenderSession.step

    def spy(self, samples=1):
        requested.add(samples)
        return orig_step(self, samples)

    monkeypatch.setattr(RenderSession, "step", spy)
    s.step(25)  # past the interactive phase
    requested.clear()
    for _ in range(3):
        s.step_for(0.05)
    assert requested <= set(RenderSession.STEP_LADDER)
    assert len(requested) <= 3
