"""Checkpoint round-trip + metrics smoke tests."""

import numpy as np

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.driver.checkpoint import (
    load_render_state,
    save_render_state,
)
from se195_raytracer_tpu.driver.render import render
from se195_raytracer_tpu.scenes.registry import get_scene
from se195_raytracer_tpu.utils.metrics import (
    MetricsLogger,
    device_inventory,
    render_metrics,
)


def test_checkpoint_roundtrip_resume(tmp_path):
    spec = get_scene("simple")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=16, height=16, spp=2, seed=3)
    img1, st = render(scene, cam, cfg)
    path = str(tmp_path / "ckpt.npz")
    save_render_state(path, st)
    st2 = load_render_state(path)
    img_a, _ = render(scene, cam, cfg, state=st)
    img_b, _ = render(scene, cam, cfg, state=st2)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))


def test_device_inventory_shape():
    inv = device_inventory()
    assert inv["device_count"] >= 1
    assert inv["devices"][0]["platform"] == "cpu"


def test_render_metrics_and_logger(capsys):
    m = render_metrics(64, 64, 4, 0.5, pass_index=3)
    assert m["rays_per_sec"] == 32768.0
    import io

    buf = io.StringIO()
    MetricsLogger(buf).log("step", **m)
    line = buf.getvalue().strip()
    import json

    rec = json.loads(line)
    assert rec["event"] == "step" and rec["pass"] == 3
