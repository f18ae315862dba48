"""Golden-image regression tests — the formalized version of the
reference's committed golden outputs (test.bmp etc., SURVEY.md §4.2).

Regenerate with tools/make_goldens.py after *intended* semantic changes.
Comparisons allow ulp-level drift (XLA version/vectorization changes)
but catch any behavioral regression."""

import os

import numpy as np
import pytest

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.driver.render import render
from se195_raytracer_tpu.scenes.registry import get_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing — run tools/make_goldens.py")
    with np.load(path) as z:
        return z["image"]


def _check(img, golden):
    img = np.asarray(img)
    close = np.isclose(img, golden, rtol=1e-4, atol=1e-4)
    assert 1 - close.mean() <= 2e-3, (
        f"golden mismatch: {(1 - close.mean()):.3%} of components, "
        f"max {np.abs(img - golden).max()}"
    )


@pytest.mark.parametrize(
    "name,integ", [("simple", "pt"), ("cornell", "pt"), ("cornell", "dl"), ("caustic3", "pt")]
)
def test_smallpt_goldens(name, integ):
    golden = _load(f"smallpt_{name}_{integ}")
    spec = get_scene(name)
    cfg = RenderConfig(width=32, height=32, spp=2, seed=13, integrator=integ)
    img, _ = render(spec.to_scene(), spec.to_camera(), cfg)
    _check(img, golden)


def test_whitted_golden():
    from se195_raytracer_tpu.models.whitted import render_whitted_scene
    from se195_raytracer_tpu.scenes.whitted_scenes import room_scene

    golden = _load("whitted_room")
    img = render_whitted_scene(room_scene(), width=48, height=36)
    _check(img, golden)


def test_whitted5_golden():
    from se195_raytracer_tpu.models.whitted5 import render_whitted5
    from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene

    golden = _load("whitted5_room")
    img = render_whitted5(
        room5_scene(textures="procedural"), width=48, height=36, spp=1, seed=3
    )
    _check(img, golden)


def test_whitted5_golden_real_textures():
    """Textured room with the reference's real marble/checker .tga assets
    (scene.cpp:429,448 via io/tga.py)."""
    from se195_raytracer_tpu.models.whitted5 import render_whitted5
    from se195_raytracer_tpu.scenes.whitted5_scenes import (
        REF_TEXTURES_DIR,
        room5_scene,
    )

    if not os.path.isdir(REF_TEXTURES_DIR):
        pytest.skip("reference texture mount not available")
    golden = _load("whitted5_room_tga")
    img = render_whitted5(
        room5_scene(textures="real"), width=48, height=36, spp=1, seed=3
    )
    _check(img, golden)
