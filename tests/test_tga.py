"""TGA loader tests — io/tga.py must replicate Texture::Texture
(raytracer5/trunk/scene.cpp:38-60) byte-for-byte."""

import os

import numpy as np
import pytest

from se195_raytracer_tpu.io.tga import load_tga

REF_TEXTURES = "/root/reference/raytracer5/trunk/textures"


def _write_tga(path, w, h, bgr_bytes):
    hdr = bytearray(18)
    hdr[2] = 2  # uncompressed true-color
    hdr[12], hdr[13] = w & 0xFF, w >> 8
    hdr[14], hdr[15] = h & 0xFF, h >> 8
    hdr[16] = 24
    with open(path, "wb") as f:
        f.write(bytes(hdr) + bytes(bgr_bytes))


def test_synthetic_bgr_order_and_scale(tmp_path):
    """Pixel bytes are BGR from offset 18, scaled by 1/256 (not 255)."""
    p = str(tmp_path / "t.tga")
    # one pixel: B=64 G=128 R=192
    _write_tga(p, 1, 1, [64, 128, 192])
    img = load_tga(p)
    assert img.shape == (1, 1, 3)
    np.testing.assert_allclose(img[0, 0], [192 / 256, 128 / 256, 64 / 256])


def test_synthetic_row_order(tmp_path):
    """No bottom-up flip: file row order is kept (the reference ignores the
    origin bit entirely)."""
    p = str(tmp_path / "rows.tga")
    # 1x2: first file row black, second white
    _write_tga(p, 1, 2, [0, 0, 0, 255, 255, 255])
    img = load_tga(p)
    assert img[0, 0, 0] == 0.0 and img[1, 0, 0] == 255 / 256


def test_truncated_file_rejected(tmp_path):
    p = str(tmp_path / "bad.tga")
    _write_tga(p, 4, 4, [0] * 10)  # needs 48 pixel bytes
    with pytest.raises(ValueError, match="expected"):
        load_tga(p)


@pytest.mark.skipif(not os.path.isdir(REF_TEXTURES), reason="no reference mount")
@pytest.mark.parametrize("name", ["checker", "marble", "wood"])
def test_reference_assets_load(name):
    img = load_tga(os.path.join(REF_TEXTURES, f"{name}.tga"))
    h, w, c = img.shape
    assert c == 3 and w > 0 and h > 0
    assert img.min() >= 0.0 and img.max() < 1.0  # /256 keeps 255 -> 0.996
    # a real image, not a constant field
    assert img.std() > 0.01
