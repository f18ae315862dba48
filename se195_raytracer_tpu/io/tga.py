"""TGA texture loader with the reference's exact (quirky) semantics.

``Texture::Texture(char*)`` (raytracer5/trunk/scene.cpp:38-60) does NOT
parse TGA properly: it takes width/height from header bytes 12-15, then
re-reads the whole file and treats every byte from offset 18 (the standard
TGA header size — the id-field length in byte 0 is ignored) as packed BGR
pixel data in file row order (no bottom-up flip), scaled by 1/256 (not 255):

    m_Bitmap[i] = Color(t[i*3+20], t[i*3+19], t[i*3+18]) / 256

This loader replicates that byte-for-byte so a textured render matches the
reference, including on files where proper TGA decoding would differ.
"""

from __future__ import annotations

import numpy as np


def load_tga(path: str) -> np.ndarray:
    """Returns float32 [H, W, 3] RGB in [0, 1), reference semantics."""
    data = np.fromfile(path, dtype=np.uint8)
    if data.size < 18:
        raise ValueError(f"{path}: too short to be a TGA file")
    width = int(data[12]) + 256 * int(data[13])
    height = int(data[14]) + 256 * int(data[15])
    n = width * height * 3
    if data.size < 18 + n:
        raise ValueError(
            f"{path}: expected {18 + n} bytes for {width}x{height} 24-bpp, "
            f"got {data.size} (reference loader assumes uncompressed type-2)"
        )
    bgr = data[18 : 18 + n].astype(np.float32) * (1.0 / 256.0)
    bgr = bgr.reshape(height, width, 3)
    return np.ascontiguousarray(bgr[..., ::-1])
