"""Tone mapping / pixel packing (reference vec.h:62 ``toInt``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def to_int(x: jnp.ndarray) -> jnp.ndarray:
    """Gamma-2.2 byte mapping: int(pow(clamp(x,0,1), 1/2.2) * 255 + .5)."""
    c = jnp.clip(x, 0.0, 1.0)
    return (jnp.power(c, jnp.float32(1.0 / 2.2)) * 255.0 + 0.5).astype(jnp.int32)


def to_srgb_bytes(radiance: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] float radiance -> [..., 3] uint8 image via to_int."""
    return to_int(radiance).astype(jnp.uint8)


def to_int_np(x: np.ndarray) -> np.ndarray:
    c = np.clip(x, 0.0, 1.0).astype(np.float32)
    return (np.power(c, np.float32(1.0 / 2.2)) * 255.0 + 0.5).astype(np.int32)


def pack_rgba(radiance: jnp.ndarray) -> jnp.ndarray:
    """Pack [..., 3] radiance into uint32 0x00BBGGRR words — the packed
    pixel format of rendering_kernel.cl:91-93
    (``toInt(r) | toInt(g) << 8 | toInt(b) << 16``)."""
    b = to_int(radiance).astype(jnp.uint32)
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
