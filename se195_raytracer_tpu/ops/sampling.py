"""Sampling ops: uniform sphere sampling and cosine-hemisphere basis.

Reference: smallptgpu-v1.6/geomfunc.h UniformSampleSphere:61-69 and the
diffuse-bounce basis construction inside RadiancePathTracing
(geomfunc.h:242-265).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from se195_raytracer_tpu.core.types import FLOAT_PI


def uniform_sample_sphere(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform point on the unit sphere (geomfunc.h:61-69).

    zz = 1 - 2 u1;  r = sqrt(max(0, 1 - zz^2));  phi = 2 pi u2.
    Args are [...] arrays; returns [..., 3].
    """
    zz = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz * zz))
    phi = jnp.float32(2.0 * FLOAT_PI) * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), zz], axis=-1)


def cosine_sample_dir(
    nl: jnp.ndarray, r1_unit: jnp.ndarray, r2: jnp.ndarray
) -> jnp.ndarray:
    """Cosine-weighted hemisphere direction around ``nl``.

    Exactly the reference construction (geomfunc.h:242-265):
    r1 = 2 pi * u;  r2s = sqrt(r2);
    w = nl;  a = (0,1,0) if |w.x| > .1 else (1,0,0);
    u = normalize(a x w);  v = w x u;
    dir = u cos(r1) r2s + v sin(r1) r2s + w sqrt(1 - r2)
    (the reference does not re-normalize; neither do we).

    Args:
      nl: [R, 3] oriented surface normal.
      r1_unit, r2: [R] uniforms in [0,1).
    """
    r1 = jnp.float32(2.0 * FLOAT_PI) * r1_unit
    r2s = jnp.sqrt(r2)
    w = nl
    a = jnp.where(
        (jnp.abs(w[:, 0]) > 0.1)[:, None],
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    u = jnp.cross(a, w)
    u = u * (1.0 / jnp.sqrt(jnp.sum(u * u, axis=-1, keepdims=True)))
    v = jnp.cross(w, u)
    return (
        u * (jnp.cos(r1) * r2s)[:, None]
        + v * (jnp.sin(r1) * r2s)[:, None]
        + w * jnp.sqrt(jnp.maximum(0.0, 1.0 - r2))[:, None]
    )
