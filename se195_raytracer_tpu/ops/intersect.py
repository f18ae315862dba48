"""Batched ray-sphere intersection ops (L2).

TPU-native form of the reference's intersection layer
(smallptgpu-v1.6/geomfunc.h: SphereIntersect:32-59, Intersect:71-92,
IntersectP:94-110): the per-work-item "loop over all spheres" becomes one
``[rays, spheres]`` vectorized test plus an argmin, which XLA maps onto the
VPU (and which the Pallas fast path tiles through VMEM).

Numerical note: we intentionally compute ``op = center - origin`` first and
dot products elementwise (not via the matmul expansion
``p.d - o.d`` / ``|p|^2 - 2 p.o + |o|^2``) because the Cornell scenes use
1e4-radius wall spheres where the expansion loses ~3 decimal digits to
cancellation. Elementwise keeps float32 semantics aligned with the
reference.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from se195_raytracer_tpu.core.types import EPSILON, Scene

# geomfunc.h:80 — initial nearest-hit distance. Host-side np scalar, NOT
# jnp: a module-level jnp constant initializes the XLA backend at import
# time, which breaks jax.distributed.initialize in multi-process runs
# (it must run before ANY backend use — scripts/multihost_bench.py).
import numpy as _np

_INF = _np.float32(1e20)


def sphere_intersect(
    scene: Scene, origin: jnp.ndarray, direction: jnp.ndarray
) -> jnp.ndarray:
    """Distances from each ray to each sphere; 0 where no hit.

    Exact float32 semantics of geomfunc.h:32-59: solve
    ``t^2 + 2 t (o-p).d + |o-p|^2 - R^2 = 0``; return ``b - sqrt(det)`` if
    > EPSILON, else ``b + sqrt(det)`` if > EPSILON, else 0.

    Args:
      origin:    [R, 3]
      direction: [R, 3]
    Returns:
      [R, N] float32 distances (0 = miss).
    """
    op = scene.center[None, :, :] - origin[:, None, :]  # [R, N, 3]
    b = jnp.sum(op * direction[:, None, :], axis=-1)  # [R, N]
    det = b * b - jnp.sum(op * op, axis=-1) + (scene.radius * scene.radius)[None, :]
    hit_mask = det >= 0.0
    # Safe value 1.0 (not 0.0) on miss lanes: sqrt'(0) = inf would turn the
    # zero cotangent of unselected lanes into NaN in the backward pass.
    sq = jnp.sqrt(jnp.where(hit_mask, det, 1.0))
    t1 = b - sq
    t2 = b + sq
    eps = jnp.float32(EPSILON)
    t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, 0.0))
    return jnp.where(hit_mask, t, 0.0)


def intersect_nearest(
    scene: Scene, origin: jnp.ndarray, direction: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest-hit over all spheres.

    Reference Intersect (geomfunc.h:71-92) iterates spheres from N-1 down
    to 0 and updates on strict ``d < t`` — so among equal distances the
    *largest* index wins. We reproduce that tie-break by argmin over the
    reversed sphere axis.

    Returns:
      (t [R], hit_id [R] int32, hit [R] bool)
    """
    d = sphere_intersect(scene, origin, direction)  # [R, N]
    dm = jnp.where(d != 0.0, d, _INF)
    n = dm.shape[-1]
    rev_idx = jnp.argmin(dm[:, ::-1], axis=-1)
    hit_id = (n - 1) - rev_idx
    t = jnp.take_along_axis(dm, hit_id[:, None], axis=-1)[:, 0]
    hit = t < _INF
    return t, hit_id.astype(jnp.int32), hit


def _sphere_intersect_gradsafe(
    scene: Scene, origin: jnp.ndarray, direction: jnp.ndarray
) -> jnp.ndarray:
    """``sphere_intersect`` with a derivative-safe discriminant floor.

    The hard path's ``sqrt(where(det >= 0, det, 1))`` passes det == +0.0
    through — an exactly-tangent ray (it happens at full frame size in
    f32) then has sqrt'(0) = inf and one NaN pixel in the soft-mode JVP
    (found by debug_nans on the chip, r4). Flooring at 1e-30 changes
    values only for det in (0, 1e-30) — below f32 visibility downstream,
    and the TPU flushes that subnormal range to zero anyway — while
    bounding the tangent. Used by the soft-visibility relaxation's
    nearest-hit; the hard path keeps the reference-exact form."""
    op = scene.center[None, :, :] - origin[:, None, :]
    b = jnp.sum(op * direction[:, None, :], axis=-1)
    det = b * b - jnp.sum(op * op, axis=-1) + (scene.radius * scene.radius)[None, :]
    hit_mask = det >= 0.0
    sq = jnp.sqrt(jnp.where(hit_mask, jnp.maximum(det, 1e-30), 1.0))
    t1 = b - sq
    t2 = b + sq
    eps = jnp.float32(EPSILON)
    t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, 0.0))
    return jnp.where(hit_mask, t, 0.0)


def intersect_nearest_excluding(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    exclude: Tuple[int, ...],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest-hit restricted to spheres NOT in the static ``exclude``
    index set — used by the soft-visibility relaxation, which handles
    emissive spheres analytically (models/smallpt.py soft_edges) so the
    geometric winner must be chosen among the others. Same reversed
    argmin tie-break as ``intersect_nearest``; derivative-safe
    discriminant (see _sphere_intersect_gradsafe)."""
    d = _sphere_intersect_gradsafe(scene, origin, direction)  # [R, N]
    dm = jnp.where(d != 0.0, d, _INF)
    if exclude:
        cols = jnp.zeros((dm.shape[-1],), bool)
        for j in exclude:
            cols = cols.at[j].set(True)
        dm = jnp.where(cols[None, :], _INF, dm)
    n = dm.shape[-1]
    rev_idx = jnp.argmin(dm[:, ::-1], axis=-1)
    hit_id = (n - 1) - rev_idx
    t = jnp.take_along_axis(dm, hit_id[:, None], axis=-1)[:, 0]
    hit = t < _INF
    return t, hit_id.astype(jnp.int32), hit


def intersect_any(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    max_t: jnp.ndarray,
) -> jnp.ndarray:
    """Any-hit (shadow) predicate — reference IntersectP (geomfunc.h:94-110).

    Returns [R] bool: True if any sphere is hit strictly closer than max_t.
    """
    d = sphere_intersect(scene, origin, direction)  # [R, N]
    return jnp.any((d != 0.0) & (d < max_t[:, None]), axis=-1)
