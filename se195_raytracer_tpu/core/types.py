"""Core value types: scene pytree, camera, material constants.

TPU-native re-expression of the reference's L1 layer
(smallptgpu-v1.6/vec.h, geom.h:29-47, camera.h:29-34): the AoS
``Sphere {rad, p, e, c, refl}`` array becomes a differentiable SoA pytree of
``jnp`` arrays so that intersection is a batched ``[rays, spheres]``
contraction and every geometric/material field is a gradient leaf.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Material ids — reference geom.h:36-40 (enum Refl { DIFF, SPEC, REFR }).
DIFF = 0
SPEC = 1
REFR = 2

# Reference geom.h:29 (#define EPSILON 0.01f) — smallpt family intersection
# epsilon. The Whitted family uses 0.001f (raytracer_kernel.cl:30); see
# models/whitted.py.
EPSILON = 0.01

FLOAT_PI = float(np.float32(np.pi))


def _ref_is_zero_vec(e: np.ndarray) -> bool:
    """The reference's ``viszero`` macro, bug included.

    vec.h:44 reads ``(((v).x == 0.f) && ((v).x == 0.f) && ((v).z == 0.f))``
    — the y component is never tested (x is tested twice). A sphere with
    emission (0, 5, 0) is therefore *not* treated as a light by the
    reference. We replicate this exactly so light classification matches;
    every shipped scene has symmetric emission so images are unaffected.
    """
    return bool(e[0] == 0.0 and e[2] == 0.0)


@struct.dataclass
class Scene:
    """SoA sphere scene — the differentiable pytree the whole framework runs on.

    Fields mirror reference geom.h:43-47 ``Sphere {rad, p, e, c, refl}``
    in structure-of-arrays form.

    ``light_indices`` is *static* structure (pytree aux data): which spheres
    are emissive, in ascending index order. It is static because the
    reference's ``SampleLights`` (geomfunc.h:112-165) loops spheres in index
    order and draws two RNG values per light — keeping the light set
    structural lets the vectorized integrator consume the RNG stream
    identically while emission *values* stay differentiable.
    """

    center: jnp.ndarray  # [N, 3] float32
    radius: jnp.ndarray  # [N]    float32
    emission: jnp.ndarray  # [N, 3] float32
    color: jnp.ndarray  # [N, 3] float32
    refl: jnp.ndarray  # [N]    int32 — DIFF / SPEC / REFR
    light_indices: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    @property
    def num_spheres(self) -> int:
        return self.center.shape[0]

    @classmethod
    def from_arrays(
        cls,
        center: Any,
        radius: Any,
        emission: Any,
        color: Any,
        refl: Any,
    ) -> "Scene":
        center = jnp.asarray(center, jnp.float32).reshape(-1, 3)
        radius = jnp.asarray(radius, jnp.float32).reshape(-1)
        emission_np = np.asarray(emission, np.float32).reshape(-1, 3)
        lights = tuple(
            int(i)
            for i in range(emission_np.shape[0])
            if not _ref_is_zero_vec(emission_np[i])
        )
        return cls(
            center=center,
            radius=radius,
            emission=jnp.asarray(emission_np),
            color=jnp.asarray(color, jnp.float32).reshape(-1, 3),
            refl=jnp.asarray(refl, jnp.int32).reshape(-1),
            light_indices=lights,
        )

    @classmethod
    def from_spheres(cls, spheres) -> "Scene":
        """Build from a list of (radius, p, e, c, refl) tuples."""
        rad, p, e, c, m = [], [], [], [], []
        for s in spheres:
            rad.append(s[0])
            p.append(s[1])
            e.append(s[2])
            c.append(s[3])
            m.append(s[4])
        return cls.from_arrays(p, rad, e, c, m)


@struct.dataclass
class Camera:
    """Camera pose: position + look-at target (reference camera.h:29-34).

    Differentiable — gradients flow to both fields through the derived basis.
    """

    orig: jnp.ndarray  # [3] float32
    target: jnp.ndarray  # [3] float32

    @classmethod
    def look_at(cls, orig, target) -> "Camera":
        return cls(
            orig=jnp.asarray(orig, jnp.float32),
            target=jnp.asarray(target, jnp.float32),
        )


@struct.dataclass
class CameraBasis:
    """Derived screen basis (reference displayfunc.cpp:182-195 UpdateCamera)."""

    orig: jnp.ndarray  # [3]
    dir: jnp.ndarray  # [3] normalized view direction
    x: jnp.ndarray  # [3] screen-x axis, scaled by width*fov/height
    y: jnp.ndarray  # [3] screen-y axis, scaled by fov


def normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """1/sqrt(dot) normalization (reference vec.h:41 vnorm)."""
    return v * (1.0 / jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True)))


def update_camera(camera: Camera, width: int, height: int) -> CameraBasis:
    """Compute the screen basis exactly as displayfunc.cpp:182-195.

    fov = 45 degrees; x axis scaled by width*fov/height, y axis by fov.
    Fully differentiable w.r.t. camera.orig / camera.target.
    """
    d = camera.target - camera.orig
    d = d * (1.0 / jnp.sqrt(jnp.sum(d * d)))
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    fov = jnp.float32(np.pi / 180.0) * jnp.float32(45.0)
    cx = jnp.cross(d, up)
    cx = cx * (1.0 / jnp.sqrt(jnp.sum(cx * cx)))
    cx = cx * (jnp.float32(width) * fov / jnp.float32(height))
    cy = jnp.cross(cx, d)
    cy = cy * (1.0 / jnp.sqrt(jnp.sum(cy * cy)))
    cy = cy * fov
    return CameraBasis(orig=camera.orig, dir=d, x=cx, y=cy)


@dataclasses.dataclass(frozen=True)
class SceneSpec:
    """Host-side (numpy) scene description used by parsers/builders before
    device placement. Mirrors the `.scn` grammar of displayfunc.cpp:120-180."""

    camera_orig: np.ndarray
    camera_target: np.ndarray
    radius: np.ndarray
    center: np.ndarray
    emission: np.ndarray
    color: np.ndarray
    refl: np.ndarray

    def to_scene(self) -> Scene:
        return Scene.from_arrays(
            self.center, self.radius, self.emission, self.color, self.refl
        )

    def to_camera(self) -> Camera:
        return Camera.look_at(self.camera_orig, self.camera_target)
