"""Scene types for the extended (raytracer5-family) Whitted tracer.

TPU-native form of raytracer5/trunk/scene.h:24-181 — sphere / one-sided
plane / axis-aligned box primitives, full material vector
{color, refl, refr, refr_index, diff, spec, drefl}, optional bilinear
textures with UV scales, and box *area lights* (Box::Light builds the
4x4 jittered shadow grid, scene.cpp:376-404).

Static structure (pytree aux): primitive types, is_light flags, texture
assignment. Everything numeric (geometry, materials, texture bitmaps) is
a differentiable pytree leaf.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

SPHERE5 = 0
PLANE5 = 1
BOX5 = 2

# Box area-light 4x4 jittered grid cell origins, in units of size/4
# (exact table from Box::Light, scene.cpp:381-396).
BOX_LIGHT_GRID = np.array(
    [
        (1, 2), (3, 3), (2, 0), (0, 1),
        (2, 3), (0, 3), (0, 0), (2, 2),
        (3, 1), (1, 3), (1, 0), (3, 2),
        (2, 1), (3, 0), (1, 1), (0, 2),
    ],
    np.float32,
)


@struct.dataclass
class Whitted5Scene:
    # Geometry (unused fields zero for other types).
    center: jnp.ndarray  # [N, 3] sphere center
    radius: jnp.ndarray  # [N] sphere radius
    normal: jnp.ndarray  # [N, 3] plane normal
    depth: jnp.ndarray  # [N] plane D
    box_pos: jnp.ndarray  # [N, 3] box min corner
    box_size: jnp.ndarray  # [N, 3] box size
    # Material (raytracer5 Material, scene.h:43-76).
    color: jnp.ndarray  # [N, 3]
    refl: jnp.ndarray  # [N]
    refr: jnp.ndarray  # [N]
    refr_index: jnp.ndarray  # [N]
    diff: jnp.ndarray  # [N]
    spec: jnp.ndarray  # [N]
    drefl: jnp.ndarray  # [N] diffuse (glossy) reflection radius
    uv_scale: jnp.ndarray  # [N, 2]
    textures: Tuple[jnp.ndarray, ...] = ()  # per-texture [Th, Tw, 3] bitmaps
    # Static structure.
    ptype: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    is_light: Tuple[bool, ...] = struct.field(pytree_node=False, default=())
    tex_id: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    @property
    def num_prims(self) -> int:
        return len(self.ptype)


class Whitted5Builder:
    def __init__(self):
        self.rows = []
        self.textures = []

    def add_texture(self, bitmap: np.ndarray) -> int:
        self.textures.append(jnp.asarray(bitmap, jnp.float32))
        return len(self.textures) - 1

    def _row(self, ptype, **kw):
        base = dict(
            center=(0.0, 0.0, 0.0), radius=0.0,
            normal=(0.0, 0.0, 0.0), depth=0.0,
            box_pos=(0.0, 0.0, 0.0), box_size=(0.0, 0.0, 0.0),
            color=(0.2, 0.2, 0.2), refl=0.0, refr=0.0, refr_index=1.5,
            diff=0.2, spec=0.8, drefl=0.0, uv_scale=(1.0, 1.0),
            is_light=False, tex=-1,
        )
        base.update(kw)
        base["ptype"] = ptype
        self.rows.append(base)
        return self

    def sphere(self, centre, radius, **kw):
        return self._row(SPHERE5, center=tuple(centre), radius=radius, **kw)

    def plane(self, normal, d, **kw):
        return self._row(PLANE5, normal=tuple(normal), depth=d, **kw)

    def box(self, pos, size, **kw):
        return self._row(BOX5, box_pos=tuple(pos), box_size=tuple(size), **kw)

    def build(self) -> Whitted5Scene:
        r = self.rows
        f32 = np.float32
        arr = lambda k: jnp.asarray(np.array([x[k] for x in r], f32))
        return Whitted5Scene(
            center=arr("center"), radius=arr("radius"),
            normal=arr("normal"), depth=arr("depth"),
            box_pos=arr("box_pos"), box_size=arr("box_size"),
            color=arr("color"), refl=arr("refl"), refr=arr("refr"),
            refr_index=arr("refr_index"), diff=arr("diff"),
            spec=arr("spec"), drefl=arr("drefl"), uv_scale=arr("uv_scale"),
            textures=tuple(self.textures),
            ptype=tuple(int(x["ptype"]) for x in r),
            is_light=tuple(bool(x["is_light"]) for x in r),
            tex_id=tuple(int(x["tex"]) for x in r),
        )


# The reference's real texture assets (raytracer5/trunk/textures/{checker,
# marble,wood}.tga, loaded by Texture::Texture, scene.cpp:38-60). Read from
# the read-only mount when available; the procedural stand-ins below are the
# fallback for environments without it.
REF_TEXTURES_DIR = "/root/reference/raytracer5/trunk/textures"


def load_ref_texture(name: str, textures_dir: str = REF_TEXTURES_DIR) -> np.ndarray:
    """Loads one of the reference's .tga assets with the reference's own
    (quirky) decoder semantics — see io/tga.py."""
    from se195_raytracer_tpu.io.tga import load_tga

    return load_tga(os.path.join(textures_dir, f"{name}.tga"))


def checker_texture(size: int = 64, scale: int = 8) -> np.ndarray:
    """Procedural stand-in for textures/checker.tga, used when the reference
    texture assets are unavailable."""
    ij = np.indices((size, size)).sum(axis=0) // scale
    c = (ij % 2).astype(np.float32)
    return np.stack([c, c, c], axis=-1) * 0.8 + 0.2


def marble_texture(size: int = 64, seed: int = 0) -> np.ndarray:
    """Procedural marble-ish texture (sine-warped noise)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    noise = rng.random((size, size)).astype(np.float32)
    # cheap smoothing
    for _ in range(3):
        noise = 0.25 * (
            noise
            + np.roll(noise, 1, 0)
            + np.roll(noise, 1, 1)
            + np.roll(noise, (1, 1), (0, 1))
        )
    x = np.linspace(0, 4 * np.pi, size, dtype=np.float32)
    veins = 0.5 + 0.5 * np.sin(x[None, :] + 6.0 * noise)
    col = np.stack([veins, veins * 0.95, veins * 0.9], axis=-1)
    return (0.4 + 0.6 * col).astype(np.float32)


def room5_scene(textures: str = "auto") -> Whitted5Scene:
    """The hard-coded raytracer5 room (Scene::InitScene, scene.cpp:415-542):
    checker-textured ground plane, marble-textured big sphere (scene.cpp:
    429,448), glossy sphere, degenerate third sphere, 3 box area lights,
    back plane, box pillar, bright box ceiling, refractive ceiling plane.

    textures: 'real' = the reference's .tga assets (requires the mount),
    'procedural' = the stand-ins, 'auto' = real if the mount exists.
    """
    if textures == "auto":
        textures = "real" if os.path.isdir(REF_TEXTURES_DIR) else "procedural"
    b = Whitted5Builder()
    if textures == "real":
        checker = b.add_texture(load_ref_texture("checker"))
        marble = b.add_texture(load_ref_texture("marble"))
    elif textures == "procedural":
        checker = b.add_texture(checker_texture())
        marble = b.add_texture(marble_texture())
    else:
        raise ValueError(f"textures must be auto|real|procedural, got {textures!r}")
    b.plane((0, 1, 0), 4.4, refl=0.0, refr=0.0, diff=1.0, spec=0.5,
            color=(0.7, 0.7, 0.7), tex=checker, uv_scale=(0.45, 0.45))
    b.sphere((0, -0.8, 7), 2.0, refl=0.05, refr=0.0, refr_index=1.3,
             diff=0.5, spec=0.8, color=(2.7, 2.7, 3.0), tex=marble,
             uv_scale=(0.8, 0.8))
    b.sphere((-5, -0.8, 7), 2.0, refl=0.5, refr=0.0, refr_index=1.3,
             diff=0.1, color=(0.7, 0.7, 1.0), drefl=0.6)
    b.sphere((5, -0.8, 7), 0.0, refl=0.5, refr=0.0, refr_index=1.3,
             diff=0.1, color=(0.7, 0.7, 1.0))
    h = 5.0
    lc = (0.5, 0.5, 0.5)
    b.box((-1, h, 4), (2, 0.1, 2), is_light=True, color=lc)
    b.box((-6, h, 4), (2, 0.1, 2), is_light=True, color=lc)
    b.box((4, h, 4), (2, 0.1, 2), is_light=True, color=lc)
    b.plane((0, 0, -1), 10.4, refl=0.0, refr=0.0, diff=1.7,
            color=(0.4, 0.3, 0.3))
    b.box((4, -2, 0.5), (0.25, 3.5, 12), refl=0.2, refr=0.0, diff=0.1,
          color=(2.7, 2.7, 3.0))
    b.box((-15.0, h + 0.1, 2.5), (30.0, 0.25, 30.0), refl=0.0, refr=0.0,
          diff=0.0, color=(12.7, 12.7, 13.0))
    b.plane((0, 1, 0), 5.0, refl=0.0, refr=0.5, diff=0.0,
            color=(0.4, 0.3, 0.3))
    return b.build()


# Scene registry for the raytracer5 family (CLI --integrator whitted5
# resolves --scene here; "room5" is Scene::InitScene, scene.cpp:415-542).
WHITTED5_SCENES = {
    "room5": room5_scene,
    "room5_procedural": lambda: room5_scene(textures="procedural"),
}
