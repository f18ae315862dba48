"""Built-in scene registry.

Python builders for the reference's scene zoo: the hard-coded Cornell array
(scene.h:30-40 CornellSpheres) and SCENE_TEST (scene.h:43-49), the `.scn`
zoo (scenes/simple.scn, cornell.scn, cornell_large.scn, caustic.scn,
caustic3.scn) and the generated complex scene (scene_build_complex.pl →
scenes/complex.scn). Scene *data* is re-encoded as Python builders so the
framework is self-contained; the `.scn` parser (scenes/parser.py) loads
external files with the same grammar.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

from se195_raytracer_tpu.core.types import DIFF, REFR, SPEC, SceneSpec
from se195_raytracer_tpu.scenes.generator import complex_scene

WALL_RAD = 10000.0


def _spec(cam_o, cam_t, spheres) -> SceneSpec:
    """spheres: list of (rad, (px,py,pz), (ex,ey,ez), (cx,cy,cz), mat)."""
    return SceneSpec(
        camera_orig=np.array(cam_o, np.float32),
        camera_target=np.array(cam_t, np.float32),
        radius=np.array([s[0] for s in spheres], np.float32),
        center=np.array([s[1] for s in spheres], np.float32),
        emission=np.array([s[2] for s in spheres], np.float32),
        color=np.array([s[3] for s in spheres], np.float32),
        refl=np.array([s[4] for s in spheres], np.int32),
    )


def cornell() -> SceneSpec:
    """The hard-coded Cornell box (scene.h:30-40), camera from the GPU main
    (smallptGPU.cpp:847-851 uses the .scn camera; wall radius 1e4)."""
    w = WALL_RAD
    z = (0.0, 0.0, 0.0)
    return _spec(
        (50.0, 45.0, 205.6),
        (50.0, 44.957388, 204.6),
        [
            (w, (w + 1.0, 40.8, 81.6), z, (0.75, 0.25, 0.25), DIFF),  # left
            (w, (-w + 99.0, 40.8, 81.6), z, (0.25, 0.25, 0.75), DIFF),  # right
            (w, (50.0, 40.8, w), z, (0.75, 0.75, 0.75), DIFF),  # back
            (w, (50.0, 40.8, -w + 270.0), z, z, DIFF),  # front
            (w, (50.0, w, 81.6), z, (0.75, 0.75, 0.75), DIFF),  # bottom
            (w, (50.0, -w + 81.6, 81.6), z, (0.75, 0.75, 0.75), DIFF),  # top
            (16.5, (27.0, 16.5, 47.0), z, (0.9, 0.9, 0.9), SPEC),  # mirror
            (16.5, (73.0, 16.5, 78.0), z, (0.9, 0.9, 0.9), REFR),  # glass
            (7.0, (50.0, 66.6, 81.6), (12.0, 12.0, 12.0), z, DIFF),  # light
        ],
    )


def cornell_scn() -> SceneSpec:
    """scenes/cornell.scn — same geometry as cornell() with the wall sphere
    centers written out numerically (10001, -9901, ..., -9730 front wall
    with black color)."""
    w = WALL_RAD
    z = (0.0, 0.0, 0.0)
    return _spec(
        (50.0, 45.0, 205.6),
        (50.0, 44.957388, 204.6),
        [
            (w, (10001.0, 40.8, 81.6), z, (0.75, 0.25, 0.25), DIFF),
            (w, (-9901.0, 40.8, 81.6), z, (0.25, 0.25, 0.75), DIFF),
            (w, (50.0, 40.8, 10000.0), z, (0.75, 0.75, 0.75), DIFF),
            (w, (50.0, 40.8, -9730.0), z, z, DIFF),
            (w, (50.0, 10000.0, 81.6), z, (0.75, 0.75, 0.75), DIFF),
            (w, (50.0, -9918.4, 81.6), z, (0.75, 0.75, 0.75), DIFF),
            (16.5, (27.0, 16.5, 47.0), z, (0.9, 0.9, 0.9), SPEC),
            (16.5, (73.0, 16.5, 78.0), z, (0.9, 0.9, 0.9), REFR),
            (7.0, (50.0, 66.6, 81.6), (12.0, 12.0, 12.0), z, DIFF),
        ],
    )


def cornell_large() -> SceneSpec:
    """scenes/cornell_large.scn — pulled-back camera, shifted walls."""
    w = WALL_RAD
    z = (0.0, 0.0, 0.0)
    return _spec(
        (50.0, 45.0, 295.6),
        (50.0, 44.957388, 294.6),
        [
            (w, (10001.0, 40.8, 81.6), z, (0.75, 0.25, 0.25), DIFF),
            (w, (-9801.0, 40.8, 81.6), z, (0.25, 0.25, 0.75), DIFF),
            (w, (50.0, 40.8, 10000.0), z, (0.75, 0.75, 0.75), DIFF),
            (w, (50.0, 40.8, -9530.0), z, (0.75, 0.75, 0.75), DIFF),
            (w, (50.0, 10000.0, 81.6), z, (0.75, 0.75, 0.75), DIFF),
            (w, (50.0, -9818.4, 81.6), z, (0.75, 0.75, 0.75), DIFF),
            (16.5, (27.0, 16.5, 47.0), z, (0.9, 0.9, 0.9), SPEC),
            (16.5, (73.0, 16.5, 78.0), z, (0.9, 0.9, 0.9), REFR),
            (7.0, (50.0, 66.6, 81.6), (12.0, 12.0, 12.0), z, DIFF),
        ],
    )


def simple() -> SceneSpec:
    """scenes/simple.scn — 5 diffuse spheres + light."""
    z = (0.0, 0.0, 0.0)
    return _spec(
        (20.0, 80.0, 300.0),
        (0.0, 15.0, 0.0),
        [
            (1000.0, (0.0, -1000.0, 0.0), z, (0.75, 0.75, 0.75), DIFF),
            (10.0, (35.0, 10.0, 0.0), z, (0.75, 0.0, 0.0), DIFF),
            (15.0, (-35.0, 15.0, 0.0), z, (0.0, 0.75, 0.0), DIFF),
            (20.0, (0.0, 20.0, -35.0), z, (0.0, 0.0, 0.75), DIFF),
            (8.0, (0.0, 60.0, 0.0), (15.0, 15.0, 15.0), z, DIFF),
        ],
    )


def scene_test() -> SceneSpec:
    """scene.h:43-49 SCENE_TEST — ground + 3 diffuse spheres + light."""
    z = (0.0, 0.0, 0.0)
    return _spec(
        (20.0, 80.0, 300.0),
        (0.0, 15.0, 0.0),
        [
            (1000.0, (0.0, -1000.0, 0.0), z, (0.75, 0.75, 0.75), DIFF),
            (15.0, (10.0, 15.0, 0.0), z, (0.75, 0.0, 0.0), DIFF),
            (20.0, (-40.0, 20.0, 0.0), z, (0.0, 0.0, 0.75), DIFF),
            (10.0, (-5.0, 10.0, 20.0), z, (0.0, 0.75, 0.0), DIFF),
            (10.0, (-30.0, 100.0, 20.0), (12.0, 12.0, 12.0), z, DIFF),
        ],
    )


def caustic() -> SceneSpec:
    """scenes/caustic.scn — one refractive sphere over a ground plane."""
    z = (0.0, 0.0, 0.0)
    return _spec(
        (20.0, 80.0, 300.0),
        (0.0, 40.0, 0.0),
        [
            (1000.0, (0.0, -1000.0, 0.0), z, (0.75, 0.75, 0.75), DIFF),
            (15.0, (0.0, 30.0, 0.0), z, (0.9, 0.9, 0.9), REFR),
            (15.0, (0.0, 100.0, 0.0), (15.0, 15.0, 15.0), z, DIFF),
        ],
    )


def caustic3() -> SceneSpec:
    """scenes/caustic3.scn — three colored refractive spheres."""
    z = (0.0, 0.0, 0.0)
    return _spec(
        (20.0, 100.0, 300.0),
        (0.0, 25.0, 0.0),
        [
            (1000.0, (0.0, -1000.0, 0.0), z, (0.75, 0.75, 0.75), DIFF),
            (10.0, (35.0, 15.0, 0.0), z, (0.9, 0.0, 0.0), REFR),
            (15.0, (-35.0, 20.0, 0.0), z, (0.0, 0.9, 0.0), REFR),
            (20.0, (0.0, 25.0, -35.0), z, (0.0, 0.0, 0.9), REFR),
            (8.0, (0.0, 60.0, 0.0), (15.0, 15.0, 15.0), z, DIFF),
        ],
    )


SCENES: Dict[str, Callable[[], SceneSpec]] = {
    "cornell": cornell,
    "cornell_scn": cornell_scn,
    "cornell_large": cornell_large,
    "simple": simple,
    "scene_test": scene_test,
    "caustic": caustic,
    "caustic3": caustic3,
    "complex": complex_scene,
}


def get_scene(name: str) -> SceneSpec:
    try:
        return SCENES[name]()
    except KeyError:
        raise KeyError(f"unknown scene {name!r}; known: {sorted(SCENES)}") from None


def list_scenes() -> List[str]:
    return sorted(SCENES)
