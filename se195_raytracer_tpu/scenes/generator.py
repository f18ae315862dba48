"""Procedural scene generators.

``hyper_sphere_scene`` reproduces the reference's fractal hypersphere
generator (scene_build_complex.pl:19-60): a depth-limited recursion that
surrounds each sphere with half-radius children on the 6 axis directions
(skipping the direction it came from), colored by depth. With the default
parameters it emits the same 781-sphere fractal as scenes/complex.scn
(plus the light and ground spheres added by complex_scene() to total 783).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from se195_raytracer_tpu.core.types import SceneSpec

# Opposite-direction ids, matching the perl generator's convention:
# 0: came from -x, 1: from +x, 2: from -y, 3: from +y, 4: from -z, 5: from +z
_OFFSETS = {
    0: (-1.0, 0.0, 0.0),
    1: (1.0, 0.0, 0.0),
    2: (0.0, -1.0, 0.0),
    3: (0.0, 1.0, 0.0),
    4: (0.0, 0.0, -1.0),
    5: (0.0, 0.0, 1.0),
}
_CHILD_DIR = {0: 1, 1: 0, 2: 3, 3: 2, 4: 5, 5: 4}


def hyper_sphere(
    max_depth: float = 4.0,
    pos=(0.0, 0.0, 0.0),
    radius: float = 15.0,
    direction: int = 2,
) -> List[Tuple[float, Tuple[float, float, float], Tuple[float, float, float]]]:
    """Returns [(radius, position, color)] for the fractal."""
    out = []

    def rec(depth: float, p, rad: float, came_from: int):
        if depth > max_depth:
            return
        k = depth / max_depth
        col = (0.75 * (1.0 - k), 0.0, 0.75 * k)
        out.append((rad, tuple(p), col))
        new_rad = rad / 2.0
        for d in range(6):
            if d == came_from:
                continue
            off = _OFFSETS[d]
            child = (
                p[0] + off[0] * (rad + new_rad),
                p[1] + off[1] * (rad + new_rad),
                p[2] + off[2] * (rad + new_rad),
            )
            # A child spawned toward direction d "came from" the opposite side.
            rec(depth + 1.0, child, new_rad, _CHILD_DIR[d])

    rec(0.0, tuple(pos), radius, direction)
    return out


def complex_scene(max_depth: float = 4.0) -> SceneSpec:
    """The 783-sphere complex scene (scenes/complex.scn): a light, a huge
    ground sphere, and the depth-4 fractal."""
    spheres = hyper_sphere(max_depth=max_depth)
    rad = [8.0, 10000.0]
    center = [[50.0, 80.0, 90.0], [0.0, -10050.0, 0.0]]
    emission = [[25.0, 25.0, 25.0], [0.0, 0.0, 0.0]]
    color = [[0.0, 0.0, 0.0], [0.75, 0.75, 0.75]]
    refl = [0, 0]
    for r, p, c in spheres:
        rad.append(r)
        center.append(list(p))
        emission.append([0.0, 0.0, 0.0])
        color.append([c[0], c[1], c[2]])
        refl.append(0)
    return SceneSpec(
        camera_orig=np.array([20.0, 80.0, 150.0], np.float32),
        camera_target=np.array([0.0, 15.0, 0.0], np.float32),
        radius=np.array(rad, np.float32),
        center=np.array(center, np.float32),
        emission=np.array(emission, np.float32),
        color=np.array(color, np.float32),
        refl=np.array(refl, np.int32),
    )
