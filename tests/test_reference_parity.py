"""Parity against the ACTUAL reference C code.

Compiles the reference's own geomfunc.h/simplernd.h (read from the
read-only mount at test time) into a small harness and compares radiance
and final RNG seed state per ray against our vectorized integrator — the
strongest form of the dual-implementation check. Skipped when the
reference mount or a C compiler is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from se195_raytracer_tpu.core.rng import init_mwc_state
from se195_raytracer_tpu.core.types import update_camera
from se195_raytracer_tpu.driver.render import pixel_coords
from se195_raytracer_tpu.models.smallpt import generate_camera_rays, radiance
from se195_raytracer_tpu.scenes.registry import get_scene

REF = "/root/reference/smallptgpu-v1.6"
HARNESS_SRC = os.path.join(os.path.dirname(__file__), "ref_harness", "harness.c")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and shutil.which("gcc")),
    reason="reference mount or gcc unavailable",
)


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    exe = str(tmp_path_factory.mktemp("refh") / "harness")
    subprocess.run(
        ["gcc", "-O2", "-ffp-contract=off", "-I", REF, HARNESS_SRC, "-lm", "-o", exe],
        check=True,
        capture_output=True,
    )
    return exe


def run_reference(exe, scene, origins, dirs, s0, s1, direct):
    lines = [str(scene.num_spheres)]
    c = np.asarray(scene.center)
    r = np.asarray(scene.radius)
    e = np.asarray(scene.emission)
    col = np.asarray(scene.color)
    refl = np.asarray(scene.refl)
    for i in range(scene.num_spheres):
        vals = [r[i], *c[i], *e[i], *col[i]]
        lines.append(
            " ".join(repr(float(v)) for v in vals) + f" {int(refl[i])}"
        )
    m = origins.shape[0]
    lines.append(str(m))
    for i in range(m):
        vals = [*origins[i], *dirs[i]]
        lines.append(
            " ".join(repr(float(v)) for v in vals)
            + f" {int(s0[i])} {int(s1[i])} {int(direct)}"
        )
    out = subprocess.run(
        [exe], input="\n".join(lines) + "\n",
        capture_output=True, text=True, check=True,
    ).stdout
    rows = [line.split() for line in out.strip().splitlines()]
    rad = np.array([[float(v) for v in row[:3]] for row in rows], np.float32)
    fs0 = np.array([int(row[3]) for row in rows], np.uint32)
    fs1 = np.array([int(row[4]) for row in rows], np.uint32)
    return rad, fs0, fs1


@pytest.mark.parametrize("scene_name", ["simple", "cornell", "caustic3"])
@pytest.mark.parametrize("direct", [False, True])
def test_matches_actual_reference_c(harness, scene_name, direct):
    spec = get_scene(scene_name)
    scene = spec.to_scene()
    w = h = 12
    n = w * h
    s0, s1 = init_mwc_state((n,), seed=17)
    basis = update_camera(spec.to_camera(), w, h)
    xs, ys = pixel_coords(w, h)
    # Rays + the seed state the bounce loop starts from.
    o, d, st_cam = generate_camera_rays(basis, (s0, s1), w, h, xs, ys)
    out, st_end = radiance(scene, o, d, st_cam, direct_only=direct)

    ref_rad, ref_s0, ref_s1 = run_reference(
        harness,
        scene,
        np.asarray(o),
        np.asarray(d),
        np.asarray(st_cam[0], np.uint32),
        np.asarray(st_cam[1], np.uint32),
        direct,
    )

    a = np.asarray(out)
    close = np.isclose(a, ref_rad, rtol=5e-3, atol=5e-3)
    frac_bad = 1 - close.mean()
    assert frac_bad <= 0.02, (
        f"{frac_bad:.3%} differ vs actual C reference; "
        f"max {np.abs(a - ref_rad).max()}"
    )
    # RNG stream: final seeds must match except on branch-flipped lanes.
    mism = (np.asarray(st_end[0], np.uint32) != ref_s0).mean()
    assert mism <= 5e-3, f"{mism:.3%} seed streams diverge"
