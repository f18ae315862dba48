"""Generate golden-image fixtures (tests/goldens/*.npz) on the CPU
backend — the formalized version of the reference's committed golden
outputs (test.bmp, SURVEY.md §4.2). Rerun after any *intended* change to
integrator semantics; tests/test_goldens.py compares fresh renders
against these."""

import os

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.render import render
    from se195_raytracer_tpu.models.whitted import render_whitted_scene
    from se195_raytracer_tpu.models.whitted5 import render_whitted5
    from se195_raytracer_tpu.scenes.registry import get_scene
    from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene
    from se195_raytracer_tpu.scenes.whitted_scenes import room_scene

    for name, integ in [
        ("simple", "pt"),
        ("cornell", "pt"),
        ("cornell", "dl"),
        ("caustic3", "pt"),
    ]:
        spec = get_scene(name)
        cfg = RenderConfig(width=32, height=32, spp=2, seed=13, integrator=integ)
        img, _ = render(spec.to_scene(), spec.to_camera(), cfg)
        path = os.path.join(GOLDEN_DIR, f"smallpt_{name}_{integ}.npz")
        np.savez_compressed(path, image=np.asarray(img))
        print("wrote", path)

    img = render_whitted_scene(room_scene(), width=48, height=36)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "whitted_room.npz"), image=np.asarray(img)
    )
    print("wrote whitted_room")

    # CPU anchor for the real-TPU whitted gate (tests/test_tpu.py): both
    # TPU paths (XLA tree + Pallas heap kernel) are compared against this
    # instead of only each other, so a regression in either is caught and
    # platform float drift (TPU sqrt/div/rsqrt vs CPU, amplified through
    # the 31-node reflect/refract tree) is budgeted once, from measurement.
    img = render_whitted_scene(
        room_scene(), width=80, height=60, supersample=2, trace_depth=4
    )
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "whitted_room_gate.npz"),
        image=np.asarray(img),
    )
    print("wrote whitted_room_gate")

    img = render_whitted5(
        room5_scene(textures="procedural"), width=48, height=36, spp=1, seed=3
    )
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "whitted5_room.npz"), image=np.asarray(img)
    )
    print("wrote whitted5_room")

    # Textured variant with the reference's real .tga assets (scene.cpp:
    # 429,448). Requires the reference mount; the matching test skips if
    # the mount is missing but the golden is committed.
    from se195_raytracer_tpu.scenes.whitted5_scenes import REF_TEXTURES_DIR

    if os.path.isdir(REF_TEXTURES_DIR):
        img = render_whitted5(
            room5_scene(textures="real"), width=48, height=36, spp=1, seed=3
        )
        np.savez_compressed(
            os.path.join(GOLDEN_DIR, "whitted5_room_tga.npz"),
            image=np.asarray(img),
        )
        print("wrote whitted5_room_tga")
    else:
        print("skip whitted5_room_tga (no reference mount)")


if __name__ == "__main__":
    main()
