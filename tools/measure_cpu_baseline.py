"""Measure the CPU-backend throughput constant used by bench.py.

Runs the same Cornell workload on the JAX CPU backend (128x128 to keep it
quick; throughput is per-ray so it transfers to 512x512 within noise) and
prints rays/sec. Update bench.py:CPU_BASELINE_RAYS_PER_SEC with the result.
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.driver.render import render
from se195_raytracer_tpu.scenes.registry import get_scene


def main():
    spec = get_scene("cornell")
    scene = spec.to_scene()
    camera = spec.to_camera()
    cfg = RenderConfig(width=128, height=128, spp=8, seed=0)
    img, state = render(scene, camera, cfg)
    img.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        img, state = render(scene, camera, cfg, state=state)
        img.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    rays = cfg.width * cfg.height * cfg.spp
    print(f"CPU baseline: {rays / best:.3e} rays/sec ({best * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
