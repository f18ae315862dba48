"""Measure the CPU-backend throughput baseline used by bench.py.

Runs the same Cornell workload on the JAX CPU backend (128x128 to keep it
quick; throughput is per-ray so it transfers to 512x512 within noise) and
prints rays/sec. bench.py invokes this in a JAX_PLATFORMS=cpu subprocess
with ``--json`` at every run, so ``vs_baseline`` always divides by a
number measured on the machine the benchmark ran on — never by a pasted
constant (the smallptCPU side of the reference's GPU-vs-CPU comparison,
smallptgpu-v1.6/README.txt:36-44, measured live).
"""

import json
import sys
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
    if "--json" in sys.argv:
        print(json.dumps({
            "rays_per_sec": round(rays / best, 1),
            "elapsed_s": round(best, 4),
            "workload": "cornell 128x128 8spp, XLA-CPU backend",
        }))
    else:
        print(f"CPU baseline: {rays / best:.3e} rays/sec ({best * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
