"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric (BASELINE.json): rays/sec/chip at Cornell 512x512 8 spp, where a
"ray" is a primary pixel-sample (W*H*spp), matching the reference's
samples/sec caption metric (smallptGPU.cpp:777-781: samples*W*H/elapsed).
Bounce rays are not counted — same convention as the reference.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares against the framework's own CPU-backend throughput for the same
workload measured once on this host (the smallptCPU-vs-smallptGPU
comparison reborn): CPU_BASELINE_RAYS_PER_SEC below.
"""

import json
import time

import numpy as np


# JAX CPU backend, Cornell 128x128 8spp scaled estimate, measured on this
# host (see tools/measure_cpu_baseline.py). Stands in for the reference's
# CPU path (smallptCPU) which cannot run here.
CPU_BASELINE_RAYS_PER_SEC = 8.50e5


def main():
    import jax

    from se195_raytracer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.render import render
    from se195_raytracer_tpu.scenes.registry import get_scene

    spec = get_scene("cornell")
    scene = spec.to_scene()
    camera = spec.to_camera()
    cfg = RenderConfig(width=512, height=512, spp=8, seed=0, use_pallas=True)

    # Warm-up / compile.
    img, state = render(scene, camera, cfg)
    img.block_until_ready()

    # Timed: 3 repetitions of 8 progressive passes, best-of.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        img, state = render(scene, camera, cfg, state=state)
        img.block_until_ready()
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    rays = cfg.width * cfg.height * cfg.spp
    rays_per_sec = rays / elapsed

    assert np.isfinite(np.asarray(img)).all(), "non-finite radiance"

    print(
        json.dumps(
            {
                "metric": "rays/sec/chip Cornell 512x512 8spp",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / CPU_BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
