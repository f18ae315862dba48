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
    from se195_raytracer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.render import render
    from se195_raytracer_tpu.scenes.registry import get_scene

    spec = get_scene("cornell")
    scene = spec.to_scene()
    camera = spec.to_camera()

    # Synchronization: ``block_until_ready`` does not reliably block on the
    # axon (tunneled-TPU) platform, so every timed region ends with a full
    # host fetch (np.asarray). That fetch costs a fixed ~0.1 s of tunnel
    # readback regardless of work, so the metric is the MARGINAL per-pass
    # rate — the slope between a small and a large sample count. This is
    # the same amortization the reference performs: its adaptive batching
    # re-launches the kernel many times per readback
    # (smallptGPU.cpp:739-755) and its samples/sec caption reflects the
    # batched asymptote.
    def timed(spp: int) -> float:
        cfg = RenderConfig(width=512, height=512, spp=spp, seed=0, use_pallas=True)
        img, state = render(scene, camera, cfg)
        a = np.asarray(img)  # warm-up / compile, full sync
        assert np.isfinite(a).all(), "non-finite radiance"
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            img, state = render(scene, camera, cfg, state=state)
            np.asarray(img)
            best = min(best, time.perf_counter() - t0)
        return best

    spp_lo, spp_hi = 8, 136
    t_lo = timed(spp_lo)
    t_hi = timed(spp_hi)
    per_pass = max((t_hi - t_lo) / (spp_hi - spp_lo), 1e-9)
    rays_per_sec = 512 * 512 / per_pass
    # End-to-end rate at the literal 8-spp workload, INCLUDING the fixed
    # ~0.1 s tunnel sync (the number a one-shot 8-spp render observes;
    # the marginal rate is what sustained progressive rendering observes).
    e2e_rays_per_sec = 512 * 512 * spp_lo / t_lo

    print(
        json.dumps(
            {
                "metric": "rays/sec/chip Cornell 512x512 8spp",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / CPU_BASELINE_RAYS_PER_SEC, 3),
                "value_marginal": round(rays_per_sec, 1),
                "value_e2e": round(e2e_rays_per_sec, 1),
                "e2e_elapsed_s": round(t_lo, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
