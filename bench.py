"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric (BASELINE.json): rays/sec/chip at Cornell 512x512 8 spp, where a
"ray" is a primary pixel-sample (W*H*spp), matching the reference's
samples/sec caption metric (smallptGPU.cpp:777-781: samples*W*H/elapsed).
Bounce rays are not counted — same convention as the reference.

Measurement methodology (r5 — replaces r4's two-point slope, whose
committed spread was 2x):
* ``value`` is the e2e rate of the literal 8-spp workload including the
  fixed per-dispatch tunnel sync, median of ``REPS`` runs (spread
  reported). This is the number a user of the 8-spp config observes.
* ``value_marginal`` is the sustained progressive rate from a
  LEAST-SQUARES fit of median elapsed vs spp over SPP_GRID
  {8, 136, 264, 520}: t = a + b*spp, marginal = W*H/b. The intercept
  absorbs the fixed sync; four points + R^2 expose nonlinearity or a
  bad rep instead of hiding them in a two-point slope. Per-rep fits
  (pairing each point's k-th order statistic) give the spread.
* A VPU flop-budget ceiling is computed from the scene (ops/ray x
  assumed 4e12 f32 op/s VPU peak) and the marginal rate is asserted
  physically possible against it. The r3 "2.29 Grays/s" violated this
  by ~50x; the check makes that class of artifact impossible to commit.
* ``vs_baseline`` divides by the framework's own CPU-backend throughput
  on the same scene, measured AT RUNTIME in a JAX_PLATFORMS=cpu
  subprocess (the smallptCPU-vs-smallptGPU comparison reborn,
  README.txt:36-44) — not a pasted constant. Falls back to the last
  measured constant only if the subprocess fails.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPS = 5
SPP_GRID = (8, 136, 264, 520)  # least-squares fit axis (r5)
VPU_F32_OPS = 4.0e12  # assumed v5e VPU f32 peak (8x128 lanes, ~4 ops/cyc)
# Fallback only (see module docstring): JAX-CPU Cornell rays/s measured
# 2026-08-21 on this 2-core host via tools/measure_cpu_baseline.py.
CPU_BASELINE_FALLBACK = 8.50e5


def ops_per_ray(n_spheres: int, n_lights: int, max_depth: int) -> float:
    """Conservative (low) estimate of f32 VPU ops per primary ray for the
    fused PT kernel: per bounce, a nearest sweep (~15 ops/sphere), one
    NEE shadow sweep per light (~12 ops/sphere + ~45 setup), and ~70 ops
    of shading/RNG/bookkeeping; plus ~25 ops of camera-gen. Counting low
    makes the derived rays/s ceiling HIGH, so the physicality assert
    stays conservative."""
    per_bounce = 15.0 * n_spheres + n_lights * (12.0 * n_spheres + 45.0) + 70.0
    return 25.0 + max_depth * per_bounce


def measure_cpu_baseline_rays_per_sec() -> tuple[float, str]:
    """Run tools/measure_cpu_baseline.py in a CPU-backend subprocess and
    parse its JSON line. Returns (rays_per_sec, source)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        out = subprocess.run(
            [sys.executable, os.path.join("tools", "measure_cpu_baseline.py"),
             "--json"],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return float(json.loads(line)["rays_per_sec"]), "measured"
    except Exception:
        pass
    return CPU_BASELINE_FALLBACK, "fallback-constant"


def main():
    from se195_raytracer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.render import render
    from se195_raytracer_tpu.scenes.registry import get_scene

    spec = get_scene("cornell")
    scene = spec.to_scene()
    camera = spec.to_camera()
    w = h = 512

    # ``block_until_ready`` does not reliably block on the axon
    # (tunneled-TPU) platform, so every timed region ends with a full
    # host fetch (np.asarray) — its fixed cost is why the marginal rate
    # is measured from a LARGE spp delta (see module docstring).
    def timed(spp: int, reps: int = REPS) -> list[float]:
        cfg = RenderConfig(width=w, height=h, spp=spp, seed=0, use_pallas=True)
        img, state = render(scene, camera, cfg)
        a = np.asarray(img)  # warm-up / compile, full sync
        assert np.isfinite(a).all(), "non-finite radiance"
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            img, state = render(scene, camera, cfg, state=state)
            np.asarray(img)
            times.append(time.perf_counter() - t0)
        return times

    times = {spp: timed(spp) for spp in SPP_GRID}
    meds = np.array([float(np.median(times[s])) for s in SPP_GRID])
    grid = np.array(SPP_GRID, np.float64)

    def fit(ys):
        """OLS t = a + b*spp; returns (b, r2)."""
        b, a = np.polyfit(grid, ys, 1)
        pred = a + b * grid
        ss_res = float(((ys - pred) ** 2).sum())
        ss_tot = float(((ys - ys.mean()) ** 2).sum())
        return float(b), 1.0 - ss_res / max(ss_tot, 1e-30)

    slope, r2 = fit(meds)
    marginal = w * h / max(slope, 1e-12)
    # Per-rep fits (k-th order statistic at every grid point) -> spread.
    rep_slopes = []
    for k in range(REPS):
        ys = np.array([sorted(times[s])[k] for s in SPP_GRID])
        bk, _ = fit(ys)
        rep_slopes.append(w * h / max(bk, 1e-12))
    lo_med = meds[0]
    e2e = w * h * SPP_GRID[0] / lo_med
    t_lo = times[SPP_GRID[0]]
    hi_med = meds[-1]

    # Physicality ceiling: the Pallas PT path is VPU-bound f32 vector
    # work; rays/s cannot exceed VPU peak / ops-per-ray.
    opr = ops_per_ray(scene.num_spheres, len(scene.light_indices),
                      RenderConfig().max_depth)
    ceiling = VPU_F32_OPS / opr
    assert marginal < ceiling, (
        f"marginal {marginal:.3e} rays/s exceeds the VPU flop-budget "
        f"ceiling {ceiling:.3e} (ops/ray~{opr:.0f}) — measurement artifact"
    )

    cpu_rays, cpu_src = measure_cpu_baseline_rays_per_sec()

    print(
        json.dumps(
            {
                "metric": "rays/sec/chip Cornell 512x512 8spp",
                "value": round(e2e, 1),
                "unit": "rays/s",
                "vs_baseline": round(e2e / cpu_rays, 3),
                "value_e2e": round(e2e, 1),
                "e2e_spread_s": [round(min(t_lo), 4), round(max(t_lo), 4)],
                "value_marginal": round(marginal, 1),
                "marginal_spread": [
                    round(min(rep_slopes), 1), round(max(rep_slopes), 1)
                ],
                "marginal_fit_r2": round(r2, 5),
                "marginal_fit_points": {
                    str(s): round(float(np.median(times[s])), 4)
                    for s in SPP_GRID
                },
                "marginal_vs_baseline": round(marginal / cpu_rays, 3),
                "elapsed_lo_s": round(float(lo_med), 4),
                "elapsed_hi_s": round(float(hi_med), 4),
                "vpu_ceiling_rays_per_sec": round(ceiling, 1),
                "vpu_utilization_pct_of_ceiling": round(
                    100.0 * marginal / ceiling, 1
                ),
                "cpu_baseline_rays_per_sec": round(cpu_rays, 1),
                "cpu_baseline_source": cpu_src,
            }
        )
    )


if __name__ == "__main__":
    main()
