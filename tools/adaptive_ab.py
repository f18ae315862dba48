"""ADAPTIVE_AB — the A/B the adaptive supersampler exists for (r4
VERDICT weak #2): adaptive 1-vs-4-ray against FULL 4-ray supersampling
at matched quality, plus the 1-ray brute baseline, all on the fused
pallas+MXU-texel path on the chip.

Quality metric: PSNR against the full-4-ray frame (the reference
algorithm's "always supersample" answer, raytracer.cpp:500-512).
Adaptive should be near-identical to it (they differ only at non-edge
pixels where adaptive kept 1 ray) while costing ~1-ray wall-clock;
1-ray brute is the quality floor that shows the 4-ray target is not
vacuous. Times are best-of-reps e2e (one sync each) AND repeat-slope
marginal (sync cancels).

Writes ADAPTIVE_AB.json. Usage: python tools/adaptive_ab.py [--w 800]
"""

import argparse
import json
import time

import numpy as np


def best_of(fn, reps=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def repeat_slope(fn, reps=4, lo=1, hi=9):
    """Marginal seconds/frame via k-repeat slope (sync cancels)."""
    def run_k(k):
        out = None
        for _ in range(k):
            out = fn()
        np.asarray(out)

    run_k(lo)
    run_k(hi)
    tl = th = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_k(lo)
        tl = min(tl, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_k(hi)
        th = min(th, time.perf_counter() - t0)
    return (th - tl) / (hi - lo)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    peak = float(np.asarray(b).max()) or 1.0
    return 10.0 * np.log10(peak * peak / max(mse, 1e-20))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=800)
    ap.add_argument("--h", type=int, default=600)
    ap.add_argument("--out", default="ADAPTIVE_AB.json")
    args = ap.parse_args()

    import jax

    from se195_raytracer_tpu.kernels.whitted5_kernel import (
        render_whitted5_pallas,
    )
    from se195_raytracer_tpu.models.whitted5 import (
        render_whitted5_4ray,
        render_whitted5_adaptive,
    )
    from se195_raytracer_tpu.scenes.whitted5_scenes import WHITTED5_SCENES

    scene = WHITTED5_SCENES["room5"]()
    w, h = args.w, args.h

    frac_box = {}

    def run_adaptive():
        img, frac = render_whitted5_adaptive(
            scene, width=w, height=h, use_pallas=True
        )
        frac_box["f"] = frac
        return img

    def run_4ray():
        return render_whitted5_4ray(scene, width=w, height=h,
                                    use_pallas=True)

    def run_brute1():
        return render_whitted5_pallas(scene, width=w, height=h, spp=1)

    rows = {}
    imgs = {}
    for name, fn in [("brute1", run_brute1), ("adaptive", run_adaptive),
                     ("full4ray", run_4ray)]:
        imgs[name] = np.asarray(fn())
        rows[name] = {
            "e2e_best_s": round(best_of(fn), 4),
            "marginal_s_per_frame": round(repeat_slope(fn), 4),
        }
    rows["adaptive"]["edge_fraction"] = round(float(frac_box["f"]), 5)

    ref = imgs["full4ray"]
    out = {
        "config": {"scene": "room5", "width": w, "height": h,
                   "path": "pallas + MXU texel unit",
                   "device": str(jax.devices()[0])},
        "rows": rows,
        "psnr_vs_full4ray_db": {
            "adaptive": round(psnr(imgs["adaptive"], ref), 2),
            "brute1": round(psnr(imgs["brute1"], ref), 2),
        },
        "wallclock_ratio_full4ray_over_adaptive": {
            "e2e": round(rows["full4ray"]["e2e_best_s"]
                         / rows["adaptive"]["e2e_best_s"], 2),
            "marginal": round(
                rows["full4ray"]["marginal_s_per_frame"]
                / max(rows["adaptive"]["marginal_s_per_frame"], 1e-9), 2),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
