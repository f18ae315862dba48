"""Quick Whitted-kernel perf probe (real TPU). Times room+grid 800x600 3x3
on the Pallas path and prints rays/s. Used while iterating on
kernels/whitted_kernel.py; not part of the bench matrix."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps=3):
    np.asarray(fn())  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scenes = sys.argv[1:] or ["room", "grid"]
    from se195_raytracer_tpu.kernels.whitted_kernel import render_whitted_pallas
    from se195_raytracer_tpu.scenes.whitted_scenes import WHITTED_SCENES

    w, h = 800, 600
    rays = w * h * 9
    for name in scenes:
        scene = WHITTED_SCENES[name]()
        t0 = time.perf_counter()
        el = timed(lambda: render_whitted_pallas(scene, width=w, height=h))
        print(
            f"{name}: {el*1e3:.1f} ms  {rays/el/1e6:.2f} Mrays/s  "
            f"(compile+3reps {time.perf_counter()-t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
