"""Depth-sweep probe for the Whitted Pallas kernel: isolates per-node cost
from tree-walk overhead. Not part of the bench matrix."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from se195_raytracer_tpu.kernels.whitted_kernel import render_whitted_pallas
    from se195_raytracer_tpu.scenes.whitted_scenes import WHITTED_SCENES

    scene = WHITTED_SCENES["room"]()
    w, h = 800, 600
    rays = w * h * 9
    for depth in [int(a) for a in (sys.argv[1:] or ["0", "1", "2", "5"])]:
        el = timed(
            lambda: render_whitted_pallas(scene, width=w, height=h, trace_depth=depth)
        )
        print(
            f"depth={depth} nodes={2**(depth+1)-1}: {el*1e3:.1f} ms "
            f"{rays/el/1e6:.2f} Mrays/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
