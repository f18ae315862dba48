"""On-chip decomposition profile of the whitted5 pallas path.

Times render_whitted5_pallas at 800x600 with the marginal-spp
methodology, then re-times it with the texture fetch monkeypatched to
material color only — isolating the XLA gather cost from the level
kernels + glue.
"""

import time

import numpy as np


def marginal(fn, lo, hi, reps=3):
    """Marginal seconds/spp via (t_hi - t_lo)/(hi - lo), best-of-reps."""
    np.asarray(fn(lo))
    np.asarray(fn(hi))
    tl = th = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(lo))
        tl = min(tl, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(fn(hi))
        th = min(th, time.perf_counter() - t0)
    return tl, th, (th - tl) / (hi - lo)


def main():
    import jax

    from se195_raytracer_tpu.kernels import whitted5_kernel as wk
    from se195_raytracer_tpu.models import whitted5 as w5
    from se195_raytracer_tpu.scenes.whitted5_scenes import WHITTED5_SCENES

    print(jax.devices())
    scene = WHITTED5_SCENES["room5"]()
    W, H = 800, 600
    LO, HI = 1, 8

    def run_pallas(spp):
        return wk.render_whitted5_pallas(scene, width=W, height=H, spp=spp)

    tl, th, per_spp = marginal(run_pallas, LO, HI)
    rate = W * H / per_spp
    print(f"pallas full: lo={tl:.3f}s hi={th:.3f}s per_spp={per_spp:.4f}s "
          f"marginal={rate/1e6:.2f} Mrays/s")

    # --- no-texture variant: stub the color fetch to material color ---
    orig = wk._get_color_planes

    def no_tex(scene, idx, px, py, pz):
        return tuple(scene.color[:, c][idx] for c in range(3))

    wk._get_color_planes = no_tex
    try:
        def run_notex(spp):
            return wk._whitted5_frame_pallas(
                scene, *_rays_state(scene, W, H), spp=spp, trace_depth=4,
                height=H, width=W)

        def _rays_state(scene, w, h):
            o, d = w5.camera_rays5(w, h)
            return o, d, w5._init_state5_np(o.shape[0], 0)

        tl, th, per_spp = marginal(run_notex, LO, HI)
        rate = W * H / per_spp
        print(f"pallas NO-TEX: lo={tl:.3f}s hi={th:.3f}s per_spp={per_spp:.4f}s "
              f"marginal={rate/1e6:.2f} Mrays/s")
    finally:
        wk._get_color_planes = orig

    # --- brute jnp for reference ---
    def run_brute(spp):
        return w5.render_whitted5(scene, width=W, height=H, spp=spp)

    tl, th, per_spp = marginal(run_brute, LO, HI)
    rate = W * H / per_spp
    print(f"jnp brute: lo={tl:.3f}s hi={th:.3f}s per_spp={per_spp:.4f}s "
          f"marginal={rate/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
