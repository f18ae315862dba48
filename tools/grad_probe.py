"""Characterize the pixel-grad-vs-finite-diff failures (VERDICT r3
weak #3): where exactly does max_abs_err live, and what does that pixel
see?

For each checked parameter this renders the JVP field and the central-FD
field with the SAME jnp forward (identical RNG streams, identical f32
rounding between the up/down renders except through the perturbed
parameter), then reports the worst pixels with their primary-hit
classification and neighborhood values — the evidence for whether the
failure is a visibility discontinuity (silhouette/occlusion boundary),
FD quantization, or a backward bug.

Usage: python tools/grad_probe.py [--size 128] [--spp 2] [--cpu]
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--soft", type=float, default=0.0,
                    help="soft_edges relaxation width (0 = hard)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.optimize import _render_jnp_diff
    from se195_raytracer_tpu.ops.intersect import intersect_nearest
    from se195_raytracer_tpu.scenes.registry import get_scene

    cfg = RenderConfig(width=args.size, height=args.size, spp=args.spp,
                       seed=5, soft_edges=args.soft)
    spec = get_scene("cornell")
    scene, cam = spec.to_scene(), spec.to_camera()
    li = scene.light_indices[0]

    # Primary-hit id map for pixel classification (pixel centers, no
    # jitter: good enough to label what a pixel mostly sees).
    from se195_raytracer_tpu.core.types import update_camera
    from se195_raytracer_tpu.driver.render import pixel_coords

    basis = update_camera(cam, cfg.width, cfg.height)
    xs, ys = pixel_coords(cfg.width, cfg.height)
    kcx = (xs + 0.5) / cfg.width - 0.5
    kcy = (ys + 0.5) / cfg.height - 0.5
    rdir = (basis.x[None] * kcx[:, None] + basis.y[None] * kcy[:, None]
            + basis.dir[None])
    rorig = 0.1 * rdir + basis.orig[None]
    rdir = rdir / jnp.linalg.norm(rdir, axis=-1, keepdims=True)
    _, hid, _ = intersect_nearest(scene, rorig, rdir)
    hid = np.asarray(hid).reshape(cfg.height, cfg.width)

    out = {"config": {"size": args.size, "spp": args.spp,
                      "soft_edges": args.soft}}
    for param, idx, eps, tag in [
        ("emission", (li, 0), 1e-2, "light emission r"),
        ("color", (0, 1), 1e-3, "wall albedo g"),
        ("center", (li, 1), 1e-2, "light center y"),
    ]:
        arr = getattr(scene, param)
        tangent = jnp.zeros_like(arr).at[idx].set(1.0)

        def f(a, param=param):
            return _render_jnp_diff(scene.replace(**{param: a}), cam, cfg)

        _, jvp_img = jax.jvp(f, (arr,), (tangent,))
        jvp_img = np.asarray(jvp_img)
        up = np.asarray(f(arr.at[idx].add(eps)))
        dn = np.asarray(f(arr.at[idx].add(-eps)))
        fd = (up - dn) / (2 * eps)
        err = np.abs(jvp_img - fd).max(axis=-1)
        flat = np.argsort(err.ravel())[::-1][:5]
        worst = []
        for p in flat:
            r, c = int(p // cfg.width), int(p % cfg.width)
            worst.append({
                "pixel": [r, c],
                "err": float(err[r, c]),
                "jvp": [float(v) for v in jvp_img[r, c]],
                "fd": [float(v) for v in fd[r, c]],
                "primary_hit": int(hid[r, c]),
                "hit_3x3": [int(v) for v in hid[
                    max(r - 1, 0):r + 2, max(c - 1, 0):c + 2].ravel()],
            })
        scale = float(np.abs(fd).max()) or 1.0
        out[tag] = {
            "fd_scale": scale,
            "max_abs_err": float(err.max()),
            "p99_abs_err": float(np.percentile(
                np.abs(jvp_img - fd), 99)),
            "n_pixels_err_gt_1pct_scale": int((err > 0.01 * scale).sum()),
            "worst": worst,
        }
        print(json.dumps({tag: {k: out[tag][k] for k in
                                ("fd_scale", "max_abs_err", "p99_abs_err",
                                 "n_pixels_err_gt_1pct_scale")}}),
              flush=True)
        print(json.dumps(worst[:3]), flush=True)

    with open("/tmp/grad_probe.json", "w") as fjson:
        json.dump(out, fjson, indent=1)
    print("wrote /tmp/grad_probe.json")


if __name__ == "__main__":
    main()
