"""GRAD_BENCH — BASELINE.json config #4 at full size, on real hardware.

Runs Cornell 512x512 inverse rendering end-to-end on the attached TPU
using the differentiable fast path (driver/optimize.py
_render_pallas_diff: fused Pallas PT kernel forward, remat-jnp VJP
backward), and measures the north-star gradient metric ("pixel-grad
max-err vs finite diff", BASELINE.json) at the same resolution.

Reference anchor: the keystroke edit->re-render loop this replaces,
smallptgpu-v1.6/smallptGPU.cpp:784-830 + displayfunc.cpp:252-420; here
the "keystrokes" are optax updates from pixel gradients.

Writes GRAD_BENCH.json:
  {config, loss_curve, step_seconds, recovered_errors,
   pixel_grad_checks: [{param, max_abs_err, p99_abs_err, ref_scale}]}

Usage:  python tools/grad_bench.py [--size 512] [--spp 2] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _fetch(x):
    """Full host sync (block_until_ready is unreliable on axon)."""
    return np.asarray(x)


def pixel_grad_check(scene, cam, cfg, param, idx, eps):
    """Per-pixel gradient field d(img)/d(theta) two ways at full frame:

    * forward-mode ``jax.jvp`` through the remat jnp path (the same
      function whose VJP backs the fast path's backward), and
    * central finite differences of the *Pallas* forward.

    Returns (max_abs_err, p99_abs_err, ref_scale) over all pixels.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from se195_raytracer_tpu.driver.optimize import (
        _render_jnp_diff,
        render_differentiable,
    )

    cfg_fast = cfg
    cfg_jnp = dataclasses.replace(cfg, use_pallas=False)

    arr = getattr(scene, param)
    tangent = jnp.zeros_like(arr).at[idx].set(1.0)

    def f(a):
        return _render_jnp_diff(scene.replace(**{param: a}), cam, cfg_jnp)

    _, jvp_img = jax.jvp(f, (arr,), (tangent,))
    jvp_img = _fetch(jvp_img)

    def render_fast(a):
        return _fetch(
            render_differentiable(scene.replace(**{param: a}), cam, cfg_fast)
        )

    up = render_fast(arr.at[idx].add(eps))
    dn = render_fast(arr.at[idx].add(-eps))
    fd_img = (up - dn) / (2.0 * eps)

    err = np.abs(jvp_img - fd_img)
    scale = float(np.abs(fd_img).max()) or 1.0
    return float(err.max()), float(np.percentile(err, 99)), scale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.15)
    ap.add_argument("--out", default="GRAD_BENCH.json")
    ap.add_argument("--no-pallas", action="store_true",
                    help="use the jnp path for the forward too")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.optimize import (
        OptState,
        l2_image_loss,
        make_inverse_step,
        render_differentiable,
    )
    from se195_raytracer_tpu.scenes.registry import get_scene

    cfg = RenderConfig(
        width=args.size, height=args.size, spp=args.spp, seed=5,
        use_pallas=not args.no_pallas,
    )
    spec = get_scene("cornell")
    scene_true, cam = spec.to_scene(), spec.to_camera()

    print(f"device: {jax.devices()[0]}", flush=True)
    print(f"rendering {args.size}x{args.size} spp={args.spp} target...",
          flush=True)
    t0 = time.perf_counter()
    target = render_differentiable(scene_true, cam, cfg)
    _fetch(target)
    t_target = time.perf_counter() - t0

    # The perturbation of examples/inverse_rendering.py: move the ceiling
    # light, tint the left wall (smooth-gradient parameters; mirror
    # silhouettes are out of scope per SURVEY.md section 7 hard part 2).
    scene0 = scene_true.replace(
        center=scene_true.center.at[8].add(jnp.array([8.0, -5.0, 0.0])),
        color=scene_true.color.at[0].set(jnp.array([0.3, 0.6, 0.3])),
    )

    # zero_nans + clipping: at full frame size a handful of silhouette
    # pixels produce non-finite/huge VJP terms (SURVEY.md §7 hard part 2
    # — visibility step functions); without the guards one bad step
    # poisons the Adam state and the light-center diverges to NaN.
    # Per-group rates: sphere centers live in scene units (tens), albedo
    # in [0,1] — one shared lr either stalls the center or blows up the
    # color, so centers train at 10x the base rate.
    def group_opt(lr):
        return optax.chain(
            optax.zero_nans(),
            optax.clip_by_global_norm(10.0),
            optax.adam(lr),
        )

    optimizer = optax.multi_transform(
        {"geom": group_opt(args.lr * 10.0), "mat": group_opt(args.lr)},
        {"center": "geom", "color": "mat"},
    )
    pf = lambda n: n in ("center", "color")
    trainable0 = {"center": scene0.center, "color": scene0.color}
    st = OptState(scene0, cam, optimizer.init(trainable0), jnp.float32(0.0))
    step = make_inverse_step(target, cfg, optimizer, pf)

    loss_curve = []
    step_seconds = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        st = step(st)
        loss = float(st.loss)  # host sync
        dt = time.perf_counter() - t0
        loss_curve.append(loss)
        step_seconds.append(round(dt, 4))
        if i % max(1, args.steps // 10) == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {loss:.6e}  {dt:.2f}s", flush=True)

    err_center = float(
        np.abs(_fetch(st.scene.center[8]) - _fetch(scene_true.center[8])).max()
    )
    err_color = float(
        np.abs(_fetch(st.scene.color[0]) - _fetch(scene_true.color[0])).max()
    )
    print(f"light-center err {err_center:.3f} (was 8.0), "
          f"wall-albedo err {err_color:.3f} (was 0.45)", flush=True)

    # North-star gradient metric at full frame size. Emission and albedo
    # enter the estimator (near-)linearly -> FD is trustworthy everywhere;
    # light-center moves shadows/silhouettes, so report p99 alongside max.
    li = scene_true.light_indices[0]
    checks = []
    for param, idx, eps, tag in [
        ("emission", (li, 0), 1e-2, "light emission r"),
        ("color", (0, 1), 1e-3, "wall albedo g"),
        ("center", (li, 1), 1e-2, "light center y"),
    ]:
        print(f"pixel-grad FD check: {tag}...", flush=True)
        mx, p99, scale = pixel_grad_check(scene_true, cam, cfg, param, idx, eps)
        checks.append({
            "param": tag, "index": list(idx), "eps": eps,
            "max_abs_err": mx, "p99_abs_err": p99, "fd_scale": scale,
        })
        print(f"  max {mx:.3e}  p99 {p99:.3e}  scale {scale:.3e}", flush=True)

    out = {
        "config": {
            "scene": "cornell", "width": args.size, "height": args.size,
            "spp": args.spp, "steps": args.steps, "lr": args.lr,
            "forward": "pallas" if cfg.use_pallas else "jnp",
            "backward": "remat-jnp-vjp",
            "device": str(jax.devices()[0]),
        },
        "target_render_s": round(t_target, 3),
        "loss_curve": [round(x, 8) for x in loss_curve],
        "step_seconds": step_seconds,
        "median_step_s": round(float(np.median(step_seconds)), 4),
        "loss_reduction": round(loss_curve[0] / max(loss_curve[-1], 1e-12), 2),
        "recovered": {
            "light_center_max_err": round(err_center, 4),
            "wall_albedo_max_err": round(err_color, 4),
        },
        "pixel_grad_checks": checks,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
