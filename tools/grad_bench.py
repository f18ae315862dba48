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
  {config, optimizer, hard/soft: {loss_curve, interior_loss_curve,
   best_step, best_loss, recovered_at_best, recovered_at_final, ...},
   pixel_grad_checks: [{param, max_abs_err, p99_abs_err, fd_scale}]}

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


def pixel_grad_check(scene, cam, cfg, param, idx, eps, soft=0.0):
    """Per-pixel gradient field d(img)/d(theta) two ways at full frame:

    * forward-mode ``jax.jvp`` through the remat jnp path (the same
      function whose VJP backs the fast path's backward), and
    * central finite differences of the SAME jnp forward.

    FD must difference the estimator the JVP differentiates: r3 ran FD
    on the Pallas forward, so sub-ulp implementation drift between the
    two f32 programs (separately pinned by the kernel parity tests)
    divided by 2*eps masqueraded as gradient error — e.g. the committed
    0.666 max on the (exactly linear!) emission check. ``soft > 0`` runs
    both sides with the differentiable-visibility relaxation
    (RenderConfig.soft_edges), the mode whose gradients are defined
    ACROSS silhouettes.

    Returns (max_abs_err, p99_abs_err, ref_scale) over all pixels.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from se195_raytracer_tpu.driver.optimize import _render_jnp_diff

    cfg_jnp = dataclasses.replace(cfg, use_pallas=False, soft_edges=soft)

    arr = getattr(scene, param)
    tangent = jnp.zeros_like(arr).at[idx].set(1.0)

    def f(a):
        return _render_jnp_diff(scene.replace(**{param: a}), cam, cfg_jnp)

    _, jvp_img = jax.jvp(f, (arr,), (tangent,))
    jvp_img = _fetch(jvp_img)

    up = _fetch(f(arr.at[idx].add(eps)))
    dn = _fetch(f(arr.at[idx].add(-eps)))
    fd_img = (up - dn) / (2.0 * eps)

    err = np.abs(jvp_img - fd_img)
    scale = float(np.abs(fd_img).max()) or 1.0
    return float(err.max()), float(np.percentile(err, 99)), scale


def light_capsule_mask(scene_true, scene0, cam, width, height, li,
                       margin=1.4, nseg=17):
    """Boolean [H, W] mask of pixels whose primary ray can see the
    emissive disk ANYWHERE along the optimization path (the segment
    from scene0's light center to the true one), dilated by ``margin``.

    These are the pixels where the hard estimator's visibility step
    makes the L2 gradient-blind; the loss restricted to the COMPLEMENT
    ("interior" pixels) is the component the optimizer can actually
    descend, and its curve is the evidence for the hard-mode note."""
    import jax.numpy as jnp

    from se195_raytracer_tpu.core.types import update_camera
    from se195_raytracer_tpu.driver.render import pixel_coords

    basis = update_camera(cam, width, height)
    xs, ys = pixel_coords(width, height)
    kcx = (np.asarray(xs, np.float32) + 0.5) / width - 0.5
    kcy = (np.asarray(ys, np.float32) + 0.5) / height - 0.5
    bdir = np.asarray(basis.dir)
    bx, by = np.asarray(basis.x), np.asarray(basis.y)
    d = bdir[None] + bx[None] * kcx[:, None] + by[None] * kcy[:, None]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    orig = np.asarray(basis.orig)

    c0 = np.asarray(scene0.center[li])
    c1 = np.asarray(scene_true.center[li])
    rad = float(np.asarray(scene_true.radius[li]))
    mask = np.zeros(d.shape[0], bool)
    for t in np.linspace(0.0, 1.0, nseg):
        c = c0 + t * (c1 - c0)
        v = c - orig
        dist = np.linalg.norm(v)
        cosang = (d @ v) / dist
        ang = np.arccos(np.clip(cosang, -1.0, 1.0))
        half = np.arcsin(min(rad / dist, 1.0)) * margin + 0.01
        mask |= ang < half
    return jnp.asarray(mask.reshape(height, width))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.15)
    ap.add_argument("--out", default="GRAD_BENCH.json")
    ap.add_argument("--no-pallas", action="store_true",
                    help="use the jnp path for the forward too")
    ap.add_argument("--soft", type=float, default=0.5,
                    help="soft_edges width for the relaxed run/checks")
    ap.add_argument("--interior-every", type=int, default=4,
                    help="steps between interior-masked loss samples")
    ap.add_argument("--sched-alpha", type=float, default=0.25,
                    help="cosine-decay floor as a fraction of base lr")
    ap.add_argument("--geom-mult-soft", type=float, default=3.0,
                    help="soft-mode geometry lr multiplier (the relaxed "
                    "estimator's silhouette gradients are strong — the "
                    "hard mode's 10x boost overshoots)")
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
    # LR schedule (r4 VERDICT weak #3: the soft run overshot its own
    # best iterate with a constant rate): cosine decay to 5% over the
    # run, per group.
    def group_opt(lr):
        sched = optax.cosine_decay_schedule(lr, decay_steps=args.steps,
                                            alpha=args.sched_alpha)
        return optax.chain(
            optax.zero_nans(),
            optax.clip_by_global_norm(10.0),
            optax.adam(sched),
        )

    def make_optimizer(geom_mult):
        return optax.multi_transform(
            {"geom": group_opt(args.lr * geom_mult),
             "mat": group_opt(args.lr)},
            {"center": "geom", "color": "mat"},
        )

    pf = lambda n: n in ("center", "color")
    trainable0 = {"center": scene0.center, "color": scene0.color}

    li0 = scene_true.light_indices[0]
    interior_keep = ~light_capsule_mask(
        scene_true, scene0, cam, args.size, args.size, li0
    )
    mask_frac = float(1.0 - np.asarray(interior_keep).mean())

    def run_opt(opt_cfg, label, optimizer):
        """One optimization run. Returns a dict with the loss curve, the
        interior-masked loss curve (hard-mode evidence), and the
        BEST-ITERATE parameters (st.loss at step i is evaluated at the
        pre-update parameters, so the best iterate is recoverable
        exactly). ``opt_cfg.soft_edges > 0`` runs the relaxation with a
        consistently-relaxed target."""
        tgt = target
        if getattr(opt_cfg, "soft_edges", 0.0) > 0.0:
            tgt = render_differentiable(scene_true, cam, opt_cfg)

        def interior_loss(scene):
            img = render_differentiable(scene, cam, opt_cfg)
            d2 = (img - tgt) ** 2
            return float(jnp.mean(
                jnp.where(interior_keep[:, :, None], d2, 0.0)
            ) / jnp.mean(interior_keep))

        st = OptState(
            scene0, cam, optimizer.init(trainable0), jnp.float32(0.0)
        )
        step = make_inverse_step(tgt, opt_cfg, optimizer, pf)
        curve, secs, interior = [], [], []
        best = {"loss": float("inf"), "scene": scene0, "step": -1}
        prev_scene = st.scene
        for i in range(args.steps):
            if i % args.interior_every == 0:
                interior.append([i, round(interior_loss(st.scene), 8)])
            t0 = time.perf_counter()
            st = step(st)
            loss = float(st.loss)  # host sync; loss AT prev_scene
            dt = time.perf_counter() - t0
            curve.append(loss)
            secs.append(round(dt, 4))
            if loss < best["loss"]:
                best = {"loss": loss, "scene": prev_scene, "step": i}
            prev_scene = st.scene
            if i % max(1, args.steps // 10) == 0 or i == args.steps - 1:
                print(f"[{label}] step {i:3d}  loss {loss:.6e}  {dt:.2f}s",
                      flush=True)
        final_loss = float(l2_image_loss(st.scene, cam, tgt, opt_cfg))
        curve.append(final_loss)
        if final_loss < best["loss"]:
            best = {"loss": final_loss, "scene": st.scene,
                    "step": args.steps}
        interior.append([args.steps,
                         round(interior_loss(st.scene), 8)])

        def errs(scene):
            ec = float(np.abs(
                _fetch(scene.center[8]) - _fetch(scene_true.center[8])
            ).max())
            eco = float(np.abs(
                _fetch(scene.color[0]) - _fetch(scene_true.color[0])
            ).max())
            return ec, eco

        err_center, err_color = errs(best["scene"])
        fin_center, fin_color = errs(st.scene)
        print(f"[{label}] BEST step {best['step']} loss {best['loss']:.6e}"
              f"  light-center err {err_center:.3f} (was 8.0), "
              f"wall-albedo err {err_color:.3f} (was 0.45)", flush=True)
        return {
            "loss_curve": [round(x, 8) for x in curve],
            "interior_loss_curve": interior,
            "interior_mask_fraction": round(mask_frac, 4),
            "step_seconds": secs,
            "median_step_s": round(float(np.median(secs)), 4),
            "loss_first_over_best": round(
                curve[0] / max(best["loss"], 1e-12), 2
            ),
            "best_step": best["step"],
            "best_loss": round(best["loss"], 8),
            "final_loss": round(final_loss, 8),
            "final_equals_best": best["step"] == args.steps,
            "recovered_at_best": {
                "light_center_max_err": round(err_center, 4),
                "wall_albedo_max_err": round(err_color, 4),
            },
            "recovered_at_final": {
                "light_center_max_err": round(fin_center, 4),
                "wall_albedo_max_err": round(fin_color, 4),
            },
        }

    import dataclasses as _dc

    # HARD estimator (the reference's semantics): interior gradients
    # only — the optimizer cannot see the emissive disk's position
    # through its silhouette, so the L2's disk-overlap component is
    # gradient-invisible and the loss need not decrease monotonically
    # even as parameters improve. The interior_loss_curve (same L2
    # restricted to pixels that never see the disk) is the measured
    # form of that claim: it should FALL even when the total rises.
    hard = run_opt(cfg, "hard", make_optimizer(10.0))
    # SOFT estimator (soft_edges relaxation): silhouette gradients exist;
    # the loss should now actually decrease and the light recover.
    cfg_soft = _dc.replace(cfg, soft_edges=args.soft, use_pallas=False)
    soft = run_opt(cfg_soft, "soft", make_optimizer(args.geom_mult_soft))

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
        for soft_w in (0.0, args.soft):
            mode = "hard" if soft_w == 0.0 else f"soft w={soft_w}"
            print(f"pixel-grad FD check: {tag} [{mode}]...", flush=True)
            mx, p99, scale = pixel_grad_check(
                scene_true, cam, cfg, param, idx, eps, soft=soft_w
            )
            checks.append({
                "param": tag, "index": list(idx), "eps": eps,
                "soft_edges": soft_w,
                "max_abs_err": mx, "p99_abs_err": p99, "fd_scale": scale,
                "max_err_pct_of_scale": round(100.0 * mx / scale, 2),
            })
            print(f"  max {mx:.3e}  p99 {p99:.3e}  scale {scale:.3e}"
                  f"  ({100.0 * mx / scale:.2f}% of scale)", flush=True)

    out = {
        "config": {
            "scene": "cornell", "width": args.size, "height": args.size,
            "spp": args.spp, "steps": args.steps, "lr": args.lr,
            "forward": "pallas" if cfg.use_pallas else "jnp",
            "backward": "remat-jnp-vjp",
            "device": str(jax.devices()[0]),
        },
        "target_render_s": round(t_target, 3),
        "optimizer": {
            "schedule": "cosine_decay(alpha=0.05) per group",
            "base_lr": args.lr, "geom_lr_mult": 10.0,
            "best_iterate_tracking": True,
        },
        "hard": {
            "note": (
                "reference-hard visibility: silhouette pixels carry no "
                "gradient, so the optimizer descends only the interior "
                "(diffuse-field) component of the L2 — the emissive "
                "disk's overlap term is gradient-invisible and the "
                "total loss need not fall monotonically even while "
                "parameters improve; interior_loss_curve ([step, loss] "
                "over pixels that never see the disk) is the measured "
                "form of that claim"
            ),
            **hard,
        },
        "soft": {
            "soft_edges": args.soft,
            **soft,
        },
        "pixel_grad_checks": checks,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
