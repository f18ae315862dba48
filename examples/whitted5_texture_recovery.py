"""Inverse texture recovery through the whitted5 renderer.

The raytracer5 family's richest asset is its bilinear TGA textures
(Texture::GetTexel, raytracer5/trunk/scene.cpp:81-106). Because the
TPU-native whitted5 tracer is pure differentiable jnp (texture bitmaps
are pytree leaves of Whitted5Scene), the texel fetch differentiates:
d(image)/d(texel) flows through the bilinear weights to exactly the
texels the camera sees. This example recovers the checker floor texture
from a rendered target, starting from flat gray — the reference's
edit->re-render loop (displayfunc.cpp:252-420) with gradients steering
2*200*200*3 texture parameters instead of keystrokes.

Usage: python examples/whitted5_texture_recovery.py
       [--size 160] [--steps 40] [--out-prefix /tmp/texrec]
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--out-prefix", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from se195_raytracer_tpu.models.whitted5 import render_whitted5
    from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene

    w, h = args.size, args.size * 3 // 4
    scene_true = room5_scene()
    print(f"rendering {w}x{h} target...", flush=True)
    target = render_whitted5(scene_true, width=w, height=h, spp=1)

    # Start: flat gray floor texture (the marble sphere keeps its true
    # texture — the floor is the optimization target).
    tex0 = scene_true.textures[0]
    gray = jnp.full_like(tex0, 0.5)
    scene0 = scene_true.replace(textures=(gray,) + scene_true.textures[1:])

    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(gray)

    @jax.jit
    def step(tex, opt_state):
        def loss_fn(t):
            sc = scene_true.replace(
                textures=(t,) + scene_true.textures[1:]
            )
            img = render_whitted5(sc, width=w, height=h, spp=1)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(tex)
        updates, opt_state = optimizer.update(g, opt_state, tex)
        return optax.apply_updates(tex, updates), opt_state, loss

    # "Seen" texels (nonzero gradient at the start) are the recoverable
    # set — texels the camera never samples cannot be constrained.
    g0 = jax.grad(
        lambda t: jnp.mean(
            (render_whitted5(
                scene_true.replace(textures=(t,) + scene_true.textures[1:]),
                width=w, height=h, spp=1) - target) ** 2)
    )(gray)
    seen = np.asarray(jnp.abs(g0).sum(-1) > 0)
    print(f"{seen.mean() * 100:.1f}% of floor texels are camera-visible",
          flush=True)

    tex = gray
    for i in range(args.steps):
        tex, opt_state, loss = step(tex, opt_state)
        if i % max(1, args.steps // 10) == 0 or i == args.steps - 1:
            err = float(np.abs(np.asarray(tex - tex0))[seen].mean())
            print(f"step {i:3d}  loss {float(loss):.6e}  "
                  f"seen-texel MAE {err:.4f}", flush=True)

    err0 = float(np.abs(np.asarray(gray - tex0))[seen].mean())
    err1 = float(np.abs(np.asarray(tex - tex0))[seen].mean())
    print(f"seen-texel MAE: {err0:.4f} -> {err1:.4f} "
          f"({err0 / max(err1, 1e-9):.1f}x better)", flush=True)

    if args.out_prefix:
        from se195_raytracer_tpu.io.image import write_image

        for name, t in [("true", tex0), ("recovered", tex)]:
            img = np.clip(np.asarray(t) * 255.0, 0, 255).astype(np.uint8)
            write_image(img, f"{args.out_prefix}_{name}.png")
            print(f"wrote {args.out_prefix}_{name}.png", flush=True)


if __name__ == "__main__":
    main()
