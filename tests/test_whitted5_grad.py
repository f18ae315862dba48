"""Differentiability of the whitted5 (raytracer5) family — r5.

The jnp levelwise tracer is pure differentiable dataflow: texture
bitmaps, materials and geometry are pytree leaves. Two capabilities are
pinned here:

* texture recovery — gradients flow through the bilinear texel fetch
  (Texture::GetTexel, scene.cpp:81-106) to the texels the camera sees
  (examples/whitted5_texture_recovery.py is the full-size demo);
* silhouette optimization through SOFT shadows — with
  ``soft_edges > 0`` the CalcShade visibility becomes a smooth
  transmittance (models/whitted5._soft_shadow_transmittance), so an
  area light's position optimizes through where its shadow falls; the
  hard estimator's shadow indicator is a step function with zero/biased
  gradient at the same pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from se195_raytracer_tpu.models.whitted5 import render_whitted5
from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene

W, H = 64, 48


def test_texture_gradient_recovers_floor():
    scene_true = room5_scene()
    target = render_whitted5(scene_true, width=W, height=H, spp=1)
    tex0 = scene_true.textures[0]
    gray = jnp.full_like(tex0, 0.5)

    optimizer = optax.adam(0.5)
    opt_state = optimizer.init(gray)

    @jax.jit
    def step(tex, opt_state):
        def loss_fn(t):
            sc = scene_true.replace(textures=(t,) + scene_true.textures[1:])
            img = render_whitted5(sc, width=W, height=H, spp=1)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(tex)
        upd, opt_state = optimizer.update(g, opt_state, tex)
        return optax.apply_updates(tex, upd), opt_state, loss, g

    tex, losses = gray, []
    seen = None
    for _ in range(8):
        tex, opt_state, loss, g = step(tex, opt_state)
        if seen is None:
            seen = np.asarray(jnp.abs(g).sum(-1) > 0)
        losses.append(float(loss))
    assert seen.mean() > 0.005, "no texels received gradient"
    assert losses[-1] < 0.35 * losses[0], losses
    err0 = float(np.abs(np.asarray(gray - tex0))[seen].mean())
    err1 = float(np.abs(np.asarray(tex - tex0))[seen].mean())
    assert err1 < 0.7 * err0, (err0, err1)


def test_soft_shadow_light_position_gradient():
    """An area light's x-position must carry a usable gradient through
    its shadow with the relaxation on; optimizing recovers the true
    position from a 1.5-unit offset."""
    scene_true = room5_scene()
    soft = 0.3
    target = render_whitted5(scene_true, width=W, height=H, spp=1,
                             soft_edges=soft)
    li = 4  # first box light
    true_x = float(scene_true.box_pos[li, 0])

    def loss_at(x):
        sc = scene_true.replace(
            box_pos=scene_true.box_pos.at[li, 0].set(x)
        )
        img = render_whitted5(sc, width=W, height=H, spp=1,
                              soft_edges=soft)
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_at))
    x = jnp.float32(true_x + 1.5)
    l0, g0 = vg(x)
    assert np.isfinite(float(g0)) and float(g0) > 0.0, float(g0)
    # Clipped gradient descent (loss ~1e-3-scale, parameter in scene
    # units; measured landscape is smooth and monotone over the offset).
    for _ in range(15):
        loss, g = vg(x)
        x = x - jnp.clip(g * 300.0, -0.3, 0.3)
    err1 = abs(float(x) - true_x)
    assert err1 < 0.3, (err1, float(loss), float(l0))


def test_device_compaction_matches_host():
    """render_whitted5_adaptive's device-side fixed-size compaction
    (default) must reproduce the host-compaction path: same edge set,
    same blend — up to denormal dust at the pad-target pixel (pad slots
    alias index 0 in both paths)."""
    from se195_raytracer_tpu.models.whitted5 import render_whitted5_adaptive

    scene = room5_scene()
    d_img, d_frac = render_whitted5_adaptive(
        scene, width=W, height=H, compaction="device"
    )
    h_img, h_frac = render_whitted5_adaptive(
        scene, width=W, height=H, compaction="host"
    )
    assert d_frac == h_frac
    assert float(
        np.abs(np.asarray(d_img) - np.asarray(h_img)).max()
    ) < 1e-20


def test_soft_matches_hard_away_from_shadow_edges():
    """The relaxation only perturbs ~w-wide bands: most pixels match the
    hard estimator closely at small w."""
    scene = room5_scene()
    hard = np.asarray(render_whitted5(scene, width=W, height=H, spp=1))
    soft = np.asarray(
        render_whitted5(scene, width=W, height=H, spp=1, soft_edges=0.05)
    )
    d = np.abs(hard - soft).max(-1)
    assert np.median(d) < 2e-2, np.median(d)
    assert (d < 0.1).mean() > 0.85, (d < 0.1).mean()
