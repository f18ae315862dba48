"""Inverse rendering: recover scene parameters from a target image.

The differentiable version of the reference's interactive edit loop
(SURVEY.md §3.5: keystroke edits mutate camera/spheres then re-render —
displayfunc.cpp:252-420, smallptGPU.cpp:784-830). Here the "keystrokes"
are gradients: render with fixed RNG streams, L2 against the target,
optax updates on any subset of scene/camera leaves.

Gradient notes (SURVEY.md §7 hard part 2): hit/miss and shadow predicates
are step functions, so silhouette pixels carry no (or biased) gradient;
interior shading, material colors, emission and smooth geometry terms all
differentiate exactly. Per-bounce ``jax.checkpoint`` (remat) bounds
backward memory.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.core.rng import init_mwc_state
from se195_raytracer_tpu.core.types import Camera, Scene, update_camera
from se195_raytracer_tpu.driver.render import _sample_once, pixel_coords


def render_differentiable(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    seed: Optional[int] = None,
) -> jnp.ndarray:
    """Differentiable render with *fixed* RNG streams (same seeds every
    call so the loss surface is deterministic). Returns [H, W, 3].

    With ``config.use_pallas`` the PRIMAL runs on the fused Pallas PT
    kernel (kernels/pt_kernel.py) and the backward pass re-runs the
    remat'd jnp path's VJP — see ``_render_pallas_diff``. Otherwise both
    directions use the per-bounce-remat jnp scan.

    ``config.soft_edges > 0`` (the differentiable-visibility relaxation)
    always takes the jnp path: the kernel implements the reference-hard
    estimator, and the relaxation must be identical in forward and
    backward for FD/autodiff consistency."""
    if (getattr(config, "use_pallas", False)
            and getattr(config, "soft_edges", 0.0) == 0.0):
        if seed is not None and seed != config.seed:
            config = dataclasses.replace(config, seed=seed)
        return _render_pallas_diff(scene, camera, config)
    return _render_jnp_diff(scene, camera, config, seed)


def _render_jnp_diff(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    seed: Optional[int] = None,
) -> jnp.ndarray:
    """Pure-jnp differentiable render: ``lax.scan`` over samples with
    per-bounce ``jax.checkpoint`` inside ``radiance`` (remat bounds the
    backward's live memory to one bounce of temporaries)."""
    basis = update_camera(camera, config.width, config.height)
    xs, ys = pixel_coords(config.width, config.height)
    n = config.width * config.height
    s0, s1 = init_mwc_state((n,), config.seed if seed is None else seed)

    def step(carry, s_idx):
        accum, c0, c1 = carry
        r, (c0, c1) = _sample_once(
            scene, basis, config, xs, ys, (c0, c1), remat=True
        )
        k1 = s_idx.astype(jnp.float32)
        accum = (accum * k1 + r) / (k1 + 1.0)
        return (accum, c0, c1), None

    init = (jnp.zeros((n, 3), jnp.float32), s0, s1)
    (accum, _, _), _ = jax.lax.scan(step, init, jnp.arange(config.spp))
    return accum.reshape(config.height, config.width, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _render_pallas_diff(scene: Scene, camera: Camera, config: RenderConfig):
    """The fused PT kernel with a backward story (VERDICT r2 task 1):

    * forward  = ``kernels/pt_kernel.render_pallas`` — the Mosaic kernel,
      ~500M rays/s/chip;
    * backward = VJP of the remat'd jnp scan (``_render_jnp_diff``),
      recomputed from the same fixed seeds.

    The two paths draw identical RNG streams (tests/test_pallas_kernel.py
    pins them stream-for-stream in both ``mwc`` and ``counter`` modes), so
    the jnp recompute in the backward differentiates the same estimator
    the kernel evaluated — the pallas-forward/remat-jnp-backward pairing.
    Silhouette caveats of ``render_differentiable`` apply unchanged."""
    from se195_raytracer_tpu.kernels.pt_kernel import render_pallas

    img, _ = render_pallas(
        scene, camera, config, interpret=config.pallas_interpret
    )
    return img


def _render_pallas_diff_fwd(scene, camera, config):
    from se195_raytracer_tpu.kernels.pt_kernel import render_pallas

    img, _ = render_pallas(
        scene, camera, config, interpret=config.pallas_interpret
    )
    return img, (scene, camera)


def _render_pallas_diff_bwd(config, res, g):
    scene, camera = res
    _, vjp = jax.vjp(
        lambda s, c: _render_jnp_diff(s, c, config), scene, camera
    )
    return vjp(g)


_render_pallas_diff.defvjp(_render_pallas_diff_fwd, _render_pallas_diff_bwd)


def l2_image_loss(
    scene: Scene, camera: Camera, target: jnp.ndarray, config: RenderConfig
) -> jnp.ndarray:
    img = render_differentiable(scene, camera, config)
    return jnp.mean((img - target) ** 2)


class OptState(NamedTuple):
    scene: Scene
    camera: Camera
    opt_state: Any
    loss: jnp.ndarray


def make_inverse_step(
    target: jnp.ndarray,
    config: RenderConfig,
    optimizer: optax.GradientTransformation,
    param_filter: Callable[[str], bool] = lambda name: True,
) -> Callable[[OptState], OptState]:
    """Build a jitted optimization step updating (scene, camera).

    ``param_filter`` selects which leaves train, by field name
    ('center', 'radius', 'emission', 'color', 'orig', 'target').
    Integer leaves (refl) never train.
    """

    def split(params: Tuple[Scene, Camera]):
        scene, camera = params
        trainable = {}
        if param_filter("center"):
            trainable["center"] = scene.center
        if param_filter("radius"):
            trainable["radius"] = scene.radius
        if param_filter("emission"):
            trainable["emission"] = scene.emission
        if param_filter("color"):
            trainable["color"] = scene.color
        if param_filter("orig"):
            trainable["orig"] = camera.orig
        if param_filter("target"):
            trainable["target"] = camera.target
        return trainable

    def merge(scene: Scene, camera: Camera, trainable):
        scene = scene.replace(
            **{k: v for k, v in trainable.items() if k in ("center", "radius", "emission", "color")}
        )
        cam_kw = {k: v for k, v in trainable.items() if k in ("orig", "target")}
        if cam_kw:
            camera = camera.replace(**cam_kw)
        return scene, camera

    @jax.jit
    def step(st: OptState) -> OptState:
        trainable = split((st.scene, st.camera))

        def loss_fn(tr):
            scene, camera = merge(st.scene, st.camera, tr)
            return l2_image_loss(scene, camera, target, config)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = optimizer.update(grads, st.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        scene, camera = merge(st.scene, st.camera, trainable)
        return OptState(scene, camera, opt_state, loss)

    return step


def run_inverse_rendering(
    scene0: Scene,
    camera0: Camera,
    target: jnp.ndarray,
    config: RenderConfig,
    steps: int = 100,
    learning_rate: float = 1e-2,
    param_filter: Callable[[str], bool] = lambda name: True,
    log_every: int = 0,
) -> OptState:
    optimizer = optax.adam(learning_rate)

    def split_init(scene, camera):
        d = {}
        for name, v in (
            ("center", scene.center),
            ("radius", scene.radius),
            ("emission", scene.emission),
            ("color", scene.color),
            ("orig", camera.orig),
            ("target", camera.target),
        ):
            if param_filter(name):
                d[name] = v
        return d

    opt_state = optimizer.init(split_init(scene0, camera0))
    st = OptState(scene0, camera0, opt_state, jnp.float32(0.0))
    step = make_inverse_step(target, config, optimizer, param_filter)
    for i in range(steps):
        st = step(st)
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"step {i:4d}  loss {float(st.loss):.6e}")
    return st
