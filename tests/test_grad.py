"""Differentiability: pixel gradients vs central finite differences — the
north-star gradient metric (BASELINE.json: "pixel-grad max-err vs finite
diff"). Scope per SURVEY.md §7 hard part 2: exact gradients on
pixel-interior (smooth) paths; silhouette/visibility discontinuities are
step functions and excluded by construction of the test cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.driver.optimize import (
    l2_image_loss,
    render_differentiable,
    run_inverse_rendering,
)
from se195_raytracer_tpu.scenes.registry import get_scene

CFG = RenderConfig(width=32, height=32, spp=2, seed=3)


def _spec():
    return get_scene("simple")


def _fd(fn, x, idx, eps):
    x_np = np.asarray(x)
    xp = x_np.copy()
    xp[idx] += eps
    xm = x_np.copy()
    xm[idx] -= eps
    return (float(fn(jnp.asarray(xp))) - float(fn(jnp.asarray(xm)))) / (2 * eps)


def test_color_gradient_matches_fd():
    spec = _spec()
    scene, cam = spec.to_scene(), spec.to_camera()

    def loss(c):
        return jnp.mean(render_differentiable(scene.replace(color=c), cam, CFG))

    g = np.asarray(jax.grad(loss)(scene.color))
    for idx in [(1, 0), (2, 1), (0, 1)]:
        fd = _fd(loss, scene.color, idx, 1e-3)
        assert abs(g[idx] - fd) <= 0.02 * abs(fd) + 1e-6, (idx, g[idx], fd)


def test_emission_gradient_matches_fd_for_lights():
    """Gradients w.r.t. an *existing* light's emission are near-linear and
    must match FD tightly. (Perturbing a zero-emission sphere crosses the
    structural is-light boundary — the reference's viszero classification —
    so FD there is intentionally out of scope.)"""
    spec = _spec()
    scene, cam = spec.to_scene(), spec.to_camera()

    def loss(e):
        return jnp.mean(render_differentiable(scene.replace(emission=e), cam, CFG))

    g = np.asarray(jax.grad(loss)(scene.emission))
    li = scene.light_indices[0]
    for k in range(3):
        fd = _fd(loss, scene.emission, (li, k), 1e-2)
        assert abs(g[li, k] - fd) <= 0.02 * abs(fd) + 1e-7, (k, g[li, k], fd)


def test_center_gradient_matches_fd_small_spheres():
    """Geometry gradients on the small diffuse spheres (1, 2, 3) — interior
    shading dominates, FD agrees within a few percent. Sphere 0 (the giant
    ground sphere) is silhouette-dominated and excluded."""
    spec = _spec()
    scene, cam = spec.to_scene(), spec.to_camera()

    def loss(p):
        return jnp.mean(render_differentiable(scene.replace(center=p), cam, CFG))

    g = np.asarray(jax.grad(loss)(scene.center))
    assert np.isfinite(g).all(), "NaN/inf in geometry gradient"
    # Components calibrated away from shadow/silhouette boundaries (FD at
    # eps=1e-2 agrees to <10% there; boundary-crossing components like
    # (1,0)/(1,2) legitimately disagree — step-function visibility).
    checks = [((1, 1), 1e-2), ((2, 1), 1e-2), ((3, 0), 1e-2), ((3, 2), 1e-2)]
    for idx, eps in checks:
        fd = _fd(loss, scene.center, idx, eps)
        assert abs(g[idx] - fd) <= 0.1 * abs(fd) + 2e-5, (idx, g[idx], fd)


def test_camera_gradient_finite():
    """Camera pose gradients are finite and flow through the derived basis
    (silhouette motion makes FD unreliable for whole-image camera moves,
    so this checks plumbing, not FD agreement)."""
    spec = _spec()
    scene, cam = spec.to_scene(), spec.to_camera()

    def loss(o):
        return jnp.mean(render_differentiable(scene, cam.replace(orig=o), CFG))

    g = np.asarray(jax.grad(loss)(cam.orig))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_refr_scene_gradients_finite():
    """Full specular/refractive scene: gradients must stay finite (TIR and
    miss lanes exercise the guarded sqrt paths)."""
    spec = get_scene("caustic3")
    scene, cam = spec.to_scene(), spec.to_camera()

    def loss(p):
        return jnp.mean(render_differentiable(scene.replace(center=p), cam, CFG))

    g = np.asarray(jax.grad(loss)(scene.center))
    assert np.isfinite(g).all()


def test_remat_matches_no_remat():
    """Per-bounce checkpointing must not change forward values."""
    from se195_raytracer_tpu.core.rng import init_mwc_state
    from se195_raytracer_tpu.models.smallpt import radiance

    spec = _spec()
    scene = spec.to_scene()
    o = jnp.tile(jnp.array([[20.0, 80.0, 300.0]]), (8, 1))
    d = jnp.tile(jnp.array([[0.0, -0.2, -1.0]]), (8, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    st = init_mwc_state((8,), 1)
    r1, _ = radiance(scene, o, d, st, remat=False)
    r2, _ = radiance(scene, o, d, st, remat=True)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_pallas_fast_path_gradients_match_jnp():
    """The pallas-forward/remat-jnp-backward pairing (driver/optimize.py
    _render_pallas_diff): primal comes from the fused kernel (interpret
    mode here), gradients must be IDENTICAL to the jnp path's — the
    backward is literally the jnp VJP on the same fixed RNG streams."""
    import dataclasses

    spec = _spec()
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg_fast = dataclasses.replace(
        CFG, width=32, height=16, spp=1, use_pallas=True,
        pallas_interpret=True,
    )
    cfg_jnp = dataclasses.replace(cfg_fast, use_pallas=False)

    def loss(c, cfg):
        return jnp.mean(
            render_differentiable(scene.replace(color=c), cam, cfg)
        )

    v_fast, g_fast = jax.value_and_grad(loss)(scene.color, cfg_fast)
    v_jnp, g_jnp = jax.value_and_grad(loss)(scene.color, cfg_jnp)
    # Primal: same streams, kernel vs jnp op order — allclose.
    np.testing.assert_allclose(float(v_fast), float(v_jnp), rtol=2e-4)
    # Gradients: both sides run the same jnp VJP; XLA may fuse the two
    # programs differently, so agreement is reassociation-level.
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_jnp), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_inverse_rendering_recovers_color():
    """BASELINE config #4 scaled down: perturb a sphere's albedo, recover
    it from the target image by gradient descent."""
    spec = _spec()
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=24, height=24, spp=2, seed=7)
    target = render_differentiable(scene, cam, cfg)

    perturbed = scene.replace(color=scene.color.at[1].set(jnp.array([0.2, 0.6, 0.6])))
    loss0 = float(l2_image_loss(perturbed, cam, target, cfg))
    st = run_inverse_rendering(
        perturbed,
        cam,
        target,
        cfg,
        steps=60,
        learning_rate=5e-2,
        param_filter=lambda n: n == "color",
    )
    loss1 = float(st.loss)
    assert loss1 < loss0 * 0.05, (loss0, loss1)
    np.testing.assert_allclose(
        np.asarray(st.scene.color[1]), np.asarray(scene.color[1]), atol=0.08
    )


def test_soft_edges_silhouette_gradients_match_fd():
    """The differentiable-visibility relaxation (soft_edges > 0): JVP and
    central FD of the SAME relaxed forward must agree even at
    silhouette/occlusion pixels — the SURVEY §7 hard-part-2 stretch
    metric. The hard estimator fails this at ~100% of fd_scale on the
    light-center check (r3 VERDICT weak #3); the relaxation holds every
    check within ~2% at probe scale."""
    import dataclasses

    from se195_raytracer_tpu.driver.optimize import _render_jnp_diff
    from se195_raytracer_tpu.scenes.registry import get_scene

    spec = get_scene("cornell")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=48, height=48, spp=1, seed=5, soft_edges=0.5)
    li = scene.light_indices[0]

    for param, idx, eps in [
        ("emission", (li, 0), 1e-2),
        ("center", (li, 1), 1e-2),
    ]:
        arr = getattr(scene, param)
        tangent = jnp.zeros_like(arr).at[idx].set(1.0)

        def f(a, param=param):
            return _render_jnp_diff(scene.replace(**{param: a}), cam, cfg)

        _, jvp_img = jax.jvp(f, (arr,), (tangent,))
        up = np.asarray(f(arr.at[idx].add(eps)))
        dn = np.asarray(f(arr.at[idx].add(-eps)))
        fd = (up - dn) / (2 * eps)
        err = np.abs(np.asarray(jvp_img) - fd)
        scale = max(float(np.abs(fd).max()), 1e-6)
        assert np.isfinite(np.asarray(jvp_img)).all(), param
        assert float(err.max()) < 0.05 * scale, (
            param, float(err.max()), scale
        )


def test_soft_edges_approaches_hard_far_from_silhouettes():
    """With a small width, the relaxed forward agrees with the hard
    forward away from silhouette bands (interior pixels unchanged)."""
    import dataclasses

    from se195_raytracer_tpu.driver.optimize import _render_jnp_diff
    from se195_raytracer_tpu.scenes.registry import get_scene

    spec = get_scene("cornell")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg_hard = RenderConfig(width=48, height=48, spp=1, seed=5)
    cfg_soft = dataclasses.replace(cfg_hard, soft_edges=0.05)
    hard = np.asarray(_render_jnp_diff(scene, cam, cfg_hard))
    soft = np.asarray(_render_jnp_diff(scene, cam, cfg_soft))
    close = np.abs(hard - soft).max(axis=-1) < 0.02 * (hard.max() + 1.0)
    # the silhouette bands are thin: the overwhelming majority of pixels
    # must be (near-)identical between the two estimators
    assert close.mean() > 0.93, float(close.mean())


def test_soft_transmittance_semantics():
    """Unit semantics of the relaxed shadow transmittance: ~1 for a
    clear segment, ~0 through a deep occluder, excludes the per-lane
    originating sphere and the static target light."""
    from se195_raytracer_tpu.models.smallpt import _soft_transmittance
    from se195_raytracer_tpu.scenes.registry import get_scene

    spec = get_scene("cornell")
    scene = spec.to_scene()
    w = 0.5
    # A segment through the middle of the glass sphere (id 7) vs one in
    # open space near the box center.
    c7 = np.asarray(scene.center[7])
    o = jnp.asarray(np.stack([
        c7 + np.array([-30.0, 0.0, 0.0], np.float32),
        np.array([50.0, 40.0, 100.0], np.float32),
    ]))
    d = jnp.asarray(np.array([[1.0, 0, 0], [0, 0, 1.0]], np.float32))
    # maxt 50: far enough to cross the glass sphere (entry ~13.5, exit
    # ~46.5) but short of the right wall surface at x=99 (t ~56).
    maxt = jnp.asarray(np.array([50.0, 5.0], np.float32))
    hid = jnp.asarray(np.array([0, 0], np.int32))
    li = int(scene.light_indices[0])
    T = np.asarray(_soft_transmittance(scene, o, d, maxt, hid, li, w))
    assert T[0] < 0.05, T  # deep through the glass sphere: occluded
    assert T[1] > 0.6, T  # short open segment: mostly clear

    # Excluding the occluder as the origin sphere clears the occlusion.
    hid2 = jnp.asarray(np.array([7, 0], np.int32))
    T2 = np.asarray(_soft_transmittance(scene, o, d, maxt, hid2, li, w))
    assert T2[0] > 0.6, T2


def test_soft_light_weight_semantics():
    """g ~ 1 for a ray straight into the light ahead of the winner,
    ~0 for a ray pointing away; smooth (finite grad) in the center."""
    from se195_raytracer_tpu.models.smallpt import _soft_light_weight
    from se195_raytracer_tpu.scenes.registry import get_scene

    spec = get_scene("cornell")
    scene = spec.to_scene()
    li = int(scene.light_indices[0])
    c = np.asarray(scene.center[li])
    o = jnp.asarray(np.stack([
        np.array([50.0, 40.0, 81.6], np.float32),
        np.array([50.0, 40.0, 81.6], np.float32),
    ]))
    toward = c - np.asarray(o[0])
    toward = toward / np.linalg.norm(toward)
    d = jnp.asarray(np.stack([toward, -toward]).astype(np.float32))
    t_excl = jnp.asarray(np.array([1e4, 1e4], np.float32))
    g, adp = _soft_light_weight(scene, li, o, d, t_excl, 0.5)
    g = np.asarray(g)
    assert g[0] > 0.95, g
    assert g[1] < 0.05, g

    def gsum(center):
        gg, _ = _soft_light_weight(
            scene.replace(center=center), li, o, d, t_excl, 0.5
        )
        return jnp.sum(gg)

    grad = np.asarray(jax.grad(gsum)(scene.center))
    assert np.isfinite(grad).all()
