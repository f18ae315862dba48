"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (SURVEY.md
§4: the reference is single-device — devices[0] only — so these tests
cover what it never had: shard-invariant rendering and psum'd scene
gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.core.rng import init_mwc_state
from se195_raytracer_tpu.driver.render import (
    init_render_state,
    render,
    render_steps,
    RenderState,
)
from se195_raytracer_tpu.parallel.mesh import (
    make_mesh,
    ray_sharding,
    replicate,
    replicated,
)
from se195_raytracer_tpu.scenes.registry import get_scene


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(n_devices=8)


def test_sharded_pallas_render_bitwise_equals_single_device(mesh):
    """The fused Pallas kernel under shard_map (8 shards, absolute pixel
    base offsets) must reproduce the single-device Pallas render exactly:
    identical seeds per pixel, identical draw streams, zero collectives."""
    from se195_raytracer_tpu.kernels.pt_kernel import render_pallas
    from se195_raytracer_tpu.parallel.render_sharded import (
        render_pallas_sharded,
    )

    spec = get_scene("cornell")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=64, height=32, spp=2, seed=11)
    img_1, _ = render_pallas(scene, cam, cfg, interpret=True)
    img_8, _ = render_pallas_sharded(
        scene, cam, cfg, mesh=mesh, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(img_1), np.asarray(img_8))


def test_sharded_render_bitwise_equals_single_device(mesh):
    """Sharding the pixel axis over 8 devices must not change a single bit
    of the output (RNG is keyed per-pixel, forward needs no collectives)."""
    spec = get_scene("cornell")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=32, height=16, spp=2, seed=6)

    img_single, _ = render(scene, cam, cfg)

    state = init_render_state(cfg)
    sh = ray_sharding(mesh)
    state_sharded = RenderState(
        accum=jax.device_put(state.accum, sh),
        s0=jax.device_put(state.s0, sh),
        s1=jax.device_put(state.s1, sh),
        sample=jax.device_put(state.sample, replicated(mesh)),
    )
    scene_r = replicate(scene, mesh)
    cam_r = replicate(cam, mesh)
    out = render_steps(scene_r, cam_r, state_sharded, cfg, cfg.spp)
    img_sharded = np.asarray(out.accum).reshape(cfg.height, cfg.width, 3)

    np.testing.assert_array_equal(np.asarray(img_single), img_sharded)


def test_sharded_accum_stays_sharded(mesh):
    """The progressive accumulator must remain sharded across steps (no
    silent full replication = the on-device-resident buffer design)."""
    spec = get_scene("simple")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=32, height=16, spp=1, seed=0)
    state = init_render_state(cfg)
    sh = ray_sharding(mesh)
    state = RenderState(
        accum=jax.device_put(state.accum, sh),
        s0=jax.device_put(state.s0, sh),
        s1=jax.device_put(state.s1, sh),
        sample=jax.device_put(state.sample, replicated(mesh)),
    )
    out = render_steps(
        replicate(scene, mesh), replicate(cam, mesh), state, cfg, 1
    )
    assert not out.accum.sharding.is_fully_replicated
    assert len(out.accum.sharding.device_set) == 8


def test_scene_gradient_psum_across_shards(mesh):
    """Scene-parameter gradients from a sharded loss must equal the
    single-device gradients (XLA inserts the psum because the scene is
    replicated while pixels are sharded)."""
    from se195_raytracer_tpu.driver.optimize import l2_image_loss

    spec = get_scene("simple")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=16, height=16, spp=1, seed=2, max_depth=3)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    grad_fn = jax.jit(
        jax.grad(lambda s: l2_image_loss(s, cam, target, cfg), allow_int=True)
    )
    g_single = grad_fn(scene)

    scene_r = replicate(scene, mesh)
    tgt_sh = jax.device_put(
        target.reshape(-1, 3), ray_sharding(mesh)
    ).reshape(cfg.height, cfg.width, 3)
    grad_fn_sh = jax.jit(
        jax.grad(lambda s: l2_image_loss(s, cam, tgt_sh, cfg), allow_int=True)
    )
    g_sharded = grad_fn_sh(scene_r)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_render_sharded_api(mesh):
    """User-facing render_sharded: matches the plain render bitwise."""
    from se195_raytracer_tpu.parallel.render_sharded import render_sharded

    spec = get_scene("caustic")
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=32, height=16, spp=2, seed=1)
    img_plain, _ = render(scene, cam, cfg)
    img_shard, st = render_sharded(scene, cam, cfg, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(img_plain), np.asarray(img_shard))
    assert int(st.sample) == 2
    # resume keeps working (st is donated into the resumed call)
    img2, st2 = render_sharded(scene, cam, cfg, mesh=mesh, state=st)
    assert int(st2.sample) == 4


def test_whitted5_sharded_invariant(mesh):
    """render_whitted5_sharded must consume exactly the counter-RNG
    streams the single-device render_whitted5 does (state is a
    (key, counter) pair keyed by absolute ray id — NOT MWC seed words).
    The frames agree to 1 ulp: streams and estimator are identical, but
    XLA may fuse the shard_map body differently than the plain jit, so
    a handful of pixels drift by <=1e-6 (an RNG/keying bug shows up as
    ~1e-1-level disagreement across most of the frame, far beyond this
    gate)."""
    from se195_raytracer_tpu.models.whitted5 import render_whitted5
    from se195_raytracer_tpu.parallel.render_sharded import (
        render_whitted5_sharded,
    )
    from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene

    scene = room5_scene()
    w, h, spp, seed = 40, 30, 2, 5
    single = np.asarray(render_whitted5(scene, width=w, height=h, spp=spp,
                                        seed=seed))
    sharded = np.asarray(render_whitted5_sharded(scene, width=w, height=h,
                                                 spp=spp, seed=seed,
                                                 mesh=mesh))
    np.testing.assert_allclose(sharded, single, rtol=0, atol=1e-6)
    exact = float((sharded == single).mean())
    assert exact > 0.99, f"only {exact:.3f} of elements bit-equal"


def test_whitted5_kernel_sharded_invariant(mesh):
    """The whitted5 fused level kernels under shard_map (interpret mode
    on the CPU mesh): each device runs the identical per-tile kernel
    program on its shard with absolute-id RNG keys, so output matches
    the single-device kernel render to 1 ulp (same gate shape as the
    jnp-path test above)."""
    from se195_raytracer_tpu.kernels.whitted5_kernel import (
        render_whitted5_pallas,
    )
    from se195_raytracer_tpu.parallel.render_sharded import (
        render_whitted5_sharded,
    )
    from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene

    scene = room5_scene()
    w, h, seed = 32, 24, 5
    single = np.asarray(
        render_whitted5_pallas(scene, width=w, height=h, spp=1, seed=seed,
                               interpret=True)
    )
    sharded = np.asarray(
        render_whitted5_sharded(scene, width=w, height=h, spp=1, seed=seed,
                                mesh=mesh, use_pallas=True, interpret=True)
    )
    np.testing.assert_allclose(sharded, single, rtol=0, atol=1e-6)
    assert float((sharded == single).mean()) > 0.99


def test_blocked_layout_sharded_bitwise_equals_single_device():
    """Loop scenes (>UNROLL_MAX_SPHERES) use the tile-blocked ray layout
    (pt_kernel.ray_layout) whose lane<->pixel permutation must compose
    with shard_map slicing: absolute per-lane pixel ids make every
    device draw a given pixel's exact stream, so the 8-device render of
    a 158-sphere scene is bitwise equal to the single-device one —
    including the extra pad tiles the shard rounding introduces."""
    import numpy as np

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.kernels.pt_kernel import (
        UNROLL_MAX_SPHERES,
        render_pallas,
    )
    from se195_raytracer_tpu.parallel.mesh import make_mesh
    from se195_raytracer_tpu.parallel.render_sharded import (
        render_pallas_sharded,
    )
    from se195_raytracer_tpu.scenes.generator import complex_scene

    spec = complex_scene(max_depth=3.0)  # 158 spheres -> loop kernel
    scene, cam = spec.to_scene(), spec.to_camera()
    assert scene.num_spheres > UNROLL_MAX_SPHERES
    cfg = RenderConfig(width=64, height=32, spp=2, seed=7, max_depth=3,
                       use_pallas=True)
    img1, _ = render_pallas(scene, cam, cfg, interpret=True)
    img8, _ = render_pallas_sharded(scene, cam, cfg, mesh=make_mesh(),
                                    interpret=True)
    assert np.array_equal(np.asarray(img1), np.asarray(img8))
