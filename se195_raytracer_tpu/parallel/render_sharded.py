"""Sharded / multi-host rendering entry points.

This is the layer the reference never had (SURVEY.md §2e P7 — always
``devices[0]``): render over every chip of a mesh, and over multiple
hosts.

The design needs no custom collectives: pixels (the batch/"sequence"
axis) are sharded, the scene is replicated, RNG streams are keyed
per-pixel, so the forward pass is embarrassingly parallel and XLA inserts
the only communication that exists — the `psum` reducing scene-parameter
gradients in the backward pass, riding ICI within a slice and DCN across
hosts. Output is bitwise identical to a single-device render
(tests/test_sharding.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.core.types import Camera, Scene
from se195_raytracer_tpu.driver.render import (
    RenderState,
    init_render_state,
    render_steps,
)
from se195_raytracer_tpu.parallel.mesh import (
    make_mesh,
    ray_sharding,
    replicate,
    replicated,
)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the jax.distributed runtime for multi-host rendering.

    On cloud TPU pods the arguments are auto-detected; pass them
    explicitly for manual clusters. Call once per process before any
    device use. (The DCN analogue of the reference's OpenCL platform
    setup, SetUpOpenCL smallptGPU.cpp:209-471.)
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def shard_render_state(state: RenderState, mesh) -> RenderState:
    sh = ray_sharding(mesh)
    return RenderState(
        accum=jax.device_put(state.accum, sh),
        s0=jax.device_put(state.s0, sh),
        s1=jax.device_put(state.s1, sh),
        sample=jax.device_put(state.sample, replicated(mesh)),
    )


def render_sharded(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    mesh=None,
    state: Optional[RenderState] = None,
):
    """Progressive render with the pixel axis sharded over ``mesh``
    (defaults to all devices). Returns ([H, W, 3] radiance, state).

    The framebuffer assembly (``np.asarray`` on the sharded accumulator)
    is the only host transfer — an all-gather the runtime performs when
    the caller materializes the image.
    """
    if mesh is None:
        mesh = make_mesh()
    n_pixels = config.width * config.height
    n_dev = len(mesh.devices.ravel())
    if n_pixels % n_dev:
        raise ValueError(
            f"pixel count {n_pixels} must divide evenly over {n_dev} devices"
        )
    if state is None:
        state = shard_render_state(init_render_state(config), mesh)
    scene_r = replicate(scene, mesh)
    cam_r = replicate(camera, mesh)
    state = render_steps(scene_r, cam_r, state, config, config.spp)
    img = state.accum.reshape(config.height, config.width, 3)
    return img, state


def render_pallas_sharded(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    mesh=None,
    state=None,
    interpret: bool = False,
):
    """Progressive render on the fused Pallas kernel with the ray axis
    sharded over ``mesh`` via ``shard_map`` — each device runs the kernel
    on its pixel shard, offset by its absolute base pixel id so RNG/pixel
    keying (and therefore the image) is identical to a single-device
    render. Zero collectives; frame assembly happens when the caller
    materializes the image.

    Returns ([H, W, 3] radiance, (s0, s1, acc, sample) state).
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from se195_raytracer_tpu.core.rng import init_state
    from se195_raytracer_tpu.core.types import update_camera
    from se195_raytracer_tpu.kernels.pt_kernel import (
        DEF_SUBLANES,
        LANES,
        UNROLL_MAX_SPHERES,
        pack_camera,
        pack_scene,
        pt_multi_pass,
        ray_layout,
    )
    from se195_raytracer_tpu.parallel.mesh import RAY_AXIS

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    w, h = config.width, config.height
    r = w * h
    blocked = scene.num_spheres > UNROLL_MAX_SPHERES
    rp, pix_np, inv_np = ray_layout(
        w, h, DEF_SUBLANES, blocked, tile_multiple=n_dev
    )

    if state is None:
        # Per-pixel streams laid out in lane order — identical to
        # render_pallas's init, so shard output == single-device output.
        s0, s1 = init_state(config.rng, (r,), config.seed)
        pad = jnp.full((max(rp - r, 1),), 2, jnp.uint32)
        if blocked:
            s0 = jnp.concatenate([s0, pad[:1]])[pix_np]
            s1 = jnp.concatenate([s1, pad[:1]])[pix_np]
        elif rp != r:
            s0 = jnp.concatenate([s0, pad])
            s1 = jnp.concatenate([s1, pad])
        acc = jnp.zeros((3, rp // LANES, LANES), jnp.float32)
        start = 0
    else:
        s0, s1, acc, start = state

    sh = ray_sharding(mesh)
    s0 = jax.device_put(s0, sh)
    s1 = jax.device_put(s1, sh)
    pix = jax.device_put(jnp.asarray(pix_np), sh)
    acc = jax.device_put(
        acc, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, RAY_AXIS, None))
    )
    scene_tab = replicate(pack_scene(scene), mesh)
    cam_tab = replicate(pack_camera(update_camera(camera, w, h)), mesh)
    emissive_flags = tuple(
        bool(i in scene.light_indices) for i in range(scene.num_spheres)
    )

    def body(scene_tab, cam_tab, pix, s0, s1, acc):
        # pix carries ABSOLUTE pixel ids, so every device draws the same
        # jittered ray for a given pixel as a single-device render would
        # (shard-invariant RNG keying) — no per-shard offset needed.
        return pt_multi_pass(
            scene_tab, cam_tab, jnp.int32(start), s0, s1, acc, pix,
            num_samples=config.spp, width=w, height=h,
            max_depth=config.max_depth,
            direct_only=(config.integrator == "dl"),
            light_indices=scene.light_indices,
            emissive_flags=emissive_flags,
            interpret=interpret,
            rng=config.rng,
        )

    try:
        from jax import shard_map  # jax >= 0.4.35
    except ImportError:
        from jax.experimental.shard_map import shard_map

    s0, s1, acc = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                  P(None, RAY_AXIS, None)),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS), P(None, RAY_AXIS, None)),
        check_vma=False,
    )(scene_tab, cam_tab, pix, s0, s1, acc)
    flat = acc.reshape(3, rp)
    flat = flat[:, inv_np] if blocked else flat[:, :r]
    img = flat.T.reshape(h, w, 3)
    return img, (s0, s1, acc, start + config.spp)


def render_whitted_sharded(
    scene,
    width: int = 800,
    height: int = 600,
    supersample: int = 3,
    trace_depth: int = 5,
    hit_bias: float = 0.0,
    mesh=None,
    ray_tile: int | None = None,
):
    """Whitted (3.2.0x) frame with the ray axis sharded over ``mesh`` —
    P1 sharding for the queue/tree family (SURVEY §2e P1/P7). Rays are a
    formula of the absolute ray index and the tracer is deterministic, so
    each device traces its contiguous ray shard independently and the
    result is bitwise identical to the single-device render. Zero
    collectives; assembly happens when the caller materializes the image.

    Returns [H, W, 3] float32 in 0..255 scale.
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from se195_raytracer_tpu.models.whitted import (
        whitted_camera_rays_device,
        whitted_trace,
    )
    from se195_raytracer_tpu.parallel.mesh import RAY_AXIS

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    ss2 = supersample * supersample
    n = width * height * ss2
    if ray_tile is None:
        ray_tile = min((n + n_dev - 1) // n_dev, 256 * 1024)

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def shard_body(o, d):
        # Chunk the shard so the unrolled tree's working set stays bounded
        # (same discipline as _whitted_frame_xla's lax.map).
        ns = o.shape[0]
        pad = (-ns) % ray_tile
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
            d = jnp.concatenate([d, jnp.zeros((pad, 3), jnp.float32)])
        chunks = (ns + pad) // ray_tile
        acc = jax.lax.map(
            lambda od: whitted_trace(scene, od[0], od[1], trace_depth, hit_bias),
            (o.reshape(chunks, ray_tile, 3), d.reshape(chunks, ray_tile, 3)),
        )
        return acc.reshape(-1, 3)[:ns]

    @jax.jit
    def frame():
        o, d = whitted_camera_rays_device(width, height, supersample)
        pad = (-n) % n_dev
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
            d = jnp.concatenate([d, jnp.zeros((pad, 3), jnp.float32)])
        acc = shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(RAY_AXIS), P(RAY_AXIS)),
            out_specs=P(RAY_AXIS),
            check_vma=False,
        )(o, d)
        acc = acc[:n].reshape(height, width, ss2, 3).sum(axis=2)
        return jnp.clip(acc * jnp.float32(256.0 / ss2), 0.0, 255.0)

    return frame()


def render_whitted5_sharded(
    scene,
    width: int = 320,
    height: int = 240,
    spp: int = 1,
    trace_depth: int | None = None,
    seed: int = 0,
    mesh=None,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """raytracer5-family frame with the ray axis sharded over ``mesh``.

    The per-ray counter-RNG state — ``whitted5_trace``'s contract is a
    (key, draw-counter) pair, NOT MWC seed words — is initialized over
    the FULL frame with keys derived from the absolute ray id
    (``_init_state5_np``, the same host-side init ``render_whitted5``
    uses) and then sharded, so every device consumes exactly the streams
    the single-device render would (multi-host determinism, SURVEY §7
    hard part 6). Output agrees with ``render_whitted5`` to within 1 ulp
    (a handful of pixels differ by <=1e-6 from XLA fusing the shard_map
    body differently than the plain jit — the smallpt shard paths are
    bitwise only because both sides execute the identical Pallas
    program; tests/test_sharding.py::test_whitted5_sharded_invariant
    pins the bound). Returns [H, W, 3] float32 linear radiance.
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from se195_raytracer_tpu.models.whitted5 import (
        TRACEDEPTH5,
        _init_state5_np,
        camera_rays5,
        whitted5_trace,
    )
    from se195_raytracer_tpu.parallel.mesh import RAY_AXIS

    if trace_depth is None:
        trace_depth = TRACEDEPTH5
    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    r = width * height
    pad = (-r) % n_dev
    s0, s1 = _init_state5_np(r, seed)

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    if use_pallas:
        from se195_raytracer_tpu.kernels.whitted5_kernel import (
            whitted5_trace_pallas,
        )

        def trace_fn(sc, o, d, st):
            return whitted5_trace_pallas(
                sc, o, d, st, trace_depth, interpret=interpret
            )
    else:
        def trace_fn(sc, o, d, st):
            return whitted5_trace(sc, o, d, st, trace_depth)

    def shard_body(sc, o, d, s0, s1):
        # Structurally IDENTICAL to models/whitted5._whitted5_frame (same
        # lax.scan accumulate, same final division): matching the program
        # structure keeps XLA's fusion/FMA rounding decisions identical,
        # which bitwise shard-invariance requires — a python-unrolled spp
        # loop here produced ~1e-4-level drift vs the single-device frame.
        # ``use_pallas`` swaps in the fused level kernels: each device
        # runs the same per-tile kernel program on its shard with
        # absolute-id RNG keys, so shard outputs match the single-device
        # kernel render the same way.
        def body(carry, _):
            st, acc = carry
            col, st = trace_fn(sc, o, d, st)
            return (st, acc + col), None

        init = ((s0, s1), jnp.zeros((o.shape[0], 3)))
        (_, acc), _ = jax.lax.scan(body, init, None, length=spp)
        return acc / spp

    scene_specs = jax.tree.map(lambda _: P(), scene)

    @jax.jit
    def frame(sc, o, d, s0, s1):
        # Scene, o and d are jit ARGUMENTS, not closed-over constants:
        # baking them into the graph lets XLA constant-fold/fuse the
        # trace differently from the single-device _whitted5_frame
        # (which takes them as args), breaking bitwise shard-invariance.
        if pad:
            # Inert padding rays: d=0 yields misses; lanes sliced off below.
            o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
            d = jnp.concatenate([d, jnp.zeros((pad, 3), jnp.float32)])
            s0 = jnp.concatenate([s0, jnp.full((pad,), 2, s0.dtype)])
            s1 = jnp.concatenate([s1, jnp.full((pad,), 2, s1.dtype)])
        acc = shard_map(
            shard_body, mesh=mesh,
            in_specs=(scene_specs, P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                      P(RAY_AXIS)),
            out_specs=P(RAY_AXIS),
            check_vma=False,
        )(sc, o, d, s0, s1)
        return acc[:r].reshape(height, width, 3)

    o, d = camera_rays5(width, height)
    return frame(scene, o, d, s0, s1)
