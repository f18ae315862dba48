"""Render driver: progressive accumulation, framebuffer, resumable state.

TPU-native replacement for the reference's L4 host runtime
(smallptgpu-v1.6/smallptGPU.cpp UpdateRenderingGPU:642-782,
smallptCPU.cpp UpdateRenderingCPU:77-132): instead of per-frame kernel
launches with blocking pixel readback, the whole progressive loop is one
jitted ``lax.scan`` over samples with the accumulator donated in place —
buffers stay resident on device across steps, and the running-mean update
``colors = (colors*k1 + r)*k2`` (rendering_kernel.cl:84-89) makes any
sample count a valid stopping point, so the scan carry *is* the
checkpoint (SURVEY.md §5 checkpoint/resume).

Framebuffer convention: ``image[row, col]`` with row 0 = TOP of the image.
The reference's camera-space y counts up from the bottom, so row r maps to
camera y = height-1-r (the v-flip of rendering_kernel.cl:79).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.core.rng import MWCState, init_mwc_state, init_state
from se195_raytracer_tpu.core.types import Camera, Scene, update_camera
from se195_raytracer_tpu.models.smallpt import generate_camera_rays, radiance


class RenderState(NamedTuple):
    """Resumable progressive-render state — the TPU analogue of the
    reference's ``(colors[], seeds[], currentSample)`` triple."""

    accum: jnp.ndarray  # [R, 3] running-mean radiance
    s0: jnp.ndarray  # [R] uint32
    s1: jnp.ndarray  # [R] uint32
    sample: jnp.ndarray  # scalar int32 — currentSample


def pixel_coords(width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flattened (x, y) camera coordinates in framebuffer row-major order.

    Index i = row*width + col; x = col, y = height-1-row.
    """
    rows = jnp.arange(height, dtype=jnp.int32)
    cols = jnp.arange(width, dtype=jnp.int32)
    x = jnp.tile(cols, height)
    y = jnp.repeat(height - 1 - rows, width)
    return x, y


def _sample_once(
    scene: Scene,
    basis,
    config: RenderConfig,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    state: MWCState,
    remat: bool = False,
) -> Tuple[jnp.ndarray, MWCState]:
    """One progressive pass: camera rays + radiance for every pixel chunk."""
    direct_only = config.integrator == "dl"

    def chunk_fn(args):
        cx, cy, cs0, cs1 = args
        o, d, st = generate_camera_rays(
            basis, (cs0, cs1), config.width, config.height, cx, cy, config.rng
        )
        r, st = radiance(
            scene, o, d, st, config.max_depth, direct_only, remat=remat,
            rng=config.rng,
            soft_edges=getattr(config, "soft_edges", 0.0),
        )
        return r, st[0], st[1]

    n = xs.shape[0]
    tile = config.ray_tile
    if tile is None and scene.num_spheres > 128:
        # Large scenes: the [rays, spheres] intersection working set is
        # N*4 bytes/ray per temp; chunk rays so it stays ~100 MB.
        target = max(8192, (100_000_000 // (scene.num_spheres * 4)) // 128 * 128)
        tile = next(
            (t for t in range(min(target, n), 0, -1) if n % t == 0), None
        )
    if tile is None or tile >= n:
        r, s0, s1 = chunk_fn((xs, ys, state[0], state[1]))
        return r, (s0, s1)
    if n % tile != 0:
        raise ValueError(f"ray_tile {tile} must divide pixel count {n}")
    k = n // tile
    shaped = (
        xs.reshape(k, tile),
        ys.reshape(k, tile),
        state[0].reshape(k, tile),
        state[1].reshape(k, tile),
    )
    r, s0, s1 = jax.lax.map(chunk_fn, shaped)
    return r.reshape(n, 3), (s0.reshape(n), s1.reshape(n))


def init_render_state(config: RenderConfig) -> RenderState:
    n = config.width * config.height
    s0, s1 = init_state(config.rng, (n,), config.seed)
    return RenderState(
        accum=jnp.zeros((n, 3), jnp.float32),
        s0=s0,
        s1=s1,
        sample=jnp.int32(0),
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "num_samples", "remat"),
    donate_argnums=(2,),
)
def render_steps(
    scene: Scene,
    camera: Camera,
    state: RenderState,
    config: RenderConfig,
    num_samples: int,
    remat: bool = False,
) -> RenderState:
    """Advance the progressive render by ``num_samples`` passes.

    The scan carry is donated, so repeated calls accumulate in place on
    device — the replacement for the reference's adaptive multi-launch
    batching (smallptGPU.cpp:739-755) without any host round-trips.
    """
    basis = update_camera(camera, config.width, config.height)
    xs, ys = pixel_coords(config.width, config.height)

    def step(st: RenderState, _):
        r, (s0, s1) = _sample_once(
            scene, basis, config, xs, ys, (st.s0, st.s1), remat
        )
        k1 = st.sample.astype(jnp.float32)
        k2 = 1.0 / (k1 + 1.0)
        accum = jnp.where(st.sample == 0, r, (st.accum * k1 + r) * k2)
        return RenderState(accum, s0, s1, st.sample + 1), None

    state, _ = jax.lax.scan(step, state, None, length=num_samples)
    return state


def render(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    state=None,
):
    """Render ``config.spp`` samples; returns ([H, W, 3] radiance, state).

    Pass the returned state back in to continue accumulating (progressive
    preview / checkpoint-resume, reference ReInit semantics:
    smallptCPU.cpp:139-166). With ``config.use_pallas`` the fused Pallas
    kernel path is used (kernels/pt_kernel.py — ~100x faster on TPU); its
    resumable state is opaque but interchangeable in this API.
    """
    if config.use_pallas:
        # Small scenes get the fully unrolled kernel; large ones (e.g.
        # complex, 783 spheres) the fori_loop kernel with the scene table
        # in SMEM — selection inside pt_kernel (UNROLL_MAX_SPHERES).
        # Both RNG modes (reference MWC, shard-invariant counter) run
        # in-kernel.
        from se195_raytracer_tpu.kernels.pt_kernel import render_pallas

        return render_pallas(
            scene, camera, config, state=state,
            interpret=config.pallas_interpret,
        )
    if state is None:
        state = init_render_state(config)
    state = render_steps(scene, camera, state, config, config.spp)
    img = state.accum.reshape(config.height, config.width, 3)
    return img, state


def render_image(scene, camera, config) -> np.ndarray:
    """Convenience: render and return a host numpy [H, W, 3] float32 image."""
    img, _ = render(scene, camera, config)
    return np.asarray(img)
