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
