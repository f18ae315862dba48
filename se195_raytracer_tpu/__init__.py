"""se195_raytracer_tpu — a TPU-native differentiable ray/path-tracing framework.

A from-scratch JAX / XLA / Pallas / pjit framework with the capabilities of
the reference OpenCL ray tracer (`markrosoft/se-195-project-ray-tracer`):

* SmallptGPU-style Monte-Carlo path tracing and direct-lighting integrators
  (reference: smallptgpu-v1.6/geomfunc.h, rendering_kernel.cl) expressed as
  batched `lax.scan` bounce loops over sharded ray batches.
* Whitted reflect/refract tracing over sphere+plane scenes with Phong
  shading, hard shadows and Beer's-law transparency (reference:
  Raytracer3.2.03/raytracer_kernel.cl, raytracer3.0.06 ray-tree form).
* Bit-compatible multiply-with-carry RNG (reference: simplernd.h) plus
  counter-based stateless PRNG for shard-invariant multi-host rendering.
* Progressive sample accumulation with resumable `(accum, seeds, step)`
  state (reference: rendering_kernel.cl:80-89, smallptGPU.cpp:739-755).
* `.scn` scene zoo, procedural builders and the fractal hypersphere
  generator (reference: displayfunc.cpp:120-180, scene_build_complex.pl).
* Exact pixel gradients w.r.t. sphere geometry, materials, emission and
  camera pose; inverse-rendering optimization driver.
* Multi-chip/multi-host scaling via `jax.sharding.Mesh` over the ray/pixel
  axis with `psum` gradient all-reduce.

The package name is the importable form of `se-195-project-ray-tracer_tpu`.
"""

__version__ = "0.1.0"

from se195_raytracer_tpu.core.types import (  # noqa: F401
    DIFF,
    SPEC,
    REFR,
    EPSILON,
    Scene,
    Camera,
    CameraBasis,
)
from se195_raytracer_tpu.core.config import RenderConfig  # noqa: F401
