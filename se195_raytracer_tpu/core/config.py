"""Typed render configuration.

Replaces the reference's three config tiers (SURVEY.md §5): compile-time
#defines (TRACEDEPTH, WORK_GROUP_SIZE, SMALLPT_CPU/GPU, CHOOSE_SCENE...),
CLI args (<useGPU> <wgSize> <kernel> <w> <h> <scene>), and runtime globals
(useOpenCL/useGPU/forceWorkSize) with one dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 640
    height: int = 480  # reference defaults: displayfunc.cpp:61-62
    spp: int = 1  # samples per pixel (progressive passes)
    # Bounce budget. The reference runs the bounce body for depth = 0..6
    # inclusive (geomfunc.h:182-187 terminates when depth > 6), i.e. 7
    # iterations; max_depth counts body iterations.
    max_depth: int = 7
    integrator: str = "pt"  # "pt" (RadiancePathTracing) | "dl" (DirectLighting)
    rng: str = "mwc"  # "mwc" (reference-exact) | "counter" (threefry)
    seed: int = 0
    # Rays processed per inner chunk; bounds the [rays, spheres] working set
    # (the TPU analogue of the OpenCL work-group size knob,
    # smallptGPU.cpp:595-614). None = whole image at once.
    ray_tile: Optional[int] = None
    # Use the Pallas fused kernel path when available; pure-jnp otherwise.
    use_pallas: bool = False
    # Run Pallas kernels in interpreter mode (CPU semantics testing; the
    # reference's DEBUGGING printf hook analogue, raytracer_kernel.cl:1-6).
    pallas_interpret: bool = False
    # Whitted-family (3.2.0x) knobs — defaults match the reference's
    # compile-time constants (raytracer_kernel.cl:8 TRACEDEPTH 5, :291-292
    # 3x3 supersampling; hit_bias 0.005 is the 3.2.03 near-hit slack,
    # :128 — default 0.0 = 3.2.02/CPU semantics).
    supersample: int = 3
    trace_depth: int = 5
    hit_bias: float = 0.0
    # Differentiable-visibility relaxation width (world units), the
    # SURVEY §7 hard-part-2 stretch: 0.0 = the reference's hard
    # step-function visibility (silhouette pixels carry no gradient);
    # > 0 smooths the nearest-hit winner selection and shadow occlusion
    # over this length scale in BOTH forward and backward, making the
    # rendering differentiable across silhouettes/occlusion boundaries
    # (finite differences of the relaxed forward then agree with
    # autodiff everywhere). Only the jnp differentiable path honors it.
    soft_edges: float = 0.0

    def __post_init__(self):
        if self.integrator not in ("pt", "dl"):
            raise ValueError(f"unknown integrator {self.integrator!r}")
        if self.rng not in ("mwc", "counter"):
            raise ValueError(f"unknown rng {self.rng!r}")
