"""Persistent XLA compilation cache setup.

The reference rebuilds its OpenCL kernel from source on every process
start (smallptGPU.cpp:537-593); on TPU a cold compile of the full render
program costs tens of seconds, so the CLI/bench entry points enable JAX's
persistent compilation cache to make every run after the first fast.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    """Opt-in only (SE195_JAX_CACHE=1): on the axon remote-compile TPU
    backend the persistent cache has been observed to stall executable
    deserialization, so it stays off unless explicitly requested."""
    if os.environ.get("SE195_JAX_CACHE") != "1":
        return
    import jax

    cache_dir = path or os.environ.get(
        "SE195_JAX_CACHE_DIR",
        os.path.expanduser("~/.cache/se195_raytracer_tpu/jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
