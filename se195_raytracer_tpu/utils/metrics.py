"""Structured metrics and topology logging.

Replaces the reference's observability surface (SURVEY.md §5): the stderr
device inventory at startup (smallptGPU.cpp:236-459), the per-pass
"Rendering time ... Sample/sec" caption (smallptGPU.cpp:777-781,
smallptCPU.cpp:126-129) and the mm:ss.mmm frame timers
(raytracer.c:759-770) become structured dicts + a JSON-lines logger.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional, TextIO


def device_inventory() -> dict:
    """Mesh/device topology at init — the `jax.devices()` analogue of the
    reference's platform/device dump."""
    import jax

    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "device_count": len(devs),
        "local_device_count": jax.local_device_count(),
        "devices": [
            {
                "id": d.id,
                "platform": d.platform,
                "kind": getattr(d, "device_kind", "?"),
                "process": d.process_index,
            }
            for d in devs
        ],
    }


def render_metrics(width: int, height: int, spp: int, elapsed_s: float,
                   pass_index: Optional[int] = None) -> dict:
    """Per-step metrics dict — samples/sec formula per the reference
    caption (samples*W*H/elapsed)."""
    rays = width * height * spp
    m = {
        "width": width,
        "height": height,
        "spp": spp,
        "elapsed_s": round(elapsed_s, 6),
        "rays_per_sec": round(rays / elapsed_s, 1) if elapsed_s > 0 else None,
        "samples_per_sec_k": round(rays / elapsed_s / 1e3, 1) if elapsed_s > 0 else None,
    }
    if pass_index is not None:
        m["pass"] = pass_index
    return m


class MetricsLogger:
    """JSON-lines metrics sink (stderr by default)."""

    def __init__(self, stream: Optional[TextIO] = None):
        self.stream = stream or sys.stderr

    def log(self, event: str, **fields) -> None:
        rec = {"event": event, "t": round(time.time(), 3), **fields}
        print(json.dumps(rec), file=self.stream, flush=True)

    def log_topology(self) -> None:
        self.log("topology", **device_inventory())


class Timer:
    """block_until_ready-aware wall-clock timer (the WallClockTime
    analogue, displayfunc.cpp:69-80)."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False
