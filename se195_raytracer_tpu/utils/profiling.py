"""Profiling — the real-trace upgrade of the reference's wall-clock-only
instrumentation (SURVEY.md §5: ``WallClockTime`` captions,
displayfunc.cpp:69-80; no device-side profiling anywhere in the tree).

``trace`` wraps a region in a ``jax.profiler`` trace whose output loads
in Perfetto / TensorBoard, exposing per-kernel device time, HBM traffic,
and host/device gaps — the information the reference approximated with
"Sample/sec" captions. ``maybe_trace`` is the no-op-when-disabled form
the CLI uses.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(trace_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region into
    ``trace_dir`` (view with TensorBoard's profile plugin or Perfetto)."""
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """``trace`` when a directory is given, no-op otherwise."""
    if trace_dir:
        with trace(trace_dir):
            yield
    else:
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-region inside a trace (shows as a span on the timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
