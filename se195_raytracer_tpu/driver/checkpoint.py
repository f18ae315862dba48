"""Checkpoint / resume for progressive renders.

The reference's progressive state is ``(colors[], seeds[], currentSample)``
(SURVEY.md §5: rendering_kernel.cl:84-89 makes any sample count a valid
stopping point; edits reset via currentSample=0 + re-upload,
smallptGPU.cpp:784-830). Here that state is the render scan carry — this
module serializes it (npz; no heavyweight deps) so long multi-host runs
can snapshot and resume, which the reference never could.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from se195_raytracer_tpu.driver.render import RenderState


def save_render_state(path: str, state: Union[RenderState, tuple]) -> None:
    if isinstance(state, RenderState):
        np.savez_compressed(
            path,
            kind="jnp",
            accum=np.asarray(state.accum),
            s0=np.asarray(state.s0),
            s1=np.asarray(state.s1),
            sample=np.asarray(state.sample),
        )
    else:  # pallas state tuple (s0, s1, acc, sample)
        s0, s1, acc, sample = state
        np.savez_compressed(
            path,
            kind="pallas",
            accum=np.asarray(acc),
            s0=np.asarray(s0),
            s1=np.asarray(s1),
            sample=np.asarray(sample),
        )


def load_render_state(path: str):
    """Returns a RenderState or a pallas state tuple, matching what was
    saved."""
    with np.load(path, allow_pickle=False) as z:
        kind = str(z["kind"])
        accum = jnp.asarray(z["accum"])
        s0 = jnp.asarray(z["s0"])
        s1 = jnp.asarray(z["s1"])
        sample = z["sample"]
        if kind == "jnp":
            return RenderState(accum, s0, s1, jnp.int32(sample))
        return (s0, s1, accum, int(sample))
