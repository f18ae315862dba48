"""Device mesh + sharding layout.

The reference is single-device only (smallptGPU.cpp:463-467 always picks
devices[0]) — this module is the gap the framework fills (SURVEY.md §2e P7):
rays/pixels are the batch ("sequence") axis, sharded over a 1-D mesh axis
``rays``; the scene is tiny and replicated (§2e P3). The forward pass needs
zero collectives; scene-parameter gradients are all-reduced by XLA-inserted
``psum`` over ICI because the scene is replicated while pixel shards are
not (§2e P6).

Multi-host: same code — ``jax.distributed.initialize()`` then build the
mesh over all devices; keying RNG by absolute pixel id keeps output
bitwise identical to single-device rendering.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray/pixel) axis; replicate the rest."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pixels(tree, mesh: Mesh):
    """Place every leaf with a leading ray axis on the mesh, sharded."""
    sh = ray_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh) if getattr(x, "ndim", 0) >= 1 else x, tree
    )


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
