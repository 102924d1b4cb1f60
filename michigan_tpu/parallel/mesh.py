"""Device mesh construction.

The reference's only parallelism is single-host DataParallel over <=8 GPUs
with thread-based sync-BN (SURVEY §2.7).  Here the equivalent is an SPMD
mesh: batch sharded over the 'data' axis, parameters replicated, gradients
and BN statistics reduced with `lax.psum` over ICI.  Multi-host falls out of
the same mesh via jax.distributed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def make_mesh(
    mesh_shape: str = "data:-1", devices: Optional[Sequence] = None
) -> Mesh:
    """Build a Mesh from an "axis:size,axis:size" spec; -1 = remaining."""
    devices = list(devices if devices is not None else jax.devices())
    axes = []
    sizes = []
    remaining = len(devices)
    minus_one = None
    for part in mesh_shape.split(","):
        name, size = part.split(":")
        size = int(size)
        axes.append(name)
        sizes.append(size)
        if size == -1:
            minus_one = len(sizes) - 1
        else:
            remaining //= size
    if minus_one is not None:
        sizes[minus_one] = max(remaining, 1)
    total = int(np.prod(sizes))
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(axes))
