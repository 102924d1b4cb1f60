"""VGG19 feature extractor for perceptual/style losses.

Replaces torchvision's pretrained VGG19 sliced at relu1_1/2_1/3_1/4_1/5_1
(reference architecture.py:160-190).  Weights are converted from a torchvision
state_dict when one is available (training/convert.py); otherwise the random
initialization still exercises the loss plumbing (documented divergence: the
environment has no torchvision/network access to fetch ImageNet weights).
"""

from __future__ import annotations

from typing import List

import jax
import flax.linen as nn

from michigan_tpu.models.layers import TorchConv
from michigan_tpu.ops.resize import max_pool_same

# Static replay of torchvision vgg19.features[0:30].  Entries are either
# ("conv", features_index, out_channels) followed by an implicit ReLU, or
# ("pool",).  Slice boundaries (reference architecture.py:169-178) come after
# the relus at features indices 1, 6, 11, 20, 29.
_PLAN = [
    ("conv", 0, 64), ("slice",),
    ("conv", 2, 64), ("pool",),
    ("conv", 5, 128), ("slice",),
    ("conv", 7, 128), ("pool",),
    ("conv", 10, 256), ("slice",),
    ("conv", 12, 256), ("conv", 14, 256), ("conv", 16, 256), ("pool",),
    ("conv", 19, 512), ("slice",),
    ("conv", 21, 512), ("conv", 23, 512), ("conv", 25, 512), ("pool",),
    ("conv", 28, 512), ("slice",),
]


class VGG19(nn.Module):
    """Returns [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1] features."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        outs = []
        for step in _PLAN:
            if step[0] == "conv":
                x = jax.nn.relu(
                    TorchConv(step[2], 3, padding=1, name=f"features_{step[1]}")(x)
                )
            elif step[0] == "pool":
                x = max_pool_same(x, 2, 2, 0)
            else:  # slice boundary
                outs.append(x)
        return outs
