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


# (features_index, out_channels) for every conv in the slice plan — the
# contract shared with training/convert.convert_vgg19
VGG19_CONVS = [(s[1], s[2]) for s in _PLAN if s[0] == "conv"]

# where pretrained weights are looked for, in priority order:
#   1. $MICHIGAN_VGG19 (either a torchvision .pth or a converted .npz)
#   2. <checkpoints_dir>/vgg19.npz (converted cache; written by the CLI
#      `python -m michigan_tpu.training.convert --vgg <pth> --out <npz>`)
#   3. <checkpoints_dir>/vgg19-dcbb9e9d.pth (the torchvision release file,
#      reference architecture.py:160-190 downloads this via torchvision)
VGG19_ENV = "MICHIGAN_VGG19"


def find_vgg19_weights(checkpoints_dir: str = "./checkpoints"):
    import os

    cand = [os.environ.get(VGG19_ENV, "")]
    for base in (checkpoints_dir, "."):
        cand += [
            os.path.join(base, "vgg19.npz"),
            os.path.join(base, "vgg19-dcbb9e9d.pth"),
            os.path.join(base, "vgg19.pth"),
        ]
    for path in cand:
        if path and os.path.exists(path):
            return path
    return None


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_vgg19_npz(variables, path: str) -> None:
    import numpy as np

    np.savez(path, **_flatten(variables))


def load_vgg19_variables(rng, checkpoints_dir: str = "./checkpoints",
                         context: str = "training"):
    """Returns (variables, pretrained: bool).

    The reference's VGG/style/content losses and FID run on ImageNet-
    pretrained VGG19 (architecture.py:160-190); with random weights those
    numbers are meaningless, so the fallback warns LOUDLY.
    """
    import warnings

    import jax
    import jax.numpy as jnp
    import numpy as np

    path = find_vgg19_weights(checkpoints_dir)
    if path and path.endswith(".npz"):
        flat = dict(np.load(path))
        print(f"loaded pretrained VGG19 from {path}")
        return _unflatten(flat), True
    if path:  # .pth
        from michigan_tpu.training.convert import convert_vgg19, load_pth

        state = load_pth(path)
        # torchvision full-model state_dicts prefix conv keys 'features.'
        state = {
            k[len("features."):] if k.startswith("features.") else k: v
            for k, v in dict(state).items()
        }
        variables = jax.tree_util.tree_map(np.asarray, convert_vgg19(state))
        print(f"loaded pretrained VGG19 from {path} (converted from torch)")
        return variables, True

    warnings.warn(
        f"VGG19 weights not found (searched $MICHIGAN_VGG19, "
        f"{checkpoints_dir}/vgg19.npz, vgg19-dcbb9e9d.pth): {context} will "
        "run on a RANDOM VGG backbone — perceptual/style/content losses and "
        "FID are NOT comparable to the reference. Convert weights with "
        "`python -m michigan_tpu.training.convert --vgg <torch.pth> --out "
        "checkpoints/vgg19.npz`.",
        stacklevel=2,
    )
    # Feature-preserving fallback init.  The process-default init type is the
    # GAN nets' gain-0.02 xavier (config.py --init_type), which collapses a
    # 16-conv ReLU tower's activations to ~0 and silently zeroed the
    # VGG/style/content losses in training.  Kaiming fan_in (std=sqrt(2/fan))
    # keeps activation variance ~constant through conv+ReLU, so the loss
    # terms produce real gradients even without ImageNet weights
    # (reference always trains them pretrained, loss.py:178-207).
    from michigan_tpu.models.layers import set_default_init_type

    prev = set_default_init_type("kaiming")
    try:
        variables = VGG19().init(rng, jnp.zeros((1, 64, 64, 3)))
    finally:
        set_default_init_type(*prev)
    return variables, False
