"""Import machinery to use the reference torch implementation as a numerical
oracle in tests.  The reference is treated as untrusted read-only data: we
import its modules under stubs (torchvision is absent in this image) purely to
compare numbers.
"""

from __future__ import annotations

import dataclasses
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_stubs():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")

    def _random_vgg19(*a, pretrained=False, **k):
        """torchvision.models.vgg19 stand-in: the exact .features layout
        (conv/relu/pool indices 0..36) with RANDOM weights — ImageNet weights
        are not downloadable here.  Lets the reference's VGGLoss /
        StyleContentLoss (architecture.py:160-190) construct and run; the
        numbers are only meaningful for cross-framework parity of the
        surrounding code, never as perceptual quality."""
        import torch.nn as nn

        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
                in_ch = v
        model = types.SimpleNamespace(features=nn.Sequential(*layers))
        return model

    tv_models.vgg19 = _random_vgg19
    tv_transforms = types.ModuleType("torchvision.transforms")

    # Minimal faithful transforms so the reference's get_transform
    # (base_dataset.py:420-454) is executable in this torchvision-less env.
    # Only the classes its test-phase path touches (Resize, Lambda, ToTensor,
    # Normalize, Compose); train-only ColorJitter raises if constructed.
    import numpy as _np

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class _Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    class _Resize:
        def __init__(self, size, interpolation=None):
            self.size = size  # [h, w]
            self.interpolation = interpolation

        def __call__(self, img):
            h, w = self.size
            return img.resize((w, h), self.interpolation)

    class _ToTensor:
        def __call__(self, pic):
            import torch as _torch

            arr = _np.array(pic, copy=True)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = _torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()
            if t.dtype == _torch.uint8:
                return t.float().div(255.0)
            return t.float()

    class _Normalize:
        def __init__(self, mean, std):
            self.mean, self.std = mean, std

        def __call__(self, t):
            import torch as _torch

            mean = _torch.tensor(self.mean).view(-1, 1, 1)
            std = _torch.tensor(self.std).view(-1, 1, 1)
            return (t - mean) / std

    def _no_color_jitter(*a, **k):
        raise RuntimeError("ColorJitter not stubbed (train-only path)")

    tv_transforms.Compose = _Compose
    tv_transforms.Lambda = _Lambda
    tv_transforms.Resize = _Resize
    tv_transforms.ToTensor = _ToTensor
    tv_transforms.Normalize = _Normalize
    tv_transforms.ColorJitter = _no_color_jitter
    tv.models = tv_models
    tv.transforms = tv_transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.transforms"] = tv_transforms


def import_reference():
    """Returns the reference's models.networks package, CPU-importable."""
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        # append, never prepend: the reference root also contains top-level
        # modules named inference/train/demo/cal_orientation, and prepending
        # would shadow the repo's own entry points for every later test in
        # the session (observed: `from inference import batch_inference`
        # resolving into /root/reference once an oracle test ran first)
        sys.path.append(REFERENCE_ROOT)
    import models.networks.generator as ref_gen
    import models.networks.discriminator as ref_disc
    import models.networks.encoder as ref_enc

    return types.SimpleNamespace(
        generator=ref_gen, discriminator=ref_disc, encoder=ref_enc
    )


def import_reference_pipeline():
    """Returns the reference's full inference pipeline modules
    (models.networks factories, Pix2PixModel, data.base_dataset, util.util)
    for end-to-end oracles against /root/reference/inference.py:23-56."""
    import_reference()  # stubs + sys.path
    import models.networks as ref_networks
    import models.pix2pix_model as ref_p2p
    import data.base_dataset as ref_data
    import util.util as ref_util

    return types.SimpleNamespace(
        networks=ref_networks,
        Pix2PixModel=ref_p2p.Pix2PixModel,
        base_dataset=ref_data,
        util=ref_util,
    )


def torch_opt(opt):
    """My Options dataclass -> an argparse-like namespace the reference code
    can consume (it reads ~40 attributes off `opt`)."""
    ns = types.SimpleNamespace(**dataclasses.asdict(opt))
    ns.gpu_ids = []
    return ns
