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

    def _no_vgg(*a, **k):
        raise RuntimeError("no pretrained vgg in test env")

    tv_models.vgg19 = _no_vgg
    tv_transforms = types.ModuleType("torchvision.transforms")
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


def torch_opt(opt):
    """My Options dataclass -> an argparse-like namespace the reference code
    can consume (it reads ~40 attributes off `opt`)."""
    ns = types.SimpleNamespace(**dataclasses.asdict(opt))
    ns.gpu_ids = []
    return ns
