"""Flax network zoo mirroring the reference's models/networks/ inventory.

Factories follow reference models/networks/__init__.py:51-85 but with an
explicit registry instead of string reflection.
"""

from michigan_tpu.models.generator import SPADEBGenerator
from michigan_tpu.models.inpaint import InpaintGenerator, SInpaintGenerator, SelfAttention
from michigan_tpu.models.discriminator import MultiscaleDiscriminator, NLayerDiscriminator
from michigan_tpu.models.encoders import (
    ConvEncoder,
    ImageEncoder,
    ImageEncoder2,
    ImageEncoder3,
    BackgroundEncode,
    BackgroundEncode2,
)
from michigan_tpu.models.blend import Blend2Generator
from michigan_tpu.models.maskgan import (
    FeatureEncoder,
    LabelEncoder,
    SFTLayer,
    StyleEncoder,
)
from michigan_tpu.models.vgg import VGG19

GENERATORS = {"spadeb": SPADEBGenerator}
DISCRIMINATORS = {"multiscale": MultiscaleDiscriminator, "n_layer": NLayerDiscriminator}
INPAINTERS = {"inpaint": InpaintGenerator, "sinpaint": SInpaintGenerator}
BLENDERS = {"blend2": Blend2Generator}


def define_G(opt, axis_name=None):
    return GENERATORS[opt.netG](opt=opt, axis_name=axis_name)


def define_D(opt, axis_name=None):
    # the reference's MultiscaleDiscriminator builds its sub-discriminators
    # by --netD_subarch reflection (discriminator.py:30-44); only 'n_layer'
    # ships, so reject anything else loudly instead of ignoring the flag
    sub = getattr(opt, "netD_subarch", "n_layer")
    if opt.netD == "multiscale" and sub != "n_layer":
        raise ValueError(
            f"--netD_subarch '{sub}' is not implemented (only 'n_layer', "
            "matching the reference's shipped subarchitectures)"
        )
    return DISCRIMINATORS[opt.netD](opt=opt, axis_name=axis_name)


def define_E(opt, axis_name=None):
    return ConvEncoder(opt=opt, axis_name=axis_name)


def define_IG(opt):
    return INPAINTERS[opt.netIG](opt=opt)


def define_SIG(opt):
    return INPAINTERS[opt.netSIG](opt=opt)


def define_B(opt):
    return BLENDERS[opt.netB](opt=opt)


def define_FE(opt):
    """pix2pixHD instance-feature encoder (models/networks/__init__.py:77-80)."""
    return FeatureEncoder(
        input_nc=opt.feat_input_nc, output_nc=opt.feat_num, ngf=opt.nef
    )
