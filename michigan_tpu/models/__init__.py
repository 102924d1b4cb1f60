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
