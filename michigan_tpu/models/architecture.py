"""SPADE residual block (reference architecture.py:23-85)."""

from __future__ import annotations

from typing import Optional

import jax
import flax.linen as nn

from michigan_tpu.models.layers import TorchConv
from michigan_tpu.models.normalization import SPADE, SPADEImage


class SPADEResnetBlock(nn.Module):
    """2x (SPADE -> LeakyReLU(0.2) -> 3x3 conv) + learned 1x1 shortcut.

    Conv spectral/weight norm follows opt.norm_G / opt.weight_norm_G
    (architecture.py:36-55); SPADE label channels from opt.spade_label_nc().
    """

    fin: int
    fout: int
    opt: object
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, seg: jax.Array, train: bool = False) -> jax.Array:
        opt = self.opt
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout
        spectral = ("spectral" in opt.norm_G) and not opt.weight_norm_G
        wnorm = None
        if opt.weight_norm_G:
            wnorm = "torch" if opt.weight_norm_g == 0 else "fixed"
        spade_cfg = opt.norm_G.replace("spectral", "")
        label_nc = opt.spade_label_nc()

        def spade(name, nc):
            return SPADE(
                spade_cfg, nc, label_nc, use_weight_norm=opt.weight_norm_G,
                axis_name=self.axis_name, name=name,
                use_pallas=getattr(opt, "use_pallas", False),
            )

        def conv(name, nf, ks, pad, bias=True):
            return TorchConv(
                nf, ks, padding=pad, use_bias=bias, spectral=spectral,
                weight_norm=wnorm, name=name,
            )

        x_s = x
        if learned_shortcut:
            x_s = conv("conv_s", self.fout, 1, 0, bias=False)(
                spade("norm_s", self.fin)(x, seg, train), train
            )

        dx = conv("conv_0", fmiddle, 3, 1)(
            jax.nn.leaky_relu(spade("norm_0", self.fin)(x, seg, train), 0.2), train
        )
        dx = conv("conv_1", self.fout, 3, 1)(
            jax.nn.leaky_relu(spade("norm_1", fmiddle)(dx, seg, train), 0.2), train
        )
        return x_s + dx


class SPADEImageBlock(nn.Module):
    """SPADE residual block conditioned on a full-res image via SPADEImage
    norms (architecture.py:88-135).  Non-default capability path."""

    fin: int
    fout: int
    opt: object
    downsample_n: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, image: jax.Array, train: bool = False) -> jax.Array:
        opt = self.opt
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout
        spectral = "spectral" in opt.norm_G
        spade_cfg = opt.norm_G.replace("spectral", "")

        def norm(name, nc):
            return SPADEImage(
                spade_cfg, nc, 3, self.downsample_n, axis_name=self.axis_name,
                name=name,
            )

        def conv(name, nf, ks, pad, bias=True):
            return TorchConv(nf, ks, padding=pad, use_bias=bias,
                             spectral=spectral, name=name)

        x_s = x
        if learned_shortcut:
            x_s = conv("conv_s", self.fout, 1, 0, bias=False)(
                norm("norm_s", self.fin)(x, image, train), train
            )
        dx = conv("conv_0", fmiddle, 3, 1)(
            jax.nn.leaky_relu(norm("norm_0", self.fin)(x, image, train), 0.2), train
        )
        dx = conv("conv_1", self.fout, 3, 1)(
            jax.nn.leaky_relu(norm("norm_1", fmiddle)(dx, image, train), 0.2), train
        )
        return x_s + dx
