"""Multiscale PatchGAN discriminator (reference discriminator.py:14-120)."""

from __future__ import annotations

from typing import List, Optional

import jax
import flax.linen as nn

from michigan_tpu.models.layers import TorchConv
from michigan_tpu.models.normalization import NonSpadeNorm
from michigan_tpu.ops.resize import avg_pool_3x3s2


class NLayerDiscriminator(nn.Module):
    """4-layer PatchGAN, kw=4, padw=2, nf 64->512 cap, spectral-instance norm.

    Returns the list of intermediate features (one per layer group) when
    feature matching is on, else [final prediction] for uniform handling.
    """

    opt: object
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        opt = self.opt
        kw, padw = 4, 2
        nf = opt.ndf
        results = []

        # model0: plain conv (bias, no norm) + LReLU (discriminator.py:84-85)
        y = TorchConv(nf, kw, 2, padw, name="model0_conv")(x, train)
        y = jax.nn.leaky_relu(y, 0.2)
        results.append(y)

        for n in range(1, opt.n_layers_D):
            nf = min(nf * 2, 512)
            stride = 1 if n == opt.n_layers_D - 1 else 2
            y = NonSpadeNorm(
                nf, kw, stride, padw, opt.norm_D, axis_name=self.axis_name,
                name=f"model{n}",
            )(y, train)
            y = jax.nn.leaky_relu(y, 0.2)
            results.append(y)

        y = TorchConv(1, kw, 1, padw, name=f"model{opt.n_layers_D}_conv")(y, train)
        results.append(y)

        if opt.no_ganFeat_loss:
            return [results[-1]]
        return results


class MultiscaleDiscriminator(nn.Module):
    """num_D sub-discriminators over a 2x avg-pool pyramid
    (discriminator.py:30-63).  Returns list-of-lists."""

    opt: object
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[List[jax.Array]]:
        out = []
        for i in range(self.opt.num_D):
            sub = NLayerDiscriminator(
                self.opt, self.axis_name, name=f"discriminator_{i}"
            )
            out.append(sub(x, train))
            if i != self.opt.num_D - 1:
                x = avg_pool_3x3s2(x)
        return out
