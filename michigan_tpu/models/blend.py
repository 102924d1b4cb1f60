"""Blend generator — a working rebuild of the reference's dead capability.

The reference's `Blend2Generator` lost its class header in a bad merge
(generator.py:352-447: its __init__/forward sit inside `Bottleneck`), so
`--use_blender` crashes upstream.  This is the intended U-Net: 7x7 stem on
[hair*mask + bg*(1-mask), mask], 3 stride-2 downs, 3 instance-norm resblocks,
3 skip-concat transposed-conv ups, 7x7 head, tanh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from michigan_tpu.models.layers import (
    ConvBlock,
    TorchConv,
    TorchConvTranspose,
    reflect_pad,
)
from michigan_tpu.ops.masks import wide_edges
from michigan_tpu.ops.norms import instance_norm


class ResnetBlock2(nn.Module):
    """MaskGAN_networks.py:225-239: two 3x3 reflect ConvBlocks (in-norm)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = ConvBlock(self.dim, 3, 1, 1, norm="in", activation="relu",
                      pad_type="reflect", name="block0")(x, train)
        y = ConvBlock(self.dim, 3, 1, 1, norm="in", activation="none",
                      pad_type="reflect", name="block1")(y, train)
        return x + y


class Blend2Generator(nn.Module):
    opt: object
    ngf: int = 32

    @nn.compact
    def __call__(self, hair, background, mask, noise=None, train: bool = False):
        opt = self.opt
        ngf = self.ngf
        hair_mask = mask[..., 1:2] if mask.shape[-1] > 1 else mask
        x = hair * hair_mask + background * (1 - hair_mask)

        if opt.hair_random_disturb and noise is not None:
            edges = wide_edges(hair_mask, th=5.0 / hair_mask.shape[1])
            x = x * (1 - edges) + noise * edges

        def down(name, nf, inp):
            y = TorchConv(nf, 3, 2, 1, name=name)(inp, train)
            return jax.nn.leaky_relu(instance_norm(y), 0.2)

        e1 = reflect_pad(jnp.concatenate([x, hair_mask], axis=-1), 3)
        e1 = TorchConv(ngf, 7, padding=0, name="model1_conv")(e1, train)
        e1 = jax.nn.leaky_relu(instance_norm(e1), 0.2)
        e2 = down("model2_conv", ngf * 2, e1)
        e3 = down("model3_conv", ngf * 4, e2)
        e4 = down("model4_conv", ngf * 8, e3)

        em = e4
        for i in range(3):
            em = ResnetBlock2(ngf * 8, name=f"model_middle_{i}")(em, train)

        def up(name, nf, inp):
            y = TorchConvTranspose(nf, 3, 2, 1, output_padding=1, name=name)(inp, train)
            return jax.nn.leaky_relu(instance_norm(y), 0.2)

        e5 = up("model5_conv", ngf * 4, jnp.concatenate([em, e4], axis=-1))
        e6 = up("model6_conv", ngf * 2, jnp.concatenate([e5, e3], axis=-1))
        e7 = up("model7_conv", ngf, jnp.concatenate([e6, e2], axis=-1))
        out = reflect_pad(jnp.concatenate([e7, e1], axis=-1), 3)
        out = TorchConv(3, 7, padding=0, name="model8_conv")(out, train)
        return jnp.tanh(out)
