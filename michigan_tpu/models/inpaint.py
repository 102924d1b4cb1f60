"""Orientation inpainting generators IG / SIG (reference generator.py:450-665).

Topology (non-skip variant, the one the released models use): reflect-pad
7x7 spectral conv encoder to 256ch at 1/4 res, 12 dilated spectral resblocks
+ self-attention (concat output -> 512ch), spectral transposed-conv decoder,
(tanh+1)/2 output.  IG input is 4ch (orient-RGB-with-noise + hole), SIG 5ch
(+ stroke mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from michigan_tpu.models.layers import (
    TorchConv,
    TorchConvTranspose,
    reflect_pad,
)
from michigan_tpu.ops.norms import instance_norm


def _in_act(y, act=None, use_pallas=False):
    """IN + optional activation.  IG/SIG run frozen under stop_gradient
    (pix2pix_model.py:196-201, 260-265), so the fused Pallas kernel — which
    has no AD rule — is safe on every path when --use_pallas."""
    if use_pallas:
        from michigan_tpu.ops.pallas.spade import fused_instance_norm

        return fused_instance_norm(y, act=act)
    y = instance_norm(y)
    if act == "relu":
        return jax.nn.relu(y)
    if act == "lrelu":
        return jax.nn.leaky_relu(y, 0.2)
    return y


class DilatedResnetBlock(nn.Module):
    """generator.py:450-464: reflect2 -> spectral 3x3 dil2 -> IN -> ReLU ->
    reflect1 -> spectral 3x3 -> IN; residual add."""

    dim: int
    use_pallas: bool = False
    use_pallas_epilogue: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.use_pallas_epilogue:
            # whole block as two fused conv+IN(+act/+residual) kernels —
            # the conv is computed inside the Pallas program, so the block
            # writes each intermediate to HBM exactly once (epilogue.py)
            from michigan_tpu.ops.pallas.epilogue import conv3x3_in_act

            k1, b1 = TorchConv(
                self.dim, 3, padding=0, dilation=2, spectral=True,
                name="conv1", return_kernel=True,
            )(x, train)
            y = conv3x3_in_act(reflect_pad(x, 2), k1, b1, dilation=2, act="relu")
            k2, b2 = TorchConv(
                self.dim, 3, padding=0, spectral=True,
                name="conv2", return_kernel=True,
            )(y, train)
            return conv3x3_in_act(reflect_pad(y, 1), k2, b2, residual=x)

        y = reflect_pad(x, 2)
        y = TorchConv(self.dim, 3, padding=0, dilation=2, spectral=True, name="conv1")(
            y, train
        )
        y = _in_act(y, "relu", self.use_pallas)
        y = reflect_pad(y, 1)
        y = TorchConv(self.dim, 3, padding=0, spectral=True, name="conv2")(y, train)
        y = _in_act(y, None, self.use_pallas)
        return x + y


class SelfAttention(nn.Module):
    """generator.py:467-485: 1x1 q/k/v, softmax over keys, concat output."""

    dim: int
    downsample: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n, h, w, c = x.shape
        q = TorchConv(self.dim // self.downsample, 1, name="query_conv")(x, train)
        k = TorchConv(self.dim // self.downsample, 1, name="key_conv")(x, train)
        v = TorchConv(self.dim, 1, name="value_conv")(x, train)
        qf = q.reshape(n, h * w, -1)
        kf = k.reshape(n, h * w, -1)
        vf = v.reshape(n, h * w, -1)
        energy = jnp.einsum("bpc,bqc->bpq", qf, kf)
        att = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bpq,bqc->bpc", att, vf).reshape(n, h, w, c)
        return jnp.concatenate([x, out], axis=-1)


class _InpaintBase(nn.Module):
    opt: object
    in_channels: int = 4
    blocks: int = 12

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pallas = getattr(self.opt, "use_pallas", False)
        # encoder (generator.py:512-524)
        y = reflect_pad(x, 3)
        y = TorchConv(64, 7, padding=0, spectral=True, name="encoder_1")(y, train)
        y = _in_act(y, "lrelu", pallas)
        y = TorchConv(128, 4, 2, padding=1, spectral=True, name="encoder_4")(y, train)
        y = _in_act(y, "lrelu", pallas)
        y = TorchConv(256, 4, 2, padding=1, spectral=True, name="encoder_7")(y, train)
        y = _in_act(y, "lrelu", pallas)

        # middle: 12 dilated resblocks + self-attention (generator.py:526-530)
        epilogue = getattr(self.opt, "use_pallas_epilogue", False)
        for i in range(self.blocks):
            y = DilatedResnetBlock(
                256, use_pallas=pallas, use_pallas_epilogue=epilogue,
                name=f"middle_{i}",
            )(y, train)
        y = SelfAttention(256, name=f"middle_{self.blocks}")(y, train)

        # decoder (generator.py:548-557)
        y = TorchConvTranspose(128, 4, 2, padding=1, spectral=True, name="decoder_0")(
            y, train
        )
        y = _in_act(y, "relu", pallas)
        y = TorchConvTranspose(64, 4, 2, padding=1, spectral=True, name="decoder_3")(
            y, train
        )
        y = _in_act(y, "relu", pallas)
        y = reflect_pad(y, 3)
        y = TorchConv(3, 7, padding=0, name="decoder_7")(y, train)
        return (jnp.tanh(y) + 1.0) / 2.0


class InpaintGenerator(_InpaintBase):
    """netIG: input [orient_rgb_with_noise (3), hole (1)] at 256^2."""

    in_channels: int = 4


class SInpaintGenerator(_InpaintBase):
    """netSIG: input [orient_rgb_with_noise (3), hole (1), stroke_mask (1)]."""

    in_channels: int = 5
