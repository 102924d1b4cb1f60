"""MaskGAN/pix2pixHD auxiliary networks (reference MaskGAN_networks.py).

`FeatureEncoder` is netFE (--use_instance_feat): the pix2pixHD encoder whose
instance-wise average pooling (MaskGAN_networks.py:36-49, a quadruple Python
loop upstream) is vectorized here as a one-hot segment mean over instance
ids.  StyleEncoder/LabelEncoder/SFTLayer mirror the unused-by-default blocks
so the capability surface is complete.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from michigan_tpu.models.layers import (
    ConvBlock,
    TorchConv,
    TorchConvTranspose,
    TorchLinear,
    reflect_pad,
)
from michigan_tpu.ops.norms import instance_norm


def instance_wise_avg(feat: jax.Array, inst: jax.Array, num_ids: int) -> jax.Array:
    """Replace each instance region with its per-channel mean.

    feat (N,H,W,C); inst (N,H,W,1) integer ids < num_ids.  Equivalent to
    MaskGAN_networks.py:40-48 without the Python loops: a one-hot segment
    mean, one matmul pair on the MXU.
    """
    n, h, w, c = feat.shape
    ids = jnp.clip(inst[..., 0].astype(jnp.int32), 0, num_ids - 1)
    onehot = jax.nn.one_hot(ids.reshape(n, -1), num_ids, dtype=feat.dtype)  # (N,HW,K)
    f = feat.reshape(n, -1, c)
    sums = jnp.einsum("npk,npc->nkc", onehot, f)
    counts = onehot.sum(axis=1)[..., None]  # (N,K,1)
    means = sums / jnp.maximum(counts, 1.0)
    out = jnp.einsum("npk,nkc->npc", onehot, means)
    return out.reshape(n, h, w, c)


class FeatureEncoder(nn.Module):
    """netFE (MaskGAN_networks.py:14-49): reflect 7x7 stem, 4 stride-2 downs,
    4 transpose ups, tanh head, instance-wise average pooling."""

    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 32
    n_downsampling: int = 4
    max_instance_ids: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, inst: jax.Array, train: bool = False):
        ngf = self.ngf
        y = reflect_pad(x, 3)
        y = TorchConv(ngf, 7, padding=0, name="stem")(y, train)
        y = jax.nn.relu(instance_norm(y))
        for i in range(self.n_downsampling):
            mult = 2 ** i
            y = TorchConv(ngf * mult * 2, 3, 2, 1, name=f"down{i}")(y, train)
            y = jax.nn.relu(instance_norm(y))
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            y = TorchConvTranspose(
                ngf * mult // 2, 3, 2, 1, output_padding=1, name=f"up{i}"
            )(y, train)
            y = jax.nn.relu(instance_norm(y))
        y = reflect_pad(y, 3)
        y = jnp.tanh(TorchConv(self.output_nc, 7, padding=0, name="head")(y, train))
        return instance_wise_avg(y, inst, self.max_instance_ids)


class SFTLayer(nn.Module):
    """Spatial feature transform (MaskGAN_networks.py:242-253)."""

    dim: int = 64

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        s = TorchConv(self.dim, 1, name="scale_conv1")(cond, train)
        s = TorchConv(self.dim, 1, name="scale_conv2")(
            jax.nn.leaky_relu(s, 0.1), train
        )
        t = TorchConv(self.dim, 1, name="shift_conv1")(cond, train)
        t = TorchConv(self.dim, 1, name="shift_conv2")(
            jax.nn.leaky_relu(t, 0.1), train
        )
        return x * s + t


class StyleEncoder(nn.Module):
    """MaskGAN_networks.py:54-87 (debug prints elided)."""

    n_downsample: int
    dim: int
    style_dim: int
    norm: str = "none"
    activ: str = "relu"
    pad_type: str = "reflect"

    @nn.compact
    def __call__(self, x, cond1, cond2, train: bool = False):
        d = self.dim
        y = ConvBlock(d, 7, 1, 3, self.norm, self.activ, self.pad_type,
                      name="stem")(x, train)
        for i in range(2):
            y = ConvBlock(2 * d, 4, 2, 1, self.norm, self.activ, self.pad_type,
                          name=f"down{i}")(y, train)
            d *= 2
        y = SFTLayer(d, name="sft1")(y, cond1, train)
        for i in range(self.n_downsample - 2):
            y = ConvBlock(d, 4, 2, 1, self.norm, self.activ, self.pad_type,
                          name=f"mid{i}")(y, train)
        y = SFTLayer(d, name="sft2")(y, cond2, train)
        y = y.mean(axis=(1, 2), keepdims=True)
        return TorchConv(self.style_dim, 1, name="fc")(y, train)


class LabelEncoder(nn.Module):
    """MaskGAN_networks.py:91-110: returns (mid features, final features)."""

    n_downsample: int
    dim: int
    norm: str = "none"
    activ: str = "relu"
    pad_type: str = "reflect"

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        y = ConvBlock(d, 7, 1, 3, self.norm, self.activ, self.pad_type,
                      name="stem")(x, train)
        y = ConvBlock(2 * d, 4, 2, 1, self.norm, self.activ, self.pad_type,
                      name="down0")(y, train)
        d *= 2
        fea = ConvBlock(2 * d, 4, 2, 1, self.norm, "none", self.pad_type,
                        name="down1")(y, train)
        d *= 2
        y = jax.nn.relu(fea)
        for i in range(self.n_downsample - 3):
            y = ConvBlock(d, 4, 2, 1, self.norm, self.activ, self.pad_type,
                          name=f"last{i}")(y, train)
        y = ConvBlock(d, 4, 2, 1, self.norm, "none", self.pad_type,
                      name="last_final")(y, train)
        return fea, y


def adaptive_instance_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                           eps: float = 1e-5) -> jax.Array:
    """AdaIN (MaskGAN_networks.py:281-310): instance-normalize then apply
    externally-assigned per-channel scale/bias."""
    return instance_norm(x, eps) * scale.reshape(1, 1, 1, -1) + bias.reshape(
        1, 1, 1, -1
    )


class LayerNorm2d(nn.Module):
    """MaskGAN_networks.py:312-339: per-sample layer norm over (H,W,C) with
    optional per-channel affine."""

    num_features: int
    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = x.shape[0]
        flat = x.reshape(n, -1)
        mean = flat.mean(axis=1).reshape(n, 1, 1, 1)
        std = flat.std(axis=1).reshape(n, 1, 1, 1)
        y = (x - mean) / (std + self.eps)
        if self.affine:
            gamma = self.param("gamma", nn.initializers.uniform(1.0),
                               (self.num_features,))
            beta = self.param("beta", nn.initializers.zeros, (self.num_features,))
            y = y * gamma.reshape(1, 1, 1, -1) + beta.reshape(1, 1, 1, -1)
        return y


class LinearBlock(nn.Module):
    """MaskGAN_networks.py:176-221 (norm 'none' | 'ln'; act relu/lrelu/tanh)."""

    features: int
    norm: str = "none"
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = TorchLinear(self.features, name="fc")(x)
        if self.norm == "ln":
            mean = y.mean(axis=-1, keepdims=True)
            std = y.std(axis=-1, keepdims=True)
            y = (y - mean) / (std + 1e-5)
        if self.activation == "relu":
            y = jax.nn.relu(y)
        elif self.activation == "lrelu":
            y = jax.nn.leaky_relu(y, 0.2)
        elif self.activation == "tanh":
            y = jnp.tanh(y)
        return y
