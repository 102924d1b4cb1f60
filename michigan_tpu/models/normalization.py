"""SPADE conditional normalization (reference normalization.py:70-118).

The param-free norm is cross-replica batch norm (`syncbatch`) by default for
netG=spadeb — on TPU the sync is one `lax.psum` over the data mesh axis
(replacing the reference's entire sync_batchnorm/ thread machinery).
Modulation `normalized * (1 + gamma) + beta` optionally runs as a fused
Pallas kernel (ops/pallas/spade.py) to cut HBM round-trips.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from michigan_tpu.models.layers import TorchConv, xavier_init, _conv
from michigan_tpu.ops.norms import batch_norm_eval, batch_norm_train, instance_norm
from michigan_tpu.ops.resize import resize_nearest


class _ConvParams(nn.Module):
    """Parameter holder with TorchConv-compatible naming; lets SPADE fuse the
    gamma and beta convolutions into one kernel-concatenated conv without
    changing the checkpoint tree."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_ch: int):
        k = self.param(
            "kernel", xavier_init(0.02),
            (self.kernel_size, self.kernel_size, in_ch, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


def parse_spade_config(config_text: str):
    """'spadesyncbatch3x3' -> ('syncbatch', 3) (normalization.py:74-77)."""
    m = re.search(r"spade(\D+)(\d)x\d", config_text)
    return str(m.group(1)), int(m.group(2))


class ParamFreeNorm(nn.Module):
    """instance / batch / syncbatch norm, affine-free, torch semantics.

    `syncbatch` and `batch` carry running stats in the 'batch_stats'
    collection; `syncbatch` additionally psums batch statistics over
    `axis_name` when set (the reference's SynchronizedBatchNorm2d).
    """

    norm_type: str
    num_features: int
    axis_name: Optional[str] = None
    momentum: float = 0.1
    eps: float = 1e-5
    return_stats: bool = False  # eval-only: return (mean, var) instead of
                                # normalizing, for fused modulation kernels

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        if self.norm_type == "instance":
            return instance_norm(x, self.eps)
        if self.norm_type not in ("batch", "syncbatch"):
            raise ValueError(self.norm_type)
        rm = self.variable(
            "batch_stats", "running_mean", jnp.zeros, (self.num_features,), jnp.float32
        )
        rv = self.variable(
            "batch_stats", "running_var", jnp.ones, (self.num_features,), jnp.float32
        )
        if self.return_stats and not train:
            return rm.value, rv.value
        if train:
            axis = self.axis_name if self.norm_type == "syncbatch" else None
            y, new_m, new_v = batch_norm_train(
                x, rm.value, rv.value, self.momentum, self.eps, axis
            )
            if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"
            ):
                rm.value = new_m
                rv.value = new_v
            return y
        return batch_norm_eval(x, rm.value, rv.value, self.eps)


class SPADE(nn.Module):
    """out = param_free_norm(x) * (1 + gamma(seg)) + beta(seg).

    Submodule names mirror the torch state_dict for the weight converter:
    mlp_shared_0 (Sequential[0]), mlp_gamma, mlp_beta.
    """

    config_text: str
    norm_nc: int
    label_nc: int
    use_weight_norm: bool = False
    axis_name: Optional[str] = None
    nhidden: int = 128
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, segmap: jax.Array, train: bool = False) -> jax.Array:
        norm_type, ks = parse_spade_config(self.config_text)
        pw = ks // 2

        seg = resize_nearest(segmap, (x.shape[1], x.shape[2])).astype(x.dtype)
        actv = jax.nn.relu(
            TorchConv(self.nhidden, ks, padding=pw, name="mlp_shared_0")(seg, train)
        )
        # gamma and beta read the same activation — run them as ONE conv with
        # concatenated output channels (numerically identical; doubles MXU
        # lane utilization when norm_nc < 128 and halves actv HBM reads)
        gk, gb = _ConvParams(self.norm_nc, ks, name="mlp_gamma")(self.nhidden)
        bk, bb = _ConvParams(self.norm_nc, ks, name="mlp_beta")(self.nhidden)
        kernel = jnp.concatenate([gk, bk], axis=-1)
        bias = jnp.concatenate([gb, bb])
        gb_out = _conv(actv, kernel, 1, ((pw, pw), (pw, pw))) + bias.astype(
            actv.dtype
        )
        gamma = gb_out[..., : self.norm_nc]
        beta = gb_out[..., self.norm_nc :]

        if self.use_weight_norm:
            # weight_norm_G skips the param-free norm (normalization.py:103-107)
            return x * (1.0 + gamma) + beta

        # --- fused Pallas modulation (inference path; --use_pallas) ---
        # training keeps the XLA composition for exact autodiff + stat updates
        if self.use_pallas and not train:
            from michigan_tpu.ops.pallas.spade import (
                fused_instance_norm,
                spade_modulate,
            )

            if norm_type == "instance":
                return fused_instance_norm(x, gamma, beta)
            rm, rv = ParamFreeNorm(
                norm_type, x.shape[-1], axis_name=self.axis_name,
                name="param_free_norm", return_stats=True,
            )(x, train)
            inv = jax.lax.rsqrt(rv + 1e-5)
            return spade_modulate(x, rm, inv, gamma, beta)

        normalized = ParamFreeNorm(
            norm_type, x.shape[-1], axis_name=self.axis_name,
            name="param_free_norm",
        )(x, train)
        return normalized * (1.0 + gamma) + beta


class SPADEImage(nn.Module):
    """SPADE variant conditioned on a full-resolution image with its own
    stride-2 downsampling stack instead of nearest resize
    (normalization.py:152-203).  Used by SPADEImageBlock (non-default path).
    """

    config_text: str
    norm_nc: int
    image_nc: int
    downsample_n: int
    axis_name: Optional[str] = None
    nhidden: int = 128

    @nn.compact
    def __call__(self, x: jax.Array, image: jax.Array, train: bool = False) -> jax.Array:
        norm_type, ks = parse_spade_config(self.config_text)
        pw = ks // 2
        normalized = ParamFreeNorm(
            norm_type, x.shape[-1], axis_name=self.axis_name,
            name="param_free_norm",
        )(x, train)
        actv = jax.nn.relu(
            TorchConv(self.nhidden, ks, padding=pw, name="mlp_shared_0")(image, train)
        )
        for i in range(self.downsample_n):
            actv = jax.nn.relu(
                TorchConv(self.nhidden, 3, 2, pw, name=f"middle_{2 * i}")(actv, train)
            )
        gamma = TorchConv(self.norm_nc, ks, padding=pw, name="mlp_gamma")(actv, train)
        beta = TorchConv(self.norm_nc, ks, padding=pw, name="mlp_beta")(actv, train)
        return normalized * (1.0 + gamma) + beta


class NonSpadeNorm(nn.Module):
    """get_nonspade_norm_layer wrapper semantics (normalization.py:18-54):
    spectral conv (bias stripped when a norm follows) + batch/syncbatch/
    instance norm.  Used by the discriminator and the VAE encoder.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    norm_str: str  # e.g. 'spectralinstance'
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm_str = self.norm_str
        spectral = norm_str.startswith("spectral")
        sub = norm_str[len("spectral"):] if spectral else norm_str
        has_norm = sub not in ("", "none")
        y = TorchConv(
            self.features, self.kernel_size, self.stride, self.padding,
            use_bias=not has_norm, spectral=spectral, name="conv",
        )(x, train)
        if sub == "instance":
            y = instance_norm(y)
        elif sub in ("batch", "sync_batch"):
            y = ParamFreeNorm(
                "syncbatch" if sub == "sync_batch" else "batch",
                self.features, axis_name=self.axis_name, name="norm",
            )(y, train)
            # reference uses affine=True here (normalization.py:43-46)
            scale = self.param("norm_scale", nn.initializers.ones, (self.features,))
            bias = self.param("norm_bias", nn.initializers.zeros, (self.features,))
            y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
        elif has_norm:
            raise ValueError(sub)
        return y
