"""Condition-module encoders (reference encoder.py).

ImageEncoder3 (partial-conv appearance encoder) and BackgroundEncode2 (noise
background encoder) are the two modules on the flagship path.  The reference's
per-sample Python pooling loops (encoder.py:144-153, 216-220) are vectorized
masked means; the train-time random mask dilation (encoder.py:288-297) keeps a
static compiled shape by decomposing the random-width dilation into a dynamic
count of 3x3 max-pool steps inside `lax.fori_loop`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from michigan_tpu.models.layers import ConvBlock, PartialConv, TorchConv, TorchLinear
from michigan_tpu.models.normalization import NonSpadeNorm
from michigan_tpu.ops.norms import instance_norm
from michigan_tpu.ops.resize import (
    dilate_mask,
    max_pool_same,
    resize_bilinear,
    resize_nearest,
)
from michigan_tpu.ops.stats import masked_region_mean


class ConvEncoder(nn.Module):
    """VAE encoder (encoder.py:17-59): 6 stride-2 convs -> fc_mu/fc_var."""

    opt: object
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        opt = self.opt
        ndf = opt.ngf
        if x.shape[1] != 256 or x.shape[2] != 256:
            x = resize_bilinear(x, (256, 256))

        def layer(i, nf):
            return NonSpadeNorm(
                nf, 3, 2, 1, opt.norm_E, axis_name=self.axis_name, name=f"layer{i}"
            )

        y = layer(1, ndf)(x, train)
        y = layer(2, ndf * 2)(jax.nn.leaky_relu(y, 0.2), train)
        y = layer(3, ndf * 4)(jax.nn.leaky_relu(y, 0.2), train)
        y = layer(4, ndf * 8)(jax.nn.leaky_relu(y, 0.2), train)
        y = layer(5, ndf * 8)(jax.nn.leaky_relu(y, 0.2), train)
        if opt.crop_size >= 256:
            y = layer(6, ndf * 8)(jax.nn.leaky_relu(y, 0.2), train)
        y = jax.nn.leaky_relu(y, 0.2)
        # torch flattens NCHW -> (N, C*H*W)
        y = jnp.transpose(y, (0, 3, 1, 2)).reshape(y.shape[0], -1)
        mu = TorchLinear(256, name="fc_mu")(y)
        logvar = TorchLinear(256, name="fc_var")(y)
        return mu, logvar


class ImageEncoder(nn.Module):
    """Appearance encoder, mode 'norm' (encoder.py:61-105)."""

    opt: object
    sw: int
    sh: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, label_ref=None, label_tag=None, train: bool = False):
        opt = self.opt
        ndf = opt.ngf
        if x.shape[1] != 256 or x.shape[2] != 256:
            x = resize_bilinear(x, (256, 256))

        def layer(i, nf):
            return NonSpadeNorm(
                nf, 3, 2, 1, opt.norm_E, axis_name=self.axis_name, name=f"layer{i}"
            )

        y = layer(1, ndf)(x, train)
        y = layer(2, ndf * 2)(jax.nn.leaky_relu(y, 0.2), train)
        y = layer(3, ndf * 4)(jax.nn.leaky_relu(y, 0.2), train)
        y = layer(4, ndf * 8)(jax.nn.leaky_relu(y, 0.2), train)
        y = layer(5, ndf * 16)(jax.nn.leaky_relu(y, 0.2), train)
        y = jax.nn.leaky_relu(y, 0.2)
        y = y.mean(axis=(1, 2), keepdims=True)  # adaptive avg pool to 1x1
        y = TorchConv(ndf * 16 * self.sw * self.sh, 1, name="fc")(y, train)
        # torch reshapes (N, C*sh*sw,1,1) -> (N, C, sh, sw): channel-major
        y = y.reshape(y.shape[0], ndf * 16, self.sh, self.sw)
        return jnp.transpose(y, (0, 2, 3, 1))


class ImageEncoder2(nn.Module):
    """Appearance encoder, mode 'instance' (encoder.py:107-158)."""

    opt: object
    sw: int
    sh: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, label_ref, label_tag, train: bool = False):
        opt = self.opt
        ndf = opt.ngf

        def layer(i, nf):
            return NonSpadeNorm(
                nf, 3, 2, 1, opt.norm_E, axis_name=self.axis_name, name=f"layer{i}"
            )

        y = layer(1, ndf)(x, train)
        y = layer(2, ndf * 2)(jax.nn.leaky_relu(y, 0.2), train)
        y = layer(3, ndf * 4)(jax.nn.leaky_relu(y, 0.2), train)
        y = layer(4, ndf * 8)(jax.nn.leaky_relu(y, 0.2), train)
        y = layer(5, ndf * 16)(jax.nn.leaky_relu(y, 0.2), train)
        y = jax.nn.leaky_relu(y, 0.2)
        xh, xw = y.shape[1], y.shape[2]
        lr = resize_nearest(label_ref, (xh, xw))
        lt = resize_nearest(label_tag, (xh, xw))
        if opt.ref_global_pool:
            pooled = y.mean(axis=(1, 2), keepdims=True)
        else:
            pooled = masked_region_mean(y, lr)
        out = jnp.broadcast_to(pooled, y.shape) * lt
        if self.sh != xh:
            out = resize_nearest(out, (self.sh, self.sw))
        return out


class ImageEncoder3(nn.Module):
    """Appearance encoder, mode 'partialconv' — the default condition module
    (encoder.py:160-225): 5 PartialConv layers masked by the reference hair
    mask, hair-region average pooled and broadcast into the target hair mask.
    """

    opt: object
    sw: int
    sh: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, label_ref, label_tag, train: bool = False):
        opt = self.opt
        ndf = opt.ngf
        use_in = "instance" in opt.norm_ref_encode

        mask = label_ref
        y = x
        for i, nf in enumerate([ndf, ndf * 2, ndf * 4, ndf * 8, ndf * 16], start=1):
            if i > 1:
                y = jax.nn.leaky_relu(y, 0.2)
            y, mask = PartialConv(nf, 3, 2, 1, name=f"layer{i}")(y, mask)
            if use_in:
                y = instance_norm(y)
        y = jax.nn.leaky_relu(y, 0.2)

        xh, xw = y.shape[1], y.shape[2]
        lr = resize_nearest(label_ref, (xh, xw))
        lt = resize_nearest(label_tag, (xh, xw))
        pooled = masked_region_mean(y, lr)
        out = jnp.broadcast_to(pooled, y.shape) * lt
        if self.sh != xh:
            out = resize_bilinear(out, (self.sh, self.sw))
        return out


class BackgroundEncode(nn.Module):
    """Background pyramid without noise (encoder.py:227-253) — intent
    rebuild.  The reference class returns its pyramid UNREVERSED
    ([x0..x4], full-res first), but the generator composites index 0 at
    its SMALLEST up-block scale (generator.py:183-187), so every
    `noise_background=False` config crashes upstream on a shape mismatch:
    a dead-broken path like Blend2Generator (PARITY.md known divergences).
    Rebuilt to the working contract BackgroundEncode2 defines
    (encoder.py:339-343): smallest scale first, channels matching the
    up-block outputs, including the half-channel stem for 'most'; the
    reference's unused 16*ngf `layer4` level is dropped."""

    opt: object

    @nn.compact
    def __call__(self, image, mask, train: bool = False):
        ngf = self.opt.ngf
        most = self.opt.num_upsampling_layers == "most"
        if most:
            x00 = ConvBlock(ngf // 2, 7, 1, 3, pad_type="reflect", name="conv0")(
                image, train
            )
            x0 = ConvBlock(ngf, 4, 2, 1, pad_type="reflect", name="layer0")(
                x00, train
            )
        else:
            x0 = ConvBlock(ngf, 7, 1, 3, pad_type="reflect", name="conv1")(
                image, train
            )
        x1 = ConvBlock(2 * ngf, 4, 2, 1, pad_type="reflect", name="layer1")(x0, train)
        x2 = ConvBlock(4 * ngf, 4, 2, 1, pad_type="reflect", name="layer2")(x1, train)
        x3 = ConvBlock(8 * ngf, 4, 2, 1, pad_type="reflect", name="layer3")(x2, train)
        bm = mask[..., 0:1]
        h, w = bm.shape[1], bm.shape[2]
        bm1, bm2, bm3, bm4 = (
            resize_nearest(bm, (h // f, w // f)) for f in (2, 4, 8, 16)
        )
        if most:
            return [x3, x2, x1, x0, x00], [bm4, bm3, bm2, bm1, bm]
        return [x3, x2, x1, x0], [bm3, bm2, bm1, bm]


def _expanded_back_mask(opt, mask, extra_dilate_steps=None):
    """Compute the background mask with hair-mask dilation
    (encoder.py:288-316).  `extra_dilate_steps` is the traced number of
    additional 3x3 dilations on top of the base width for the train-time
    random expansion (static shapes; equivalent to the reference's random
    odd-kernel max-pool since square-SE dilation composes)."""
    hair = mask[..., 1:2]
    if opt.isTrain:
        if not opt.random_expand_mask:
            return mask[..., 0:1]
        mh = hair.shape[1]
        th = int(mh * opt.random_expand_th)
        th = th if th % 2 == 1 else th + 1
        base_k = max(th - 4, 1)
        expanded = dilate_mask(hair, base_k)
        if extra_dilate_steps is None:
            extra_dilate_steps = jnp.asarray(2)  # expectation: k == th

        def body(_, m):
            return dilate_mask(m, 3)

        expanded = jax.lax.fori_loop(
            0, extra_dilate_steps, body, expanded
        )
        return 1.0 - expanded
    if opt.expand_mask_be:
        k = opt.expand_th
        if opt.add_feat_zeros:
            th = opt.add_th
            H = W = opt.crop_size
            r0 = th // 2
            center = hair[:, r0 : r0 + H, r0 : r0 + W, :]
            center = max_pool_same(center, k, 1, int(k / 2))
            if center.shape[1] != H:
                center = center[:, :H, :W, :]
            expanded = jnp.zeros_like(hair)
            expanded = expanded.at[:, r0 : r0 + H, r0 : r0 + W, :].set(center)
        else:
            expanded = dilate_mask(hair, k)
        return 1.0 - expanded
    return mask[..., 0:1]


class BackgroundEncode2(nn.Module):
    """Noise-background condition module (encoder.py:271-341).

    Returns the feature pyramid coarsest-first to match generator scales.
    """

    opt: object

    @nn.compact
    def __call__(self, image, mask, noise, train: bool = False,
                 extra_dilate_steps=None):
        opt = self.opt
        ngf = opt.ngf
        back_mask = _expanded_back_mask(opt, mask, extra_dilate_steps)

        if opt.random_noise_background:
            inp = noise
        else:
            inp = image * back_mask + noise * (1.0 - back_mask)
        inp = inp.astype(image.dtype)

        if opt.num_upsampling_layers == "most":
            x00 = ConvBlock(ngf // 2, 7, 1, 3, pad_type="reflect", name="conv0")(inp, train)
            x0 = ConvBlock(ngf, 4, 2, 1, pad_type="reflect", name="layer0")(x00, train)
        else:
            x0 = ConvBlock(ngf, 7, 1, 3, pad_type="reflect", name="conv1")(inp, train)
        x1 = ConvBlock(2 * ngf, 4, 2, 1, pad_type="reflect", name="layer1")(x0, train)
        x2 = ConvBlock(4 * ngf, 4, 2, 1, pad_type="reflect", name="layer2")(x1, train)
        x3 = ConvBlock(8 * ngf, 4, 2, 1, pad_type="reflect", name="layer3")(x2, train)
        # layer4 exists in reference checkpoints but is never applied
        # (encoder.py:284 vs forward :323-331); omitted here.

        h, w = back_mask.shape[1], back_mask.shape[2]
        bm1 = resize_nearest(back_mask, (h // 2, w // 2))
        bm2 = resize_nearest(back_mask, (h // 4, w // 4))
        bm3 = resize_nearest(back_mask, (h // 8, w // 8))
        bm4 = resize_nearest(back_mask, (h // 16, w // 16))
        if opt.num_upsampling_layers == "most":
            return [x3, x2, x1, x0, x00], [bm4, bm3, bm2, bm1, back_mask]
        return [x3, x2, x1, x0], [bm3, bm2, bm1, back_mask]
