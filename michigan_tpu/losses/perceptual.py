"""VGG perceptual + AdaIN-style style/content losses (loss.py:178-207,
623-712).  The caller supplies a `vgg_apply(x) -> [5 feature maps]` closure
(frozen VGG19 params applied inside the jitted loss)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from michigan_tpu.ops.resize import resize_nearest
from michigan_tpu.ops.stats import masked_mean_std

VGG_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


# Features may arrive at the compute dtype (bf16): each loss upcasts INSIDE
# its reduction (the convert fuses into the reduce — one pass over bf16 data,
# fp32 accumulation) rather than asking the tower for fp32 tensors, which
# would double the stored feature maps' HBM traffic (model.py _vgg_tower).
_f32 = lambda t: t.astype(jnp.float32)


def _l1_mask_sum(a, b, label):
    label1 = resize_nearest(label, (a.shape[1], a.shape[2]))
    return jnp.abs(_f32(a) * label1 - _f32(b) * label1).sum() / (
        label1.sum() * a.shape[-1] + 1e-5
    )


def vgg_loss_from_features(fx, fy, opt, label=None) -> jax.Array:
    """Perceptual L1 over 5 slices (loss.py:199-207), from precomputed
    feature lists (lets the caller share VGG forwards across losses)."""
    total = 0.0
    for w, a, b in zip(VGG_WEIGHTS, fx, fy):
        b = jax.lax.stop_gradient(b)
        if opt.remove_background:
            total = total + w * _l1_mask_sum(a, b, jax.lax.stop_gradient(label))
        else:
            total = total + w * jnp.mean(jnp.abs(_f32(a) - _f32(b)))
    return total


def _mean_std(feat, eps=1e-5):
    """calc_mean_std (loss.py:624-632): torch .var() is unbiased (ddof=1)."""
    n, h, w, c = feat.shape
    f = _f32(feat).reshape(n, -1, c)
    mean = f.mean(axis=1).reshape(n, 1, 1, c)
    var = f.var(axis=1, ddof=1) + eps
    return mean, jnp.sqrt(var).reshape(n, 1, 1, c)


def style_content_loss_from_features(f_fake, f_style, f_content, opt,
                                      style_label=None, content_label=None):
    """(content, style) pair (loss.py:656-712): content = MSE on relu5_1,
    style = MSE on per-channel mean/std over all 5 slices; masked variants
    when remove_background.  Style/content features must be pre-stop-gradiented.
    """

    if opt.remove_background:
        cl = jax.lax.stop_gradient(content_label)
        sl = jax.lax.stop_gradient(style_label)
        a, b = _f32(f_fake[-1]), _f32(f_content[-1])
        lab = resize_nearest(cl, (a.shape[1], a.shape[2]))
        loss_c = jnp.sum((a * lab - b * lab) ** 2) / (
            jnp.sum(lab) * a.shape[-1] + 1e-5
        )
        loss_s = 0.0
        for fs, ff in zip(f_style, f_fake):
            sl1 = resize_nearest(sl, (fs.shape[1], fs.shape[2]))
            cl1 = resize_nearest(cl, (ff.shape[1], ff.shape[2]))
            sm, ss = masked_mean_std(fs, sl1)
            fm, fstd = masked_mean_std(ff, cl1)
            loss_s = loss_s + jnp.mean((sm - fm) ** 2) + jnp.mean((ss - fstd) ** 2)
        return loss_c, loss_s

    loss_c = jnp.mean((_f32(f_fake[-1]) - _f32(f_content[-1])) ** 2)
    loss_s = 0.0
    for fs, ff in zip(f_style, f_fake):
        sm, ss = _mean_std(fs)
        fm, fstd = _mean_std(ff)
        loss_s = loss_s + jnp.mean((sm - fm) ** 2) + jnp.mean((ss - fstd) ** 2)
    return loss_c, loss_s


def vgg_loss(vgg_apply, fake, real, opt, label=None) -> jax.Array:
    fx = vgg_apply(fake)
    fy = vgg_apply(jax.lax.stop_gradient(real))
    return vgg_loss_from_features(fx, fy, opt, label)


def style_content_loss(
    vgg_apply, fake, style_img, content_img, opt, style_label=None, content_label=None
):
    f_fake = vgg_apply(fake)
    f_style = [jax.lax.stop_gradient(t) for t in vgg_apply(style_img)]
    f_content = [jax.lax.stop_gradient(t) for t in vgg_apply(content_img)]
    return style_content_loss_from_features(
        f_fake, f_style, f_content, opt, style_label, content_label
    )
