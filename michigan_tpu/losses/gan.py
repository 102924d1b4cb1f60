"""GAN losses (reference loss.py:19-140).

Modes: hinge (default, with optional wide-edge pixel weighting and
hair-masked normalization), ls, original (BCE-with-logits), w.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from michigan_tpu.ops.masks import wide_edges
from michigan_tpu.ops.resize import resize_nearest


def _weight_mask(pred: jax.Array, mask: jax.Array, wide_edge: float) -> jax.Array:
    """Edge-band upweighting (loss.py:70-78)."""
    label = resize_nearest(mask, (pred.shape[1], pred.shape[2]))
    edges = wide_edges(label)
    return edges * wide_edge + (1.0 - edges)


def gan_loss(
    pred: jax.Array,
    target_is_real: bool,
    for_discriminator: bool,
    opt,
    label: jax.Array | None = None,
) -> jax.Array:
    """Single-scale loss (loss.py:80-124).  `label` is the target hair mask
    at full resolution (NHWC single channel)."""
    # patch logits may arrive at the compute dtype (bf16); the loss math and
    # its reductions run fp32 (model.py discriminate keeps features uncast)
    pred = pred.astype(jnp.float32)
    mode = opt.gan_mode
    if mode == "original":
        tgt = jnp.full_like(pred, 1.0 if target_is_real else 0.0)
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * tgt + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    if mode == "ls":
        tgt = 1.0 if target_is_real else 0.0
        return jnp.mean((pred - tgt) ** 2)
    if mode == "hinge":
        if not opt.remove_background:
            if for_discriminator:
                minval = jnp.minimum((pred - 1) if target_is_real else (-pred - 1), 0.0)
                if opt.wide_edge > 1.0 and label is not None:
                    minval = minval * _weight_mask(pred, label, opt.wide_edge)
                return -jnp.mean(minval)
            assert target_is_real, "generator hinge must aim for real"
            return -jnp.mean(pred)
        label1 = resize_nearest(label, (pred.shape[1], pred.shape[2]))
        c = pred.shape[-1]
        denom = jnp.sum(label1) * c + 1e-5
        if for_discriminator:
            raw = (pred - 1) if target_is_real else (-pred - 1)
            minval = jnp.minimum(raw * label1, 0.0)
            return -jnp.sum(minval) / denom
        return -jnp.sum(pred * label1) / denom
    # wgan
    return -jnp.mean(pred) if target_is_real else jnp.mean(pred)


def multiscale_gan_loss(
    preds, target_is_real: bool, for_discriminator: bool, opt, label=None
) -> jax.Array:
    """List-of-lists handling (loss.py:126-140): per-D mean over batch dims,
    averaged over discriminators."""
    label = jax.lax.stop_gradient(label) if label is not None else None
    total = 0.0
    for p in preds:
        pred = p[-1] if isinstance(p, (list, tuple)) else p
        total = total + gan_loss(pred, target_is_real, for_discriminator, opt, label)
    return total / len(preds)
