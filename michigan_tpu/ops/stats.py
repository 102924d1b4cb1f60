"""Masked statistics — vectorized replacements for the reference's per-sample
Python loops (encoder.py:144-153, 214-220; loss.py:634-654)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean_std(feat: jax.Array, mask: jax.Array, eps: float = 1e-5):
    """calc_mean_std_mask (loss.py:634-654): per-(N,C) mean/std over masked
    pixels.  feat (N,H,W,C), mask (N,H,W,1) -> two (N,1,1,C) arrays.

    Note the reference computes variance as E[((x*m - mean)*m)^2]/sum(m): the
    mean is *not* re-masked before subtraction, so zero (masked-out) pixels
    contribute (mean*0)^2 = 0 via the second mask — replicated exactly.
    """
    n, h, w, c = feat.shape
    # fp32 statistics regardless of the feature dtype (bf16 VGG features
    # arrive uncast — see losses/perceptual.py); the convert fuses into the
    # reductions, so no fp32 copy of the feature map is materialized
    m = mask.astype(jnp.float32).reshape(n, -1, 1)
    f = feat.astype(jnp.float32).reshape(n, -1, c) * m
    msum = m.sum(axis=1) + eps  # (N,1)
    mean = f.sum(axis=1) / msum  # (N,C)
    var = (((f - mean[:, None, :]) * m) ** 2).sum(axis=1) / msum + eps
    std = jnp.sqrt(var)
    return mean.reshape(n, 1, 1, c), std.reshape(n, 1, 1, c)


def masked_region_mean(feat: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-channel hair-region average — the encoders' instance-wise pool
    (encoder.py:216-219): sum over (H,W) of feat*mask divided by
    max(sum(mask), 1), where the mask is single-channel.

    feat (N,H,W,C), mask (N,H,W,1) -> (N,1,1,C).
    """
    num = (feat * mask).sum(axis=(1, 2), keepdims=True)  # (N,1,1,C)
    den = jnp.maximum(mask.sum(axis=(1, 2), keepdims=True), 1.0)  # (N,1,1,1)
    return num / den


def hair_avg(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-channel masked average (loss.py:571-577): (N,1,1,C)."""
    s = (x * mask).sum(axis=(1, 2), keepdims=True)
    msum = mask.sum(axis=(1, 2), keepdims=True)
    msum = jnp.where(msum == 0, 1.0, msum)
    return s / msum
