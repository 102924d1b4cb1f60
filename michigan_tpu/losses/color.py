"""Color-space losses (reference loss.py:388-621): Lab ab-channel L1 with
optional ab-histogram balancing, hair-average Lab (unpair step 2),
background L1, and the VAE KLD."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from michigan_tpu.ops.color import rgb_to_lab
from michigan_tpu.ops.resize import grid_sample_nearest
from michigan_tpu.ops.stats import hair_avg


def _balance_weight_map(real_lab: jax.Array, ab_count: jax.Array, opt) -> jax.Array:
    """Per-pixel weight from the data ab-histogram (loss.py:484-507):
    weight = clamp(max(count)/count, <=th), sampled at each pixel's (b,a)
    position via nearest grid-sample.  `ab_count` is the (256,256) table
    from data/ab_count.npy, passed in as an array so the fn stays jittable.
    """
    n, h, w, _ = real_lab.shape
    weight = jnp.where(ab_count == 0, 1.0, ab_count)
    weight = jnp.max(weight) / weight
    weight = jnp.minimum(weight, opt.Lab_weight_th)
    weight = jnp.broadcast_to(weight[None, :, :, None], (n,) + weight.shape + (1,))

    a = real_lab[..., 1:2]
    b = real_lab[..., 2:3]
    m = jnp.concatenate([b, a], axis=-1) + 128.0
    m = jnp.clip(m, 0.0, 255.0)
    m = m.astype(jnp.int32).astype(jnp.float32)
    m = (m - 127.5) / 127.5
    return grid_sample_nearest(weight, m)


def lab_color_loss(fake, real, opt, mask=None, ab_count=None) -> jax.Array:
    """ab-channel L1 in Lab space (loss.py:509-531).  Inputs in [-1,1]."""
    fake_lab = rgb_to_lab((fake + 1.0) / 2.0)
    real_lab = jax.lax.stop_gradient(rgb_to_lab((real + 1.0) / 2.0))
    if opt.balance_Lab and ab_count is not None:
        wm = _balance_weight_map(real_lab, ab_count, opt)
        wm = wm * mask
        wm = jnp.where(wm == 0, 1.0, wm)
        diff = jnp.abs(fake_lab[..., 1:] - real_lab[..., 1:])
        return jnp.mean(wm * diff)
    return jnp.mean(jnp.abs(fake_lab[..., 1:] - real_lab[..., 1:]))


def hair_avg_lab_loss(fake, real, mask_fake, mask_real, opt, ab_count=None):
    """L1 between masked average Lab colors (loss.py:601-621)."""
    fake_avg = hair_avg(rgb_to_lab((fake + 1.0) / 2.0), mask_fake)
    real_avg = jax.lax.stop_gradient(
        hair_avg(rgb_to_lab((real + 1.0) / 2.0), mask_real)
    )
    if opt.balance_Lab and ab_count is not None:
        wm = _balance_weight_map(real_avg, ab_count, opt)
        diff = jnp.abs(fake_avg[..., 1:] - real_avg[..., 1:])
        return jnp.mean(wm * diff)
    return jnp.mean(jnp.abs(fake_avg[..., 1:] - real_avg[..., 1:]))


def rgb_background_l1_loss(fake, input_tag_onehot, image_tag) -> jax.Array:
    """L1 outside the hair (loss.py:388-400); channel 0 is background."""
    bg = input_tag_onehot[..., 0:1]
    return jnp.mean(jnp.abs(fake * bg - jax.lax.stop_gradient(image_tag * bg)))


def kld_loss(mu, logvar) -> jax.Array:
    """Standard VAE KLD (loss.py:211-213)."""
    return -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))


def load_ab_count(path: str) -> jnp.ndarray:
    return jnp.asarray(np.load(path).astype(np.float32))
