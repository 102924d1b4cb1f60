"""Discriminator feature-matching loss (reference loss.py:144-175)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from michigan_tpu.ops.resize import resize_nearest


# D features may arrive at the compute dtype (bf16): upcast inside the
# reductions (fuses into the reduce) instead of materializing fp32 feature
# maps at the discriminator exit (model.py discriminate).
_f32 = lambda t: t.astype(jnp.float32)


def _l1_mask(a: jax.Array, b: jax.Array, label: jax.Array) -> jax.Array:
    """Masked L1 normalized by mask area * channels (loss.py:154-161)."""
    label1 = resize_nearest(label, (a.shape[1], a.shape[2]))
    diff = jnp.abs(_f32(a) * label1 - _f32(b) * label1)
    return diff.sum() / (label1.sum() * a.shape[-1] + 1e-5)


def gan_feat_loss(pred_fake, pred_real, opt, label=None) -> jax.Array:
    """L1 over all intermediate D features x lambda_feat/num_D
    (loss.py:163-175).  Real features and labels are stop-gradiented."""
    num_d = len(pred_fake)
    total = 0.0
    for i in range(num_d):
        for j in range(len(pred_fake[i]) - 1):  # exclude final prediction
            real = jax.lax.stop_gradient(pred_real[i][j])
            if opt.remove_background:
                term = _l1_mask(pred_fake[i][j], real, jax.lax.stop_gradient(label))
            else:
                term = jnp.mean(jnp.abs(_f32(pred_fake[i][j]) - _f32(real)))
            total = total + term * (opt.lambda_feat / num_d)
    return total
