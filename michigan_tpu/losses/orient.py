"""Orientation supervision loss (reference loss.py:274-385).

The fake image is converted to gray, pushed through the 32-orientation
filter bank (one batched conv — ops/filters.py), and the resulting doubled-
angle field is L1-matched to the label inside the hair mask, plus a
confidence term.  Gradients reach the image through the max response only,
exactly like torch.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from michigan_tpu.ops.filters import cal_orientation_two_channel


def orient_loss(fake_image, orient_label, input_tag_onehot, opt):
    """Returns (orient_l1, confidence_loss).

    fake_image: (N,H,W,3) in [-1,1]; orient_label: (N,H,W,1) raw [0,255]
    when use_ig=False else (N,H,W,2) decoded; input_tag_onehot (N,H,W,2).
    """
    hair_mask = input_tag_onehot[..., 1:2]
    mode = "gabor" if "gabor" in opt.orient_filter else "dog"
    # under the bf16 policy the fake image is already bf16-rounded, so the
    # bank's fp32-HIGHEST forward (3-pass MXU emulation) buys nothing the
    # input still has; --orient_bank_fp32 restores it (ops/filters.py)
    fwd_bf16 = (
        getattr(opt, "dtype", "float32") == "bfloat16"
        and not getattr(opt, "orient_bank_fp32", False)
    )
    orientation_fake, confidence = cal_orientation_two_channel(
        fake_image, mode, hair_mask if mode == "dog" else None,
        fwd_bf16=fwd_bf16,
    )

    if not opt.use_ig:
        t = orient_label / 255.0 * math.pi
        orientation_mask = jnp.concatenate([jnp.sin(2 * t), jnp.cos(2 * t)], axis=-1)
    else:
        orientation_mask = orient_label

    orientation_fake = orientation_fake * hair_mask
    orientation_mask = jax.lax.stop_gradient(orientation_mask * hair_mask)
    l1 = jnp.mean(jnp.abs(orientation_fake - orientation_mask))

    if mode == "gabor":
        conf = jnp.clip(confidence, 0.001, 1.0)
        conf_loss = -jnp.sum(jnp.log(conf) * hair_mask) / jnp.sum(hair_mask)
    else:
        conf_gt = jax.lax.stop_gradient(hair_mask)
        conf = confidence * hair_mask
        conf_loss = jnp.sum(jnp.abs(conf - conf_gt)) / (jnp.sum(hair_mask) + 1e-5)
    return l1, conf_loss
