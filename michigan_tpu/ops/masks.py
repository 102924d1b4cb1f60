"""Mask utilities: one-hot labels, edge bands, instance edges. NHWC."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from michigan_tpu.ops.resize import max_pool_same, resize_nearest


def one_hot_label(label_map: jax.Array, num_classes: int) -> jax.Array:
    """Integer (N,H,W,1) label map -> one-hot (N,H,W,num_classes).

    Mirrors the scatter_ one-hot in pix2pix_model.py:229-243.
    """
    lab = jnp.clip(label_map[..., 0].astype(jnp.int32), 0, num_classes - 1)
    return jax.nn.one_hot(lab, num_classes, dtype=jnp.float32)


def wide_edges(mask: jax.Array, th: float = 0.06) -> jax.Array:
    """Edge band around a binary mask: dilate(m) - erode(m) (loss.py:60-68).

    Kernel k = max(1, int(H*th)); torch's even-kernel pooling grows the map by
    one, then it is nearest-resized back — replicated exactly.
    """
    h, w = mask.shape[1], mask.shape[2]
    k = max(1, int(h * th))
    p = int(k / 2)
    grow = max_pool_same(mask, k, 1, p)
    shrink = 1.0 - max_pool_same(1.0 - mask, k, 1, p)
    edges = grow - shrink
    return resize_nearest(edges, (h, w))


def wide_edges_outer(mask: jax.Array, k: int = 5) -> jax.Array:
    """Outer edge band: m - erode(m) (generator.py:98-105)."""
    h, w = mask.shape[1], mask.shape[2]
    p = int(k / 2)
    shrink = 1.0 - max_pool_same(1.0 - mask, k, 1, p)
    edges = mask - shrink
    return resize_nearest(edges, (h, w))


def instance_edges(inst: jax.Array) -> jax.Array:
    """Instance boundary map (pix2pix_model.py:596-602), NHWC (N,H,W,1)."""
    t = inst
    dx = t[:, :, 1:, :] != t[:, :, :-1, :]
    dy = t[:, 1:, :, :] != t[:, :-1, :, :]
    edge = jnp.zeros(t.shape, dtype=bool)
    edge = edge.at[:, :, 1:, :].set(edge[:, :, 1:, :] | dx)
    edge = edge.at[:, :, :-1, :].set(edge[:, :, :-1, :] | dx)
    edge = edge.at[:, 1:, :, :].set(edge[:, 1:, :, :] | dy)
    edge = edge.at[:, :-1, :, :].set(edge[:, :-1, :, :] | dy)
    return edge.astype(jnp.float32)
