"""Functional normalization primitives.

Cross-replica batch norm is the TPU replacement for the reference's entire
distributed stack (sync_batchnorm/: thread+queue master/slave reduce-broadcast
over DataParallel replicas, batchnorm.py:51-145).  On TPU the per-shard
(sum, sum-of-squares, count) triple is combined with a single `lax.psum` over
the data-parallel mesh axis — one collective, no choreography.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """nn.InstanceNorm2d(affine=False) on NHWC: per-(N,C) over spatial dims.

    torch normalizes by biased variance with eps inside the sqrt.  Statistics
    always accumulate in fp32 (bf16 activations would lose the mean).

    bf16 inputs take a custom-VJP path that keeps every tensor-wide residual
    and cotangent in bf16 (fp32 only inside the reductions): plain autodiff
    through the fp32 upcast saves full-size fp32 intermediates, which doubles
    the backward's HBM traffic on a bandwidth-bound step (PERF.md roofline).
    fp32 inputs keep the original formulation byte-for-byte.
    """
    if x.dtype == jnp.bfloat16:
        return _instance_norm_b16(x, float(eps))
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _instance_norm_b16(x: jax.Array, eps: float) -> jax.Array:
    y, _, _ = _in_fwd_impl(x, eps)
    return y


def _in_fwd_impl(x, eps):
    xf = x.astype(jnp.float32)  # fuses into the reductions; never materialized
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = (xf * xf).mean(axis=(1, 2), keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    y = ((x - mean.astype(x.dtype)) * inv.astype(x.dtype)).astype(x.dtype)
    return y, mean, inv


def _in_fwd(x, eps):
    y, mean, inv = _in_fwd_impl(x, eps)
    # residuals: bf16 x + per-(N,1,1,C) fp32 stats — no full-size fp32 tensor
    return y, (x, mean, inv)


def _in_bwd(eps, res, g):
    x, mean, inv = res
    xhat = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    gf = g.astype(jnp.float32)
    mg = gf.mean(axis=(1, 2), keepdims=True)
    mgx = (gf * xhat.astype(jnp.float32)).mean(axis=(1, 2), keepdims=True)
    dx = inv.astype(x.dtype) * (
        g - mg.astype(x.dtype) - xhat * mgx.astype(x.dtype)
    )
    return (dx.astype(x.dtype),)


_instance_norm_b16.defvjp(_in_fwd, _in_bwd)


def batch_stats(x: jax.Array, axis_name: Optional[str] = None):
    """Per-channel (mean, biased var, count) over (N,H,W), psum'd across the
    data-parallel axis when present.  Mirrors the math of
    sync_batchnorm/batchnorm.py:74-145: normalize with biased variance,
    maintain running stats with unbiased variance.
    """
    n = x.shape[0] * x.shape[1] * x.shape[2]
    s = x.sum(axis=(0, 1, 2))
    ss = (x * x).sum(axis=(0, 1, 2))
    count = jnp.asarray(n, dtype=x.dtype)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        ss = jax.lax.psum(ss, axis_name)
        count = jax.lax.psum(count, axis_name)
    mean = s / count
    var_biased = ss / count - mean * mean
    return mean, var_biased, count


def batch_norm_train(
    x: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
):
    """Training-mode BN (affine-free). Returns (y, new_mean, new_var).

    Running stats use the *unbiased* variance (batchnorm.py:137-145);
    normalization uses the biased one.  Running stats are buffers, never
    differentiated (torch updates them under no_grad) — gradients flow only
    through y.

    bf16 inputs use a custom-VJP path (see instance_norm): residuals and
    cotangents stay bf16, reductions accumulate fp32, the data-axis psum
    appears in both the forward stats and the backward reductions exactly as
    autodiff would place it.  fp32 keeps the original path byte-for-byte.
    """
    if x.dtype == jnp.bfloat16:
        y, mean, var_b, count = _bn_train_b16(x, float(eps), axis_name)
        mean = jax.lax.stop_gradient(mean)
        var_b = jax.lax.stop_gradient(var_b)
    else:
        mean, var_b, count = batch_stats(x.astype(jnp.float32), axis_name)
        inv = jax.lax.rsqrt(var_b + eps)
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    var_unbiased = var_b * (count / jnp.maximum(count - 1.0, 1.0))
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * var_unbiased
    return y, new_mean, new_var


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _bn_train_b16(x: jax.Array, eps: float, axis_name: Optional[str]):
    y, mean, var_b, count, _inv = _bn_fwd_impl(x, eps, axis_name)
    return y, mean, var_b, count


def _bn_fwd_impl(x, eps, axis_name):
    xf = x.astype(jnp.float32)  # fuses into the reductions
    n = x.shape[0] * x.shape[1] * x.shape[2]
    s = xf.sum(axis=(0, 1, 2))
    ss = (xf * xf).sum(axis=(0, 1, 2))
    count = jnp.asarray(n, jnp.float32)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        ss = jax.lax.psum(ss, axis_name)
        count = jax.lax.psum(count, axis_name)
    mean = s / count
    var_b = ss / count - mean * mean
    inv = jax.lax.rsqrt(var_b + eps)
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    return y, mean, var_b, count, inv


def _bn_b16_fwd(x, eps, axis_name):
    y, mean, var_b, count, inv = _bn_fwd_impl(x, eps, axis_name)
    return (y, mean, var_b, count), (x, mean, inv, count)


def _bn_b16_bwd(eps, axis_name, res, cts):
    # cotangents of (mean, var_b, count) are ignored: running stats are
    # buffers (torch no_grad update), and the normalization's dependence on
    # the batch statistics is handled analytically below
    x, mean, inv, count = res
    g = cts[0]
    xhat = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    gf = g.astype(jnp.float32)
    sum_g = gf.sum(axis=(0, 1, 2))
    sum_gx = (gf * xhat.astype(jnp.float32)).sum(axis=(0, 1, 2))
    if axis_name is not None:
        sum_g = jax.lax.psum(sum_g, axis_name)
        sum_gx = jax.lax.psum(sum_gx, axis_name)
    mg = (sum_g / count).astype(x.dtype)
    mgx = (sum_gx / count).astype(x.dtype)
    dx = inv.astype(x.dtype) * (g - mg - xhat * mgx)
    return (dx.astype(x.dtype),)


_bn_train_b16.defvjp(_bn_b16_fwd, _bn_b16_bwd)


def batch_norm_eval(
    x: jax.Array, running_mean: jax.Array, running_var: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Eval-mode BN from running stats (batchnorm.py:64-68 fallback path)."""
    inv = jax.lax.rsqrt(running_var + eps)
    return (x - running_mean.astype(x.dtype)) * inv.astype(x.dtype)


def l2_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize(dim=0) semantics: v / max(||v||, eps)."""
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


def spectral_normalize(
    w_mat: jax.Array, u: jax.Array, v: jax.Array, n_iter: int = 1, update: bool = True
):
    """torch-style spectral norm power iteration on w_mat (out, in_flat).

    Training (update=True): run `n_iter` iterations (v = norm(W^T u);
    u = norm(W v)) under stop_gradient, then sigma = u . (W v) with the
    detached u, v — exactly torch's compute_weight.  Eval reuses the stored
    (u, v) without iterating.  Returns (sigma, u_new, v_new).
    """
    if update:
        w_sg = jax.lax.stop_gradient(w_mat)

        def body(_, carry):
            u_c, _v = carry
            v_n = l2_normalize(w_sg.T @ u_c)
            u_n = l2_normalize(w_sg @ v_n)
            return u_n, v_n

        u, v = jax.lax.fori_loop(0, n_iter, body, (u, v))
    sigma = jnp.dot(u, w_mat @ v)
    return sigma, u, v
