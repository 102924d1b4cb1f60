"""Decompose the orientation-loss backward cost on the TPU.

The production cotangent entering the filter-bank conv's VJP is one-hot
per pixel (gradient flows only through the per-pixel max response).  This
script times, at the training shape (bs8 512^2), with every jitted program
reduced to a scalar output (through the axon relay the sync point fetches
the whole output, so returning a big array would inflate the timing by
D2H transfer at ~57 MB/s):

  1. the full production orientation loss fwd and fwd+bwd
     (losses/orient.py path via cal_orientation_two_channel),
  2. the s2d backward conv alone on an fp32 cotangent,
  3. the same with the cotangent cast to bf16 inside the program (the cast
     fuses into the s2d transpose, halving its read traffic).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(leaves[0]).ravel()[0])


def timeit(fn, *args, iters=8):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from michigan_tpu.ops import filters as FB

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (8, 512, 512, 3)).astype(np.float32))
    g32 = jnp.asarray(
        rng.standard_normal((8, 512, 512, 32)).astype(np.float32)
    )
    out = {}

    # 1. production loss path: (sin,cos)*conf L1'd against a target
    tgt = jnp.zeros((8, 512, 512, 2), jnp.float32)

    def loss(x):
        two, conf = FB.cal_orientation_two_channel(x, "gabor")
        return jnp.mean(jnp.abs(two - tgt)) - jnp.mean(jnp.log(conf + 1e-6))

    out["loss_fwd_ms"] = round(timeit(jax.jit(loss), img) * 1e3, 2)
    grad_sum = jax.jit(lambda x: jnp.sum(jax.grad(loss)(x)))
    out["loss_fwd_bwd_ms"] = round(timeit(grad_sum, img) * 1e3, 2)

    # 2/3. backward conv alone, fp32 vs in-program bf16 cast
    from michigan_tpu.ops.filters import (
        _s2d_bank_transpose_np,
        _s2d_conv_apply,
    )

    w_np, lo, hi = _s2d_bank_transpose_np("gabor", 17, 32, 8)

    def bwd_conv(g):
        y = _s2d_conv_apply(g, w_np, lo, hi, 8, jax.lax.Precision.DEFAULT)
        return jnp.sum(y)

    out["bwd_conv_fp32_ms"] = round(timeit(jax.jit(bwd_conv), g32) * 1e3, 2)

    def bwd_conv_cast16(g):
        y = _s2d_conv_apply(
            g.astype(jnp.bfloat16), w_np, lo, hi, 8,
            jax.lax.Precision.DEFAULT, compute_dtype=jnp.bfloat16,
        )
        return jnp.sum(y.astype(jnp.float32))

    try:
        out["bwd_conv_bf16_ms"] = round(
            timeit(jax.jit(bwd_conv_cast16), g32) * 1e3, 2
        )
    except TypeError:
        out["bwd_conv_bf16_ms"] = None  # compute_dtype not yet supported

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
