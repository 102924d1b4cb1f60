"""A/B the orientation filter bank paths on the TPU: direct C_in=1 conv vs
the MXU-shaped space-to-depth form (ops/filters.py), fwd and fwd+bwd, at
the training shape (bs8 512^2)."""

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
    bank = FB.gabor_bank()

    def gray(x):
        return FB.rgb_to_gray255(x)

    paths = {
        "direct": lambda g: FB.filter_bank_conv_direct(g, bank),
        "s2d": lambda g: FB.filter_bank_conv_s2d(g, "gabor"),
    }
    out = {}
    for name, conv in paths.items():
        fwd = jax.jit(lambda x: jnp.max(conv(gray(x))))
        # reduce the gradient to a scalar ON DEVICE: through the axon relay
        # the sync point fetches the jit's output, so returning the 25 MB
        # gradient would inflate the timing by D2H transfer (~57 MB/s)
        bwd = jax.jit(
            lambda x: jnp.sum(
                jax.grad(lambda y: jnp.sum(jnp.tanh(conv(gray(y)) / 100.0)))(x)
            )
        )
        out[f"{name}_fwd_ms"] = round(timeit(fwd, img) * 1e3, 2)
        out[f"{name}_fwd_bwd_ms"] = round(timeit(bwd, img) * 1e3, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
