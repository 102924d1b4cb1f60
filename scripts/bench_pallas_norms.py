"""Micro-benchmark: fused Pallas norms vs the XLA composition, at the
flagship shapes (bs32 512^2-class inference).  Decides the use_pallas
gating policy from measured data (PERF.md)."""

from __future__ import annotations

import time

import numpy as np


def sync(x):
    import jax

    float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, *args, iters=30):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from michigan_tpu.ops.norms import instance_norm
    from michigan_tpu.ops.pallas.spade import fused_instance_norm, spade_modulate

    rng = np.random.default_rng(0)
    shapes = [
        ("IG mid 64^2 c256 [resident]", (32, 64, 64, 256)),
        ("gen up 144^2 c256 [stream]", (32, 144, 144, 256)),
        ("gen up 288^2 c128 [stream]", (32, 288, 288, 128)),
        ("IG encoder 256^2 c64 [stream]", (32, 256, 256, 64)),
    ]
    for dtype in ("bfloat16",):
        for name, shp in shapes:
            x = jnp.asarray(rng.normal(size=shp), getattr(jnp, dtype))

            # sum ON DEVICE: the relay sync fetches the jit output, and at
            # these shapes (64 MB) the D2H transfer would dwarf the ~ms
            # kernels under test and wash every ratio toward 1.0
            xla = jax.jit(lambda x: jnp.sum(jax.nn.relu(instance_norm(x))))
            t_x = timeit(xla, x, iters=10)
            print(f"IN+relu {name} {dtype}: xla {t_x:.2f} ms", flush=True)
            pal = jax.jit(
                lambda x: jnp.sum(fused_instance_norm(x, act="relu"))
            )
            t_p = timeit(pal, x, iters=10)
            print(f"IN+relu {name} {dtype}: pallas {t_p:.2f} ms "
                  f"({t_x / t_p:.2f}x)", flush=True)

    # spade_modulate vs XLA eval-BN modulation
    for name, shp in [("gen up 288^2 c128", (32, 288, 288, 128))]:
        c = shp[-1]
        x = jnp.asarray(rng.normal(size=shp), jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=shp), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=shp), jnp.bfloat16)
        mean = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        inv = jnp.asarray(rng.uniform(0.5, 2, (c,)), jnp.float32)

        def xla_mod(x, g, b):
            m = mean.reshape(1, 1, 1, c)
            iv = inv.reshape(1, 1, 1, c)
            return jnp.sum(((x - m) * iv * (1.0 + g) + b).astype(x.dtype))

        t_x = timeit(jax.jit(xla_mod), x, g, b)
        t_p = timeit(
            jax.jit(
                lambda x, g, b: jnp.sum(spade_modulate(x, mean, inv, g, b))
            ),
            x, g, b,
        )
        print(f"modulate {name}: xla {t_x:.2f} ms  pallas {t_p:.2f} ms "
              f"({t_x / t_p:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
