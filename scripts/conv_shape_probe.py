"""Per-shape A/B probes for the bs32 inference MXU gap (PERF.md: 59% of the
compute roofline, attributed to conv dimension-shuffling).

Benchmarks the three dominant bs32 inference conv shapes (the same trio the
int8 probe used) under the candidate levers VERDICT r3 item 7 names:

  base    — production layout: NHWC x HWIO, bf16, default precision
  nchw    — dimension_numbers NCHW x OIHW (the torch-native layout; tests
            whether XLA's TPU emitter prefers feature-major)
  cpad    — channels padded up to the 128-lane width (64->128 in/out);
            the extra FLOPs are waste, so the effective rate on the REAL
            channel count is the padded time itself
  s2b     — (dilated shape only) space-to-batch rewrite: dilation-2 3x3
            becomes one dense 3x3 over 4 phase-batched quarter-res images
            (inverse transform included — production would pay it)
  upconv  — (upsample-consumer shape only) nearest-2x-upsample + 3x3 conv
            as production composes it
  upfuse  — the same collapsed algebraically to 4 phase convs with
            pre-summed 2x2 kernels (2.25x fewer MACs, no materialized
            upsampled tensor).  NOTE: valid only where a conv consumes the
            raw nearest-upsampled tensor; in SPADE the full-res modulation
            sits between upsample and conv, so this is a shape-level
            ceiling probe, not a drop-in.

Timing methodology: a single small conv through the axon relay is dominated
by the ~25 ms per-dispatch round trip (PERF.md known-caveat), which buries
1-5 ms kernel differences — so each variant is expressed as a same-shaped
step `y = f(y, w)` chained K and 2K times inside one jitted program, and the
per-application time is the difference quotient (t(2K) - t(K)) / K, which
cancels the dispatch constant exactly.  Effective TFLOP/s are reported
against the REAL (unpadded, pre-collapse) MAC count of the production op.

Usage: python scripts/conv_shape_probe.py [--reps 10] [--out artifacts/conv_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAIN = 24  # conv applications per dispatch


def bench(step, x0, w, reps, chain=CHAIN):
    """Median per-application seconds of `step(y, w) -> y` (same-shaped),
    chained `chain` and `2*chain` times inside one jitted program each;
    the difference quotient cancels the relay dispatch constant."""
    import jax
    import jax.numpy as jnp

    def chained(k):
        @jax.jit
        def run(x, w):
            y = jax.lax.fori_loop(0, k, lambda i, y: step(y, w), x)
            return jnp.sum(y.astype(jnp.float32))

        return run

    f1, f2 = chained(chain), chained(2 * chain)
    float(f1(x0, w)), float(f2(x0, w))  # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f1(x0, w))
        t1 = time.perf_counter()
        float(f2(x0, w))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / chain)
    return float(np.median(ts))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="artifacts/conv_probe.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    bf16 = jnp.bfloat16

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), bf16)

    def conv(x, w, dil=1, dn=("NHWC", "HWIO", "NHWC")):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(dil, dil)] * 2,
            rhs_dilation=(dil, dil) if dil != 1 else None,
            dimension_numbers=dn,
        )

    SHAPES = [
        # (name, N, H, W, Cin, Cout, k, dilation)
        ("ig_res_64x256_d2", 32, 64, 64, 256, 256, 3, 2),
        ("ig_enc_256x64", 32, 256, 256, 64, 64, 3, 1),
        ("gen_up_288x128", 32, 288, 288, 128, 128, 3, 1),
    ]

    results = {}
    for name, n, h, w, cin, cout, k, dil in SHAPES:
        x = mk((n, h, w, cin))
        w_hwio = mk((k, k, cin, cout))
        # real MACs of the production op at this shape (conv at full res)
        flops = 2.0 * n * h * w * k * k * cin * cout
        row = {}

        row["base_nhwc"] = bench(
            lambda y, w: conv(y, w, dil), x, w_hwio, args.reps)

        x_nchw = jnp.transpose(x, (0, 3, 1, 2))
        w_oihw = jnp.transpose(w_hwio, (3, 2, 0, 1))
        row["nchw_oihw"] = bench(
            lambda y, w: conv(y, w, dil, ("NCHW", "OIHW", "NCHW")),
            x_nchw, w_oihw, args.reps)

        if cin < 128:
            cp = 128
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - cin)))
            wp = jnp.pad(w_hwio,
                         ((0, 0), (0, 0), (0, cp - cin), (0, cp - cout)))
            row["cpad128"] = bench(
                lambda y, w: conv(y, w, dil), xp, wp, args.reps)

        if cout <= 64 and dil == 1:
            # output-phase packing: s2d(conv3x3(x)) computed directly as a
            # 4x4 stride-2 conv with Cout*4 filters (each 2x2 output phase
            # is a 3x3 window at offset (a,b) inside the 4x4 support).
            # Raises the matmul N-dim from 64 to 256 lanes at the cost of
            # 16/9 the MACs; effective rate is still scored against the
            # real 3x3 count.  Chain step returns to input shape via
            # depth-to-space (the consumer reshape production would pay).
            wp4 = jnp.zeros((4, 4, cin, 4 * cout), bf16)
            for a in (0, 1):
                for b in (0, 1):
                    wp4 = wp4.at[a:a + 3, b:b + 3, :,
                                 (2 * a + b) * cout:(2 * a + b + 1) * cout
                                 ].set(w_hwio)

            def s2d_pack(y, w):
                n_, h_, w__, c_ = y.shape
                yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
                o = jax.lax.conv_general_dilated(
                    yp, w, (2, 2), [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                o = o.reshape(n_, h_ // 2, w__ // 2, 2, 2, c_)
                return o.transpose(0, 1, 3, 2, 4, 5).reshape(y.shape)

            # self-check: equals plain SAME conv3x3 (HIGHEST precision)
            hp = jax.lax.Precision.HIGHEST
            xs = mk((1, 8, 8, cin)).astype(jnp.float32)
            want = jax.lax.conv_general_dilated(
                xs, w_hwio.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=hp)
            yp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
            o = jax.lax.conv_general_dilated(
                yp, wp4.astype(jnp.float32), (2, 2), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=hp)
            o = o.reshape(1, 4, 4, 2, 2, cout)
            got = o.transpose(0, 1, 3, 2, 4, 5).reshape(1, 8, 8, cout)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=2e-3)

            row["s2d_out_pack"] = bench(s2d_pack, x, wp4, args.reps)

        if dil == 2:
            # space-to-batch: 2x2 phases into batch, dense 3x3, inverse
            def s2b(y, w):
                n_, h_, w__, c_ = y.shape
                ph = y.reshape(n_, h_ // 2, 2, w__ // 2, 2, c_)
                ph = ph.transpose(0, 2, 4, 1, 3, 5).reshape(
                    n_ * 4, h_ // 2, w__ // 2, c_)
                o = conv(ph, w)
                o = o.reshape(n_, 2, 2, h_ // 2, w__ // 2, c_)
                return o.transpose(0, 3, 1, 4, 2, 5).reshape(y.shape)

            row["s2b_dense"] = bench(s2b, x, w_hwio, args.reps)

        if name == "gen_up_288x128":
            # production composition: nearest-up(2x) then conv3x3.  The
            # chain step returns to half-res with a ::2 slice — identical
            # in both variants, so their comparison is unpolluted.
            x_half = mk((n, h // 2, w // 2, cin))

            def up_then_conv(y, w):
                up = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
                return conv(up, w)[:, ::2, ::2, :]

            row["up_then_conv"] = bench(up_then_conv, x_half, w_hwio,
                                        args.reps)

            # collapsed phase convs with pre-summed 2x2 kernels.  Output
            # phase a of a SAME 3x3 conv on nearest-2x input reads two
            # source rows: a=0 -> {i-1: w0, i: w1+w2} (pad top), a=1 ->
            # {i: w0+w1, i+1: w2} (pad bottom); same per column phase b.
            def _phase_kernel(w, a, b):
                if a == 0:
                    rows = [w[0], w[1] + w[2]]
                else:
                    rows = [w[0] + w[1], w[2]]
                wk = []
                for r in rows:
                    if b == 0:
                        wk.append(jnp.stack([r[0], r[1] + r[2]], axis=0))
                    else:
                        wk.append(jnp.stack([r[0] + r[1], r[2]], axis=0))
                return jnp.stack(wk, axis=0)  # (2,2,Cin,Cout)

            def up_fused_full(y, w):
                outs = []
                for a in (0, 1):
                    for b in (0, 1):
                        wk = _phase_kernel(w, a, b)
                        pad = [(1, 0) if a == 0 else (0, 1),
                               (1, 0) if b == 0 else (0, 1)]
                        outs.append(jax.lax.conv_general_dilated(
                            y, wk, (1, 1), pad,
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        ))
                o = jnp.stack(outs, axis=0).reshape(
                    2, 2, y.shape[0], y.shape[1], y.shape[2], -1)
                return o.transpose(2, 3, 0, 4, 1, 5).reshape(
                    y.shape[0], 2 * y.shape[1], 2 * y.shape[2], -1)

            def up_fused(y, w):
                return up_fused_full(y, w)[:, ::2, ::2, :]

            # numerical self-check at a tiny shape before timing; HIGHEST
            # precision so TPU default bf16 matmul rounding doesn't mask
            # the algebraic comparison
            hp = jax.lax.Precision.HIGHEST
            xs = mk((1, 6, 6, 3)).astype(jnp.float32)
            ws = mk((3, 3, 3, 4)).astype(jnp.float32)
            up = jnp.repeat(jnp.repeat(xs, 2, axis=1), 2, axis=2)
            want = jax.lax.conv_general_dilated(
                up, ws, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=hp)
            got_parts = []
            for a in (0, 1):
                for b in (0, 1):
                    wk = _phase_kernel(ws, a, b)
                    pad = [(1, 0) if a == 0 else (0, 1),
                           (1, 0) if b == 0 else (0, 1)]
                    got_parts.append(jax.lax.conv_general_dilated(
                        xs, wk, (1, 1), pad,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        precision=hp))
            g = jnp.stack(got_parts, 0).reshape(2, 2, 1, 6, 6, 4)
            g = g.transpose(2, 3, 0, 4, 1, 5).reshape(1, 12, 12, 4)
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(want), rtol=1e-4, atol=1e-4)

            row["up_fused_phases"] = bench(up_fused, x_half, w_hwio,
                                           args.reps)

        base_t = row["base_nhwc"]
        results[name] = {
            "ms": {k_: round(v * 1e3, 3) for k_, v in row.items()},
            "speedup_vs_base": {k_: round(base_t / v, 3)
                                for k_, v in row.items()},
            "tflops_effective": {k_: round(flops / v / 1e12, 1)
                                 for k_, v in row.items()},
        }
        print(name, json.dumps(results[name], indent=1))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(results, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
