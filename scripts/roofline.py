"""Roofline accounting from XLA cost_analysis on the compiled TPU executable:
train (g/d/fused at the config of record) and inference (bs32 batched + bs1
interactive) — PERF.md's MFU/HBM tables (VERDICT round-2: inference had no
bound analysis).

Usage (on the TPU):
  python scripts/roofline.py train
  python scripts/roofline.py infer
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_FLOPS = 197e12
V5E_HBM_BW = 819e9


def _analyze(name, compiled, batch_images):
    c = compiled.cost_analysis()
    if isinstance(c, list):
        c = c[0]
    flops = c.get("flops", 0.0)
    bytes_accessed = c.get("bytes accessed", 0.0)
    t_flops = flops / V5E_BF16_FLOPS
    t_hbm = bytes_accessed / V5E_HBM_BW
    bound = "HBM" if t_hbm > t_flops else "MXU"
    sol = batch_images / max(t_flops, t_hbm)
    print(json.dumps({
        "program": name,
        "tflops": round(flops / 1e12, 2),
        "hbm_gb": round(bytes_accessed / 1e9, 2),
        "roofline_compute_ms": round(t_flops * 1e3, 1),
        "roofline_hbm_ms": round(t_hbm * 1e3, 1),
        "bound": bound,
        "speed_of_light_img_s": round(sol, 2),
    }))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    import jax
    import jax.numpy as jnp

    from bench import _build_batch, _make_opt
    from michigan_tpu.model import MichiGANModel

    if mode == "train":
        from michigan_tpu.training.state import TrainState
        from michigan_tpu.training.train_step import make_train_steps

        bs, size = 8, 512
        # the round-3 config of record: fused one-program step, no remat
        opt = _make_opt("train", size, bs, "bfloat16", True, False, "up_2")
        model = MichiGANModel(opt)
        batch = _build_batch(jnp, bs, size)
        key = jax.random.PRNGKey(0)
        variables = jax.jit(model.init_variables)(key, batch)
        steps = make_train_steps(opt, with_fused=True)
        g_step, d_step, fused = steps[1], steps[2], steps[3]
        state = TrainState.create(opt, variables)
        extra = jnp.asarray(2, jnp.int32)

        _analyze(
            "fused_step (config of record)",
            jax.jit(lambda s: fused(s, batch, key, extra)).lower(state).compile(),
            bs,
        )
        _analyze(
            "g_step",
            jax.jit(lambda s: g_step(s, batch, key, extra)).lower(state).compile(),
            bs,
        )
        _, _, _, orient = g_step(state, batch, key, extra)
        _analyze(
            "d_step (reuse_orient)",
            jax.jit(
                lambda s, o: d_step(s, batch, key, extra, orient=o)
            ).lower(state, orient).compile(),
            bs,
        )
        return

    for bs in (32, 1):
        opt = _make_opt("infer", 512, bs, "bfloat16", False, False, "all")
        model = MichiGANModel(opt)
        batch = _build_batch(jnp, bs, 512)
        key = jax.random.PRNGKey(0)
        variables = jax.jit(model.init_variables)(key, batch)

        def infer(variables, batch):
            out, _ = model.infer(variables, batch)
            return out

        _analyze(
            f"inference bs{bs} 512^2 bf16",
            jax.jit(infer).lower(variables, batch).compile(),
            bs,
        )


if __name__ == "__main__":
    main()
