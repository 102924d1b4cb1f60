"""Per-step collective volume of the data-parallel train step + expected
multi-chip scaling efficiency (VERDICT round-2 item 7 artifact).

The sharded step's collectives (training/train_step.py) are:
  1. grad pmean for the G param tree   (one all-reduce per G step)
  2. grad pmean for the D param tree   (one all-reduce per D step)
  3. loss pmean                         (scalar dict — negligible)
  4. cross-replica BN stats psum        (3 fp32 vectors of C per syncbatch
     norm call per forward; backward adds 2 more reductions of C — the
     custom-VJP path in ops/norms.py)

Everything is computed from the real variable tree (conv nets: param shapes
are spatial-size independent, so init runs at 64^2 and the counts hold for
512^2), then converted to expected all-reduce time on a v5e ICI ring and
compared against the measured single-chip step time to bound scaling
efficiency.  Runs on CPU.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tree_bytes(tree) -> int:
    import jax

    return sum(
        int(np.prod(x.shape)) * 4  # grads are fp32 like the params
        for x in jax.tree_util.tree_leaves(tree)
    )


def main():
    import jax
    import jax.numpy as jnp

    from michigan_tpu.config import Options
    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.training.state import d_net_names, g_net_names

    # flagship training config (real ngf/ndf); 64^2 init — same param tree
    opt = Options(
        isTrain=True, crop_size=64, load_size=64, batchSize=1,
        netG="spadeb", use_encoder=True, use_ig=True, noise_background=True,
        random_expand_mask=True, num_upsampling_layers="more",
    ).finalize()
    model = MichiGANModel(opt)
    rng_np = np.random.default_rng(0)
    s = opt.crop_size
    batch = {
        "label_ref": jnp.asarray(rng_np.integers(0, 2, (1, s, s, 1)), jnp.float32),
        "label_tag": jnp.asarray(rng_np.integers(0, 2, (1, s, s, 1)), jnp.float32),
        "image_ref": jnp.asarray(rng_np.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
        "image_tag": jnp.asarray(rng_np.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
        "orient": jnp.asarray(rng_np.uniform(0, 255, (1, s, s, 1)), jnp.float32),
        "hole": jnp.asarray(rng_np.integers(0, 2, (1, s, s, 1)), jnp.float32),
        "orient_rgb": jnp.asarray(rng_np.uniform(0, 1, (1, s, s, 3)), jnp.float32),
        "noise": jnp.asarray(rng_np.uniform(0, 1, (1, s, s, 3)), jnp.float32),
    }
    # jit the init: eager init is hundreds of tiny dispatches (minutes on
    # the single CPU core); only shapes/dtypes matter here
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0), batch)

    g_bytes = sum(
        tree_bytes(variables[n]["params"]) for n in g_net_names(opt)
    )
    d_bytes = sum(
        tree_bytes(variables[n]["params"])
        for n in d_net_names(opt) if n in variables
    )

    # BN psum volume: every syncbatch ParamFreeNorm psums (sum, ssum, count)
    # fp32 per channel in the forward and (sum_g, sum_gx) in the backward.
    bn_channels = []

    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            if path and path[-1] == "running_mean":
                bn_channels.append(int(np.prod(tree.shape)))

    for name in ("netG",):
        walk(variables[name].get("batch_stats", {}))
    bn_fwd_bytes = sum(bn_channels) * 3 * 4  # (sum, ssum, count~1) fp32
    bn_bwd_bytes = sum(bn_channels) * 2 * 4

    # v5e: 4 ICI links/chip, ~45 GB/s each direction usable per link pair;
    # ring all-reduce moves 2*(n-1)/n * bytes over the slowest link.
    ici_bw = 45e9
    n = 8
    ring = lambda b: 2 * (n - 1) / n * b / ici_bw

    step_allreduce_s = ring(g_bytes) + ring(d_bytes) + ring(
        bn_fwd_bytes + bn_bwd_bytes
    )
    # --bf16_grad_allreduce (train_step._grad_pmean): grad trees reduced in
    # bf16 — half the wire bytes; BN stats stay fp32
    step_allreduce_bf16_s = ring(g_bytes // 2) + ring(d_bytes // 2) + ring(
        bn_fwd_bytes + bn_bwd_bytes
    )
    # measured single-chip step time at the config of record (PERF.md);
    # STEP_IMG_S overrides as the bench number moves
    measured_step_s = 8 / float(os.environ.get("STEP_IMG_S", "15.42"))

    out = {
        "g_param_grad_bytes": g_bytes,
        "d_param_grad_bytes": d_bytes,
        "bn_syncbatch_norm_calls": len(bn_channels),
        "bn_psum_bytes_per_step_fwd": bn_fwd_bytes,
        "bn_psum_bytes_per_step_bwd": bn_bwd_bytes,
        "ring_allreduce_s_8chip_v5e": round(step_allreduce_s, 5),
        "ring_allreduce_s_8chip_v5e_bf16_grads": round(step_allreduce_bf16_s, 5),
        "measured_step_s_1chip": round(measured_step_s, 4),
        "expected_scaling_efficiency_8chip": round(
            measured_step_s / (measured_step_s + step_allreduce_s), 4
        ),
        "expected_scaling_efficiency_8chip_bf16_grads": round(
            measured_step_s / (measured_step_s + step_allreduce_bf16_s), 4
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
