"""Wall-clock throughput ladder: where the loader-inclusive rate goes.

The round-4 soak sustains ~6 img/s wall against ~16 img/s device-only
(BENCH, PERF.md).  This ladder measures each stage of the non-device path
in isolation on the same config so the gap is attributed, not guessed:

  A. device-only step rate      — jitted fused step on resident batches
                                  (bench.py's metric)
  B. host batch production      — CustomDataset.get_sample + collation on
                                  this container's single core, decode
                                  cache warm (the soak's steady state)
  C. H2D transfer               — device_put of one compact training batch
                                  through the axon relay, synced
  D. full loop                  — train.py wall rate (the soak artifact)

If B+C ≈ wall-step-time and B alone ≥ device step time, the single host
core is the ceiling and the loop is overlap-limited, matching VERDICT r3
item 1's alternate closure condition.

Usage: python scripts/wall_ladder.py [--steps 30] [--out artifacts/wall_ladder.json]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--data_dir", default="/tmp/soak_r4_ds")
    ap.add_argument("--out", default="artifacts/wall_ladder.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from michigan_tpu.config import Options
    from michigan_tpu.data.dataset import CustomDataset

    opt = Options(
        isTrain=True, batchSize=8, crop_size=512, load_size=568,
        dtype="bfloat16", data_dir=args.data_dir, nThreads=8,
        decode_cache_mb=800, device_noise=True, device_orient_rgb=True,
        use_ig=True, serial_batches=False, seed=0,
    ).finalize()

    bs = opt.batchSize
    ds = CustomDataset(opt)
    rng = random.Random(0)

    # warm the decode cache exactly like a first epoch would
    t0 = time.perf_counter()
    for i in range(len(ds)):
        ds.get_sample(i, rng)
    t_warm = time.perf_counter() - t0

    # --- B: host batch production, cache warm ---------------------------
    def make_batch():
        samples = [ds.get_sample(rng.randrange(len(ds)), rng)
                   for _ in range(bs)]
        return {k: np.stack([s[k] for s in samples])
                for k in samples[0] if isinstance(samples[0][k], np.ndarray)}

    make_batch()
    tb = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        make_batch()
        tb.append(time.perf_counter() - t0)
    host_s = float(np.median(tb))

    # --- C: H2D of one uint8-wire batch through the relay ---------------
    # mirrors train.py's device_batch: the loader already emits uint8 (and
    # omits deduped/device-computed planes); noise + orient_rgb are drawn
    # in-program on device
    from michigan_tpu.ops.noise import generate_noise_jax

    @jax.jit
    def noise_batch(seed, ctr):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), ctr)
        keys = jax.random.split(key, bs)
        return jax.vmap(
            lambda k: generate_noise_jax(k, opt.crop_size, opt.crop_size)
        )(keys).astype(jnp.bfloat16)

    @jax.jit
    def orient_rgb_batch(orient_u8, label_u8):
        t = orient_u8.astype(jnp.float32) / 255.0 * np.pi
        m = label_u8.astype(jnp.float32)
        rgb = jnp.concatenate([(jnp.cos(2 * t) + 1) * 0.5,
                               (jnp.sin(2 * t) + 1) * 0.5,
                               jnp.full_like(t, 0.5)], -1) * m
        return (jnp.floor(rgb * 255.0) / 255.0 * m).astype(jnp.bfloat16)

    def transfer(data, ctr=0):
        out = {k: jnp.asarray(v) for k, v in data.items() if k != "noise"}
        out["noise"] = noise_batch(np.uint32(0), ctr)
        if "orient_rgb" not in out:
            out["orient_rgb"] = orient_rgb_batch(out["orient"],
                                                 out["label_tag"])
        return out

    batch_np = make_batch()
    dev = transfer(batch_np)
    # relay caveat: block_until_ready does not block — sync via fetch
    float(jnp.sum(dev["image_tag"].astype(jnp.float32)))
    tc = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        dev = transfer(batch_np, ctr=i + 1)
        float(jnp.sum(dev["image_tag"].astype(jnp.float32)))
        tc.append(time.perf_counter() - t0)
    h2d_s = float(np.median(tc))
    batch_bytes = sum(
        int(np.asarray(v).nbytes) for v in jax.tree_util.tree_leaves(dev))

    result = {
        "config": "bs8 512^2 bf16 compact transfer, decode cache warm",
        "decode_warm_pass_s": round(t_warm, 2),
        "host_batch_s": round(host_s, 4),
        "host_only_img_per_s": round(bs / host_s, 2),
        "h2d_batch_s": round(h2d_s, 4),
        "h2d_batch_mb": round(batch_bytes / 1e6, 1),
        "host_plus_h2d_img_per_s": round(bs / (host_s + h2d_s), 2),
        "note": "compare against bench.py device rate (A) and the soak's "
                "wall rate (D); see PERF.md wall-clock section",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(result, open(args.out, "w"), indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
