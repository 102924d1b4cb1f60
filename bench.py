"""Headline benchmark: 512^2 batched inference (or training) throughput.

BENCH_MODE=train measures the full G+D train step (hinge + feature-matching
+ VGG/style/content + orientation + Lab losses) at batch 8 — the reference's
training config of record (BASELINE.md).

Runs the flagship configuration (BASELINE.json batched-inference config:
spadeb generator + partialconv appearance encoder + IG orientation
inpainting + noise background) on whatever jax.devices()[0] is — the real
TPU chip under the driver.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
against a self-recorded prior value in BENCH_BASELINE.json when present,
else null.

The training config of record (fused one-program G+D, no remat) sits
~300 MB under the 16 GB HBM line; the relay chip is shared, so a transient
squeeze can OOM it.  Rather than record a failed run, the bench steps down a
fallback ladder (more remat -> sequential G/D) and reports whichever config
completed (the step-down is logged to stderr).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from functools import partial

import numpy as np


def _build_batch(jnp, batch_size, size, compact=False):
    """compact=True mirrors train.py's device representation under the bf16
    policy: bf16 image-like tensors, u8 0/1 masks, fp32 orient label — the
    step upcasts inside the program (train_step.py _f32)."""
    rng_np = np.random.default_rng(0)
    s, n = size, batch_size
    img = jnp.bfloat16 if compact else jnp.float32
    msk = jnp.uint8 if compact else jnp.float32
    return {
        "label_ref": jnp.asarray(rng_np.integers(0, 2, (n, s, s, 1)), msk),
        "label_tag": jnp.asarray(rng_np.integers(0, 2, (n, s, s, 1)), msk),
        "image_ref": jnp.asarray(rng_np.uniform(-1, 1, (n, s, s, 3)), img),
        "image_tag": jnp.asarray(rng_np.uniform(-1, 1, (n, s, s, 3)), img),
        "orient": jnp.asarray(rng_np.uniform(0, 255, (n, s, s, 1)), jnp.float32),
        "hole": jnp.asarray(rng_np.integers(0, 2, (n, s, s, 1)), msk),
        "orient_rgb": jnp.asarray(rng_np.uniform(0, 1, (n, s, s, 3)), img),
        "noise": jnp.asarray(rng_np.uniform(0, 1, (n, s, s, 3)), img),
    }


def _make_opt(mode, size, batch_size, dtype, fused, remat, remat_blocks):
    from michigan_tpu.config import Options

    return Options(
        isTrain=(mode == "train"), phase="test", batchSize=batch_size,
        crop_size=size, load_size=size, netG="spadeb", use_encoder=True,
        use_ig=True, noise_background=True, expand_mask_be=True, expand_th=5,
        random_expand_mask=(mode == "train"),
        remat=remat,
        remat_blocks=remat_blocks,
        num_upsampling_layers="most" if size >= 1024 else "more", dtype=dtype,
        # BENCH_PALLAS=0/1 gives the use_pallas A/B on identical config
        # (default matches the config default: off — PERF.md policy)
        use_pallas=os.environ.get("BENCH_PALLAS", "0") == "1",
        # BENCH_PALLAS_EPI=0/1: fused conv+IN+act epilogue kernel A/B for
        # the IG resblock stack (ops/pallas/epilogue.py)
        use_pallas_epilogue=os.environ.get("BENCH_PALLAS_EPI", "0") == "1",
        # BENCH_REUSE_FAKE=1: D trains on the G step's fake (config docs)
        reuse_fake_for_d=os.environ.get("BENCH_REUSE_FAKE", "0") == "1",
        fused_step=fused,
        donate_buffers=(mode == "train"),  # duplicate train state OOMs otherwise
    ).finalize()


def _run_train(opt, batch_size, size, iters):
    import jax
    import jax.numpy as jnp

    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.training.state import TrainState
    from michigan_tpu.training.train_step import make_train_steps

    model = MichiGANModel(opt)
    batch = _build_batch(jnp, batch_size, size,
                         compact=(opt.dtype == "bfloat16"))
    key = jax.random.PRNGKey(0)
    # jit the init too: eager init is hundreds of tiny dispatches, which is
    # pathological through the remote-TPU relay
    variables = jax.jit(model.init_variables)(
        key, {k: v.astype(jnp.float32) for k, v in batch.items()}
    )

    steps = make_train_steps(opt, with_fused=opt.fused_step)
    g_step, d_step = steps[1], steps[2]
    state = TrainState.create(opt, variables)
    extra = jnp.asarray(2, jnp.int32)

    if opt.fused_step:
        fused = steps[3]

        def one_step(state):
            state, g_losses, d_losses, _fake = fused(state, batch, key, extra)
            return state, g_losses["GAN"]
    else:
        def one_step(state):
            state, g_losses, fake, orient = g_step(state, batch, key, extra)
            state, d_losses = d_step(
                state, batch, key, extra,
                fake=fake if opt.reuse_fake_for_d else None,
                orient=orient,
            )
            return state, g_losses["GAN"]

    state, s0 = one_step(state)
    float(s0)  # compile + warmup (value fetch = the only honest sync)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, sv = one_step(state)
    float(sv)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def _is_oom(exc) -> bool:
    msg = str(exc)
    return "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg


def _run_train_wall(size, batch_size):
    """Loader-INCLUSIVE wall-clock training throughput: drives the real
    train.py loop (CustomDataset + threaded prefetch + decode cache + device
    noise + compact H2D transfer + fused step) on a soak dataset built from
    the bundled samples, and reports train.py's own end-of-epoch wall rate —
    the reference's metric is wall-clock around the whole loop
    (util/iter_counter.py:42-50), not device-resident step time."""
    import re
    import subprocess
    import tempfile

    steps = int(os.environ.get("BENCH_WALL_STEPS", "60"))
    ds = os.path.join(tempfile.gettempdir(), "bench_wall_ds")
    if not os.path.isdir(os.path.join(ds, "train_images")):
        subprocess.run(
            [sys.executable, "scripts/make_soak_dataset.py", "--out", ds,
             "--replicas", str(max(1, (steps * batch_size) // 3 + 1))],
            check=True,
        )
    ck = os.path.join(tempfile.gettempdir(), "bench_wall_ck")
    cmd = [
        sys.executable, "train.py", "--name", "bench_wall",
        "--checkpoints_dir", ck, "--data_dir", ds,
        "--batchSize", str(batch_size), "--crop_size", str(size),
        "--load_size", str(size + 56), "--niter", "1",
        "--dtype", "bfloat16", "--fused_step",
        "--max_steps", str(steps + 1),
        "--nThreads", "8", "--device_prefetch", "2",
        "--decode_cache_mb", "512", "--device_noise",
        "--save_latest_freq", "100000000", "--print_freq", "100000000",
        "--display_freq", "100000000",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    assert out.returncode == 0, "train.py failed"
    m = None
    for line in out.stdout.splitlines():
        mm = re.search(r"wall throughput: ([0-9.]+) img/s over (\d+) steps", line)
        if mm:
            m = mm
    assert m, "no wall-throughput line in train.py output"
    return float(m.group(1)), int(m.group(2))


def main():
    import jax
    import jax.numpy as jnp

    from michigan_tpu.model import MichiGANModel

    # default = the BASELINE.md primary target: bs8 512^2 training
    # throughput in the recommended config (bf16 — validated against fp32
    # by scripts/bf16_quality.py — fused one-program G+D step with
    # no remat, reference step semantics: D recomputes the fake).
    # BENCH_MODE=infer gives the round-1 headline (bs32 512^2 inference).
    mode = os.environ.get("BENCH_MODE", "train")
    size = int(os.environ.get("BENCH_SIZE", "512"))
    # BENCH_SIZE=1024 measures the 'most' stretch resolution (bs4 default)
    default_bs = (
        "8" if mode in ("train", "train_wall")
        else ("4" if size >= 1024 else "32")
    )
    batch_size = int(os.environ.get("BENCH_BATCH", default_bs))
    from michigan_tpu.config import Options
    iters = int(os.environ.get("BENCH_ITERS", str(Options().bench_iters)))
    # bf16 activations win at every batch size (inference bs8: 76.7 vs 68.6
    # img/s; bs32: 84.7, and fp32 OOMs there) with bit-equal outputs at
    # default XLA precision; bf16 training quality validated (ROADMAP)
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # fused one-program G+D is the 512^2 config of record; kept off by
    # default at 1024^2 (bs1 + full remat is already at the memory edge)
    fused = mode == "train" and os.environ.get(
        "BENCH_FUSED", "1" if size < 1024 else "0") == "1"

    if mode == "train_wall":
        rate, steps_done = _run_train_wall(size, batch_size)
        metric = "%dpx_train_wall_throughput_bs%d" % (size, batch_size)
        print(json.dumps({
            "metric": metric,
            "value": round(rate, 3),
            "unit": "images/sec/chip",
            "vs_baseline": _vs_baseline(metric, rate),
            "config": {"loader_inclusive": True, "steps": steps_done,
                       "decode_cache_mb": 512, "device_noise": True,
                       "device_prefetch": 2, "nThreads": 8},
        }))
        return

    if mode == "train":
        # loader-inclusive wall-clock rate alongside the device rate — the
        # reference's own throughput metric is wall-clock around the whole
        # loop (util/iter_counter.py:42-50).  This spawns a full train.py
        # subprocess, so it MUST run before this process initializes the
        # (single-tenant) TPU backend.  Opt out with BENCH_WALL=0.
        wall_rate = wall_steps = None
        if os.environ.get("BENCH_WALL", "1") == "1" and size == 512:
            try:
                wall_rate, wall_steps = _run_train_wall(size, batch_size)
            except Exception as e:  # noqa: BLE001 — wall rate is auxiliary
                print(f"bench: wall-rate pass failed ({e}); device-only",
                      file=sys.stderr)

        # fp32 512^2 bs8 training OOMs without remat (18.5G > 15.75G); bf16
        # fits and runs faster without it.  The fused one-program step's
        # coexisting G+D live ranges needed up_3 remat to fit in round 2;
        # after round 3's compact device batches + bf16 frozen towers the
        # fused step fits with NO remat and runs 16.03 img/s (vs 15.85
        # remat-up_2, 15.55 remat-up_3 — PERF.md)
        remat = os.environ.get(
            "BENCH_REMAT", "1" if dtype == "float32" else "0") == "1"
        # BENCH_REMAT_BLOCKS: selective remat for non-default memory points
        # (ladder below steps through up_2 -> up_2,up_3 -> all on OOM)
        remat_blocks = os.environ.get(
            "BENCH_REMAT_BLOCKS", "up_2" if fused else "all")

        # fallback ladder: requested config first, then progressively more
        # rematerialization, then the sequential two-program step
        ladder = [(fused, remat, remat_blocks)]
        if fused:
            if not remat:
                ladder.append((True, True, remat_blocks))
            if remat_blocks != "all":
                ladder.append((True, True, "up_2,up_3"))
                ladder.append((True, True, "all"))
            ladder.append((False, dtype == "float32", "all"))
        elif not remat:
            ladder.append((False, True, "all"))

        imgs_per_sec = None
        used = None
        ladder_pos = 0
        for i, (f, r, rb) in enumerate(ladder):
            opt = _make_opt(mode, size, batch_size, dtype, f, r, rb)
            try:
                imgs_per_sec = _run_train(opt, batch_size, size, iters)
                used, ladder_pos = (f, r, rb), i
                if i > 0:
                    print(
                        "bench: config of record OOMed on this chip; "
                        f"measured fallback fused={f} remat={r} blocks={rb}",
                        file=sys.stderr)
                break
            except Exception as e:  # noqa: BLE001 — re-raised unless OOM
                if not _is_oom(e) or i == len(ladder) - 1:
                    raise
                print(
                    f"bench: OOM at fused={f} remat={r} blocks={rb}; "
                    "stepping down the fallback ladder", file=sys.stderr)
                gc.collect()

        metric = "%dpx_train_step_throughput_bs%d" % (size, batch_size)
        f, r, rb = used
        print(json.dumps(train_bench_record(
            metric, imgs_per_sec, _vs_baseline(metric, imgs_per_sec),
            # self-describing run config: a fallback-ladder step-down can
            # never masquerade as the config of record (ladder_position 0)
            {
                "dtype": dtype, "fused_step": f, "remat": r,
                "remat_blocks": rb, "ladder_position": ladder_pos,
                "reuse_fake_for_d": opt.reuse_fake_for_d,
                "reuse_orient_for_d": getattr(opt, "reuse_orient_for_d", True),
                "use_pallas": opt.use_pallas,
                "use_pallas_epilogue": opt.use_pallas_epilogue,
                "iters": iters,
                "compiler_options":
                    os.environ.get("MICHIGAN_COMPILER_OPTIONS") or None,
                "wall_img_per_s_loader_inclusive": wall_rate,
                "wall_steps": wall_steps,
            },
        )))
        return

    opt = _make_opt(mode, size, batch_size, dtype, False, False, "all")
    model = MichiGANModel(opt)
    batch = _build_batch(jnp, batch_size, size)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init_variables)(key, batch)

    from michigan_tpu.utils.xla_options import compiler_options

    @partial(jax.jit, compiler_options=compiler_options())
    def infer_sum(variables, batch):
        out, _ = model.infer(variables, batch)
        # reduce on device; fetching the scalar below forces completion —
        # through the axon relay block_until_ready does NOT actually block,
        # so a value fetch is the only honest synchronization
        return jnp.sum(out)

    float(infer_sum(variables, batch))  # compile + warmup

    t0 = time.perf_counter()
    vals = [infer_sum(variables, batch) for _ in range(iters)]
    float(vals[-1])  # same-stream ordering: last done => all done
    dt = time.perf_counter() - t0

    imgs_per_sec = batch_size * iters / dt
    metric = "%dpx_batched_inference_throughput_bs%d" % (size, batch_size)
    print(json.dumps({
        "metric": metric,
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": _vs_baseline(metric, imgs_per_sec),
        "config": {
            "dtype": dtype, "use_pallas": opt.use_pallas,
            "use_pallas_epilogue": opt.use_pallas_epilogue, "iters": iters,
            "compiler_options":
                os.environ.get("MICHIGAN_COMPILER_OPTIONS") or None,
        },
    }))


def train_bench_record(metric, value, vs_baseline, config):
    """The driver-consumed JSON line for the training benchmark.  Pinned by
    tests/test_bench_schema.py: the record must always carry BOTH numbers —
    the device rate ("value") and the reference-semantics loader-inclusive
    wall rate (config.wall_img_per_s_loader_inclusive, the metric the
    reference itself reports: util/iter_counter.py:42-50) — so a refactor
    cannot silently drop either."""
    required = ("wall_img_per_s_loader_inclusive", "wall_steps")
    missing = [k for k in required if k not in config]
    assert not missing, f"bench config record missing {missing}"
    return {
        "metric": metric,
        "value": round(value, 3),
        "unit": "images/sec/chip",
        "vs_baseline": vs_baseline,
        "config": config,
    }


def _vs_baseline(metric, value):
    """Self-recorded round-1 numbers (the reference publishes none —
    BASELINE.md); keyed by metric name in BENCH_BASELINE.json."""
    if not os.path.exists("BENCH_BASELINE.json"):
        return None
    try:
        rec = json.load(open("BENCH_BASELINE.json"))
        base = rec.get("metrics", {}).get(metric)
        if base is None and rec.get("metric") == metric:
            base = rec.get("value")
        return value / base if base else None
    except Exception:
        return None


if __name__ == "__main__":
    main()
