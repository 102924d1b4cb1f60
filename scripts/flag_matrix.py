"""Round-5 TPU flag-matrix campaign: execute every optional config path on
the real chip.

Motivation: the round-4 netD2 donation-aliasing bug (InvalidArgument raised
by the TPU backend only — invisible to the whole CPU suite) proved that
config paths which have only ever run under the virtual-CPU tests carry a
real risk class: buffer donation, layouts, TPU memory.  This script runs a
short REAL-CHIP training segment followed by an inference pass for each
optional path the reference can enable (pix2pix_model.py:168-203 builds all
8 nets from flags; generator.py:66-96 the upsampling variants), asserting:

  * the segment completes (rc 0) for >= the requested --max_steps,
  * every printed loss is finite,
  * per-config EXPECTED loss terms appear (KLD for --use_vae, hairAvgLab
    for --unpairTrain, ...),
  * inference restores the trained checkpoint and writes a 512^2 JPEG.

Each config runs in a fresh subprocess through the real CLIs (train.py /
inference.py) so checkpoint IO, option plumbing, and process teardown are
exercised exactly as a user would hit them.

Writes artifacts/flag_matrix_r5.json: one row per config with rc, steps
completed, the last printed loss dict, the wall rate, and pass/fail.

Usage (on the TPU host):
  python scripts/flag_matrix.py --out artifacts/flag_matrix_r5.json
  python scripts/flag_matrix.py --only vae,blender   # subset
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

# base = the reference's training command of record VERBATIM (README.md:60,
# including its loss ablations — the reference record trains with
# confidence/style/rgb/content/background losses OFF) at the bf16 fused
# config.  An earlier round-5 attempt ran the matrix with every loss term ON
# + --use_ig: that composite (which the reference never runs at once) OOMs
# bs8 on a 16G v5e — measured, and covered instead by the dedicated
# `all_losses_remat` row below; the all-losses/no-IG composite is proven by
# the r4/r5 soaks.
BASE = [
    "--batchSize", "8", "--crop_size", "512", "--load_size", "568",
    "--dtype", "bfloat16", "--fused_step",
    "--use_encoder", "--use_ig", "--noise_background", "--random_expand_mask",
    "--wide_edge", "2",
    "--no_confidence_loss", "--no_style_loss", "--no_rgb_loss",
    "--no_content_loss", "--no_background_loss",
    "--nThreads", "4", "--device_prefetch", "2", "--decode_cache_mb", "256",
    "--device_noise",
    "--niter", "2000", "--max_steps", "40",
    "--print_freq", "40", "--display_freq", "100000000",
    "--save_latest_freq", "100000000", "--save_epoch_freq", "10000",
    "--seed", "0",
]

# net-shape flags that inference must repeat so the restored checkpoint
# matches the model the inference CLI builds
SHAPE_FLAGS = {
    "--use_encoder", "--use_ig", "--use_vae", "--use_blender", "--use_stroke",
    "--use_instance_feat", "--num_upsampling_layers", "--crop_size",
    "--load_size", "--ngf", "--ndf", "--batchSize",
}

CONFIGS = [
    # key, extra train flags, expected extra loss keys, notes
    ("record", [], set(), "reference README.md:60 config, all losses live"),
    ("vae", ["--use_vae"], {"KLD"}, "netE + KLD (pix2pix_model.py:42,128)"),
    ("blender", ["--use_blender"], set(), "netB refines fake (:91,132)"),
    ("stroke", ["--use_stroke"], set(), "netSIG built+checkpointed (:171)"),
    ("instance_feat", ["--use_instance_feat"], set(),
     "netFE in G optimizer (:130-131,175)"),
    ("ups_normal", ["--num_upsampling_layers", "normal"], set(),
     "generator.py:79-96 5-up variant"),
    ("ups_most", ["--num_upsampling_layers", "most"], set(),
     "generator.py:79-96 7-up variant"),
    ("remove_background", ["--remove_background"], set(),
     "train-time background compositing"),
    ("no_ig", ["~--use_ig"], set(),
     "dense-orient path without the IG tower"),
    ("unpair", ["--unpairTrain", "--same_netD_model"], {"hairAvgLab"},
     "two-stage: D2 + hairAvgLab (train.py:42-90)"),
    ("all_losses_remat", [
        "~--no_confidence_loss", "~--no_style_loss", "~--no_rgb_loss",
        "~--no_content_loss", "~--no_background_loss",
        "--remat", "--remat_blocks", "up_1,up_2,up_3",
    ], {"style", "content", "rgb", "background", "CONFIDENCE"},
     "every loss term + IG at bs8: needs remat on 16G (measured OOM without)"),
    ("most_1024", [
        "--num_upsampling_layers", "most", "--crop_size", "1024",
        "--load_size", "1136", "--batchSize", "1", "--max_steps", "200",
        "--print_freq", "20", "--device_prefetch", "1",
    ], set(), "stretch config: 1024^2 'most' training, bs1, 200 steps"),
]

LOSS_LINE = re.compile(r"\(epoch: \d+, iters: \d+, time: [\d.]+\) (.*)")
WALL_LINE = re.compile(r"wall throughput: ([\d.]+) img/s over (\d+) steps")


def _flag_value(flags, name, default=None):
    """Last occurrence wins, matching argparse."""
    if name not in flags:
        return default
    return flags[len(flags) - 1 - flags[::-1].index(name) + 1]


def parse_losses(text: str):
    last = {}
    for m in LOSS_LINE.finditer(text):
        pairs = re.findall(r"(\w+): (-?[\d.]+(?:e-?\d+)?|nan|inf)", m.group(1))
        if pairs:
            last = {k: float(v) for k, v in pairs}
    return last


REMAT_FALLBACK = ["--remat", "--remat_blocks", "up_1,up_2,up_3"]


def run_config(key, extra, expected_losses, note, args):
    t0 = time.time()
    ck = os.path.join(args.ck_root, key)
    # extras: "~--flag" REMOVES a default-False switch from BASE (there is
    # no CLI way to un-set a store_true flag); value flags override by
    # appearing later (argparse keeps the last occurrence)
    train_flags = list(BASE)
    add = []
    for f in extra:
        if f.startswith("~"):
            train_flags.remove(f[1:])
        else:
            add.append(f)
    extra = add
    train_flags += extra
    cmd = [sys.executable, "train.py", "--name", f"fm_{key}",
           "--checkpoints_dir", ck, "--data_dir", args.data_dir] + train_flags
    print(f"[{key}] train: {' '.join(cmd)}", flush=True)
    p = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=args.timeout)
    out = p.stdout + p.stderr
    remat_fallback = False
    oom = any(s in out for s in ("RESOURCE_EXHAUSTED", "ResourceExhausted",
                                 "Ran out of memory"))
    if p.returncode != 0 and oom and "--remat" not in train_flags:
        # same policy as bench.py's OOM ladder: the flag under test is the
        # point, the memory budget is not — retry once with remat and
        # record the step-down honestly
        remat_fallback = True
        train_flags = train_flags + REMAT_FALLBACK
        cmd = cmd + REMAT_FALLBACK
        print(f"[{key}] OOM; retrying with {' '.join(REMAT_FALLBACK)}",
              flush=True)
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=args.timeout)
        out = p.stdout + p.stderr
    losses = parse_losses(out)
    wall = WALL_LINE.findall(out)
    row = {
        "config": key, "note": note, "extra_flags": extra,
        "remat_fallback": remat_fallback,
        "train_rc": p.returncode,
        "losses": losses,
        "wall_img_per_s": float(wall[-1][0]) if wall else None,
        "train_s": round(time.time() - t0, 1),
    }
    ok = p.returncode == 0 and losses
    ok = ok and all(
        v == v and abs(v) != float("inf") for v in losses.values()
    )
    missing = {k for k in expected_losses if k not in losses}
    if missing:
        ok = False
        row["missing_losses"] = sorted(missing)
    if not ok:
        row["tail"] = out[-3000:]

    # inference against the trained checkpoint (restores Orbax 'latest')
    if ok:
        # the inference CLI must repeat every net-SHAPE flag the training run
        # used so the restored checkpoint matches the model it builds; scan
        # the final train_flags (last occurrence wins, like argparse)
        inf_flags = ["--netG", "spadeb", "--expand_mask_be", "--expand_th", "5",
                     "--noise_background",
                     "--data_dir", args.inference_data_dir,
                     "--which_epoch", "latest",
                     "--checkpoints_dir", ck, "--name", f"fm_{key}",
                     "--dtype", "bfloat16"]
        value_flags = ("--crop_size", "--load_size", "--ngf", "--ndf",
                       "--num_upsampling_layers")
        for f in value_flags:
            v = _flag_value(train_flags, f)
            if v is not None:
                inf_flags += [f, v]
        for f in sorted(SHAPE_FLAGS - set(value_flags) - {"--batchSize"}):
            if f in train_flags:
                inf_flags.append(f)
        icmd = [sys.executable, "inference.py"] + inf_flags
        print(f"[{key}] inference: {' '.join(icmd)}", flush=True)
        t1 = time.time()
        pi = subprocess.run(icmd, capture_output=True, text=True,
                            timeout=args.timeout)
        iout = pi.stdout + pi.stderr
        row["inference_rc"] = pi.returncode
        row["inference_restored"] = "restored Orbax checkpoint" in iout
        row["inference_s"] = round(time.time() - t1, 1)
        if pi.returncode != 0:
            ok = False
            row["inference_tail"] = iout[-3000:]
    row["ok"] = bool(ok)
    print(f"[{key}] {'PASS' if ok else 'FAIL'} "
          f"({row['train_s']}s train, losses={sorted(losses)})", flush=True)
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/flag_matrix_r5.json")
    ap.add_argument("--data_dir", default="/tmp/fm_ds")
    ap.add_argument("--inference_data_dir", default="./datasets/FFHQ_single")
    ap.add_argument("--ck_root", default="/tmp/ck_flag_matrix")
    ap.add_argument("--only", default="")
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU: validates the harness itself")
    args = ap.parse_args(argv)

    if args.smoke:
        global BASE
        size = {"--batchSize": "2", "--crop_size": "64", "--load_size": "72",
                "--max_steps": "3", "--print_freq": "2"}
        BASE = list(BASE)
        for k, v in size.items():
            BASE[BASE.index(k) + 1] = v
        BASE += ["--ngf", "8", "--ndf", "8", "--nThreads", "0",
                 "--device_prefetch", "0"]

    if not os.path.isdir(os.path.join(args.data_dir, "train_images")):
        subprocess.run([sys.executable, "scripts/make_soak_dataset.py",
                        "--out", args.data_dir, "--replicas", "22"],
                       check=True)

    only = {s for s in args.only.split(",") if s}
    # partial rerun (--only) merges into an existing artifact: rows not
    # selected keep their previous result
    kept = {}
    if only and os.path.exists(args.out):
        for r in json.load(open(args.out)).get("rows", []):
            if r.get("config") not in only:
                kept[r["config"]] = r

    rows = []
    for key, extra, expected, note in CONFIGS:
        if only and key not in only:
            if key in kept:
                rows.append(kept[key])
            continue
        try:
            rows.append(run_config(key, extra, expected, note, args))
        except subprocess.TimeoutExpired:
            rows.append({"config": key, "ok": False, "error": "timeout"})
            print(f"[{key}] TIMEOUT", flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"rows": rows,
                       "passed": sum(r.get("ok", False) for r in rows),
                       "total": len(rows)}, f, indent=2)
    print(f"{sum(r.get('ok', False) for r in rows)}/{len(rows)} configs pass "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
