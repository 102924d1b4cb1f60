"""XLA compiler-flag search for the training step (PERF.md flag-search table).

Runs bench.py (config of record: bs8 512^2 bf16 fused step) once per
candidate compiler-option set, passing each through
MICHIGAN_COMPILER_OPTIONS (utils/xla_options.py -> jax.jit compiler_options,
the only mechanism that reaches the server-side TPU compiler through the
axon relay).  Appends one JSON line per run to artifacts/flag_search.jsonl
so an interrupted search resumes where it left off.

Usage:  python scripts/flag_search.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CANDIDATES: list[tuple[str, str]] = [
    # (label, MICHIGAN_COMPILER_OPTIONS value); "" = compiler defaults
    ("baseline", ""),
    ("scoped_vmem_64m", "xla_tpu_scoped_vmem_limit_kib=65536"),
    ("scoped_vmem_128m", "xla_tpu_scoped_vmem_limit_kib=131072"),
    ("lhs_on", "xla_tpu_enable_latency_hiding_scheduler=true"),
    ("lhs_rerun2", "xla_tpu_enable_latency_hiding_scheduler=true,"
                   "xla_latency_hiding_scheduler_rerun=2"),
    ("rwb_off", "xla_tpu_rwb_fusion=false"),
    ("mbl_opt", "xla_tpu_memory_bound_loop_optimizer_options=enabled:true"),
    ("fusion_cost_exp", "xla_tpu_enable_experimental_fusion_cost_model=true"),
    ("fusion_bundle_cost",
     "xla_tpu_use_bundle_aware_cost_model_for_fusions=true"),
    ("vmem_dmas", "xla_tpu_enable_vmem_to_vmem_dmas=true"),
    ("msa_prefetch32", "xla_msa_max_outstanding_prefetches=32"),
    ("copy_bw_1.5", "xla_tpu_async_copy_bandwidth_scaling_factor=1.5"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="artifacts/flag_search.jsonl")
    ap.add_argument("--mode", default="train", choices=["train", "infer"])
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                    if rec.get("mode", "train") == args.mode:
                        done.add(rec["label"])
                except json.JSONDecodeError:
                    pass

    for label, opts in CANDIDATES:
        if label in done:
            print(f"[skip] {label} (already measured)", file=sys.stderr)
            continue
        env = dict(os.environ)
        env["MICHIGAN_COMPILER_OPTIONS"] = opts
        env["BENCH_ITERS"] = str(args.iters)
        env["BENCH_MODE"] = args.mode
        print(f"[run ] {label}: {opts or '(defaults)'}", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, "bench.py"], env=env,
            capture_output=True, text=True, timeout=1200)
        rec: dict = {"label": label, "opts": opts, "mode": args.mode}
        if proc.returncode != 0:
            rec["error"] = proc.stderr[-800:]
            print(f"[FAIL] {label}", file=sys.stderr)
        else:
            line = proc.stdout.strip().splitlines()[-1]
            bench = json.loads(line)
            rec["value"] = bench["value"]
            rec["metric"] = bench["metric"]
            rec["ladder_position"] = (
                bench.get("config", {}).get("ladder_position"))
            print(f"[done] {label}: {bench['value']} img/s", file=sys.stderr)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")

    # summary table
    rows = []
    with open(args.out) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("mode", "train") == args.mode and "value" in rec:
                rows.append(rec)
    rows.sort(key=lambda r: -r["value"])
    print(f"\n{'label':24s} {'img/s':>8s}  opts")
    for r in rows:
        print(f"{r['label']:24s} {r['value']:8.3f}  {r['opts']}")


if __name__ == "__main__":
    main()
