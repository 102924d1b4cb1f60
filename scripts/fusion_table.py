"""Per-fusion time/HBM attribution of the fused train step (VERDICT r4 #5).

Round-4 claimed the remaining ~39% gap to the HBM roofline was "hundreds of
fusions, none >=5%" from one manual trace read; this script makes that claim
a committed artifact: it runs the bf16 fused bs8 512^2 config of record on
the real chip under jax.profiler, parses the xplane, and emits a top-K table
(op, occurrences, total ms, % of step, plus XLA-reported bytes/FLOPs when
the hlo_stats tool is available) so the tail's flatness is demonstrated
per-fusion rather than asserted.

Usage (TPU):
  python scripts/fusion_table.py --out artifacts/fusion_table_r5.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# xplane parsing
# ---------------------------------------------------------------------------

def _load_xspace(trace_dir: str):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    path = paths[-1]
    xspace = None
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "xprof.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2",
                "tsl.profiler.protobuf.xplane_pb2"):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(mod)
            xspace = xplane_pb2.XSpace()
            with open(path, "rb") as f:
                xspace.ParseFromString(f.read())
            return xspace, path
        except Exception:
            continue
    raise ImportError("no xplane_pb2 proto module importable")


def device_op_durations(xspace, verbose=False):
    """Sum device-plane "XLA Ops" event durations by event name (HLO op /
    fusion).  Returns ({name: {"ms": total, "count": n}}, total_device_ms)."""
    out = {}
    total = 0.0
    seen = []
    for plane in xspace.planes:
        pname = plane.name or ""
        seen.append((pname, [l.name for l in plane.lines]))
        is_device = ("TPU" in pname) or pname.lower().startswith("/device")
        if not is_device:
            continue
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            lname = (line.name or "").lower()
            # the per-op line; "steps"/"xla modules"/framework lines would
            # double-count the same wall time
            if "xla ops" not in lname and lname != "xla op":
                continue
            for ev in line.events:
                nm = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                ms = ev.duration_ps / 1e9
                rec = out.setdefault(nm, {"ms": 0.0, "count": 0})
                rec["ms"] += ms
                rec["count"] += 1
                total += ms
    if not out and verbose:
        print("no 'XLA Ops' device line found; planes in trace:")
        for pname, lines in seen:
            print(f"  {pname!r}: {lines}")
    return out, total


def try_hlo_stats(trace_dir: str):
    """tensorboard_plugin_profile's hlo_stats tool: per-HLO time + bytes +
    FLOPs.  Returns a list of row dicts or None if the tool/API is absent."""
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    except Exception:
        return None
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    for tool in ("hlo_stats", "hlo_stats^"):
        try:
            data, _ = rtd.xspace_to_tool_data(paths, tool, params={})
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            parsed = json.loads(data)
            return parsed
        except Exception:
            continue
    return None


# ---------------------------------------------------------------------------
# trace the fused step
# ---------------------------------------------------------------------------

def trace_fused_step(trace_dir: str, size=512, batch=8, warm=5, traced=3):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.getcwd())
    import bench

    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.training.state import TrainState
    from michigan_tpu.training.train_step import make_train_steps

    opt = bench._make_opt("train", size, batch, "bfloat16", True, False, "all")
    model = MichiGANModel(opt)
    b = bench._build_batch(jnp, batch, size, compact=True)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init_variables)(
        key, {k: v.astype(jnp.float32) for k, v in b.items()}
    )
    steps = make_train_steps(opt, with_fused=True)
    fused = steps[3]
    state = TrainState.create(opt, variables)
    extra = jnp.asarray(2, jnp.int32)

    def sync(losses):
        float(np.asarray(losses["GAN"]))

    for _ in range(warm):
        state, g_losses, d_losses, _ = fused(state, b, key, extra)
    sync(g_losses)
    import time

    t0 = time.perf_counter()
    for _ in range(warm):
        state, g_losses, d_losses, _ = fused(state, b, key, extra)
    sync(g_losses)
    step_ms = (time.perf_counter() - t0) / warm * 1000

    with jax.profiler.trace(trace_dir):
        for _ in range(traced):
            state, g_losses, d_losses, _ = fused(state, b, key, extra)
        sync(g_losses)
    return step_ms, traced


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/fusion_table_r5.json")
    ap.add_argument("--trace_dir", default="/tmp/fusion_trace_r5")
    ap.add_argument("--reuse_trace", action="store_true",
                    help="skip the TPU run; parse an existing trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)

    step_ms = None
    traced = 3
    if not args.reuse_trace:
        step_ms, traced = trace_fused_step(
            args.trace_dir, args.size, args.batch)
        print(f"steady-state fused step: {step_ms:.1f} ms")

    xspace, xpath = _load_xspace(args.trace_dir)
    ops, total_ms = device_op_durations(xspace, verbose=True)
    per_step = total_ms / max(traced, 1)
    rows = sorted(ops.items(), key=lambda kv: -kv[1]["ms"])[: args.top]
    print(f"device op time total {total_ms:.1f} ms over {traced} steps "
          f"({per_step:.1f} ms/step attributed)")
    table = []
    for name, rec in rows:
        pct = 100.0 * rec["ms"] / total_ms if total_ms else 0.0
        table.append({
            "op": name, "count": rec["count"],
            "ms_per_step": round(rec["ms"] / traced, 3),
            "pct_of_step": round(pct, 2),
        })
        print(f"{pct:6.2f}%  {rec['ms']/traced:8.3f} ms  x{rec['count']:<4d} "
              f"{name[:90]}")

    hlo = try_hlo_stats(args.trace_dir)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "config": f"{args.size}^2 bs{args.batch} bf16 fused",
            "steady_state_step_ms": step_ms,
            "traced_steps": traced,
            "attributed_ms_per_step": round(per_step, 2),
            "xplane": os.path.basename(xpath),
            "top": table,
            "max_single_op_pct": table[0]["pct_of_step"] if table else None,
            "hlo_stats_available": hlo is not None,
            "hlo_stats": hlo if isinstance(hlo, list) else None,
        }, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
