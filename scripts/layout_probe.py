"""Layout-pinning probe: can XLA do better with AUTO input layouts?

The bs32 batched-inference program is MXU-bound at 59% of its compute
roofline, with the gap attributed to conv dimension-shuffling (PERF.md);
the train step sits at 61% of its HBM bound with the residue spread over
hundreds of fusions.  One candidate lever for both is letting the
compiler CHOOSE the layouts of the program inputs instead of receiving
them row-major and transposing in-program: `jax.jit(..., in_shardings=
Format(Layout.AUTO))`, then `device_put`-ing the weights into whatever
layout the executable requests (a one-time cost — inference weights are
frozen; the train state stays layout-stable because the probe pins the
state OUTPUT to the same chosen formats, so `state = step(state)` never
relayouts).

Measures default-layout vs AUTO-layout executables on the same device
batch, same methodology as bench.py (device-resident inputs, scalar-fetch
sync).  Appends JSON lines to artifacts/layout_probe.jsonl.

Usage: python scripts/layout_probe.py [--mode infer|train] [--batch 32]
                                      [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _build_batch, _make_opt  # noqa: E402


def _count_nondefault(fmt_tree, value_tree):
    import jax

    flat_fmts, _ = jax.tree.flatten(fmt_tree)
    flat_vals, _ = jax.tree.flatten(value_tree)
    return sum(
        1 for f, v in zip(flat_fmts, flat_vals)
        if f.layout.major_to_minor != tuple(range(v.ndim))
    ), len(flat_vals)


def _probe_train(args) -> dict:
    """AUTO-layout A/B on the fused config-of-record train step (bs8 512²
    bf16, no remat).  Two-phase: compile with Layout.AUTO on the TrainState
    to learn which layouts the compiler wants, then re-jit with those
    concrete formats pinned on BOTH the state input and the state output so
    the `state = step(state)` loop is layout-stable (and donation aliases)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from michigan_tpu.training.state import TrainState
    from michigan_tpu.training.train_step import make_train_steps
    from michigan_tpu.utils.xla_options import compiler_options

    opt = _make_opt("train", args.size, args.batch, "bfloat16",
                    True, False, "up_2")
    model, _g, _d, fused = make_train_steps(opt, with_fused=True)
    batch = _build_batch(jnp, args.batch, args.size, compact=True)
    key = jax.random.PRNGKey(0)
    init_vars = jax.jit(model.init_variables)(
        key, {k: v.astype(jnp.float32) for k, v in batch.items()})
    host_vars = jax.tree.map(lambda v: jax.device_get(v), init_vars)
    extra = jnp.asarray(2, jnp.int32)

    def fresh_state():
        return TrainState.create(
            opt, jax.tree.map(jnp.asarray, host_vars))

    def timed(call, state):
        state, g_losses, _d, _f = call(state, batch, key, extra)
        float(g_losses["GAN"])  # compile + warmup sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, g_losses, _d, _f = call(state, batch, key, extra)
        float(g_losses["GAN"])
        return args.batch * args.iters / (time.perf_counter() - t0)

    results = {"default": timed(fused, fresh_state())}
    print(f"default layouts: {results['default']:.3f} img/s",
          file=sys.stderr)

    # fused is already jitted (donating); nesting it under an outer jit
    # inlines the inner trace, so the outer jit controls layouts/donation.
    def step_fn(state, batch, rng, extra):
        return fused(state, batch, rng, extra)

    auto = jax.tree.map(lambda _: Format(Layout.AUTO), fresh_state())
    probe = jax.jit(step_fn, in_shardings=(auto, None, None, None),
                    compiler_options=compiler_options())
    state0 = fresh_state()
    state_fmts = probe.lower(state0, batch, key, extra).compile(
    ).input_formats[0][0]
    nondefault, n_arrays = _count_nondefault(state_fmts, state0)
    print(f"compiler chose non-default layout for {nondefault}/"
          f"{n_arrays} state arrays", file=sys.stderr)

    pinned = jax.jit(
        step_fn,
        in_shardings=(state_fmts, None, None, None),
        out_shardings=(state_fmts, None, None, None),
        donate_argnums=(0,),
        compiler_options=compiler_options(),
    )
    # relayout leaf-by-leaf, dropping each source buffer as it is copied —
    # holding two full TrainStates alongside the fused program OOMs the chip
    flat_vals, treedef = jax.tree.flatten(state0)
    flat_fmts = jax.tree.flatten(state_fmts)[0]
    del state0
    relaid_flat = []
    for i, f in enumerate(flat_fmts):
        relaid_flat.append(jax.device_put(flat_vals[i], f))
        flat_vals[i] = None
    relaid = jax.tree.unflatten(treedef, relaid_flat)
    del relaid_flat, flat_vals
    results["auto"] = timed(pinned, relaid)
    print(f"auto layouts:    {results['auto']:.3f} img/s", file=sys.stderr)

    return {
        "mode": "train", "batch": args.batch, "size": args.size,
        "iters": args.iters, "default": round(results["default"], 3),
        "auto": round(results["auto"], 3),
        "nondefault_layouts": nondefault, "n_arrays": n_arrays,
        "speedup": round(results["auto"] / results["default"], 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="infer", choices=["infer", "train"])
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 32 (infer) / 8 (train)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="artifacts/layout_probe.jsonl")
    args = ap.parse_args()
    if args.batch is None:
        args.batch = 8 if args.mode == "train" else 32

    if args.mode == "train":
        rec = _probe_train(args)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
        return

    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.utils.xla_options import compiler_options

    opt = _make_opt("infer", args.size, args.batch, "bfloat16",
                    False, False, "all")
    model = MichiGANModel(opt)
    batch = _build_batch(jnp, args.batch, args.size)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init_variables)(key, batch)

    def infer_sum(variables, batch):
        out, _ = model.infer(variables, batch)
        return jnp.sum(out)

    def timed(call, v, b):
        float(call(v, b))  # warmup/compile sync
        t0 = time.perf_counter()
        last = None
        for _ in range(args.iters):
            last = call(v, b)
        float(last)
        return args.batch * args.iters / (time.perf_counter() - t0)

    results = {}

    # --- baseline: default layouts -------------------------------------
    jit_default = jax.jit(infer_sum, compiler_options=compiler_options())
    results["default"] = timed(jit_default, variables, batch)
    print(f"default layouts: {results['default']:.3f} img/s",
          file=sys.stderr)

    # --- AUTO layouts on the variable tree ------------------------------
    # batch stays default-layout (it is re-uploaded every step in real
    # serving; forcing an exotic layout on it would push a transpose to
    # the host).  The frozen weights are relayouted ONCE.
    auto = jax.tree.map(lambda _: Format(Layout.AUTO), variables)
    jit_auto = jax.jit(infer_sum, in_shardings=(auto, None),
                       compiler_options=compiler_options())
    compiled = jit_auto.lower(variables, batch).compile()
    in_fmts = compiled.input_formats[0]
    var_fmts, batch_fmts = in_fmts

    # how many weights did the compiler actually want in a non-default
    # layout?
    flat_fmts, _ = jax.tree.flatten(var_fmts)
    flat_vars, treedef = jax.tree.flatten(variables)
    nondefault = sum(
        1 for f, v in zip(flat_fmts, flat_vars)
        if f.layout.major_to_minor != tuple(range(v.ndim))
    )
    print(f"compiler chose non-default layout for {nondefault}/"
          f"{len(flat_vars)} arrays", file=sys.stderr)

    relaid = jax.tree.unflatten(
        treedef,
        [jax.device_put(v, f) for v, f in zip(flat_vars, flat_fmts)])
    results["auto"] = timed(compiled, relaid, batch)
    print(f"auto layouts:    {results['auto']:.3f} img/s", file=sys.stderr)

    rec = {
        "mode": args.mode, "batch": args.batch, "size": args.size,
        "iters": args.iters, "default": round(results["default"], 3),
        "auto": round(results["auto"], 3),
        "nondefault_layouts": nondefault,
        "n_arrays": len(flat_vars),
        "speedup": round(results["auto"] / results["default"], 4),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
