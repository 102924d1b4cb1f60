"""Per-loss gradient-norm shares on the generator (VERDICT r4 weak #1).

The soak's ORIENT loss plateaus above the 1.83 real-photo floor; the
competing explanation is gradient dominance — the pixel-space losses
(lab/rgb/GAN_Feat) out-pulling the orientation term.  This script makes
that measurable: for a trained checkpoint and one real training batch it
computes ||d loss_k / d netG||_2 for every active loss term separately
(one backward per term, same compiled shapes), plus the total, and writes
each term's share.  Interpretation: if ORIENT's share is small while its
loss is far from the floor, the residual gap is an objective-balance
property of the reference's loss weighting, not an optimization failure.

Usage (TPU, after a soak):
  python scripts/grad_shares.py --checkpoints_dir /tmp/ck_soak_r5 \
      --name soak_r5 --data_dir /tmp/soak_r5_ds \
      --out artifacts/soak_r5/grad_shares.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints_dir", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--which_epoch", default="latest")
    ap.add_argument("--batchSize", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from michigan_tpu.config import Options
    from michigan_tpu.data.dataset import create_dataloader
    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.training import checkpoint as CK

    run_dir = os.path.join(args.checkpoints_dir, args.name)
    opt = Options.load(os.path.join(run_dir, "opt.json"))
    opt = dataclasses.replace(
        opt, checkpoints_dir=args.checkpoints_dir, data_dir=args.data_dir,
        batchSize=args.batchSize, isTrain=True, nThreads=0,
        device_prefetch=0, device_noise=False, serial_batches=True,
    )
    model = MichiGANModel(opt)

    loader = create_dataloader(opt)
    data = next(iter(loader))
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in data.items()}
    # decode the u8 wire the way train_step._f32 does
    dec = {}
    for k, v in batch.items():
        if v.dtype == jnp.uint8 and k in ("image_ref", "image_tag"):
            dec[k] = v.astype(jnp.float32) / 127.5 - 1.0
        else:
            dec[k] = v.astype(jnp.float32)
    if "label_ref" not in dec:
        dec["label_ref"] = dec["label_tag"]
    if "image_ref" not in dec:
        dec["image_ref"] = dec["image_tag"]
    if "noise" not in dec:
        from michigan_tpu.ops.noise import generate_noise

        dec["noise"] = jnp.asarray(generate_noise(
            opt.crop_size, opt.crop_size, np.random.default_rng(0)
        )[None].repeat(args.batchSize, 0))
    batch = dec

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init_variables)(rng, batch)
    restored = CK.load_variables(opt, args.which_epoch)
    if restored is not None:
        variables = jax.tree_util.tree_map(jnp.asarray, restored)
        print(f"restored checkpoint '{args.which_epoch}'")
    else:
        print("WARNING: no checkpoint found — measuring at random init")

    # discover the active loss keys with one forward
    def total_and_losses(g_params):
        v = dict(variables)
        v["netG"] = {**variables["netG"], "params": g_params}
        total, (losses, _fake, _upd, _orient) = model.generator_loss(
            v, batch, rng, extra_dilate_steps=jnp.asarray(2, jnp.int32),
        )
        return total, losses

    g_params = variables["netG"]["params"]
    _, losses0 = jax.jit(total_and_losses)(g_params)
    keys = sorted(str(k) for k in losses0.keys())
    print("active loss terms:", keys)

    def norm(tree):
        return float(jnp.sqrt(sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(tree))))

    shares = {}
    for k in keys:
        gfn = jax.jit(jax.grad(
            lambda p, _k=k: total_and_losses(p)[1][_k].astype(jnp.float32)
        ))
        g = gfn(g_params)
        shares[k] = {
            "loss": float(losses0[k]),
            "grad_norm": norm(g),
        }
        print(f"{k:12s} loss {shares[k]['loss']:9.4f} "
              f"|grad| {shares[k]['grad_norm']:.5f}")
    gtot = jax.jit(jax.grad(lambda p: total_and_losses(p)[0]))(g_params)
    total_norm = norm(gtot)
    ssum = sum(s["grad_norm"] for s in shares.values()) or 1.0
    for k in shares:
        shares[k]["share_of_sum"] = round(shares[k]["grad_norm"] / ssum, 4)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "name": args.name, "which_epoch": args.which_epoch,
            "batchSize": args.batchSize,
            "total_grad_norm": total_norm,
            "terms": shares,
        }, f, indent=2)
    print(f"total |grad| {total_norm:.5f}; wrote {args.out}")


if __name__ == "__main__":
    main()
