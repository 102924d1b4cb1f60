"""FID trajectory over a training run's epoch checkpoints.

For every epoch checkpoint under checkpoints/<name>/, renders the run's
val_* samples (paired reconstruction: ref = tag = sample, the same flow as
inference.py / reference inference.py:23-56) and computes the VGG-feature
Frechet distance against the real val images (evaluate.py).  One jitted
render program is compiled once and reused for every checkpoint — the
weights are traced arguments, so swapping epochs costs no recompile.

The architecture flags come from the run's own saved opt.json, so the
restored variable trees always match the model.

Usage (after a soak via scripts/soak_r4.sh):
  python scripts/fid_trajectory.py --checkpoints_dir /tmp/ck_soak_r4 \
      --name soak_r4 --data_dir /tmp/soak_r4_ds \
      --out artifacts/soak_r4/fid_trajectory.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _epoch_tags(run_dir: str):
    tags = []
    for d in os.listdir(run_dir):
        if re.fullmatch(r"\d+", d) and os.path.isdir(os.path.join(run_dir, d)):
            tags.append(int(d))
    return [str(t) for t in sorted(tags)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints_dir", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batchSize", type=int, default=8)
    ap.add_argument("--include_init", action="store_true",
                    help="also score the random-init model (epoch 0 anchor)")
    ap.add_argument("--save_fakes_dir", default=None,
                    help="keep the rendered fakes of the LAST epoch here")
    ap.add_argument("--extractor", default="vgg", choices=["vgg", "inception"],
                    help="FID feature backbone (evaluate.extract_features)")
    ap.add_argument("--subset", default="val",
                    help="dataset subset prefix to score: 'val' (train-side "
                    "variants) or 'heldout' (never-trained variants from "
                    "make_soak_dataset --augment holdout split)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import evaluate as EV
    from michigan_tpu.config import Options
    from michigan_tpu.data.single import single_inference_data
    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.training import checkpoint as CK
    from michigan_tpu.utils.imaging import tensor2im

    run_dir = os.path.join(args.checkpoints_dir, args.name)
    opt = Options.load(os.path.join(run_dir, "opt.json"))
    opt = dataclasses.replace(
        opt,
        isTrain=False,
        phase="test",
        serial_batches=True,
        no_flip=True,
        batchSize=args.batchSize,
        checkpoints_dir=args.checkpoints_dir,
        data_dir=args.data_dir,
        subset=args.subset,
    )

    names = sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(os.path.join(args.data_dir, f"{args.subset}_images"))
    )
    print(f"{len(names)} val samples; epochs: ", end="")
    tags = _epoch_tags(run_dir)
    print(tags)

    model = MichiGANModel(opt)

    # host-side sample prep once (shared across epochs); the seeded noise
    # pyramid is identical per sample, draw it once
    from michigan_tpu.ops.noise import generate_noise

    noise = generate_noise(
        opt.crop_size, opt.crop_size, np.random.default_rng(opt.seed)
    )[None]
    batches = []
    for i in range(0, len(names), args.batchSize):
        chunk = names[i : i + args.batchSize]
        samples = []
        for name in chunk:
            o = dataclasses.replace(
                opt, inference_ref_name=name, inference_tag_name=name,
                inference_orient_name=name,
            )
            samples.append(single_inference_data(o, noise=noise))
        batch = {
            k: np.concatenate([s[k] for s in samples])
            for k in samples[0]
            if isinstance(samples[0][k], np.ndarray) and samples[0][k].ndim >= 3
        }
        if len(chunk) < args.batchSize:  # pad tail to the compiled shape
            padn = args.batchSize - len(chunk)
            batch = {
                k: np.concatenate([v] + [v[-1:]] * padn) for k, v in batch.items()
            }
        batches.append((chunk, batch))

    rng = jax.random.PRNGKey(opt.seed)
    infer = jax.jit(lambda v, b: model.infer(v, b, rng=rng)[0])

    first_batch = {k: jnp.asarray(v) for k, v in batches[0][1].items()}
    init_vars = jax.jit(model.init_variables)(rng, first_batch)

    def render(variables):
        imgs = {}
        for chunk, batch in batches:
            out = np.asarray(
                infer(variables, {k: jnp.asarray(v) for k, v in batch.items()})
            )
            r = opt.add_th // 2 if opt.add_feat_zeros else 0
            for j, name in enumerate(chunk):
                img = out[j]
                if r:
                    img = img[r : r + opt.crop_size, r : r + opt.crop_size]
                imgs[name] = tensor2im(img)
        return imgs

    # real-feature side once
    real = EV._load_images(
        os.path.join(args.data_dir, f"{args.subset}_images"), names
    )
    real_feats = EV.extract_features(real, args.extractor)

    def score(imgs):
        arr = []
        for name in names:
            from PIL import Image

            im = Image.fromarray(imgs[name]).resize((299, 299), Image.BILINEAR)
            arr.append(np.asarray(im, np.float32) / 127.5 - 1.0)
        return EV.frechet_distance(
            real_feats, EV.extract_features(np.stack(arr), args.extractor)
        )

    trajectory = []
    if args.include_init:
        fid = score(render(init_vars))
        print(f"epoch init: FID {fid:.3f}")
        trajectory.append({"epoch": 0, "fid": fid})

    last_imgs = None
    for tag in tags:
        variables = CK.load_variables(opt, tag)
        if variables is None:
            print(f"epoch {tag}: missing, skipped")
            continue
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        imgs = render(variables)
        fid = score(imgs)
        print(f"epoch {tag}: FID {fid:.3f}")
        trajectory.append({"epoch": int(tag), "fid": fid})
        last_imgs = imgs

    if args.save_fakes_dir and last_imgs:
        os.makedirs(args.save_fakes_dir, exist_ok=True)
        from PIL import Image

        for name, im in last_imgs.items():
            Image.fromarray(im).save(
                os.path.join(args.save_fakes_dir, f"{name}.jpg"), quality=92
            )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(
            {
                "name": args.name,
                "subset": args.subset,
                "val_samples": len(names),
                "extractor": (
                    "InceptionV3-pool3" if args.extractor == "inception"
                    else "VGG19-relu4_1"
                ),
                # False => random backbone: the trajectory measures
                # relative progress only, NOT comparable to published FID
                "extractor_pretrained": bool(EV.extract_features.last_pretrained),
                "trajectory": trajectory,
            },
            f,
            indent=2,
        )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
