"""Measure the ORIENT-loss floor: what the training-logged ORIENT term
evaluates to when the "fake" image is the REAL ground-truth photo.

The soak logs show ORIENT ~flat around its starting value while the
reconstruction losses decline (PERF.md).  The loss compares the dense
orientation field *extracted from the generated image by the Gabor bank*
with the dense orientation *condition map* (itself produced offline by the
same extractor family, then quantized to a uint8 png and re-decoded).  If
the ground-truth photo itself scores ~the same value, the term is already
at its achievable floor and a flat trajectory is the expected behavior,
not a dead gradient.

Usage: python scripts/orient_floor.py [--data_dir datasets/FFHQ_demo]
Writes artifacts/orient_floor.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="datasets/FFHQ_demo")
    ap.add_argument("--crop_size", type=int, default=512)
    ap.add_argument("--out", default="artifacts/orient_floor.json")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from michigan_tpu.config import Options
    from michigan_tpu.losses import orient_loss

    opt = Options(
        isTrain=True, crop_size=args.crop_size, load_size=args.crop_size,
        use_ig=False, dtype="bfloat16",
    ).finalize()

    ids = sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(os.path.join(args.data_dir, "images"))
    )
    rows = []
    s = args.crop_size
    for ident in ids:
        img = Image.open(
            os.path.join(args.data_dir, "images", f"{ident}.jpg")
        ).convert("RGB").resize((s, s), Image.BICUBIC)
        lab = Image.open(
            os.path.join(args.data_dir, "labels", f"{ident}.png")
        ).resize((s, s), Image.NEAREST)
        orient = Image.open(
            os.path.join(args.data_dir, "orients",
                         f"{ident}_orient_dense.png")
        ).resize((s, s), Image.NEAREST)

        image = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
        hair = (np.asarray(lab) == 1).astype(np.float32)
        onehot = jnp.asarray(np.stack([1 - hair, hair], -1))[None]
        orient_raw = jnp.asarray(
            np.asarray(orient, np.float32))[None, ..., None]

        # bf16-round the real image exactly as the training fake would be
        image = image.astype(jnp.bfloat16).astype(jnp.float32)
        l1, conf = orient_loss(image, orient_raw, onehot, opt)
        rows.append({
            "id": ident,
            "orient_l1": float(l1),
            "ORIENT_as_logged": float(l1) * opt.lambda_orient,
            "confidence_loss": float(conf),
        })
        print(rows[-1])

    out = {
        "note": "ORIENT term evaluated with the REAL photo as the fake — "
                "the achievable floor for a perfect reconstructor",
        "lambda_orient": opt.lambda_orient,
        "rows": rows,
        "mean_ORIENT_as_logged": float(
            np.mean([r["ORIENT_as_logged"] for r in rows])),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps({k: out[k] for k in ("lambda_orient",
                                          "mean_ORIENT_as_logged")}))


if __name__ == "__main__":
    main()
