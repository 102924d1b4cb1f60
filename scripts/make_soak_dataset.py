"""Build a training set for the 512^2 soak run from the bundled samples.

The repo ships 3 distinct FFHQ identities (datasets/FFHQ_demo) with labels
and dense orientation maps.  Real FFHQ is not downloadable here, so the soak
run (GAN-stability evidence, PERF.md) trains on these replicated N times —
per-step diversity comes from the training pipeline's own random crop /
flip / color jitter / hole erasure, exactly as the reference pipeline would
augment (data/base_dataset.py:398-454).

Usage:
  python scripts/make_soak_dataset.py --out /tmp/soak_ds --replicas 22
creates {out}/train_{labels,images,dense_orients} with 3*22 = 66 samples
(-> 8 full batches of 8 per epoch).
"""

from __future__ import annotations

import argparse
import os
import shutil

SRC = "datasets/FFHQ_demo"
IDS = ["59144", "60429", "67172"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicas", type=int, default=22)
    args = ap.parse_args(argv)

    dirs = {
        "train_images": (os.path.join(SRC, "images"), ".jpg", ""),
        "train_labels": (os.path.join(SRC, "labels"), ".png", ""),
        "train_dense_orients": (os.path.join(SRC, "orients"), ".png", "_orient_dense"),
    }
    for sub in dirs:
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
    n = 0
    for ident in IDS:
        for r in range(args.replicas):
            for sub, (src_dir, ext, suffix) in dirs.items():
                src = os.path.join(src_dir, f"{ident}{suffix}{ext}")
                dst = os.path.join(
                    args.out, sub, f"{ident}_r{r:02d}{suffix}{ext}"
                )
                if not os.path.exists(dst):
                    shutil.copyfile(src, dst)
            n += 1
    print(f"{n} samples x 3 modalities under {args.out}")


if __name__ == "__main__":
    main()
