"""Build a training set for the 512^2 soak run from the bundled samples.

The repo ships 3 distinct FFHQ identities (datasets/FFHQ_demo) with labels
and dense orientation maps.  Real FFHQ is not downloadable here, so the soak
run (GAN-stability evidence, PERF.md) trains on these replicated N times —
per-step diversity comes from the training pipeline's own random crop /
flip / color jitter / hole erasure, exactly as the reference pipeline would
augment (data/base_dataset.py:398-454).

--augment additionally expands each identity into geometry/appearance
variants that remain LABEL-CONSISTENT across all three modalities:
  * rotations (+-10, +-20 deg): the image rotates bilinearly with reflected
    borders, the label/orient maps rotate nearest-neighbor, AND the dense
    orientation VALUES shift by the same angle (the encoding is
    v in [0,255] ~ angle in [0,pi), base_dataset.py:363-385).  The shift
    sign was verified empirically against this repo's own DoG extractor:
    re-extracting orientation from a +20deg-rotated 67172 matches
    (angle + rad) mod pi at 8.2deg mean circular error (extraction-blur
    floor) vs 42.8deg for the opposite sign.
  * hue shifts (+-25 on the cv2 [0,180) hue wheel) on the image only:
    new hair appearance / Lab targets; the geometry modalities are
    unchanged.
This turns 3 identities into 3 x 5 x 3 = 45 distinct (image, label,
orient) triples before replication, and writes the 45 unreplicated
variants under {out}/val_* for FID passes (scripts/fid_trajectory.py).

Usage:
  python scripts/make_soak_dataset.py --out /tmp/soak_ds --replicas 22
creates {out}/train_{labels,images,dense_orients} with 3*22 = 66 samples
(-> 8 full batches of 8 per epoch); add --augment for 45*replicas.
"""

from __future__ import annotations

import argparse
import math
import os
import shutil

import numpy as np

SRC = "datasets/FFHQ_demo"
IDS = ["59144", "60429", "67172"]

ROTATIONS = [0.0, -20.0, -10.0, 10.0, 20.0]
HUE_SHIFTS = [0, -25, 25]


def _rotate_triple(img, label, orient, deg):
    """Rotate all three modalities by `deg` (CCW in display coords),
    shifting the orientation-map values by the same angle (see module
    docstring for the sign verification)."""
    import cv2

    if deg == 0.0:
        return img, label, orient
    h, w = label.shape
    m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
    rimg = cv2.warpAffine(
        img, m, (w, h), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT101
    )
    rlabel = cv2.warpAffine(label, m, (w, h), flags=cv2.INTER_NEAREST)
    rorient = cv2.warpAffine(orient, m, (w, h), flags=cv2.INTER_NEAREST)
    # shift angle values on the orientation support (the map extends in a
    # confidence band slightly beyond the hair label)
    shift_mask = (rorient > 0) | (rlabel > 0)
    ang = np.mod(
        rorient.astype(np.float32) / 255.0 * math.pi + deg * math.pi / 180.0,
        math.pi,
    )
    # round to the nearest code (truncation would bias every value ~0.35deg
    # low); 255 encodes pi which is congruent to 0, so wrap it there
    q = np.round(ang * (255.0 / math.pi)).astype(np.int32) % 255
    rorient = np.where(shift_mask, q, 0)
    return rimg, rlabel, rorient.astype(np.uint8)


def _hue_shift(img, shift):
    import cv2

    if shift == 0:
        return img
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    hsv[..., 0] = (hsv[..., 0].astype(np.int32) + shift) % 180
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def _make_variants(ident):
    """Yield (tag, image_rgb, label, orient) distinct augmented triples."""
    from PIL import Image

    img = np.asarray(
        Image.open(os.path.join(SRC, "images", f"{ident}.jpg")).convert("RGB")
    )
    label = np.asarray(Image.open(os.path.join(SRC, "labels", f"{ident}.png")))
    orient = np.asarray(
        Image.open(os.path.join(SRC, "orients", f"{ident}_orient_dense.png"))
    )
    k = 0
    for deg in ROTATIONS:
        rimg, rlabel, rorient = _rotate_triple(img, label, orient, deg)
        for hue in HUE_SHIFTS:
            yield f"{ident}a{k:02d}", _hue_shift(rimg, hue), rlabel, rorient
            k += 1


def _write_triple(out, subset, name, img, label, orient):
    from PIL import Image

    Image.fromarray(img).save(
        os.path.join(out, f"{subset}images", f"{name}.jpg"), quality=95
    )
    Image.fromarray(label).save(os.path.join(out, f"{subset}labels", f"{name}.png"))
    Image.fromarray(orient).save(
        os.path.join(out, f"{subset}dense_orients", f"{name}_orient_dense.png")
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicas", type=int, default=22)
    ap.add_argument("--augment", action="store_true")
    args = ap.parse_args(argv)

    for subset in ("train_",) + (("val_",) if args.augment else ()):
        for sub in ("images", "labels", "dense_orients"):
            os.makedirs(os.path.join(args.out, f"{subset}{sub}"), exist_ok=True)

    n = 0
    if args.augment:
        for ident in IDS:
            for tag, img, label, orient in _make_variants(ident):
                _write_triple(args.out, "val_", tag, img, label, orient)
                exts = {
                    "images": (".jpg", ""),
                    "labels": (".png", ""),
                    "dense_orients": (".png", "_orient_dense"),
                }
                for r in range(args.replicas):
                    for sub, (ext, suffix) in exts.items():
                        shutil.copyfile(
                            os.path.join(
                                args.out, f"val_{sub}", f"{tag}{suffix}{ext}"
                            ),
                            os.path.join(
                                args.out,
                                f"train_{sub}",
                                f"{tag}_r{r:02d}{suffix}{ext}",
                            ),
                        )
                    n += 1
        print(
            f"{n} samples ({len(IDS) * len(ROTATIONS) * len(HUE_SHIFTS)} distinct "
            f"x {args.replicas} replicas) x 3 modalities under {args.out} "
            f"(+ val_* with the distinct variants)"
        )
        return

    dirs = {
        "train_images": (os.path.join(SRC, "images"), ".jpg", ""),
        "train_labels": (os.path.join(SRC, "labels"), ".png", ""),
        "train_dense_orients": (os.path.join(SRC, "orients"), ".png", "_orient_dense"),
    }
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
