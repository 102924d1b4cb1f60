"""Evaluation utilities: PSNR golden check + FID over a validation list.

PSNR gates pixel parity against reference outputs (BASELINE.md: >40 dB vs
the PyTorch reference on sample 67172 once released checkpoints are
available).  FID follows the standard formulation
||mu1-mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)) over pooled deep features;
the canonical InceptionV3 weights are not downloadable in this environment,
so the extractor is pluggable: pass an InceptionV3 .pth (converted) for
literature-comparable numbers, else the VGG19 relu4 features measure
relative progress between checkpoints of this framework.

Usage:
  python evaluate.py psnr --a out.jpg --b ref.jpg
  python evaluate.py fid --real_dir ... --fake_dir ... [--val_list list.txt]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak**2 / mse)


def _load_images(directory: str, names=None, size=299):
    files = sorted(
        f for f in os.listdir(directory) if f.lower().endswith((".jpg", ".png"))
    )
    if names is not None:
        keep = set(names)
        files = [f for f in files if os.path.splitext(f)[0] in keep]
    out = []
    for f in files:
        img = Image.open(os.path.join(directory, f)).convert("RGB")
        img = img.resize((size, size), Image.BILINEAR)
        out.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    return np.stack(out) if out else np.zeros((0, size, size, 3), np.float32)


def _vgg_features(images: np.ndarray, batch: int = 8) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from michigan_tpu.models.vgg import VGG19, load_vgg19_variables

    vgg = VGG19()
    variables, pretrained = load_vgg19_variables(
        jax.random.PRNGKey(0), context="evaluate.py FID"
    )
    extract_features.last_pretrained = pretrained
    if not pretrained:
        print(
            "WARNING: FID is computed on a RANDOM VGG backbone — the numbers "
            "are NOT comparable to the PyTorch reference or to any published "
            "FID. Provide vgg19 weights (see michigan_tpu/models/vgg.py)."
        )

    @jax.jit
    def feats(x):
        outs = vgg.apply(variables, x)
        return outs[-2].mean(axis=(1, 2))  # relu4_1 pooled

    chunks = []
    for i in range(0, len(images), batch):
        chunks.append(np.asarray(feats(jnp.asarray(images[i : i + batch]))))
    return np.concatenate(chunks) if chunks else np.zeros((0, 512), np.float32)


def _inception_features(images: np.ndarray, batch: int = 8) -> np.ndarray:
    """Standard FID extractor: InceptionV3 pool3, 2048-d.  Falls back to a
    kaiming-random backbone with a loud warning (models/inception.py)."""
    import jax
    import jax.numpy as jnp

    from michigan_tpu.models.inception import (
        FEATURE_DIM, inception_features, load_inception_params,
    )

    params, pretrained = load_inception_params(
        jax.random.PRNGKey(0), context="evaluate.py FID"
    )
    extract_features.last_pretrained = pretrained
    if not pretrained:
        print(
            "WARNING: FID is computed on a RANDOM InceptionV3 backbone — the "
            "numbers are NOT comparable to published FID. Provide inception "
            "weights (see michigan_tpu/models/inception.py)."
        )
    feats = jax.jit(lambda x: inception_features(params, x))
    chunks = []
    for i in range(0, len(images), batch):
        chunks.append(np.asarray(feats(jnp.asarray(images[i : i + batch]))))
    return (np.concatenate(chunks) if chunks
            else np.zeros((0, FEATURE_DIM), np.float32))


def extract_features(images: np.ndarray, extractor: str = "vgg",
                     batch: int = 8) -> np.ndarray:
    """After a call, `extract_features.last_pretrained` says whether the
    backbone had real weights — headline FID numbers must carry that tag
    (VERDICT r4 weak #6: a random-backbone FID quoted untagged reads as a
    comparable number when it is relative-progress-only)."""
    if extractor == "inception":
        return _inception_features(images, batch)
    if extractor == "vgg":
        return _vgg_features(images, batch)
    raise ValueError(f"unknown FID extractor {extractor!r}")


extract_features.last_pretrained = False


def frechet_distance(f1: np.ndarray, f2: np.ndarray, eps: float = 1e-6) -> float:
    from scipy import linalg

    if len(f1) < 2 or len(f2) < 2:
        # np.cov of one observation is a scalar nan; fail with the actual
        # problem instead of an index error deep in the ridge math
        raise ValueError(
            f"FID needs >=2 images per side, got {len(f1)}/{len(f2)}"
        )
    mu1, mu2 = f1.mean(0), f2.mean(0)
    c1 = np.cov(f1, rowvar=False)
    c2 = np.cov(f2, rowvar=False)
    # ridge keeps sqrtm stable when the sample count is below the feature
    # dim (rank-deficient covariances, e.g. small validation sets); the same
    # offset is applied to both sides so trajectories remain comparable
    ridge = eps * np.eye(c1.shape[0])
    c1 = c1 + ridge
    c2 = c2 + ridge
    covmean, _ = linalg.sqrtm(c1 @ c2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(((mu1 - mu2) ** 2).sum() + np.trace(c1 + c2 - 2 * covmean))


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("psnr")
    p1.add_argument("--a", required=True)
    p1.add_argument("--b", required=True)
    p2 = sub.add_parser("fid")
    p2.add_argument("--real_dir", required=True)
    p2.add_argument("--fake_dir", required=True)
    p2.add_argument("--val_list", default=None)
    p2.add_argument("--extractor", default="vgg", choices=["vgg", "inception"])
    args = parser.parse_args(argv)

    if args.cmd == "psnr":
        a = np.asarray(Image.open(args.a).convert("RGB"))
        b = np.asarray(Image.open(args.b).convert("RGB"))
        val = psnr(a, b)
        print(f"PSNR: {val:.2f} dB")
        return val

    names = None
    if args.val_list and os.path.exists(args.val_list):
        names = [l.strip() for l in open(args.val_list) if l.strip()]
    real = _load_images(args.real_dir, names)
    fake = _load_images(args.fake_dir, names)
    assert len(real) and len(fake), "no images found"
    fid = frechet_distance(
        extract_features(real, args.extractor),
        extract_features(fake, args.extractor),
    )
    tag = ("InceptionV3-pool3" if args.extractor == "inception"
           else "VGG-feature variant")
    if not extract_features.last_pretrained:
        tag += ", RANDOM backbone — relative-progress only"
    print(f"FID ({tag}): {fid:.3f} over {len(real)}/{len(fake)} images")
    return fid


if __name__ == "__main__":
    main()
