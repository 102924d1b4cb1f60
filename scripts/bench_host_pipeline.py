"""Host input-pipeline micro-benchmark (PERF.md input-pipeline section).

Times the per-sample components of the training loader on this host:
full CustomDataset.get_sample, the noise pyramid (native C++ vs the
numpy/cv2 reference implementation), hole rasterization, and the PIL
transforms.  Run on an otherwise-idle host; reports min-of-R medians so
transient contention is excluded.

Usage: python scripts/bench_host_pipeline.py [--data_dir DIR] [--size 512]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best(fn, iters: int = 10, reps: int = 7) -> float:
    """min over reps of (mean ms over iters) — robust to contention."""
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        out.append((time.perf_counter() - t0) / iters * 1000)
    return min(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="datasets/FFHQ_single")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--load_size", type=int, default=568)
    args = ap.parse_args()

    from PIL import Image

    from michigan_tpu import native
    from michigan_tpu.config import train_options
    from michigan_tpu.data.dataset import CustomDataset
    from michigan_tpu.data.preprocess import generate_hole
    from michigan_tpu.data.transforms import get_params, get_transform
    from michigan_tpu.ops import noise as N

    s = args.size
    opt = train_options([
        "--name", "pipebench", "--data_dir", args.data_dir,
        "--label_dir", f"{args.data_dir}/val_labels",
        "--image_dir", f"{args.data_dir}/val_images",
        "--orient_dir", f"{args.data_dir}/val_dense_orients",
        "--load_size", str(args.load_size), "--crop_size", str(s),
        "--use_ig", "--use_encoder", "--noise_background",
        "--decode_cache_mb", "256", "--batchSize", "1", "--no_pairing_check",
    ])
    ds = CustomDataset(opt)
    rng = random.Random(0)
    for i in range(len(ds)):  # warm the decode cache
        ds.get_sample(i % len(ds), rng)

    print(f"host pipeline @ {args.load_size}->{s}, decode cache warm")
    print(f"  get_sample (full)        : "
          f"{_best(lambda: ds.get_sample(0, rng)):7.1f} ms")
    print(f"  noise pyramid native C++ : "
          f"{_best(lambda: N.generate_noise_fast(s, s, rng.getrandbits(32))):7.1f} ms"
          f"  (lib={'yes' if native.get_lib() else 'NO — numpy fallback'})")
    g = np.random.default_rng(0)
    print(f"  noise pyramid numpy/cv2  : "
          f"{_best(lambda: N.generate_noise(s, s, g)):7.1f} ms")
    lab = np.array(Image.open(ds.label_paths[0]))
    print(f"  generate_hole            : "
          f"{_best(lambda: generate_hole(lab, lab, rng)):7.1f} ms")
    img = Image.open(ds.image_paths[0]).convert("RGB")
    img.load()
    params = get_params(opt, img.size, rng)
    ti = get_transform(opt, params)
    tl = get_transform(opt, params, method=Image.NEAREST, normalize=False)
    print(f"  image transform (BICUBIC): {_best(lambda: ti(img)):7.1f} ms")
    # time the label transform on an actual label image (mode L/P) — the RGB
    # image would measure a 3-channel resize the loader never does for labels
    lab_img = Image.open(ds.label_paths[0])
    lab_img.load()
    print(f"  label transform (NEAREST): {_best(lambda: tl(lab_img)):7.1f} ms")


if __name__ == "__main__":
    main()
