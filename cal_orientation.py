"""Dense-orientation extraction CLI (reference cal_orientation.py).

The 32 sequential 17x17 DoG convolutions become one batched jit-compiled
filter-bank conv (michigan_tpu.ops.filters); the Gaussian flow smoothing
stays on host cv2 for bit-parity with the reference's output encoding.

Usage:
  python cal_orientation.py --image_path 56000.jpg --hairmask_path 56000.png \
      --orientation_root ./

Bulk dataset preparation (beyond the reference, which needs an external
loop re-importing torch per image): process a whole directory, reusing the
jit-compiled filter bank across images:

  python cal_orientation.py --image_dir train_images --hairmask_dir \
      train_labels --orientation_root train_dense_orients
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np
from PIL import Image


def compute_orientation_map(image_rgb01: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Returns the uint8 dense orientation map (cal_orientation.py:96-110).

    image_rgb01: (H,W,3) float in [0,1]; mask: (H,W) in {0,1}.
    """
    import cv2
    import jax.numpy as jnp

    from michigan_tpu.ops.filters import dense_orientation

    # normalize to [-1,1] then gray [0,255] with the reference's weights
    img = image_rgb01 * 2.0 - 1.0
    fake = (img + 1.0) / 2.0 * 255.0
    gray = 0.299 * fake[..., 0] + 0.587 * fake[..., 1] + 0.144 * fake[..., 2]

    idx, conf = dense_orientation(jnp.asarray(gray[None, ..., None]), mode="dog")
    idx = np.asarray(idx)[0, ..., 0]
    conf = np.asarray(conf)[0, ..., 0]

    # reference decodes with pi/31*2 (cal_orientation.py:101) — kept verbatim
    theta = idx * math.pi / 31.0 * 2.0
    flow_x = np.cos(theta) * conf * mask
    flow_y = np.sin(theta) * conf * mask
    flow_x = cv2.GaussianBlur(flow_x.astype(np.float32), (0, 0), 4)
    flow_y = cv2.GaussianBlur(flow_y.astype(np.float32), (0, 0), 4)
    out = np.arctan2(flow_y, flow_x) * 0.5
    out[out < 0] += math.pi
    return np.uint8(out * 255.0 / math.pi * mask)


def _process_one(image_path: str, mask_path: str, out_root: str) -> str:
    image = np.asarray(Image.open(image_path).convert("RGB"), np.float32) / 255.0
    mask = np.array(Image.open(mask_path))
    if mask.ndim == 3:
        mask = mask[..., 0]
    if mask.max() > 1:
        mask = (mask > 130) * 1
    orient = compute_orientation_map(image, mask.astype(np.float64))
    name = os.path.splitext(os.path.basename(image_path))[0] + ".png"
    out_path = os.path.join(out_root, name)
    Image.fromarray(orient).save(out_path)
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_path", type=str, default="56000.jpg")
    parser.add_argument("--hairmask_path", type=str, default="56000.png")
    parser.add_argument("--orientation_root", type=str, default="./")
    parser.add_argument(
        "--image_dir", type=str, default=None,
        help="bulk mode: process every image here (overrides --image_path)",
    )
    parser.add_argument(
        "--hairmask_dir", type=str, default=None,
        help="bulk mode: masks matched to images by basename",
    )
    args = parser.parse_args(argv)

    os.makedirs(args.orientation_root, exist_ok=True)
    if args.image_dir is not None:
        if args.hairmask_dir is None:
            parser.error("--image_dir requires --hairmask_dir")
        exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
        names = sorted(
            n for n in os.listdir(args.image_dir)
            if n.lower().endswith(exts)
        )
        done = skipped = 0
        for n in names:
            stem = os.path.splitext(n)[0]
            mask_path = None
            for ext in (".png", ".jpg", ".bmp"):
                cand = os.path.join(args.hairmask_dir, stem + ext)
                if os.path.exists(cand):
                    mask_path = cand
                    break
            if mask_path is None:
                print(f"no mask for {n}, skipped")
                skipped += 1
                continue
            _process_one(
                os.path.join(args.image_dir, n), mask_path,
                args.orientation_root,
            )
            done += 1
            if done % 50 == 0:
                print(f"{done}/{len(names)}", flush=True)
        print(f"saved {done} orientation maps to {args.orientation_root}"
              + (f" ({skipped} skipped)" if skipped else ""))
        return

    out_path = _process_one(
        args.image_path, args.hairmask_path, args.orientation_root
    )
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
