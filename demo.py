"""Interactive hair-editing demo (reference demo.py).

With PyQt5 available, launches the full painting UI; otherwise runs a
headless scripted edit over the bundled FFHQ_demo samples so the demo path
stays exercisable in UI-less environments (this image has no Qt).

Headless usage:
  python demo.py --demo_data_dir ./datasets/FFHQ_demo \
      --tag_name 67172 --ref_name 59144 [--stroke]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def _load_demo_sample(demo_dir: str, name: str):
    img = Image.open(os.path.join(demo_dir, "images", name + ".jpg"))
    label = np.array(Image.open(os.path.join(demo_dir, "labels", name + ".png")))
    orient = np.array(
        Image.open(os.path.join(demo_dir, "orients", name + "_orient_dense.png"))
    )
    # reconstructed tag (hair removed) — used when a mask edit exposes
    # background (reference demo.py:137-142)
    recon_path = os.path.join(demo_dir, "images_recon", name + ".jpg")
    recon = Image.open(recon_path) if os.path.exists(recon_path) else None
    return img, label, orient, recon


def run_headless(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--tag_name", type=str, default="67172")
    parser.add_argument("--ref_name", type=str, default="59144")
    parser.add_argument("--stroke", action="store_true",
                        help="exercise the stroke-inpainting (SIG) path")
    parser.add_argument("--erase", action="store_true",
                        help="edit that removes hair: exercises the "
                             "reconstructed-tag (images_recon) selection")
    parser.add_argument("--out", type=str, default="./inference_samples/demo_edit.jpg")
    args, rest = parser.parse_known_args(argv)

    from michigan_tpu.config import demo_options
    from michigan_tpu.demo.engine import (
        DemoEngine,
        dilate_hole,
        select_tag_image,
        stroke_to_orient,
    )

    opt = demo_options(rest)
    # precompile like the Qt shell does, so the reported latency is the
    # steady-state interactive number, not first-edit compile time
    engine = DemoEngine(opt, precompile=True)

    demo_dir = opt.demo_data_dir
    tag_img, tag_label, tag_orient, tag_recon = _load_demo_sample(
        demo_dir, args.tag_name
    )
    ref_img, ref_label, ref_orient, _ = _load_demo_sample(demo_dir, args.ref_name)
    ref_label_path = os.path.join(demo_dir, "labels", args.ref_name + ".png")

    if args.erase:
        # user edit that removes the top of the hair mask: the exposed
        # region must come from the reconstructed tag (demo.py:330-333)
        mask_m = tag_label.copy()
        ys, xs = np.nonzero(tag_label)
        if len(ys):
            cut = int(np.percentile(ys, 30))
            mask_m[:cut] = 0
        tag_for_edit = select_tag_image(tag_img, tag_recon, tag_label, mask_m)
        if tag_recon is not None:
            assert tag_for_edit is not tag_img, "recon tag must be selected"
        result, orient_rgb, latency = engine.edit(
            ref_label_path, mask_m, mask_m, tag_orient,
            ref_img, tag_for_edit, inpaint_mode="ref",
        )
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        Image.fromarray(result).save(args.out)
        print(f"saved {args.out} (latency {latency:.3f}s)")
        return

    if args.stroke:
        # synthesize a diagonal stroke through the hair region
        stroke = np.zeros_like(tag_label, dtype=np.uint8)
        ys, xs = np.nonzero(tag_label)
        if len(ys):
            cy, cx = int(ys.mean()), int(xs.mean())
            for d in range(-60, 60):
                y, x = cy + d, cx + d // 2
                if 0 <= y < stroke.shape[0] and 0 <= x < stroke.shape[1]:
                    stroke[y, max(x - 3, 0) : x + 3] = 1
        stroke = stroke * tag_label
        hole = dilate_hole(stroke, 50) * tag_label
        orient_stroke = stroke_to_orient(stroke)
        result, orient_rgb, latency = engine.edit(
            ref_label_path, tag_label, tag_label * (1 - hole), tag_orient,
            ref_img, tag_img, orient_stroke=orient_stroke, mask_stroke=stroke,
            mask_hole=hole, inpaint_mode="stroke",
        )
    else:
        # appearance transfer: tag shape + ref appearance, ref-mode inpaint
        result, orient_rgb, latency = engine.edit(
            ref_label_path, tag_label, tag_label, tag_orient,
            ref_img, tag_img, inpaint_mode="ref",
        )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    Image.fromarray(result).save(args.out)
    print(f"saved {args.out} (latency {latency:.3f}s)")


def run_qt(argv=None):
    """Qt UI shell (reference demo.py Ex widget).  Requires PyQt5."""
    from michigan_tpu.demo.qt_ui import launch  # noqa: gated import

    launch(argv)


def main(argv=None):
    try:
        import PyQt5  # noqa: F401

        has_qt = True
    except Exception:
        has_qt = False
    if has_qt and os.environ.get("MICHIGAN_HEADLESS", "0") != "1":
        run_qt(argv)
    else:
        if has_qt is False:
            print("PyQt5 not available — running headless scripted demo")
        run_headless(argv)


if __name__ == "__main__":
    main()
