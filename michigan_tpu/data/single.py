"""Single-sample and demo loaders (base_dataset.py:49-276), NHWC numpy.

Returned dict keys mirror the reference's named-tensor dict
(pix2pix_dataset.py:178-188) with a leading batch dim of 1.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
from PIL import Image

from michigan_tpu.data.preprocess import generate_hole, pad_zeros, trans_orient_to_rgb
from michigan_tpu.data.transforms import get_params, get_transform
from michigan_tpu.ops.noise import generate_noise


def _dilate_pil(img: Image.Image, k: int) -> Image.Image:
    import cv2

    arr = np.array(img)
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (k, k))
    return Image.fromarray(np.uint8(cv2.dilate(arr, kernel))).convert("L")


def _label_tensor(transform_label, img: Image.Image, label_nc: int) -> np.ndarray:
    t = transform_label(img) * 255.0
    t[t == 255] = label_nc
    return t[None]  # (1,H,W,1)


def single_inference_data(opt, noise: Optional[np.ndarray] = None
                          ) -> Dict[str, np.ndarray]:
    """Reference single_inference_dataLoad (base_dataset.py:49-160).

    `noise` lets batch renderers reuse the seeded pyramid: it is a pure
    function of (--seed, crop_size), so every sample draws the identical
    array anyway (inference.py batch_inference)."""
    base, sub = opt.data_dir, opt.subset
    p = lambda kind, name, ext: os.path.join(base, f"{sub}_{kind}", name + ext)
    label_ref = Image.open(p("labels", opt.inference_ref_name, ".png"))
    label_tag = Image.open(p("labels", opt.inference_tag_name, ".png"))
    orient_mask = Image.open(p("labels", opt.inference_orient_name, ".png"))
    orient_tag = Image.open(p("dense_orients", opt.inference_tag_name + "_orient_dense", ".png"))
    orient_ref = Image.open(p("dense_orients", opt.inference_orient_name + "_orient_dense", ".png"))
    image_ref = Image.open(p("images", opt.inference_ref_name, ".jpg"))
    image_tag = Image.open(p("images", opt.inference_tag_name, ".jpg"))

    if opt.add_zeros:
        padf = lambda im: pad_zeros(im, opt.add_th)
        label_ref, label_tag = padf(label_ref), padf(label_tag)
        orient_mask, orient_tag, orient_ref = padf(orient_mask), padf(orient_tag), padf(orient_ref)
        image_ref, image_tag = padf(image_ref), padf(image_tag)

    params = get_params(opt, label_ref.size)
    tl = get_transform(opt, params, method=Image.NEAREST, normalize=False)
    label_ref_t = _label_tensor(tl, label_ref, opt.label_nc)

    if opt.expand_tag_mask:
        label_tag = _dilate_pil(label_tag, 25)
    label_tag_t = _label_tensor(tl, label_tag, opt.label_nc)
    orient_mask_t = _label_tensor(tl, orient_mask, opt.label_nc)

    if opt.use_ig and not opt.no_orientation:
        rgb = trans_orient_to_rgb(
            np.array(orient_ref), np.array(label_tag), np.array(orient_mask)
        )
        orient_rgb_t = tl(rgb)[None] * label_tag_t
    else:
        orient_rgb_t = np.zeros_like(np.repeat(label_tag_t, 3, axis=-1))

    if opt.use_ig:
        if opt.inference_orient_name == opt.inference_tag_name:
            import random as _random

            hole = generate_hole(
                np.array(label_tag), np.array(orient_mask),
                _random.Random(opt.seed),
            )
            hole_t = tl(hole)[None] * 255.0
        else:
            hole_t = label_tag_t - orient_mask_t * label_tag_t
    else:
        hole_t = np.zeros_like(label_tag_t)

    if noise is None:
        # seeded from --seed: makes CLI inference reproducible (the
        # reference draws from the global numpy RNG, base_dataset.py:387-396)
        noise = generate_noise(
            opt.crop_size, opt.crop_size, np.random.default_rng(opt.seed)
        )[None]

    ti = get_transform(opt, params, color=opt.color_jitter)
    image_ref_t = ti(image_ref.convert("RGB"))[None]
    image_tag_t = get_transform(opt, params)(image_tag.convert("RGB"))[None]
    orient_t = tl(orient_tag)[None] * 255.0

    return {
        "label_ref": label_ref_t.astype(np.float32),
        "label_tag": label_tag_t.astype(np.float32),
        "instance": np.zeros((1,), np.float32),
        "image_ref": image_ref_t.astype(np.float32),
        "image_tag": image_tag_t.astype(np.float32),
        "path": p("images", opt.inference_tag_name, ".jpg"),
        "orient": orient_t.astype(np.float32),
        "hole": hole_t.astype(np.float32),
        "orient_rgb": orient_rgb_t.astype(np.float32),
        "noise": noise.astype(np.float32),
    }


def demo_inference_data(
    opt, ref_label_path: str, tag_label: np.ndarray, mask_orient: np.ndarray,
    ref_orient: np.ndarray, ref_image: Image.Image, tag_image: Image.Image,
    orient_stroke: Optional[np.ndarray] = None,
    mask_stroke: Optional[np.ndarray] = None,
    mask_hole: Optional[np.ndarray] = None,
    noise: Optional[np.ndarray] = None,
    cache: Optional[dict] = None,
) -> Dict[str, np.ndarray]:
    """Reference demo_inference_dataLoad (base_dataset.py:162-276).

    `noise` lets interactive callers (demo/engine.py) reuse one seeded
    pyramid across edits — it is a pure function of (--seed, crop_size), so
    recomputing it per edit only burned the host-prep budget (the pyramid is
    the hottest per-sample host op, PERF.md input-pipeline section).

    `cache` (engine-owned dict) memoizes the planes that are pure functions
    of the OPENED inputs — the ref label file and the two PIL images — which
    an interactive session changes rarely (only when the user opens a new
    file) while the mask/stroke planes change every edit.  Keys hold a
    strong reference to the keyed PIL object so a Python id() cannot be
    reused while its entry is alive."""

    def memo(key_obj, tag, fn):
        if cache is None:
            return fn()
        key = (tag, key_obj if isinstance(key_obj, str) else id(key_obj))
        if key not in cache:
            # the stored strong ref keeps key_obj alive, so its id() cannot
            # be reused by a different object while this entry exists
            cache[key] = (key_obj, fn())
        return cache[key][1]

    label_ref = Image.open(ref_label_path)
    label_tag = Image.fromarray(np.uint8(tag_label))
    orient_mask = Image.fromarray(np.uint8(mask_orient))
    orient_ref = Image.fromarray(np.uint8(ref_orient))

    params = get_params(opt, label_ref.size)
    tl = get_transform(opt, params, method=Image.NEAREST, normalize=False)
    label_ref_t = memo(ref_label_path, "label_ref",
                       lambda: _label_tensor(tl, label_ref, opt.label_nc))
    if opt.expand_tag_mask:
        label_tag = _dilate_pil(label_tag, 25)
    label_tag_t = _label_tensor(tl, label_tag, opt.label_nc)
    orient_mask_t = _label_tensor(tl, orient_mask, opt.label_nc)

    rgb = trans_orient_to_rgb(
        np.array(orient_ref), np.array(label_tag), np.array(orient_mask)
    )
    orient_rgb_t = tl(rgb)[None] * label_tag_t
    orient_rgb_mask = orient_mask_t * label_tag_t

    if mask_hole is None:
        hole_t = label_tag_t - orient_mask_t * label_tag_t
    else:
        hole_t = _label_tensor(tl, Image.fromarray(np.uint8(mask_hole)), opt.label_nc)
        hole_t = hole_t * label_tag_t

    if orient_stroke is not None:
        stroke_t = tl(Image.fromarray(np.uint8(orient_stroke)))[None] * label_tag_t
    else:
        stroke_t = np.zeros_like(orient_rgb_t)
    if mask_stroke is not None:
        mask_stroke_t = (
            tl(Image.fromarray(np.uint8(mask_stroke)))[None] * 255.0 * label_tag_t
        )
    else:
        mask_stroke_t = np.zeros_like(label_tag_t)

    if noise is None:
        # seeded from --seed: makes CLI inference reproducible (the
        # reference draws from the global numpy RNG, base_dataset.py:387-396)
        noise = generate_noise(
            opt.crop_size, opt.crop_size, np.random.default_rng(opt.seed)
        )[None]
    ti = get_transform(opt, params, color=opt.color_jitter)
    if opt.color_jitter:
        # jitter draws fresh randomness per call — never memoize it
        image_ref_t = ti(ref_image.convert("RGB"))[None]
    else:
        image_ref_t = memo(ref_image, "image_ref",
                           lambda: ti(ref_image.convert("RGB"))[None])
    image_tag_t = memo(
        tag_image, "image_tag",
        lambda: get_transform(opt, params)(tag_image.convert("RGB"))[None])
    orient_t = tl(orient_ref)[None] * 255.0

    # copy=False: these planes are read-only downstream (encode_wire /
    # jnp.asarray allocate fresh buffers), and a copy here would both burn
    # host-prep time and defeat the memo's identity contract
    return {
        "label_ref": label_ref_t.astype(np.float32, copy=False),
        "label_tag": label_tag_t.astype(np.float32, copy=False),
        "instance": np.zeros((1,), np.float32),
        "image_ref": image_ref_t.astype(np.float32, copy=False),
        "image_tag": image_tag_t.astype(np.float32, copy=False),
        "path": None,
        "orient": orient_t.astype(np.float32, copy=False),
        "hole": hole_t.astype(np.float32, copy=False),
        "orient_rgb": orient_rgb_t.astype(np.float32, copy=False),
        "orient_rgb_mask": orient_rgb_mask.astype(np.float32, copy=False),
        "noise": noise.astype(np.float32, copy=False),
        "orient_stroke": stroke_t.astype(np.float32, copy=False),
        "mask_stroke": mask_stroke_t.astype(np.float32, copy=False),
    }
