"""Image preprocessing matching the reference's torchvision pipeline
(base_dataset.py:398-505): scale/crop/flip on PIL images, then to
float NHWC; images normalized to [-1,1], labels left in [0,1].
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
from PIL import Image


@dataclass
class TransformSpec:
    crop_pos: Tuple[int, int]
    flip: bool


def get_params(opt, size: Tuple[int, int], rng: Optional[random.Random] = None) -> TransformSpec:
    """Random crop position + flip decision (base_dataset.py:398-417)."""
    r = rng or random
    w, h = size
    new_w, new_h = w, h
    if opt.preprocess_mode == "resize_and_crop":
        new_h = new_w = opt.load_size
    elif opt.preprocess_mode == "scale_width_and_crop":
        new_w = opt.load_size
        new_h = opt.load_size * h // w
    elif opt.preprocess_mode == "scale_shortside_and_crop":
        ss, ls = min(w, h), max(w, h)
        ls = int(opt.load_size * ls / ss)
        new_w, new_h = (ss, ls) if w == ss else (ls, ss)
    x = r.randint(0, max(0, new_w - opt.crop_size))
    y = r.randint(0, max(0, new_h - opt.crop_size))
    flip = r.random() > 0.5
    return TransformSpec((x, y), flip)


def _scale_width(img: Image.Image, target: int, method) -> Image.Image:
    ow, oh = img.size
    if ow == target:
        return img
    return img.resize((target, int(target * oh / ow)), method)


def _scale_shortside(img: Image.Image, target: int, method) -> Image.Image:
    ow, oh = img.size
    ss, ls = min(ow, oh), max(ow, oh)
    if ss == target:
        return img
    ls = int(target * ls / ss)
    nw, nh = (ss, ls) if ow == ss else (ls, ss)
    return img.resize((nw, nh), method)


# torchvision ColorJitter(brightness=0.1, contrast=0.01, saturation=0.01,
# hue=0.01) — the reference's jitter config (base_dataset.py:446)
JITTER_BRIGHTNESS = 0.1
JITTER_CONTRAST = 0.01
JITTER_SATURATION = 0.01
JITTER_HUE = 0.01


def _adjust_hue(img: Image.Image, factor: float) -> Image.Image:
    """torchvision F.adjust_hue PIL path: shift the HSV hue channel by
    factor*255 with uint8 wraparound."""
    if img.mode in ("L", "1", "I", "F"):
        return img
    hsv = img.convert("HSV")
    h, s, v = hsv.split()
    np_h = np.array(h, dtype=np.uint8)
    np_h = ((np_h.astype(np.int32) + int(round(factor * 255.0))) % 256).astype(
        np.uint8
    )
    return Image.merge("HSV", (Image.fromarray(np_h, "L"), s, v)).convert(
        img.mode
    )


def color_jitter(img: Image.Image, r: random.Random) -> Image.Image:
    """Full torchvision ColorJitter semantics (brightness/contrast/saturation/
    hue, randomly ordered, factors uniform around 1) at the reference's
    strengths.  Exact RNG parity with torchvision is impossible across
    frameworks; the transform semantics and distributions match."""
    from PIL import ImageEnhance

    ops = [
        ("brightness", r.uniform(1 - JITTER_BRIGHTNESS, 1 + JITTER_BRIGHTNESS)),
        ("contrast", r.uniform(1 - JITTER_CONTRAST, 1 + JITTER_CONTRAST)),
        ("saturation", r.uniform(1 - JITTER_SATURATION, 1 + JITTER_SATURATION)),
        ("hue", r.uniform(-JITTER_HUE, JITTER_HUE)),
    ]
    r.shuffle(ops)
    for name, f in ops:
        if name == "brightness":
            img = ImageEnhance.Brightness(img).enhance(f)
        elif name == "contrast":
            img = ImageEnhance.Contrast(img).enhance(f)
        elif name == "saturation":
            img = ImageEnhance.Color(img).enhance(f)
        else:
            img = _adjust_hue(img, f)
    return img


def pre_geometry(img: Image.Image, opt, method) -> Image.Image:
    """The parameter-independent scaling stage of the transform pipeline
    (base_dataset.py:420-434).  Idempotent: resize skips when the size
    already matches, _scale_width/_scale_shortside no-op on target match —
    which is what lets the decode cache serve pre-scaled images."""
    if "resize" in opt.preprocess_mode:
        if img.size != (opt.load_size, opt.load_size):
            return img.resize((opt.load_size, opt.load_size), method)
        return img
    if "scale_width" in opt.preprocess_mode:
        return _scale_width(img, opt.load_size, method)
    if "scale_shortside" in opt.preprocess_mode:
        return _scale_shortside(img, opt.load_size, method)
    return img


def get_transform(opt, params: TransformSpec, method=Image.BICUBIC,
                  normalize: bool = True, color: bool = False,
                  raw: bool = False, as_uint8: bool = False):
    """Returns PIL -> (H,W,C) float32 ndarray closure (base_dataset.py:420-454).

    color=True applies the full torchvision ColorJitter pipeline
    (brightness/contrast/saturation/hue) at the reference's strengths."""

    def apply(img: Image.Image) -> np.ndarray:
        # pre_geometry no-ops on already-scaled inputs, so images served
        # from the loader's pre-resized decode cache (dataset.py open_t)
        # skip the per-step resample on the single-core host
        x = pre_geometry(img, opt, method)
        if "crop" in opt.preprocess_mode:
            cx, cy = params.crop_pos
            x = x.crop((cx, cy, cx + opt.crop_size, cy + opt.crop_size))
        if opt.preprocess_mode == "none":
            ow, oh = x.size
            nw, nh = int(round(ow / 32) * 32), int(round(oh / 32) * 32)
            if (nw, nh) != (ow, oh):
                x = x.resize((nw, nh), method)
        if opt.preprocess_mode == "fixed":
            w = opt.crop_size
            h = round(opt.crop_size / opt.aspect_ratio)
            x = x.resize((w, h), method)
        if opt.isTrain and not opt.no_flip and params.flip:
            x = x.transpose(Image.FLIP_LEFT_RIGHT)
        if color:
            x = color_jitter(x, random)

        if as_uint8:
            # raw pixels, byte dtype: the uint8-wire loader ships these to
            # the device untouched and the train step decodes in-program
            # (train_step._f32) — no host float pass at all
            # np.array, not asarray: PIL exposes a read-only buffer and
            # callers mutate (label 255 remap); a u8 copy is 4x cheaper
            # than the float pipeline it replaces
            arr = np.array(x, dtype=np.uint8)
            return arr[..., None] if arr.ndim == 2 else arr
        arr = np.asarray(x, dtype=np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        if raw:
            # pixel values as-is, for callers that would multiply the
            # ToTensor /255 straight back out (labels/orients/holes);
            # (v/255)*255 == v exactly in float32 for all uint8 v, so this
            # is bit-identical and saves two full passes per array
            return arr
        if normalize:
            # one pass; bit-identical to ToTensor + Normalize(0.5, 0.5)
            # ((v/255 - 0.5)/0.5 == v/127.5 - 1 exactly for all uint8 v)
            arr = arr / np.float32(127.5) - np.float32(1.0)
        else:
            arr = arr / np.float32(255.0)  # torchvision ToTensor
        return arr

    return apply
