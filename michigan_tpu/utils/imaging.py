"""Array <-> image helpers (reference util/util.py:40-138)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def tensor2im(x: np.ndarray, normalize: bool = True) -> np.ndarray:
    """(H,W,3) float in [-1,1] (or [0,1]) -> uint8 (util/util.py:40-66)."""
    x = np.asarray(x)
    if x.ndim == 4:
        x = x[0]
    if x.dtype == np.uint8:
        return x  # uint8-wire images are already display pixels
    if normalize:
        x = (x + 1.0) / 2.0
    x = np.clip(x * 255.0, 0, 255)
    return x.astype(np.uint8)


def tensor2label(label: np.ndarray, n_label: int) -> np.ndarray:
    """Label map -> grayscale visualization (util/util.py:69-88 simplified:
    the colormap path is only used for >2-class datasets)."""
    lab = np.asarray(label)
    if lab.ndim == 4:
        lab = lab[0]
    lab = lab[..., 0] if lab.ndim == 3 else lab
    scale = 255 // max(n_label - 1, 1)
    return (lab * scale).astype(np.uint8)


def save_image(arr: np.ndarray, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


def crop_feat_pad(img: np.ndarray, crop_size: int, add_th: int) -> np.ndarray:
    """Remove the add_feat_zeros frame (inference.py:44-48)."""
    r = int(add_th / 2)
    return img[r : r + crop_size, r : r + crop_size, ...]


def blend_image(fake: np.ndarray, tag: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """cv2.seamlessClone MIXED_CLONE composite (util/util.py:274-285)."""
    import cv2

    mask_u8 = np.uint8(mask * 255)
    ys, xs = np.nonzero(mask_u8[..., 0] if mask_u8.ndim == 3 else mask_u8)
    if len(ys) == 0:
        return tag
    center = (int(xs.mean()), int(ys.mean()))
    return cv2.seamlessClone(fake, tag, mask_u8, center, cv2.MIXED_CLONE)
