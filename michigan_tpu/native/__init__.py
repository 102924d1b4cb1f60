"""ctypes bindings for the native host-pipeline kernels.

Compiles michigan_native.cpp with g++ on first import (cached .so next to
the source); every entry point has a pure numpy/cv2 fallback so the package
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "michigan_native.cpp")
_SO = os.path.join(_DIR, "libmichigan_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    base = ["g++", "-O3", "-march=native", "-ffast-math", "-shared", "-fPIC",
            "-o", _SO, _SRC]
    # -lmvec lets gcc vectorize the gauss_fill transcendental loops through
    # glibc's SIMD libm; fall back to a plain link where libmvec is absent
    for extra in (["-lmvec", "-lm"], []):
        try:
            subprocess.run(base + extra, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    lib.noise_pyramid.argtypes = [fp, ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
    lib.bilinear_resize_f32.argtypes = [
        fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, fp, ctypes.c_int, ctypes.c_int,
    ]
    lib.rasterize_hole.argtypes = [
        fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, fp,
    ]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def noise_pyramid(height: int, width: int, seed: int) -> Optional[np.ndarray]:
    """Deterministic multi-octave noise (base_dataset.py:387-396 semantics,
    native RNG — statistically identical, not bit-equal to numpy/cv2).
    Returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((height, width, 3), np.float32)
    lib.noise_pyramid(_ptr(out), height, width, ctypes.c_uint64(seed))
    return out


def bilinear_resize(src: np.ndarray, dh: int, dw: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    h, w, c = src.shape
    dst = np.empty((dh, dw, c), np.float32)
    lib.bilinear_resize_f32(_ptr(src), h, w, c, _ptr(dst), dh, dw)
    return dst


def rasterize_hole(
    mask: np.ndarray, orient_mask: np.ndarray, ch: int, cw: int, rr: float
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.float32)
    orient_mask = np.ascontiguousarray(orient_mask, np.float32)
    h, w = mask.shape
    out = np.empty((h, w), np.float32)
    lib.rasterize_hole(_ptr(mask), _ptr(orient_mask), h, w, ch, cw, rr, _ptr(out))
    return out
