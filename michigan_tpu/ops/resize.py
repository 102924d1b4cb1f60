"""Resize / pooling ops with exact PyTorch indexing semantics, NHWC.

The reference leans on `F.interpolate` / `F.max_pool2d` / `F.avg_pool2d`
(e.g. generator.py:151-159, normalization.py:110, discriminator.py:46-49 in
/root/reference).  PyTorch and `jax.image.resize` disagree on index math, so
we implement the torch rules directly:

  nearest               src = floor(dst * in/out)              (float32 scale)
  bilinear, ac=False    src = (dst + 0.5) * in/out - 0.5, clamped at 0
  bilinear, ac=True     src = dst * (in-1)/(out-1)

Bilinear is expressed as two dense matmuls with precomputed interpolation
matrices — exact, static-shape, and MXU-friendly (better than gather chains
on TPU).  Nearest is a pair of gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# nearest
# ---------------------------------------------------------------------------

def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    # torch upsample_nearest: src = min(int(dst * scale), in-1), scale fp32
    scale = np.float32(in_size) / np.float32(out_size)
    idx = np.floor(np.arange(out_size, dtype=np.float32) * scale).astype(np.int32)
    return np.minimum(idx, in_size - 1)


def resize_nearest(x: jax.Array, size: tuple) -> jax.Array:
    """F.interpolate(x, size, mode='nearest') for NHWC input."""
    H, W = x.shape[1], x.shape[2]
    out_h, out_w = size
    if (out_h, out_w) == (H, W):
        return x
    hi = _nearest_indices(H, out_h)
    wi = _nearest_indices(W, out_w)
    return x[:, hi][:, :, wi]


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """nn.Upsample(scale_factor=2) — exact 2x pixel replication."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# bilinear (as interpolation-matrix matmuls)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=128)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out, in) interpolation matrix matching torch bilinear."""
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)  # torch clamps negative source coords
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), (1.0 - frac).astype(np.float32))
    np.add.at(m, (rows, hi), frac.astype(np.float32))
    return m


def resize_bilinear(x: jax.Array, size: tuple, align_corners: bool = False) -> jax.Array:
    """F.interpolate(x, size, mode='bilinear', align_corners=...) for NHWC."""
    H, W = x.shape[1], x.shape[2]
    out_h, out_w = size
    if (out_h, out_w) == (H, W):
        return x
    dt = x.dtype
    mh = jnp.asarray(_bilinear_matrix(H, out_h, align_corners))
    mw = jnp.asarray(_bilinear_matrix(W, out_w, align_corners))
    hp = jax.lax.Precision.HIGHEST  # interpolation weights need full fp32
    y = jnp.einsum("oh,nhwc->nowc", mh, x.astype(jnp.float32), precision=hp)
    y = jnp.einsum("pw,nowc->nopc", mw, y, precision=hp)
    return y.astype(dt)


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------

def _pool_out_size(h: int, k: int, s: int, p: int) -> int:
    return (h + 2 * p - k) // s + 1


def max_pool_same(x: jax.Array, k: int, stride: int = 1, padding: int = None) -> jax.Array:
    """F.max_pool2d(x, k, stride, padding=int(k/2)) with torch output size.

    Torch allows even kernels with p=k//2 which *grows* the output by one
    (e.g. loss.py:60-68); callers resize back explicitly like the reference.

    Large stride-1 windows (mask dilation, encoder.py:288-316: k up to
    ~0.1*H) run as two separable 1-D passes — a k x k box max is exactly
    (k x 1) o (1 x k) — turning k^2 taps/pixel into 2k.  Profiled on TPU:
    the 47x47 dilation in the bs8 512^2 train step was a single 53 ms
    reduce_window (9% of the whole step) before this.
    """
    if padding is None:
        padding = int(k / 2)
    init = (
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min
    )
    if stride == 1 and k > 5:
        y = jax.lax.reduce_window(
            x, init, jax.lax.max,
            window_dimensions=(1, k, 1, 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (padding, padding), (0, 0), (0, 0)),
        )
        y = jax.lax.reduce_window(
            y, init, jax.lax.max,
            window_dimensions=(1, 1, k, 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (0, 0), (padding, padding), (0, 0)),
        )
    else:
        y = jax.lax.reduce_window(
            x, init, jax.lax.max,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, stride, stride, 1),
            padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
        )
    # torch formula may yield a smaller size than SAME-style reduce_window
    oh = _pool_out_size(x.shape[1], k, stride, padding)
    ow = _pool_out_size(x.shape[2], k, stride, padding)
    return y[:, :oh, :ow, :]


def dilate_mask(mask: jax.Array, k: int) -> jax.Array:
    """Binary-mask dilation via max-pool (stride 1, same spatial size).

    Mirrors the reference's `F.max_pool2d(mask, k, 1, int(k/2))` dilation
    (encoder.py:296, generator.py:102).  For odd k the size is preserved;
    for even k torch grows by one — we crop back like every reference caller
    effectively does via later nearest-resize.
    """
    y = max_pool_same(mask, k, 1, int(k / 2))
    h, w = mask.shape[1], mask.shape[2]
    if y.shape[1] != h or y.shape[2] != w:
        y = resize_nearest(y, (h, w))
    return y


def avg_pool_3x3s2(x: jax.Array) -> jax.Array:
    """F.avg_pool2d(x, 3, stride=2, padding=1, count_include_pad=False).

    The multiscale discriminator's downsample (discriminator.py:46-49).
    """
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), dtype=x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return sums / counts


# ---------------------------------------------------------------------------
# grid sample (nearest) — for the Lab-balance weight lookup (loss.py:503)
# ---------------------------------------------------------------------------

def grid_sample_nearest(weight: jax.Array, grid: jax.Array) -> jax.Array:
    """torch.nn.functional.grid_sample(weight, grid, mode='nearest',
    align_corners=False) for NHWC `weight` (N,H,W,C) and grid (N,Ho,Wo,2)
    with xy in [-1,1] (x indexes W, y indexes H)."""
    n, h, w, c = weight.shape
    gx, gy = grid[..., 0], grid[..., 1]
    # unnormalize, align_corners=False: ((x+1)*size - 1) / 2
    ix = ((gx + 1.0) * w - 1.0) / 2.0
    iy = ((gy + 1.0) * h - 1.0) / 2.0
    ix = jnp.clip(jnp.round(ix), 0, w - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.round(iy), 0, h - 1).astype(jnp.int32)
    flat = weight.reshape(n, h * w, c)
    idx = iy * w + ix  # (N, Ho, Wo)
    gathered = jnp.take_along_axis(
        flat, idx.reshape(n, -1, 1), axis=1
    )
    return gathered.reshape(n, grid.shape[1], grid.shape[2], c)
