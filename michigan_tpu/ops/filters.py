"""Oriented filter banks (Gabor / DoG) and dense-orientation estimation.

The reference builds one 17x17 kernel per orientation and runs 32 sequential
`F.conv2d` calls (loss.py:293-318, cal_orientation.py:60-80).  Here the whole
bank is a single precomputed (17,17,1,32) filter tensor and one conv — the MXU
does all 32 orientations at once.  Kernel math matches gabor_fn/DoG_fn
(loss.py:215-271) exactly: x runs along the first spatial dim, y along the
second, sigma_x=2 sigma_y=3 lambda=4 psi=0 (Gabor); sigma_h=1 sigma_l=2
sigma_y=2 (DoG).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

NUM_KERNELS = 32
KERNEL_SIZE = 17


def _grid(kernel_size: int):
    r = kernel_size // 2
    coords = np.arange(-r, r + 1, dtype=np.float32)
    # reference: x varies along rows (first spatial dim), y along cols
    x = coords[:, None] * np.ones((1, kernel_size), np.float32)
    y = np.ones((kernel_size, 1), np.float32) * coords[None, :]
    return x, y


@functools.lru_cache(maxsize=8)
def _gabor_bank_np(kernel_size: int = KERNEL_SIZE, num: int = NUM_KERNELS) -> np.ndarray:
    """(k, k, 1, num) HWIO Gabor bank; theta_i = pi*i/num (loss.py:215-243).

    Cached as numpy — caching jax arrays across jit traces leaks tracers."""
    x, y = _grid(kernel_size)
    sigma_x, sigma_y, lam, psi = 2.0, 3.0, 4.0, 0.0
    kernels = []
    for i in range(num):
        t = math.pi * i / num
        xt = x * math.cos(t) + y * math.sin(t)
        yt = -x * math.sin(t) + y * math.cos(t)
        gb = np.exp(-0.5 * (xt**2 / sigma_x**2 + yt**2 / sigma_y**2)) * np.cos(
            2.0 * math.pi / lam * xt + psi
        )
        kernels.append(gb.astype(np.float32))
    return np.stack(kernels, axis=-1)[:, :, None, :]


def gabor_bank(kernel_size: int = KERNEL_SIZE, num: int = NUM_KERNELS) -> jnp.ndarray:
    return jnp.asarray(_gabor_bank_np(kernel_size, num))


@functools.lru_cache(maxsize=8)
def _dog_bank_np(kernel_size: int = KERNEL_SIZE, num: int = NUM_KERNELS) -> np.ndarray:
    """(k, k, 1, num) HWIO DoG bank (loss.py:245-271, cal_orientation.py:18-44)."""
    x, y = _grid(kernel_size)
    sigma_h, sigma_l, sigma_y = 1.0, 2.0, 2.0
    kernels = []
    for i in range(num):
        t = math.pi * i / num
        xt = x * math.cos(t) + y * math.sin(t)
        yt = -x * math.sin(t) + y * math.cos(t)
        gb = (
            np.exp(-0.5 * (xt**2 / sigma_h**2 + yt**2 / sigma_y**2)) / sigma_h
            - np.exp(-0.5 * (xt**2 / sigma_l**2 + yt**2 / sigma_y**2)) / sigma_l
        ) / (1.0 / sigma_h - 1.0 / sigma_l)
        kernels.append(gb.astype(np.float32))
    return np.stack(kernels, axis=-1)[:, :, None, :]


def dog_bank(kernel_size: int = KERNEL_SIZE, num: int = NUM_KERNELS) -> jnp.ndarray:
    return jnp.asarray(_dog_bank_np(kernel_size, num))


def rgb_to_gray255(image_pm1: jax.Array) -> jax.Array:
    """[-1,1] NHWC RGB -> single-channel gray in [0,255] (loss.py:357-359).

    Note the reference's blue weight is 0.144 (not .114) — kept for parity.
    """
    img = (image_pm1 + 1.0) / 2.0 * 255.0
    gray = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.144 * img[..., 2]
    return gray[..., None]


def filter_bank_conv_direct(
    gray: jax.Array, bank: jnp.ndarray, padding: int = 8
) -> jax.Array:
    """One conv over the whole bank: (N,H,W,1) -> (N,H,W,num)."""
    return jax.lax.conv_general_dilated(
        gray.astype(jnp.float32),
        bank,
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,  # argmax stability needs fp32
    )


def _s2d_kernel_np(k: np.ndarray, block: int):
    """Space-to-depth transform of an arbitrary (K,K,Cin,Cout) HWIO kernel.

    A small-channel KxK conv is pathological on the MXU (poor sublane
    utilization, K*K degenerate per-tap matmuls).  The exact same map,
    expressed on the block-reduced grid, is a K'xK' conv with block^2*Cin
    input channels and block^2*Cout output channels — MXU-shaped.
    Derivation: with r = K//2 and output pixel p = block*P + u, the input
    index p + i - r = block*I + a splits into a reduced-cell offset I and
    an intra-block position a, so

        W[I-Imin, J-Jmin, (a*block+c)*Cin + ci, ((u*block+v)*Cout) + co]
            = k[i, j, ci, co].

    Returns (W, pad_lo, pad_hi) with the reduced-grid padding that
    reproduces 'same' zero padding of r full-resolution pixels.
    """
    kernel_size, _, cin, cout = k.shape
    r = kernel_size // 2
    i_min = -((r + block - 1) // block)  # floor(-r/block)
    i_max = (block - 1 + kernel_size - 1 - r) // block
    kp = i_max - i_min + 1
    w = np.zeros(
        (kp, kp, block * block * cin, block * block * cout), np.float32
    )
    for u in range(block):
        for i in range(kernel_size):
            t = u + i - r
            big_i = t // block
            a = t - big_i * block
            for v in range(block):
                for j in range(kernel_size):
                    s = v + j - r
                    big_j = s // block
                    c = s - big_j * block
                    ic = (a * block + c) * cin
                    oc = (u * block + v) * cout
                    w[
                        big_i - i_min, big_j - i_min,
                        ic : ic + cin, oc : oc + cout,
                    ] = k[i, j]
    return w, -i_min, i_max


@functools.lru_cache(maxsize=8)
def _s2d_bank_np(mode: str, kernel_size: int, num: int, block: int):
    """s2d transform of the (K,K,1,num) oriented bank (see _s2d_kernel_np)."""
    if mode == "gabor":
        k = _gabor_bank_np(kernel_size, num)
    else:
        k = _dog_bank_np(kernel_size, num)
    return _s2d_kernel_np(k, block)


@functools.lru_cache(maxsize=8)
def _s2d_bank_transpose_np(mode: str, kernel_size: int, num: int, block: int):
    """s2d transform of the bank's transpose map (for the conv's input-VJP):
    spatially flipped, in/out channels swapped -> (K,K,num,1)."""
    if mode == "gabor":
        k = _gabor_bank_np(kernel_size, num)
    else:
        k = _dog_bank_np(kernel_size, num)
    kt = np.ascontiguousarray(k[::-1, ::-1].transpose(0, 1, 3, 2))
    return _s2d_kernel_np(kt, block)


def _s2d_conv_apply(
    x, w_np, pad_lo, pad_hi, block, precision, compute_dtype=jnp.float32
):
    """Apply an s2d-transformed kernel: pad -> s2d -> conv -> d2s -> crop."""
    cout = w_np.shape[3] // (block * block)
    n, h, wd, cin = x.shape
    hp = -(-h // block) * block
    wp = -(-wd // block) * block
    g = x.astype(compute_dtype)
    if hp != h or wp != wd:
        g = jnp.pad(g, ((0, 0), (0, hp - h), (0, wp - wd), (0, 0)))
    g = g.reshape(n, hp // block, block, wp // block, block, cin)
    g = g.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, hp // block, wp // block, block * block * cin
    )
    y = jax.lax.conv_general_dilated(
        g,
        jnp.asarray(w_np, dtype=compute_dtype),
        window_strides=(1, 1),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    y = y.reshape(n, hp // block, wp // block, block, block, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp, wp, cout)
    return y[:, :h, :wd, :]


def _filter_bank_conv_s2d_impl(
    gray: jax.Array, mode: str, padding: int, block: int,
    kernel_size: int, num: int, precision,
) -> jax.Array:
    assert padding == kernel_size // 2
    w_np, pad_lo, pad_hi = _s2d_bank_np(mode, kernel_size, num, block)
    return _s2d_conv_apply(gray, w_np, pad_lo, pad_hi, block, precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _fb_s2d_core(gray, mode, padding, block, kernel_size, num, fwd_bf16=False):
    if fwd_bf16:
        # bf16 inputs/filters, fp32 MXU accumulation, fp32 result.  Under
        # the --dtype bfloat16 policy the fake image feeding the bank is
        # already bf16-rounded, so this only lowers the conv input rounding
        # to the same grid; HIGHEST's 3-pass fp32 emulation (~3x the MXU
        # work) is what it buys back.  Near-tie argmax flips land on
        # adjacent orientations with near-equal loss.
        w_np, pad_lo, pad_hi = _s2d_bank_np(mode, kernel_size, num, block)
        return _s2d_conv_apply(
            gray.astype(jnp.bfloat16), w_np, pad_lo, pad_hi, block,
            jax.lax.Precision.DEFAULT, compute_dtype=jnp.bfloat16,
        ).astype(jnp.float32)
    return _filter_bank_conv_s2d_impl(
        gray, mode, padding, block, kernel_size, num,
        jax.lax.Precision.HIGHEST,
    )


def _fb_s2d_fwd(gray, mode, padding, block, kernel_size, num, fwd_bf16=False):
    out = _fb_s2d_core(gray, mode, padding, block, kernel_size, num, fwd_bf16)
    return out, None


def _fb_s2d_bwd(mode, padding, block, kernel_size, num, fwd_bf16, _res, g):
    # the conv's input-VJP is itself a 'same'-pad correlation — with the
    # spatially-flipped, io-swapped bank — so run it as a forward s2d conv
    # rather than XLA's conv-transpose lowering (measured faster).  The
    # whole pass runs in bf16: the cast fuses into the s2d transpose,
    # halving the read traffic of the (N,H,W,num) fp32 cotangent (the MXU
    # still accumulates the conv in fp32); only the loss gradient sees the
    # quantization, never the argmax'd orientations.
    w_np, pad_lo, pad_hi = _s2d_bank_transpose_np(
        mode, kernel_size, num, block
    )
    dgray = _s2d_conv_apply(
        g.astype(jnp.bfloat16), w_np, pad_lo, pad_hi, block,
        jax.lax.Precision.DEFAULT, compute_dtype=jnp.bfloat16,
    )
    return (dgray.astype(g.dtype),)


_fb_s2d_core.defvjp(_fb_s2d_fwd, _fb_s2d_bwd)


def filter_bank_conv_s2d(
    gray: jax.Array, mode: str, padding: int = 8, block: int = 8,
    kernel_size: int = KERNEL_SIZE, num: int = NUM_KERNELS,
    fwd_bf16: bool = False,
) -> jax.Array:
    """MXU-friendly filter-bank conv via space-to-depth (exact same math).

    Only valid for 'same' padding (padding == kernel_size//2); arbitrary
    H,W handled by zero pad + crop (identical to 'same' zero padding).

    Forward runs fp32-HIGHEST by default (per-pixel argmax over near-tie
    orientation responses; the exact-parity path for cal_orientation);
    `fwd_bf16=True` — used by the training loss under the bf16 policy —
    drops the input rounding to bf16 with fp32 MXU accumulation.  The
    backward — a linear transpose — always runs in bf16, which only
    perturbs the loss gradient, not the selected orientations.
    """
    return _fb_s2d_core(
        gray.astype(jnp.float32), mode, padding, block, kernel_size, num,
        fwd_bf16,
    )


def _use_s2d() -> bool:
    """s2d path measured 31x faster fwd on TPU (MXU-shaped; PERF.md);
    MICHIGAN_FILTERBANK=direct falls back for A/B.  Read at call (trace)
    time so setting the env after import still takes effect."""
    return os.environ.get("MICHIGAN_FILTERBANK", "s2d") != "direct"


def filter_bank_conv(
    gray: jax.Array, bank: jnp.ndarray, padding: int = 8,
    mode: str | None = None, fwd_bf16: bool = False,
) -> jax.Array:
    if _use_s2d() and mode is not None and padding == bank.shape[0] // 2:
        return filter_bank_conv_s2d(
            gray, mode, padding,
            kernel_size=bank.shape[0], num=bank.shape[3],
            fwd_bf16=fwd_bf16,
        )
    return filter_bank_conv_direct(gray, bank, padding)


def orientation_response(gray: jax.Array, mode: str = "gabor", padding: int = 8,
                         fwd_bf16: bool = False):
    """Per-pixel (argmax index, raw max response) over the oriented bank.

    Equivalent to the loop + clamp + argmax in loss.py:293-311 — responses
    are clamped at 0 before the argmax, ties resolve to the first index like
    torch.argmax on CPU.
    """
    bank = gabor_bank() if mode == "gabor" else dog_bank()
    res = filter_bank_conv(gray, bank, padding, mode=mode, fwd_bf16=fwd_bf16)
    res = jnp.maximum(res, 0.0)
    idx = jnp.argmax(res, axis=-1)
    raw_conf = jnp.max(res, axis=-1)
    return idx, raw_conf


def cal_orientation_two_channel(
    image_pm1: jax.Array, mode: str = "gabor", hair_mask: jax.Array | None = None,
    fwd_bf16: bool = False,
):
    """(sin 2theta, cos 2theta) * confidence + confidence map, NHWC.

    Gabor path squashes confidence with (tanh+1)/2 (loss.py:311); DoG path
    masks and max-normalizes it (loss.py:337-343).  Gradients flow through the
    max response only, matching torch.
    """
    gray = rgb_to_gray255(image_pm1)
    idx, raw_conf = orientation_response(gray, mode, fwd_bf16=fwd_bf16)
    theta = idx.astype(jnp.float32) * (math.pi / NUM_KERNELS)
    if mode == "gabor":
        conf = (jnp.tanh(raw_conf) + 1.0) / 2.0
    else:
        conf = raw_conf[..., None]
        if hair_mask is not None:
            conf = conf * hair_mask
        conf = conf / jnp.maximum(jnp.max(conf), 1e-12)
        conf = jnp.where(conf <= 0, 0.0, conf)
        conf = conf[..., 0]
    two = jnp.stack([jnp.sin(2.0 * theta), jnp.cos(2.0 * theta)], axis=-1)
    two = two * conf[..., None]
    return two, conf[..., None]


def dense_orientation(gray: jax.Array, mode: str = "dog", padding: int = 8):
    """cal_orientation.py:60-80 — (argmax float map, confidence), NHW1."""
    idx, raw_conf = orientation_response(gray, mode, padding)
    return idx.astype(jnp.float32)[..., None], raw_conf[..., None]
