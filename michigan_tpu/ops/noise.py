"""Multi-octave background noise pyramid (base_dataset.py:387-396).

Host-side (numpy + cv2) for the data pipeline — semantics matter for parity:
octaves of N(0.5, 0.25) noise from full resolution down to 8px, each bilinear-
upsampled (cv2 default) to the full size, weighted sum normalized by the
weight total.  A jax.random device-side variant is provided for jit paths.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def generate_noise(width: int, height: int, rng: np.random.Generator | None = None) -> np.ndarray:
    """Exact reference implementation (cv2.resize, weight=1 per octave)."""
    import cv2

    rand = rng.normal if rng is not None else np.random.normal
    weight = 1.0
    weight_sum = 0.0
    noise = np.zeros((height, width, 3), dtype=np.float32)
    w, h = width, height
    while w >= 8 and h >= 8:
        octave = rand(loc=0.5, scale=0.25, size=(int(h), int(w), 3))
        noise += cv2.resize(octave, dsize=(noise.shape[0], noise.shape[1])) * weight
        weight_sum += weight
        w //= 2
        h //= 2
    return noise / weight_sum


def generate_noise_jax(key: jax.Array, width: int, height: int) -> jnp.ndarray:
    """Device-side pyramid using torch-free bilinear resize.

    Statistically equivalent (not bit-identical — cv2's INTER_LINEAR differs
    at borders), used for jit-compiled demo/bench paths where host round-trips
    would stall the TPU.
    Returns (H,W,3) float32.
    """
    from michigan_tpu.ops.resize import resize_bilinear

    noise = jnp.zeros((1, height, width, 3), dtype=jnp.float32)
    w, h = width, height
    total = 0.0
    while w >= 8 and h >= 8:
        key, sub = jax.random.split(key)
        octave = 0.5 + 0.25 * jax.random.normal(sub, (1, h, w, 3), dtype=jnp.float32)
        noise = noise + resize_bilinear(octave, (height, width))
        total += 1.0
        w //= 2
        h //= 2
    return (noise / total)[0]


def generate_noise_fast(width: int, height: int, seed: int) -> np.ndarray:
    """Native C++ pyramid when available (michigan_tpu/native), else the
    cv2 reference implementation.  Deterministic in `seed` either way."""
    from michigan_tpu import native

    out = native.noise_pyramid(height, width, seed)
    if out is None:
        return generate_noise(width, height, np.random.default_rng(seed))
    return out
