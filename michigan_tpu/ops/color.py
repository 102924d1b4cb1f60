"""RGB -> Lab conversion matching the reference's math (loss.py:439-482).

The reference converts via an XYZ matrix then the CIE f() curve, with the
quirk that XYZ is normalized by the *row sums of M* (loss.py:461-464) —
equivalent to dividing by the D65 white point.  Inputs are NHWC in [0,1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

# sRGB -> XYZ (loss.py:409); plain numpy so importing this module does not
# force jax backend initialization
_M = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)
_M_ROWSUM = _M.sum(axis=1)  # white point normalization (loss.py:461-464)


def _f(t: jnp.ndarray) -> jnp.ndarray:
    # CIE lab curve (loss.py:439-444).  Double-where: cbrt's derivative is
    # (1/3)t^(-2/3) -> inf at t=0, and jax.where backprops inf*0 = NaN
    # through the UNSELECTED branch (a black pixel in the fake = xyz 0 took
    # the round-4 soak to NaN at step ~70).  torch's masked indexing only
    # differentiates selected elements, so the reference never hits this.
    pred = t > 0.008856
    safe = jnp.where(pred, t, 1.0)
    return jnp.where(pred, jnp.cbrt(safe), 7.787 * t + 0.137931)


def rgb_to_xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    """NHWC rgb in [0,1] -> white-point-normalized XYZ (loss.py:446-464)."""
    xyz = jnp.einsum(
        "nc,bhwc->bhwn", _M, rgb, precision=jax.lax.Precision.HIGHEST
    )
    return xyz / _M_ROWSUM.reshape(1, 1, 1, 3)


def xyz_to_lab(xyz: jnp.ndarray) -> jnp.ndarray:
    """White-point-normalized XYZ -> Lab (loss.py:466-482)."""
    fxyz = _f(xyz)
    y = xyz[..., 1]
    l = jnp.where(y > 0.008856, 116.0 * fxyz[..., 1] - 16.0, 903.3 * y)
    a = 500.0 * (fxyz[..., 0] - fxyz[..., 1])
    b = 200.0 * (fxyz[..., 1] - fxyz[..., 2])
    return jnp.stack([l, a, b], axis=-1)


def rgb_to_lab(rgb01: jnp.ndarray) -> jnp.ndarray:
    """NHWC rgb in [0,1] -> NHWC Lab."""
    return xyz_to_lab(rgb_to_xyz(rgb01))
