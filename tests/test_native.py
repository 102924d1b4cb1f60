"""Native C++ host-kernel tests (skipped when no toolchain)."""

import numpy as np
import pytest

from michigan_tpu import native


def lib_available():
    return native.get_lib() is not None


pytestmark = pytest.mark.skipif(not lib_available(), reason="no g++/native lib")


def test_bilinear_resize_matches_cv2(rng):
    import cv2

    src = rng.standard_normal((32, 24, 3)).astype(np.float32)
    ours = native.bilinear_resize(src, 64, 48)
    ref = cv2.resize(src, dsize=(48, 64))  # INTER_LINEAR default
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_noise_pyramid_deterministic_and_sane():
    a = native.noise_pyramid(128, 128, seed=42)
    b = native.noise_pyramid(128, 128, seed=42)
    c = native.noise_pyramid(128, 128, seed=43)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    # N(0.5, 0.25) octaves averaged over 5 octaves: mean ~0.5, std ~0.25/sqrt(5)..0.25
    assert abs(a.mean() - 0.5) < 0.02
    assert 0.05 < a.std() < 0.3
    assert a.shape == (128, 128, 3)


def test_noise_pyramid_matches_reference_statistics(rng):
    """Same multi-scale correlation structure as the numpy/cv2 reference
    implementation: adjacent-pixel correlation should be high (low-freq
    octaves) and similar between the two implementations."""
    from michigan_tpu.ops.noise import generate_noise

    ref = generate_noise(128, 128, np.random.default_rng(0))
    ours = native.noise_pyramid(128, 128, seed=0)

    def adj_corr(x):
        a = x[:-1, :, 0].ravel()
        b = x[1:, :, 0].ravel()
        return np.corrcoef(a, b)[0, 1]

    assert abs(adj_corr(ref) - adj_corr(ours)) < 0.1


def test_rasterize_hole_matches_numpy(rng):
    mask = (rng.uniform(size=(64, 64)) > 0.3).astype(np.float32)
    orient = mask * (rng.uniform(size=(64, 64)) > 0.5).astype(np.float32)
    ch, cw, rr = 30, 33, 250.0
    ours = native.rasterize_hole(mask, orient, ch, cw, rr)
    yy = np.arange(64)[:, None]
    xx = np.arange(64)[None, :]
    circ = ((yy - ch) ** 2 + (xx - cw) ** 2) < rr
    ref = orient * circ + (mask - orient)
    np.testing.assert_allclose(ours, ref, atol=0)
