"""ColorJitter semantics (reference base_dataset.py:446: torchvision
ColorJitter(brightness=0.1, contrast=0.01, saturation=0.01, hue=0.01))."""

import random

import numpy as np
from PIL import Image

from michigan_tpu.data.transforms import _adjust_hue, color_jitter


def _img(rng, size=32):
    return Image.fromarray(
        rng.integers(0, 256, (size, size, 3), dtype=np.uint8), "RGB"
    )


def test_color_jitter_deterministic_given_rng():
    rng = np.random.default_rng(0)
    img = _img(rng)
    a = np.array(color_jitter(img, random.Random(7)))
    b = np.array(color_jitter(img, random.Random(7)))
    c = np.array(color_jitter(img, random.Random(8)))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_color_jitter_bounded_perturbation():
    """Factors are tight (0.1/0.01/0.01/0.01): the jitter must perturb, and
    only mildly — mean abs change well under the brightness bound's 25.5."""
    rng = np.random.default_rng(1)
    img = _img(rng, 64)
    arr = np.array(img, np.float32)
    for seed in range(5):
        out = np.array(color_jitter(img, random.Random(seed)), np.float32)
        d = np.abs(out - arr).mean()
        assert d < 26.0, f"jitter too strong: mean abs {d}"
    # at least one draw actually changes the image
    assert any(
        (np.array(color_jitter(img, random.Random(s))) != np.array(img)).any()
        for s in range(5)
    )


def test_adjust_hue_wraparound_and_identity():
    rng = np.random.default_rng(2)
    img = _img(rng)
    # factor 0 -> only the HSV<->RGB roundtrip's +-1 truncation remains
    # (torchvision's PIL adjust_hue converts unconditionally too)
    same = _adjust_hue(img, 0.0)
    d = np.abs(
        np.array(same.convert("HSV"))[..., 1:].astype(int)
        - np.array(img.convert("HSV"))[..., 1:].astype(int)
    )
    assert d.max() <= 1
    # +0.5 then -0.5 shifts wrap back to the identity hue channel
    h0 = np.array(img.convert("HSV"))[..., 0]
    h2 = np.array(
        _adjust_hue(_adjust_hue(img, 0.5), -0.5).convert("HSV")
    )[..., 0]
    # uint8 wrap of +-round(127.5) is exact mod 256 (128-128=0 offset... the
    # two shifts are +-128 -> net 0) up to HSV<->RGB roundtrip truncation
    assert np.abs(h0.astype(int) - h2.astype(int)).mean() < 3.0


def test_adjust_hue_moves_hue_channel_only():
    rng = np.random.default_rng(3)
    img = _img(rng)
    out = _adjust_hue(img, 0.25)
    a, b = np.array(img.convert("HSV")), np.array(out.convert("HSV"))
    # value channel is preserved exactly; hue genuinely moves
    np.testing.assert_array_equal(a[..., 2], b[..., 2])
    assert (a[..., 0] != b[..., 0]).mean() > 0.5


def test_soak_augment_rotation_keeps_orientation_consistent():
    """make_soak_dataset's rotation augmentation must rotate the dense
    orientation VALUES together with the pixels (encoding v in [0,255] ~
    angle in [0,pi), base_dataset.py:363-385).  A synthetic field of
    horizontal strands (angle 0) rotated by +30deg must read ~30deg inside
    the rotated mask."""
    import math

    from scripts.make_soak_dataset import _rotate_triple

    h = w = 64
    img = np.full((h, w, 3), 128, np.uint8)
    label = np.zeros((h, w), np.uint8)
    label[16:48, 16:48] = 1
    orient = np.zeros((h, w), np.uint8)
    # horizontal strands: angle 0 -> encode a small nonzero value so the
    # augmentation's support mask (orient>0 | label>0) is exercised both ways
    orient[label > 0] = 4  # ~2.8deg

    _, rlabel, rorient = _rotate_triple(img, label, orient, 30.0)
    inner = np.zeros_like(rlabel)
    inner[24:40, 24:40] = 1  # stay clear of nearest-neighbor edges
    m = (rlabel > 0) & (inner > 0)
    assert m.sum() > 50
    ang = rorient[m].astype(np.float64) / 255.0 * math.pi * 180.0 / math.pi
    expected = 4 / 255.0 * 180.0 + 30.0
    assert abs(np.median(ang) - expected) < 1.5

    # the synthetic orient support coincides with the label; both rotate
    # nearest-neighbor, so outside the rotated label the map stays zero
    assert (rorient[rlabel == 0] == 0).all()


def test_soak_augment_rotation_wraps_mod_pi():
    """Angle values wrap mod pi: 170deg-equivalent + 30deg -> ~20deg."""
    import math

    from scripts.make_soak_dataset import _rotate_triple

    h = w = 64
    img = np.full((h, w, 3), 128, np.uint8)
    label = np.ones((h, w), np.uint8)
    v170 = int(round(170.0 / 180.0 * 255.0))
    orient = np.full((h, w), v170, np.uint8)
    _, _, rorient = _rotate_triple(img, label, orient, 30.0)
    center = rorient[24:40, 24:40].astype(np.float64) / 255.0 * 180.0
    assert abs(np.median(center) - 20.0) < 1.5


def test_soak_augment2_scale_preserves_orientation_values():
    """Uniform zoom preserves local angles, so _scale_triple must leave the
    orientation VALUE SET untouched (only nearest-resampled)."""
    from scripts.make_soak_dataset import _scale_triple

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    label = (rng.random((64, 64)) > 0.5).astype(np.uint8)
    orient = rng.integers(0, 255, (64, 64), np.uint8)
    simg, slabel, sorient = _scale_triple(img, label, orient, 0.88)
    assert simg.shape == img.shape and sorient.shape == orient.shape
    assert set(np.unique(sorient)) <= set(np.unique(orient))
    # identity scale is a no-op
    i2, l2, o2 = _scale_triple(img, label, orient, 1.0)
    assert o2 is orient


def test_soak_augment2_heldout_rule():
    """The held-out split must be deterministic, nonempty, and leave the
    +15deg rotation entirely unseen by training."""
    from scripts.make_soak_dataset import (
        HUE_SHIFTS2, ROTATIONS2, SCALES2, _is_heldout,
    )

    grid = [(d, h, s) for d in ROTATIONS2 for s in SCALES2 for h in HUE_SHIFTS2]
    held = [g for g in grid if _is_heldout(*g)]
    train = [g for g in grid if not _is_heldout(*g)]
    assert len(held) == 12 and len(train) == 78  # per identity
    assert all(d != 15.0 for d, _h, _s in train)
    assert any(d == 15.0 for d, _h, _s in held)
