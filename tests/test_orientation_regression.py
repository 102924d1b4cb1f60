"""Golden regression: dense orientation on a fixed crop of sample 67172
must stay bit-stable across refactors (fixture from round 1)."""

import numpy as np
from PIL import Image

import jax.numpy as jnp

from michigan_tpu.ops.filters import dense_orientation

FIXTURE = "tests/fixtures_orientation_67172.npz"


def test_dense_orientation_golden():
    img = np.asarray(
        Image.open("datasets/FFHQ_single/val_images/67172.jpg").convert("RGB"),
        np.float32,
    ) / 255.0
    crop = img[128:192, 224:288]
    x = crop * 2 - 1
    fake = (x + 1) / 2 * 255
    gray = 0.299 * fake[..., 0] + 0.587 * fake[..., 1] + 0.144 * fake[..., 2]
    idx, conf = dense_orientation(jnp.asarray(gray[None, ..., None]), mode="dog")
    gold = np.load(FIXTURE)
    idx = np.asarray(idx)[0, ..., 0]
    conf = np.asarray(conf)[0, ..., 0]
    # argmax indices: allow isolated flips at near-tied responses
    assert (idx.astype(np.uint8) != gold["idx"]).mean() < 0.01
    np.testing.assert_allclose(conf, gold["conf"], rtol=1e-3, atol=1e-2)
