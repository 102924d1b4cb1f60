"""The uint8 wire: loader emits raw bytes, programs decode bit-exactly.

Round-4 redesign of the training transfer path (dataset.py get_sample,
train.py device_batch, train_step._f32): the loader ships uint8 pixels
(no host float math), paired-stage ref planes are deduped off the wire,
and the RGB orient encoding can be recomputed in-program.  These tests pin
the bit-exactness claims each piece relies on.
"""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from michigan_tpu.config import Options
from michigan_tpu.data.dataset import CustomDataset
from michigan_tpu.data.transforms import get_params, get_transform

DATA = "datasets/FFHQ_demo"


def _opt(**kw):
    d = dict(isTrain=True, crop_size=64, load_size=72,
             data_dir="/nonexistent", batchSize=2, use_ig=True, seed=0)
    d.update(kw)
    return Options(**d).finalize()


def _ds(**kw):
    import os
    import shutil
    import tempfile

    root = tempfile.mkdtemp()
    for sub, src, suffix in [("train_images", "images", ""),
                             ("train_labels", "labels", ""),
                             ("train_dense_orients", "orients", "_orient_dense")]:
        os.makedirs(f"{root}/{sub}")
        for ident in ("59144", "60429", "67172"):
            ext = ".jpg" if sub == "train_images" else ".png"
            shutil.copyfile(f"{DATA}/{src}/{ident}{suffix}{ext}",
                            f"{root}/{sub}/{ident}{suffix}{ext}")
    return CustomDataset(_opt(data_dir=root, **kw))


def test_uint8_wire_contract():
    """Paired stage: uint8 planes, ref keys deduped off the wire."""
    ds = _ds()
    s = ds.get_sample(0, random.Random(7))
    for k in ("label_tag", "image_tag", "orient", "hole"):
        assert s[k].dtype == np.uint8, k
    assert "label_ref" not in s and "image_ref" not in s
    assert s["orient_rgb"].dtype == np.float32  # host-produced float plane


def test_unpaired_ships_ref_planes():
    ds = _ds()
    ds.step = 2
    s = ds.get_sample(0, random.Random(7))
    assert s["label_ref"].dtype == np.uint8
    assert s["image_ref"].dtype == np.uint8


def test_color_jitter_ships_ref_image():
    ds = _ds(color_jitter=True)
    s = ds.get_sample(0, random.Random(7))
    assert "image_ref" in s and "label_ref" not in s


def test_u8_image_decode_matches_float_transform():
    """decode(uint8 wire) == the old normalized float transform, bitwise."""
    from PIL import Image

    ds = _ds()
    opt = ds.opt
    img = Image.open(ds.image_paths[0]).convert("RGB")
    params = get_params(opt, img.size, random.Random(3))
    f32 = get_transform(opt, params)(img)
    u8 = get_transform(opt, params, as_uint8=True)(img)
    decoded = u8.astype(np.float32) / np.float32(127.5) - np.float32(1.0)
    assert (decoded == f32).all()


def test_device_orient_rgb_matches_host():
    """In-program orient_rgb recompute == host png path, bitwise."""
    ds_host = _ds()
    ds_dev = _ds(device_orient_rgb=True)
    r1, r2 = random.Random(11), random.Random(11)
    sh = ds_host.get_sample(1, r1)
    sd = ds_dev.get_sample(1, r2)
    assert "orient_rgb" not in sd

    # the exact device-side formula (train.py _orient_rgb), NHWC on one
    # sample; mirrors trans_orient_to_rgb -> uint8 quantize -> ToTensor
    o = jnp.asarray(sd["orient"][None]).astype(jnp.float32)
    m = jnp.asarray(sd["label_tag"][None]).astype(jnp.float32)
    t = o / 255.0 * np.pi
    rgb = jnp.concatenate([(jnp.cos(2 * t) + 1.0) * 0.5,
                           (jnp.sin(2 * t) + 1.0) * 0.5,
                           jnp.full_like(t, 0.5)], axis=-1) * m
    got = np.asarray(jnp.floor(rgb * 255.0) / 255.0 * m)[0]
    np.testing.assert_array_equal(got, sh["orient_rgb"])


def test_train_step_f32_decode():
    """_f32 turns the u8 wire into the exact float batch."""
    # decode logic is embedded in train_step._f32; easiest pin is the
    # identity used: u8 image -> v/127.5-1, others value-preserving
    v = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    img = jnp.asarray(np.repeat(v, 3, axis=-1))
    dec = img.astype(jnp.float32) / 127.5 - 1.0
    ref = (img.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(ref))


def test_no_ig_omits_dead_planes():
    """Without the IG tower nothing consumes hole/orient_rgb (model.py:
    every reader is behind opt.use_ig), so the wire must not ship them —
    they were 4 channels of zeros per sample (round-5 stage-2 wire fix)."""
    ds = _ds(use_ig=False)
    s = ds.get_sample(0, random.Random(7))
    assert "hole" not in s and "orient_rgb" not in s
    # unpaired stage: still omitted, ref planes present
    ds.step = 2
    s2 = ds.get_sample(0, random.Random(7))
    assert "hole" not in s2 and "orient_rgb" not in s2
    assert "label_ref" in s2 and "image_ref" in s2
