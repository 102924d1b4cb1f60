"""DemoEngine.edit end-to-end at tiny shapes: uint8 display contract,
compact-wire equivalence, per-phase timing fields (reference demo.py
edit loop, demo.py:310-413)."""

import numpy as np
import pytest
from PIL import Image

from michigan_tpu.config import Options

# two engine builds + four compiles: slow tier (fast tier covers the wire
# encode/decode math via test_u8_wire.py)
pytestmark = pytest.mark.slow

SRC = "datasets/FFHQ_demo"
IDENT = "67172"


def _demo_inputs():
    label = np.asarray(Image.open(f"{SRC}/labels/{IDENT}.png"))
    orient = np.asarray(Image.open(f"{SRC}/orients/{IDENT}_orient_dense.png"))
    img = Image.open(f"{SRC}/images/{IDENT}.jpg").convert("RGB")
    return label, orient, img


def _opt(**kw):
    return Options(
        isTrain=False, phase="test", serial_batches=True, no_flip=True,
        batchSize=1, netG="spadeb", use_encoder=True, noise_background=True,
        load_size=64, crop_size=64, ngf=8, name="demo_engine_test",
        checkpoints_dir="/nonexistent", which_epoch="latest", seed=0, **kw,
    ).finalize()


@pytest.fixture(scope="module")
def edit_args():
    label, orient, img = _demo_inputs()
    return dict(
        ref_label_path=f"{SRC}/labels/{IDENT}.png",
        tag_label=label, mask_orient=label, ref_orient=orient,
        ref_image=img, tag_image=img,
    )


def _run(opt, edit_args, compact):
    from michigan_tpu.demo.engine import DemoEngine

    engine = DemoEngine(opt, compact_wire=compact)
    img, orient_out, latency = engine.edit(**edit_args)
    assert img.dtype == np.uint8 and img.shape == (64, 64, 3)
    assert latency > 0
    t = engine.last_timings
    for k in ("host_prep_s", "h2d_submit_s", "device_compute_s",
              "d2h_decode_s", "total_s"):
        assert t[k] >= 0
    return img, orient_out, engine


def test_edit_compact_wire_matches_float_wire(edit_args):
    """The uint8 demo wire must reproduce the fp32 wire's edit result up to
    the documented <=2e-5 encode noise (a couple of display levels)."""
    opt = _opt()
    img_u8, _, engine = _run(opt, edit_args, compact=True)
    img_f32, _, _ = _run(opt, edit_args, compact=False)
    diff = np.abs(img_u8.astype(np.int32) - img_f32.astype(np.int32))
    assert diff.max() <= 2, f"wire divergence {diff.max()} levels"
    # second edit reuses the compiled program and the device-side noise
    img2, _, _lat = engine.edit(**edit_args), None, None
    np.testing.assert_array_equal(img2[0], img_u8)


def test_edit_returns_device_encoded_orient(edit_args):
    """With the IG tower on, orient_rgb comes back uint8-encoded from the
    device (the *255 truncation formerly done on host)."""
    opt = _opt(use_ig=True)
    img, orient_out, _ = _run(opt, edit_args, compact=True)
    assert orient_out is not None
    assert orient_out.dtype == np.uint8 and orient_out.shape == (64, 64, 3)


def test_prep_cache_memoizes_rarely_changing_planes(edit_args):
    """demo_inference_data(cache=...) must reuse the ref-label/image planes
    across edits (they change only when the user opens a new file) while
    still recomputing the per-edit mask planes."""
    from michigan_tpu.data.single import demo_inference_data

    opt = _opt()
    cache = {}
    kw = dict(edit_args)
    d1 = demo_inference_data(opt, noise=np.zeros((1,), np.float32),
                             cache=cache, **kw)
    d2 = demo_inference_data(opt, noise=np.zeros((1,), np.float32),
                             cache=cache, **kw)
    # identity: these came straight out of the memo
    assert d1["label_ref"] is d2["label_ref"]
    assert d1["image_ref"] is d2["image_ref"]
    assert d1["image_tag"] is d2["image_tag"]
    # a changed mask produces a fresh hole plane and identical cached planes
    m2 = kw["mask_orient"].copy()
    m2[: m2.shape[0] // 2] = 0
    d3 = demo_inference_data(opt, noise=np.zeros((1,), np.float32),
                             cache=cache, **{**kw, "mask_orient": m2})
    assert d3["image_ref"] is d1["image_ref"]
    assert not np.array_equal(d3["hole"], d1["hole"])
    # a NEW tag image object invalidates its entry (id keyed + strong ref)
    new_tag = kw["tag_image"].copy()
    d4 = demo_inference_data(opt, noise=np.zeros((1,), np.float32),
                             cache=cache, **{**kw, "tag_image": new_tag})
    assert d4["image_tag"] is not d1["image_tag"]
    np.testing.assert_allclose(d4["image_tag"], d1["image_tag"])
    # no-cache calls recompute everything
    d5 = demo_inference_data(opt, noise=np.zeros((1,), np.float32), **kw)
    assert d5["image_ref"] is not d1["image_ref"]
