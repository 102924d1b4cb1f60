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
