"""Smoke/behavior tests for the auxiliary component inventory."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from michigan_tpu.config import Options
from michigan_tpu.models.maskgan import (
    FeatureEncoder,
    LabelEncoder,
    StyleEncoder,
    adaptive_instance_norm,
    instance_wise_avg,
    LayerNorm2d,
)
from michigan_tpu.models.architecture import SPADEImageBlock
from michigan_tpu.utils.colormap import Colorize, labelcolormap


def test_instance_wise_avg_matches_loop(rng):
    feat = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    inst = rng.integers(0, 4, (2, 8, 8, 1)).astype(np.float32)
    out = np.asarray(instance_wise_avg(jnp.asarray(feat), jnp.asarray(inst), 8))
    # reference semantics: every (b, instance, channel) region -> its mean
    ref = feat.copy()
    for b in range(2):
        for i in np.unique(inst[b]):
            m = inst[b, :, :, 0] == i
            for c in range(3):
                ref[b, :, :, c][m] = feat[b, :, :, c][m].mean()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_feature_encoder_shapes(rng):
    fe = FeatureEncoder(input_nc=3, output_nc=3, ngf=8)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    inst = jnp.asarray(rng.integers(0, 3, (1, 64, 64, 1)).astype(np.float32))
    v = fe.init(jax.random.PRNGKey(0), x, inst)
    y = fe.apply(v, x, inst)
    assert y.shape == (1, 64, 64, 3)
    assert np.abs(np.asarray(y)).max() <= 1.0


def test_style_label_encoders(rng):
    key = jax.random.PRNGKey(1)
    le = LabelEncoder(n_downsample=4, dim=16)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 2)).astype(np.float32))
    v = le.init(key, x)
    fea, final = le.apply(v, x)
    assert fea.shape[-1] == 64 and final.shape[-1] == 64

    se = StyleEncoder(n_downsample=4, dim=16, style_dim=8)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    v = se.init(key, img, fea, final)
    style = se.apply(v, img, fea, final)
    assert style.shape == (1, 1, 1, 8)


def test_adain_and_layernorm(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    y = adaptive_instance_norm(x, jnp.ones(4) * 2, jnp.ones(4))
    assert np.isfinite(np.asarray(y)).all()
    ln = LayerNorm2d(4)
    v = ln.init(jax.random.PRNGKey(0), x)
    z = np.asarray(ln.apply(v, x))
    assert np.isfinite(z).all()


def test_spade_image_block(rng):
    opt = Options(isTrain=False, ngf=8, norm_G="spectralspadeinstance3x3").finalize()
    blk = SPADEImageBlock(fin=16, fout=8, opt=opt, downsample_n=1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    img = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x, img)
    y = blk.apply(v, x, img)
    assert y.shape == (1, 8, 8, 8)


def test_labelcolormap():
    cm = labelcolormap(4)
    assert cm.shape == (4, 3)
    assert len({tuple(c) for c in cm}) == 4  # distinct colors
    cm35 = labelcolormap(35)
    assert cm35.shape == (35, 3)
    col = Colorize(4)
    lab = np.array([[0, 1], [2, 3]])
    rgb = col(lab)
    assert rgb.shape == (2, 2, 3)
    np.testing.assert_array_equal(rgb[0, 0], cm[0])


def test_filelist_cache(tmp_path, rng):
    from michigan_tpu.data.dataset import list_images

    d = tmp_path / "imgs"
    d.mkdir()
    for n in ["a.jpg", "b.png"]:
        (d / n).write_bytes(b"x")
    first = list_images(str(d), cache_write=True)
    assert len(first) == 2
    (d / "c.jpg").write_bytes(b"x")
    cached = list_images(str(d), cache_read=True)
    assert cached == first  # served from files.list
    fresh = list_images(str(d))
    assert len(fresh) == 3


def test_cal_orientation_bulk_mode(tmp_path, rng):
    """cal_orientation.py --image_dir processes every image, matches masks
    by basename, and skips images without a mask."""
    from PIL import Image

    import cal_orientation

    imgs = tmp_path / "images"
    masks = tmp_path / "labels"
    out = tmp_path / "orients"
    imgs.mkdir(); masks.mkdir()
    for stem in ("aa", "bb"):
        Image.fromarray(
            rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        ).save(imgs / f"{stem}.jpg")
    mask = np.zeros((48, 48), np.uint8)
    mask[8:40, 8:40] = 255
    Image.fromarray(mask).save(masks / "aa.png")  # bb has no mask

    cal_orientation.main([
        "--image_dir", str(imgs), "--hairmask_dir", str(masks),
        "--orientation_root", str(out),
    ])
    assert sorted(p.name for p in out.iterdir()) == ["aa.png"]
    o = np.array(Image.open(out / "aa.png"))
    assert o.shape == (48, 48) and o.dtype == np.uint8
    assert (o[mask == 0] == 0).all()  # orientation only inside the mask

    # single-image mode unchanged
    cal_orientation.main([
        "--image_path", str(imgs / "bb.jpg"),
        "--hairmask_path", str(masks / "aa.png"),
        "--orientation_root", str(out),
    ])
    assert (out / "bb.png").exists()


def test_init_variables_with_degenerate_instance_placeholder(rng):
    """--use_instance_feat init must tolerate the (N,) instance placeholder
    that --no_instance pipelines carry (single.py returns
    np.zeros((1,), f32)); flushed by the round-5 flag-matrix inference run
    on the real chip."""
    from michigan_tpu.config import Options
    from michigan_tpu.model import MichiGANModel

    opt = Options(
        isTrain=False, crop_size=64, load_size=64, ngf=8,
        num_upsampling_layers="normal", use_encoder=True,
        use_instance_feat=True, batchSize=1,
    ).finalize()
    model = MichiGANModel(opt)
    s = 64
    batch = {
        "label_ref": jnp.zeros((1, s, s, 1)),
        "label_tag": jnp.zeros((1, s, s, 1)),
        "image_ref": jnp.zeros((1, s, s, 3)),
        "image_tag": jnp.zeros((1, s, s, 3)),
        "orient": jnp.zeros((1, s, s, 1)),
        "hole": jnp.zeros((1, s, s, 1)),
        "orient_rgb": jnp.zeros((1, s, s, 3)),
        "noise": jnp.zeros((1, s, s, 3)),
        "instance": jnp.zeros((1,)),  # the degenerate placeholder
    }
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    assert "netFE" in variables
