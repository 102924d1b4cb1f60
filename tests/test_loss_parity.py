"""Loss-function parity vs the reference loss.py on CPU torch.

The reference hardcodes .cuda() in several loss paths; tests monkeypatch
Tensor.cuda to identity so the same math runs on CPU.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from michigan_tpu.config import Options
from michigan_tpu import losses as L
from tests.reference_oracle import import_reference, torch_opt

# make reference importable + neuter .cuda()
import_reference()
torch.Tensor.cuda = lambda self, *a, **k: self  # noqa: E731
torch.nn.Module.cuda = lambda self, *a, **k: self  # noqa: E731

from models.networks import loss as ref_loss  # noqa: E402


def nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def topt(**kw):
    o = Options(isTrain=True, ngf=8, ndf=8, crop_size=64, load_size=64, **kw).finalize()
    return o, torch_opt(o)


@pytest.mark.parametrize("mode,remove_bg,wide_edge", [
    ("hinge", False, 1.0),
    ("hinge", False, 3.0),
    ("hinge", True, 1.0),
    ("ls", False, 1.0),
    ("original", False, 1.0),
    ("w", False, 1.0),
])
def test_gan_loss_parity(rng, mode, remove_bg, wide_edge):
    opt, t = topt(gan_mode=mode, remove_background=remove_bg, wide_edge=wide_edge)
    crit = ref_loss.GANLoss(mode, tensor=torch.FloatTensor, opt=t)
    pred = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    label = (rng.uniform(size=(2, 64, 64, 1)) > 0.5).astype(np.float32)
    preds = [[nchw(pred)], [nchw(pred * 0.5)]]

    for target_real in (True, False):
        for for_d in ((True, False) if mode != "w" else (True,)):
            if mode in ("hinge",) and not for_d and not target_real:
                continue
            ref = crit(preds, target_real, for_d, label=nchw(label))
            ours = L.multiscale_gan_loss(
                [[jnp.asarray(pred)], [jnp.asarray(pred * 0.5)]],
                target_real, for_d, opt, jnp.asarray(label),
            )
            np.testing.assert_allclose(
                float(np.mean(ref.detach().numpy())), float(ours), rtol=1e-4, atol=1e-5
            )


@pytest.mark.parametrize("remove_bg", [False, True])
def test_gan_feat_loss_parity(rng, remove_bg):
    opt, t = topt(remove_background=remove_bg, lambda_feat=2.0)
    t.gpu_ids = []
    crit = ref_loss.GANFeatLoss(opt=t)
    label = (rng.uniform(size=(1, 64, 64, 1)) > 0.5).astype(np.float32)
    fake, real, fake_j, real_j = [], [], [], []
    for d in range(2):
        fs, rs, fsj, rsj = [], [], [], []
        for j, ch in enumerate([4, 8, 1]):
            s = 16 // (j + 1)
            f = rng.standard_normal((1, s, s, ch)).astype(np.float32)
            r = rng.standard_normal((1, s, s, ch)).astype(np.float32)
            fs.append(nchw(f)); rs.append(nchw(r))
            fsj.append(jnp.asarray(f)); rsj.append(jnp.asarray(r))
        fake.append(fs); real.append(rs); fake_j.append(fsj); real_j.append(rsj)
    ref = crit(fake, real, nchw(label))
    ours = L.gan_feat_loss(fake_j, real_j, opt, jnp.asarray(label))
    np.testing.assert_allclose(float(ref), float(ours), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("use_ig,filt", [(False, "gabor"), (True, "gabor"), (True, "dog")])
def test_orient_loss_parity(rng, use_ig, filt):
    opt, t = topt(use_ig=use_ig, orient_filter=filt)
    crit = ref_loss.L1OLoss(t)
    crit.Tensor = torch.FloatTensor
    fake = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    onehot = np.stack(
        [rng.integers(0, 2, (1, 64, 64))] * 1, -1
    ).astype(np.float32)
    input_tag = np.concatenate([1 - onehot, onehot], axis=-1)
    if use_ig:
        orient = rng.uniform(-1, 1, (1, 64, 64, 2)).astype(np.float32)
    else:
        orient = rng.uniform(0, 255, (1, 64, 64, 1)).astype(np.float32)

    if filt == "dog":
        # the reference's DoG branch (loss.py:342-343) subtracts a bool
        # tensor, which torch>=1.5 rejects — it cannot run as-is; emulate
        # its intended math with the reference's own DoG_fn kernels
        import math as _math
        import torch.nn.functional as F

        img255 = (nchw(fake) + 1) / 2 * 255
        gray = (0.299 * img255[:, 0] + 0.587 * img255[:, 1] + 0.144 * img255[:, 2]).unsqueeze(1)
        res = []
        for i in range(32):
            theta = torch.ones(1) * (_math.pi * i / 32)
            k = ref_loss.DoG_fn(17, 1, 1, theta).float()
            res.append(F.conv2d(gray, k, stride=1, padding=8))
        res = torch.cat(res, dim=1)
        res[res < 0] = 0
        hair_t = nchw(input_tag)[:, 1:2]
        idx = torch.argmax(res, dim=1).float()
        conf = torch.max(res, dim=1)[0].unsqueeze(1) * hair_t
        conf = conf / torch.max(conf)
        th = idx * _math.pi / 32
        two = torch.cat([torch.sin(2 * th).unsqueeze(1),
                         torch.cos(2 * th).unsqueeze(1)], dim=1) * conf
        o_fake = two * hair_t
        if use_ig:
            o_lab = nchw(orient) * hair_t
        else:
            t2 = nchw(orient) / 255 * _math.pi
            o_lab = torch.cat([torch.sin(2 * t2), torch.cos(2 * t2)], 1) * hair_t
        ref_o = (o_fake - o_lab).abs().mean()
        conf_m = conf * hair_t
        ref_c = (conf_m - hair_t).abs().sum() / (hair_t.sum() + 1e-5)
    else:
        ref_o, ref_c = crit(nchw(fake), nchw(orient), nchw(input_tag))
    ours_o, ours_c = L.orient_loss(
        jnp.asarray(fake), jnp.asarray(orient), jnp.asarray(input_tag), opt
    )
    np.testing.assert_allclose(float(ref_o), float(ours_o), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(ref_c), float(ours_c), rtol=1e-3, atol=1e-4)


def test_rgb_background_loss_parity(rng):
    crit = ref_loss.RGBBackgroundL1Loss()
    fake = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    tag = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    hair = rng.integers(0, 2, (2, 32, 32, 1)).astype(np.float32)
    onehot = np.concatenate([1 - hair, hair], axis=-1)
    ref = crit(nchw(fake), nchw(onehot), nchw(tag))
    ours = L.rgb_background_l1_loss(
        jnp.asarray(fake), jnp.asarray(onehot), jnp.asarray(tag)
    )
    np.testing.assert_allclose(float(ref), float(ours), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("balance", [False, True])
def test_lab_color_loss_parity(rng, balance):
    opt, t = topt(balance_Lab=balance, weight_dir="data_assets/ab_count.npy")
    crit = ref_loss.LabColorLoss(t)
    crit.FloatTensor = torch.FloatTensor
    fake = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    real = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    mask = (rng.uniform(size=(1, 32, 32, 1)) > 0.5).astype(np.float32)
    ab = L.color.load_ab_count("data_assets/ab_count.npy") if balance else None

    # the reference xyz2lab uses `output[1 - mask]` boolean indexing that
    # modern torch rejects; emulate its intended math in torch
    def ref_lab(x):
        xyz = crit.rgb2xyz(x)
        f = torch.where(
            xyz > 0.008856, xyz.clamp(min=1e-20) ** (1 / 3), 7.787 * xyz + 0.137931
        )
        ymask = xyz[:, 1] > 0.008856
        l = torch.where(ymask, 116 * f[:, 1] - 16, 903.3 * xyz[:, 1])
        a = 500 * (f[:, 0] - f[:, 1])
        b = 200 * (f[:, 1] - f[:, 2])
        return torch.stack([l, a, b], dim=1)

    fake_lab = ref_lab((nchw(fake) + 1) / 2)
    real_lab = ref_lab((nchw(real) + 1) / 2)
    if balance:
        wm = crit.cal_weight(real_lab, nchw(mask))
        diff = (fake_lab[:, 1:] - real_lab[:, 1:]).abs()
        ref = (wm * diff).mean()
    else:
        ref = (fake_lab[:, 1:] - real_lab[:, 1:]).abs().mean()

    ours = L.lab_color_loss(
        jnp.asarray(fake), jnp.asarray(real), opt, jnp.asarray(mask), ab
    )
    np.testing.assert_allclose(float(ref), float(ours), rtol=1e-3, atol=1e-3)


def test_hair_avg_lab_parity(rng):
    opt, t = topt()
    crit = ref_loss.HairAvgLabLoss(t)
    fake = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    real = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    mf = (rng.uniform(size=(2, 32, 32, 1)) > 0.5).astype(np.float32)
    mr = (rng.uniform(size=(2, 32, 32, 1)) > 0.5).astype(np.float32)

    def ref_lab(x):
        xyz = crit.rgb2xyz(x)
        f = torch.where(
            xyz > 0.008856, xyz.clamp(min=1e-20) ** (1 / 3), 7.787 * xyz + 0.137931
        )
        ymask = xyz[:, 1] > 0.008856
        l = torch.where(ymask, 116 * f[:, 1] - 16, 903.3 * xyz[:, 1])
        a = 500 * (f[:, 0] - f[:, 1])
        b = 200 * (f[:, 1] - f[:, 2])
        return torch.stack([l, a, b], dim=1)

    fa = crit.cal_hair_avg(ref_lab((nchw(fake) + 1) / 2), nchw(mf))
    ra = crit.cal_hair_avg(ref_lab((nchw(real) + 1) / 2), nchw(mr))
    ref = (fa[:, 1:] - ra[:, 1:]).abs().mean()
    ours = L.hair_avg_lab_loss(
        jnp.asarray(fake), jnp.asarray(real), jnp.asarray(mf), jnp.asarray(mr), opt
    )
    np.testing.assert_allclose(float(ref), float(ours), rtol=1e-3, atol=1e-4)


def test_style_content_masked_stats_parity(rng):
    """calc_mean_std / calc_mean_std_mask already covered in ops tests; here
    check the unmasked style/content composition vs reference formulas using
    an identity 'vgg' (feature passthrough)."""
    opt, t = topt(remove_background=False)
    fake = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    style = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    content = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    vgg_apply = lambda x: [x]  # single-slice passthrough

    lc, ls = L.style_content_loss(vgg_apply, jnp.asarray(fake),
                                  jnp.asarray(style), jnp.asarray(content), opt)
    # reference math
    mse = torch.nn.MSELoss()
    f_t, s_t, c_t = nchw(fake), nchw(style), nchw(content)
    ref_c = mse(f_t, c_t)
    sm, ss = ref_loss.calc_mean_std(s_t)
    fm, fs = ref_loss.calc_mean_std(f_t)
    ref_s = mse(sm, fm) + mse(ss, fs)
    np.testing.assert_allclose(float(ref_c), float(lc), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(ref_s), float(ls), rtol=1e-4, atol=1e-5)


def test_lab_loss_grad_finite_at_black_pixels(rng):
    """Regression for the round-4 soak NaN: cbrt's derivative is inf at 0,
    and jnp.where backprops inf*0 = NaN through the unselected branch when
    a fake-image pixel saturates to exactly -1 (xyz = 0).  The reference's
    masked index-assignment (loss.py:439-444) only differentiates selected
    elements, so parity requires finite gradients here."""
    opt = Options(isTrain=True).finalize()
    fake = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    fake = fake.at[0, :4, :4, :].set(-1.0)  # saturated black patch
    real = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    mask = jnp.ones((1, 16, 16, 1), np.float32)

    g = jax.grad(
        lambda f: L.lab_color_loss(f, real, opt, mask, None)
    )(fake)
    assert np.isfinite(np.asarray(g)).all()
