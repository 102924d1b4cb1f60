"""Numerical parity of michigan_tpu.ops against torch (CPU) oracles."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from michigan_tpu.ops import resize as R
from michigan_tpu.ops import color as C
from michigan_tpu.ops import filters as FB
from michigan_tpu.ops import masks as M
from michigan_tpu.ops import norms as NRM
from michigan_tpu.ops import stats as ST


def nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


def nhwc(t_nchw):
    return np.moveaxis(t_nchw.detach().numpy(), 1, -1)


@pytest.mark.parametrize("size", [(16, 16), (9, 9), (33, 17), (64, 64)])
def test_resize_nearest(rng, size):
    x = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    ours = np.asarray(R.resize_nearest(jnp.asarray(x), size))
    ref = nhwc(F.interpolate(nchw(x), size=size, mode="nearest"))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


@pytest.mark.parametrize("ac", [False, True])
@pytest.mark.parametrize("size", [(48, 48), (9, 9), (100, 50)])
def test_resize_bilinear(rng, ac, size):
    x = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    ours = np.asarray(R.resize_bilinear(jnp.asarray(x), size, align_corners=ac))
    ref = nhwc(F.interpolate(nchw(x), size=size, mode="bilinear", align_corners=ac))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [3, 5, 30])
def test_max_pool_same(rng, k):
    x = rng.standard_normal((1, 32, 32, 2)).astype(np.float32)
    ours = np.asarray(R.max_pool_same(jnp.asarray(x), k, 1, int(k / 2)))
    ref = nhwc(F.max_pool2d(nchw(x), kernel_size=k, stride=1, padding=int(k / 2)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=0)


def test_avg_pool_3x3s2(rng):
    x = rng.standard_normal((2, 33, 33, 3)).astype(np.float32)
    ours = np.asarray(R.avg_pool_3x3s2(jnp.asarray(x)))
    ref = nhwc(
        F.avg_pool2d(nchw(x), kernel_size=3, stride=2, padding=1, count_include_pad=False)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_upsample2x(rng):
    x = rng.standard_normal((2, 7, 5, 3)).astype(np.float32)
    ours = np.asarray(R.upsample2x_nearest(jnp.asarray(x)))
    ref = nhwc(F.interpolate(nchw(x), scale_factor=2, mode="nearest"))
    np.testing.assert_allclose(ours, ref, atol=0)


def test_grid_sample_nearest(rng):
    w = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    grid = rng.uniform(-1, 1, size=(2, 8, 8, 2)).astype(np.float32)
    ours = np.asarray(R.grid_sample_nearest(jnp.asarray(w), jnp.asarray(grid)))
    ref = nhwc(
        F.grid_sample(nchw(w), torch.from_numpy(grid), mode="nearest", align_corners=False)
    )
    np.testing.assert_allclose(ours, ref, atol=0)


def test_rgb_to_lab(rng):
    """Against the reference's rgb2xyz/xyz2lab math re-expressed in torch."""
    rgb = rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(C.rgb_to_lab(jnp.asarray(rgb)))

    M_t = torch.tensor(
        [[0.412453, 0.357580, 0.180423],
         [0.212671, 0.715160, 0.072169],
         [0.019334, 0.119193, 0.950227]]
    )
    inp = nchw(rgb)
    Mb = M_t.unsqueeze(0).repeat(inp.size(0), 1, 1)
    xyz = torch.einsum("bnc,bchw->bnhw", Mb, inp)
    xyz = xyz / Mb.sum(dim=2, keepdim=True).unsqueeze(3)
    f = torch.where(xyz > 0.008856, xyz.clamp(min=1e-20) ** (1 / 3), 7.787 * xyz + 0.137931)
    ymask = xyz[:, 1] > 0.008856
    L = torch.where(ymask, 116 * f[:, 1] - 16, 903.3 * xyz[:, 1])
    a = 500 * (f[:, 0] - f[:, 1])
    b = 200 * (f[:, 1] - f[:, 2])
    ref = nhwc(torch.stack([L, a, b], dim=1))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["gabor", "dog"])
def test_filter_bank_kernels(mode):
    """Kernels match the reference constructors (loss.py:215-271) bit-for-bit."""
    theta_fn = {
        "gabor": lambda x, y, t: np.exp(-0.5 * (((x * np.cos(t) + y * np.sin(t)) ** 2) / 4.0
                                                + ((-x * np.sin(t) + y * np.cos(t)) ** 2) / 9.0))
        * np.cos(2 * math.pi / 4.0 * (x * np.cos(t) + y * np.sin(t))),
    }
    bank = FB.gabor_bank() if mode == "gabor" else FB.dog_bank()
    bank = np.asarray(bank)

    # torch oracle (CPU re-expression of gabor_fn/DoG_fn)
    ks, n = 17, 32
    r = ks // 2
    coords = torch.arange(-r, r + 1).float()
    x = coords.view(-1, 1).repeat(1, ks)
    y = coords.view(1, -1).repeat(ks, 1)
    for i in range(n):
        t = torch.tensor(math.pi * i / n)
        xt = x * torch.cos(t) + y * torch.sin(t)
        yt = -x * torch.sin(t) + y * torch.cos(t)
        if mode == "gabor":
            k = torch.exp(-0.5 * (xt**2 / 4.0 + yt**2 / 9.0)) * torch.cos(
                2 * math.pi / 4.0 * xt
            )
        else:
            k = (
                torch.exp(-0.5 * (xt**2 / 1.0 + yt**2 / 4.0)) / 1.0
                - torch.exp(-0.5 * (xt**2 / 4.0 + yt**2 / 4.0)) / 2.0
            ) / (1.0 / 1.0 - 1.0 / 2.0)
        np.testing.assert_allclose(bank[:, :, 0, i], k.numpy(), rtol=1e-5, atol=1e-6)


def test_orientation_response_matches_looped_conv(rng):
    """Batched 32-channel conv == 32 sequential F.conv2d calls + argmax."""
    img = rng.standard_normal((1, 40, 40, 1)).astype(np.float32) * 10
    bank = np.asarray(FB.gabor_bank())
    res_t = []
    for i in range(32):
        kern = torch.from_numpy(bank[:, :, 0, i]).view(1, 1, 17, 17)
        res_t.append(F.conv2d(nchw(img), kern, stride=1, padding=8))
    res_t = torch.cat(res_t, dim=1)
    res_t[res_t < 0] = 0
    idx_ref = torch.argmax(res_t, dim=1).numpy()
    conf_ref = torch.max(res_t, dim=1)[0].numpy()

    idx, conf = FB.orientation_response(jnp.asarray(img), "gabor")
    np.testing.assert_allclose(np.asarray(conf), conf_ref, rtol=1e-4, atol=1e-3)
    # argmax may differ only where responses tie within float tolerance
    mismatch = (np.asarray(idx) != idx_ref).mean()
    assert mismatch < 1e-3


@pytest.mark.parametrize("mode", ["gabor", "dog"])
@pytest.mark.parametrize("shape", [(2, 64, 64, 1), (1, 37, 51, 1)])
def test_filter_bank_s2d_equals_direct(rng, mode, shape):
    """The MXU-shaped space-to-depth conv is the exact same map as the
    direct C_in=1 17x17 conv (filters.py filter_bank_conv_s2d) — identical
    up to fp32 reassociation, including at non-block-divisible sizes."""
    g = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    bank = FB.gabor_bank() if mode == "gabor" else FB.dog_bank()
    direct = np.asarray(FB.filter_bank_conv_direct(g, bank))
    s2d = np.asarray(FB.filter_bank_conv_s2d(g, mode))
    np.testing.assert_allclose(s2d, direct, rtol=1e-4, atol=2e-2)
    # gradients flow through the same transpose map; the s2d backward is
    # deliberately bf16 (cotangent quantization ~0.4% rel, fp32 MXU
    # accumulation — filters.py _fb_s2d_bwd), so compare at bf16 tolerance
    # scaled to the gradient's magnitude
    gd = np.asarray(
        jax.grad(lambda x: jnp.sum(FB.filter_bank_conv_direct(x, bank) ** 2))(g)
    )
    gs = np.asarray(
        jax.grad(lambda x: jnp.sum(FB.filter_bank_conv_s2d(x, mode) ** 2))(g)
    )
    np.testing.assert_allclose(
        gs, gd, rtol=1e-2, atol=1e-2 * np.abs(gd).max()
    )


def test_instance_norm(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(NRM.instance_norm(jnp.asarray(x)))
    ref = nhwc(F.instance_norm(nchw(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_batch_norm_train_and_eval(rng):
    x = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    rm = np.zeros(3, np.float32)
    rv = np.ones(3, np.float32)
    y, nm, nv = NRM.batch_norm_train(jnp.asarray(x), jnp.asarray(rm), jnp.asarray(rv))

    bn = torch.nn.BatchNorm2d(3, affine=False, momentum=0.1)
    bn.train()
    ref = nhwc(bn(nchw(x)))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nm), bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nv), bn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    bn.eval()
    ref_eval = nhwc(bn(nchw(x)))
    ours_eval = np.asarray(
        NRM.batch_norm_eval(jnp.asarray(x), jnp.asarray(nm), jnp.asarray(nv))
    )
    np.testing.assert_allclose(ours_eval, ref_eval, rtol=1e-4, atol=1e-5)


def test_spectral_normalize_matches_torch(rng):
    w = rng.standard_normal((6, 15)).astype(np.float32)
    lin = torch.nn.Linear(15, 6, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
    sn = torch.nn.utils.spectral_norm(lin)
    u0 = sn.weight_u.detach().numpy().copy()
    v0 = sn.weight_v.detach().numpy().copy()
    # one training forward: power iteration updates u,v then normalizes
    sn.train()
    sn(torch.zeros(1, 15))  # triggers the pre-hook that recomputes weight
    out_w = (sn.weight).detach().numpy().copy()

    sigma, u1, v1 = NRM.spectral_normalize(
        jnp.asarray(w), jnp.asarray(u0), jnp.asarray(v0), update=True
    )
    np.testing.assert_allclose(np.asarray(w) / np.asarray(sigma), out_w, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u1), sn.weight_u.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_masked_mean_std(rng):
    feat = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    mask = (rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32)
    mean, std = ST.masked_mean_std(jnp.asarray(feat), jnp.asarray(mask))

    # reference calc_mean_std_mask (loss.py:634-654)
    f_t, m_t = nchw(feat), nchw(mask)
    N, Ch = 2, 5
    m1 = m_t.view(N, 1, -1)
    f1 = f_t.view(N, Ch, -1) * m1
    fm = (f1.sum(dim=2) / (m1.sum(dim=2) + 1e-5)).view(N, Ch, 1)
    fv = (((f1 - fm) * m1) ** 2).sum(dim=2) / (m1.sum(dim=2) + 1e-5) + 1e-5
    np.testing.assert_allclose(
        np.asarray(mean)[:, 0, 0, :], fm[:, :, 0].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(std)[:, 0, 0, :], fv.sqrt().numpy(), rtol=1e-4, atol=1e-5
    )


def test_wide_edges(rng):
    mask = (rng.uniform(size=(1, 64, 64, 1)) > 0.7).astype(np.float32)
    ours = np.asarray(M.wide_edges(jnp.asarray(mask), th=0.06))
    t = nchw(mask)
    k = max(1, int(64 * 0.06))
    p = int(k / 2)
    out = F.max_pool2d(t, k, 1, p)
    out2 = 1 - F.max_pool2d(1 - t, k, 1, p)
    edges = F.interpolate(out - out2, size=(64, 64), mode="nearest")
    np.testing.assert_allclose(ours, nhwc(edges), atol=0)


def test_instance_edges(rng):
    inst = rng.integers(0, 3, size=(1, 10, 10, 1)).astype(np.float32)
    ours = np.asarray(M.instance_edges(jnp.asarray(inst)))
    t = nchw(inst)
    edge = torch.zeros_like(t, dtype=torch.bool)
    edge[:, :, :, 1:] |= t[:, :, :, 1:] != t[:, :, :, :-1]
    edge[:, :, :, :-1] |= t[:, :, :, 1:] != t[:, :, :, :-1]
    edge[:, :, 1:, :] |= t[:, :, 1:, :] != t[:, :, :-1, :]
    edge[:, :, :-1, :] |= t[:, :, 1:, :] != t[:, :, :-1, :]
    np.testing.assert_allclose(ours, nhwc(edge.float()), atol=0)
