"""Numerical parity of michigan_tpu.ops against torch (CPU) oracles."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile tier; fast tier: -m 'not slow'
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


def test_bf16_norm_custom_vjp_matches_autodiff(rng):
    """The bf16 custom-VJP norms (HBM-traffic lever: bf16 residuals and
    cotangents, fp32 reductions) must match plain autodiff of the fp32
    formulation to bf16 precision, keep running stats identical to the fp32
    path, and produce identical gradients sharded (psum) vs unsharded."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    from michigan_tpu.ops import norms

    x = (rng.standard_normal((2, 16, 16, 8)) * 3 + 1).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(x.shape), jnp.bfloat16)

    def in_ref(t):
        xf = t.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2), keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=(1, 2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(t.dtype)

    def bn_ref(t):
        mean, var_b, _ = norms.batch_stats(t.astype(jnp.float32))
        inv = jax.lax.rsqrt(var_b + 1e-5)
        return (t - mean.astype(t.dtype)) * inv.astype(t.dtype)

    g_in = jax.grad(lambda t: jnp.sum(norms.instance_norm(t) * w).astype(jnp.float32))(xb)
    g_in_ref = jax.grad(lambda t: jnp.sum(in_ref(t) * w).astype(jnp.float32))(xb)
    np.testing.assert_allclose(
        np.float32(g_in), np.float32(g_in_ref), atol=3e-2
    )

    g_bn = jax.grad(
        lambda t: jnp.sum(norms.batch_norm_train(t, jnp.zeros(8), jnp.ones(8))[0] * w).astype(jnp.float32)
    )(xb)
    g_bn_ref = jax.grad(lambda t: jnp.sum(bn_ref(t) * w).astype(jnp.float32))(xb)
    np.testing.assert_allclose(
        np.float32(g_bn), np.float32(g_bn_ref), atol=3e-2
    )

    # running stats: bit-identical to the fp32 path (fp32 accumulation)
    _, m_b, v_b = norms.batch_norm_train(xb, jnp.zeros(8), jnp.ones(8))
    _, m_f, v_f = norms.batch_norm_train(
        jnp.asarray(np.float32(np.asarray(xb))), jnp.zeros(8), jnp.ones(8)
    )
    np.testing.assert_array_equal(np.float32(m_b), np.float32(m_f))
    np.testing.assert_array_equal(np.float32(v_b), np.float32(v_f))

    # sharded (psum over 8 virtual devices) == unsharded, gradients included
    mesh = Mesh(np.array(jax.devices()), ("data",))
    xs = jnp.asarray(rng.standard_normal((8, 8, 8, 4)), jnp.bfloat16)
    ws = jnp.asarray(rng.standard_normal(xs.shape), jnp.bfloat16)

    def sharded_loss(t):
        def f(tt, ww):
            y, _, _ = norms.batch_norm_train(
                tt, jnp.zeros(4), jnp.ones(4), axis_name="data"
            )
            return jax.lax.psum(jnp.sum((y * ww).astype(jnp.float32)), "data")

        return jax.shard_map(
            f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            check_vma=False,
        )(t, ws)

    def global_loss(t):
        y, _, _ = norms.batch_norm_train(t, jnp.zeros(4), jnp.ones(4))
        return jnp.sum((y * ws).astype(jnp.float32))

    np.testing.assert_array_equal(
        np.float32(jax.grad(sharded_loss)(xs)),
        np.float32(jax.grad(global_loss)(xs)),
    )


def test_separable_max_pool_exact(rng):
    """Large stride-1 max pools run as two separable 1-D passes on TPU (a
    53 ms profiled hotspot in the train step — ops/resize.py); the
    decomposition must be exactly the 2-D window for every kernel size and
    the torch output-size crop must be unchanged."""
    from michigan_tpu.ops.resize import max_pool_same

    for k in (2, 5, 7, 30, 47):
        for shape in ((2, 33, 41, 1), (1, 64, 64, 3)):
            x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            p = int(k / 2)
            ref = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, k, k, 1), (1, 1, 1, 1),
                ((0, 0), (p, p), (p, p), (0, 0)),
            )
            oh = (shape[1] + 2 * p - k) + 1
            ow = (shape[2] + 2 * p - k) + 1
            got = max_pool_same(x, k, 1)
            assert got.shape == ref[:, :oh, :ow, :].shape
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(ref[:, :oh, :ow, :])
            )


def test_filterbank_bf16_forward_close(rng):
    """The bf16-forward bank (training-loss path under --dtype bfloat16)
    stays close to fp32-HIGHEST in the quantities the loss consumes: the
    (sin,cos)*conf field and the tanh-squashed confidence.  Raw responses
    have positive/negative lobe cancellation, so element-level relative
    error is not the right gate; white noise is the worst case for argmax
    ties (real images tie far less)."""
    import jax.numpy as jnp

    from michigan_tpu.ops.filters import (
        cal_orientation_two_channel,
        orientation_response,
    )

    gray = (rng.standard_normal((1, 64, 64, 1)) * 40 + 128).astype(np.float32)
    idx32, _ = orientation_response(jnp.asarray(gray), "gabor")
    idx16, _ = orientation_response(jnp.asarray(gray), "gabor", fwd_bf16=True)
    mismatch = (np.asarray(idx16) != np.asarray(idx32)).mean()
    assert mismatch < 0.08, mismatch

    img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    t32, c32 = cal_orientation_two_channel(img, "gabor")
    t16, c16 = cal_orientation_two_channel(img, "gabor", fwd_bf16=True)
    rel = float(jnp.mean(jnp.abs(t32 - t16))) / float(jnp.mean(jnp.abs(t32)))
    assert rel < 0.03, rel
    assert float(jnp.mean(jnp.abs(c32 - c16))) < 1e-4
