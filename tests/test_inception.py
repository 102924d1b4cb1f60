"""InceptionV3 FID extractor: torch conversion parity, npz roundtrip,
auto-discovery, and the random-backbone fallback (mirrors the VGG19 story
in test_vgg_weights.py; reference FID gate in BASELINE.md).

torchvision is not installed here, so the oracle replays torchvision's
inception_v3 forward by hand with torch.nn.functional against a random
state_dict that uses the exact torchvision key names — the same contract
real released weights will arrive with.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from michigan_tpu.models.inception import (
    FEATURE_DIM,
    INCEPTION_SPEC,
    find_inception_weights,
    inception_features,
    init_inception_params,
    load_inception_params,
    save_inception_npz,
)
from michigan_tpu.training.convert import convert_inception_v3


def _fake_torch_state(seed=0):
    g = torch.Generator().manual_seed(seed)
    state = {}
    for name, (i, o, (kh, kw), _s, _p) in INCEPTION_SPEC.items():
        state[f"{name}.conv.weight"] = torch.randn(o, i, kh, kw, generator=g) * 0.1
        state[f"{name}.bn.weight"] = torch.randn(o, generator=g) * 0.1 + 1.0
        state[f"{name}.bn.bias"] = torch.randn(o, generator=g) * 0.1
        state[f"{name}.bn.running_mean"] = torch.randn(o, generator=g) * 0.1
        state[f"{name}.bn.running_var"] = torch.rand(o, generator=g) * 0.5 + 0.5
    return state


def _torch_inception_pool3(state, x):
    """torchvision inception_v3 forward (aux head skipped) in raw F.* calls."""

    def bc(name, h):
        _i, _o, _k, (sh, sw), (ph, pw) = INCEPTION_SPEC[name]
        h = F.conv2d(h, state[f"{name}.conv.weight"], None, (sh, sw), (ph, pw))
        h = F.batch_norm(
            h, state[f"{name}.bn.running_mean"], state[f"{name}.bn.running_var"],
            state[f"{name}.bn.weight"], state[f"{name}.bn.bias"],
            training=False, eps=1e-3,
        )
        return F.relu(h)

    def avg3(h):
        return F.avg_pool2d(h, 3, stride=1, padding=1)  # count_include_pad=True

    def inc_a(pre, h):
        b1 = bc(f"{pre}.branch1x1", h)
        b5 = bc(f"{pre}.branch5x5_2", bc(f"{pre}.branch5x5_1", h))
        b3 = bc(f"{pre}.branch3x3dbl_3",
                bc(f"{pre}.branch3x3dbl_2", bc(f"{pre}.branch3x3dbl_1", h)))
        bp = bc(f"{pre}.branch_pool", avg3(h))
        return torch.cat([b1, b5, b3, bp], 1)

    def inc_c(pre, h):
        b1 = bc(f"{pre}.branch1x1", h)
        b7 = bc(f"{pre}.branch7x7_3",
                bc(f"{pre}.branch7x7_2", bc(f"{pre}.branch7x7_1", h)))
        bd = h
        for i in range(1, 6):
            bd = bc(f"{pre}.branch7x7dbl_{i}", bd)
        bp = bc(f"{pre}.branch_pool", avg3(h))
        return torch.cat([b1, b7, bd, bp], 1)

    def inc_e(pre, h):
        b1 = bc(f"{pre}.branch1x1", h)
        b3 = bc(f"{pre}.branch3x3_1", h)
        b3 = torch.cat([bc(f"{pre}.branch3x3_2a", b3),
                        bc(f"{pre}.branch3x3_2b", b3)], 1)
        bd = bc(f"{pre}.branch3x3dbl_2", bc(f"{pre}.branch3x3dbl_1", h))
        bd = torch.cat([bc(f"{pre}.branch3x3dbl_3a", bd),
                        bc(f"{pre}.branch3x3dbl_3b", bd)], 1)
        bp = bc(f"{pre}.branch_pool", avg3(h))
        return torch.cat([b1, b3, bd, bp], 1)

    h = bc("Conv2d_1a_3x3", x)
    h = bc("Conv2d_2a_3x3", h)
    h = bc("Conv2d_2b_3x3", h)
    h = F.max_pool2d(h, 3, 2)
    h = bc("Conv2d_3b_1x1", h)
    h = bc("Conv2d_4a_3x3", h)
    h = F.max_pool2d(h, 3, 2)
    for pre in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        h = inc_a(pre, h)
    b3 = bc("Mixed_6a.branch3x3", h)
    bd = bc("Mixed_6a.branch3x3dbl_3",
            bc("Mixed_6a.branch3x3dbl_2", bc("Mixed_6a.branch3x3dbl_1", h)))
    h = torch.cat([b3, bd, F.max_pool2d(h, 3, 2)], 1)
    for pre in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        h = inc_c(pre, h)
    b3 = bc("Mixed_7a.branch3x3_2", bc("Mixed_7a.branch3x3_1", h))
    b7 = h
    for i in range(1, 5):
        b7 = bc(f"Mixed_7a.branch7x7x3_{i}", b7)
    h = torch.cat([b3, b7, F.max_pool2d(h, 3, 2)], 1)
    h = inc_e("Mixed_7b", h)
    h = inc_e("Mixed_7c", h)
    return h.mean(dim=(2, 3))


def test_inception_conversion_matches_torch():
    state = _fake_torch_state()
    params = convert_inception_v3(state)
    x = np.random.default_rng(0).normal(size=(2, 75, 75, 3)).astype(np.float32)
    ours = np.asarray(inception_features(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = _torch_inception_pool3(
            state, torch.tensor(x.transpose(0, 3, 1, 2))
        ).numpy()
    assert ours.shape == ref.shape == (2, FEATURE_DIM)
    np.testing.assert_allclose(
        ours, ref, rtol=1e-3, atol=1e-4 * max(np.abs(ref).max(), 1.0)
    )


def test_inception_converter_rejects_shape_mismatch():
    state = _fake_torch_state()
    state["Mixed_5b.branch1x1.conv.weight"] = torch.zeros(64, 192, 3, 3)
    with pytest.raises(ValueError, match="Mixed_5b.branch1x1"):
        convert_inception_v3(state)


def test_inception_npz_roundtrip_and_discovery(tmp_path, monkeypatch):
    params = convert_inception_v3(_fake_torch_state())
    npz = tmp_path / "inception_v3.npz"
    save_inception_npz(params, str(npz))
    monkeypatch.setenv("MICHIGAN_INCEPTION", str(npz))
    assert find_inception_weights("/nonexistent") == str(npz)
    loaded, pretrained = load_inception_params(
        jax.random.PRNGKey(0), "/nonexistent"
    )
    assert pretrained
    np.testing.assert_array_equal(
        loaded["Conv2d_1a_3x3"]["kernel"], params["Conv2d_1a_3x3"]["kernel"]
    )


def test_inception_random_fallback_warns(monkeypatch):
    monkeypatch.delenv("MICHIGAN_INCEPTION", raising=False)
    with pytest.warns(UserWarning, match="RANDOM Inception"):
        params, pretrained = load_inception_params(
            jax.random.PRNGKey(0), "/nonexistent"
        )
    assert not pretrained
    assert params["Conv2d_1a_3x3"]["kernel"].shape == (3, 3, 3, 32)


def test_inception_spec_channel_flow():
    """Every conv's in_ch must equal what the forward actually feeds it —
    walk the concat topology and check against the spec table."""
    S = INCEPTION_SPEC
    assert S["Mixed_5b.branch1x1"][0] == 192
    assert S["Mixed_5c.branch1x1"][0] == 64 + 64 + 96 + 32
    assert S["Mixed_5d.branch1x1"][0] == 64 + 64 + 96 + 64
    assert S["Mixed_6a.branch3x3"][0] == 288
    assert S["Mixed_6b.branch1x1"][0] == 384 + 96 + 288
    assert S["Mixed_7a.branch3x3_1"][0] == 192 * 4
    assert S["Mixed_7b.branch1x1"][0] == 320 + 192 + 768
    assert S["Mixed_7c.branch1x1"][0] == 320 + 768 + 768 + 192
