"""VGG19 pretrained-weights story: torch conversion parity, npz roundtrip,
auto-discovery, and the random-backbone warning (reference losses run on
torchvision-pretrained VGG19, architecture.py:160-190)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from michigan_tpu.models.vgg import (
    VGG19,
    VGG19_CONVS,
    find_vgg19_weights,
    load_vgg19_variables,
    save_vgg19_npz,
)
from michigan_tpu.training.convert import convert_vgg19


def _fake_torch_vgg(scale=0.1, seed=0):
    g = torch.Generator().manual_seed(seed)
    state = {}
    prev = 3
    for fidx, out_ch in VGG19_CONVS:
        state[f"{fidx}.weight"] = torch.randn(out_ch, prev, 3, 3, generator=g) * scale
        state[f"{fidx}.bias"] = torch.randn(out_ch, generator=g) * scale
        prev = out_ch
    return state


def _torch_slices(state, x_nchw):
    feats = []
    h = x_nchw
    for fidx, _ in VGG19_CONVS:
        h = F.relu(
            F.conv2d(h, state[f"{fidx}.weight"], state[f"{fidx}.bias"], padding=1)
        )
        if fidx in (0, 5, 10, 19, 28):
            feats.append(h)
        if fidx in (2, 7, 16, 25):
            h = F.max_pool2d(h, 2, 2)
    return feats


def test_vgg19_conversion_matches_torch():
    state = _fake_torch_vgg()
    variables = jax.tree_util.tree_map(np.asarray, convert_vgg19(state))
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = VGG19().apply(variables, jnp.asarray(x))
    ref = _torch_slices(state, torch.tensor(x.transpose(0, 3, 1, 2)))
    assert len(ours) == len(ref) == 5
    for a, b in zip(ours, ref):
        bn = b.numpy().transpose(0, 2, 3, 1)
        # random weights amplify magnitude geometrically through 13 convs;
        # tolerance must scale with the slice's dynamic range
        np.testing.assert_allclose(
            np.asarray(a), bn, rtol=1e-4, atol=1e-5 * max(np.abs(bn).max(), 1.0)
        )


def test_vgg19_npz_roundtrip_and_discovery(tmp_path, monkeypatch):
    state = _fake_torch_vgg()
    variables = jax.tree_util.tree_map(np.asarray, convert_vgg19(state))
    npz = tmp_path / "vgg19.npz"
    save_vgg19_npz(variables, str(npz))

    monkeypatch.setenv("MICHIGAN_VGG19", str(npz))
    assert find_vgg19_weights("/nonexistent") == str(npz)
    loaded, pretrained = load_vgg19_variables(jax.random.PRNGKey(0), "/nonexistent")
    assert pretrained
    a = jax.tree_util.tree_leaves(variables)[0]
    b = jax.tree_util.tree_leaves(loaded)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vgg19_random_fallback_warns(tmp_path, monkeypatch):
    monkeypatch.delenv("MICHIGAN_VGG19", raising=False)
    monkeypatch.chdir(tmp_path)  # no vgg19 files anywhere
    with pytest.warns(UserWarning, match="RANDOM VGG"):
        variables, pretrained = load_vgg19_variables(
            jax.random.PRNGKey(0), str(tmp_path)
        )
    assert not pretrained
    assert "params" in variables


def test_vgg19_random_fallback_losses_alive(tmp_path, monkeypatch):
    """Regression for the round-3 dead-loss bug: the fallback VGG used the
    GAN nets' gain-0.02 xavier init, which collapses the 16-conv tower's
    features to ~0 so VGG/style/content printed 0.000 for entire training
    runs.  The fallback must keep activation variance through the tower
    (kaiming) so all three loss terms are bounded away from zero on random
    images (reference trains them always-on, loss.py:178-207)."""
    from michigan_tpu.config import Options
    from michigan_tpu.losses.perceptual import (
        style_content_loss,
        vgg_loss,
    )
    from michigan_tpu.models.layers import set_default_init_type

    monkeypatch.delenv("MICHIGAN_VGG19", raising=False)
    monkeypatch.chdir(tmp_path)
    # simulate the training process state: GAN init active process-wide
    prev = set_default_init_type("xavier", None)
    try:
        with pytest.warns(UserWarning, match="RANDOM VGG"):
            variables, pretrained = load_vgg19_variables(
                jax.random.PRNGKey(0), str(tmp_path)
            )
    finally:
        set_default_init_type(*prev)
    assert not pretrained

    vgg_apply = lambda x: VGG19().apply(variables, x)
    rng = np.random.default_rng(1)
    fake = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.5)
    real = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.5)

    # tower features must not collapse: final slice carries real signal
    feats = vgg_apply(fake)
    assert float(jnp.abs(feats[-1]).mean()) > 1e-3

    opt = Options(remove_background=False)
    lv = float(vgg_loss(vgg_apply, fake, real, opt))
    lc, ls = style_content_loss(vgg_apply, fake, real, real, opt)
    assert lv > 1e-3, f"VGG loss dead: {lv}"
    assert float(lc) > 1e-4, f"content loss dead: {float(lc)}"
    assert float(ls) > 1e-6, f"style loss dead: {float(ls)}"
