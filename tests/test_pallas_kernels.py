"""Pallas kernels vs their XLA-composed references (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from michigan_tpu.ops.norms import instance_norm
from michigan_tpu.ops.filters import orientation_response
from michigan_tpu.ops.pallas.spade import fused_instance_norm, spade_modulate
from michigan_tpu.ops.pallas.filterbank import filterbank_orientation
import pytest

pytestmark = pytest.mark.slow  # heavy compile tier; fast tier: -m 'not slow'


def test_fused_instance_norm(rng):
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    ours = np.asarray(fused_instance_norm(jnp.asarray(x)))
    ref = np.asarray(instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_fused_instance_norm_modulated(rng):
    x = rng.standard_normal((1, 8, 8, 20)).astype(np.float32)  # non-128 C
    g = rng.standard_normal((1, 8, 8, 20)).astype(np.float32)
    b = rng.standard_normal((1, 8, 8, 20)).astype(np.float32)
    ours = np.asarray(
        fused_instance_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    )
    ref = np.asarray(instance_norm(jnp.asarray(x))) * (1 + g) + b
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_spade_modulate(rng):
    x = rng.standard_normal((2, 4, 4, 16)).astype(np.float32)
    mean = rng.standard_normal(16).astype(np.float32)
    inv = rng.uniform(0.5, 2.0, 16).astype(np.float32)
    g = rng.standard_normal((2, 4, 4, 16)).astype(np.float32)
    b = rng.standard_normal((2, 4, 4, 16)).astype(np.float32)
    ours = np.asarray(
        spade_modulate(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(inv),
                       jnp.asarray(g), jnp.asarray(b))
    )
    ref = (x - mean) * inv * (1 + g) + b
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_filterbank_orientation(rng):
    gray = (rng.standard_normal((1, 40, 48, 1)) * 10).astype(np.float32)
    idx, conf = filterbank_orientation(jnp.asarray(gray), "gabor", tile_h=16)
    idx_ref, conf_ref = orientation_response(jnp.asarray(gray), "gabor")
    np.testing.assert_allclose(np.asarray(conf), np.asarray(conf_ref),
                               rtol=1e-4, atol=1e-3)
    mismatch = (np.asarray(idx) != np.asarray(idx_ref)).mean()
    assert mismatch < 1e-3


def test_streaming_instance_norm_matches_xla(rng):
    """Large-plane path: the two-pass streaming kernel (no whole-plane VMEM
    residency) must match XLA instance norm, including non-tile-aligned HW."""
    from michigan_tpu.ops.norms import instance_norm
    from michigan_tpu.ops.pallas.spade import _streaming_instance_norm

    x = rng.normal(size=(2, 40, 40, 70)).astype(np.float32)
    ours = np.asarray(
        _streaming_instance_norm(jnp.asarray(x), None, None, 1e-5, th=96)
    )
    ref = np.asarray(instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_streaming_instance_norm_modulated(rng):
    from michigan_tpu.ops.norms import instance_norm
    from michigan_tpu.ops.pallas.spade import _streaming_instance_norm

    x = rng.normal(size=(1, 33, 33, 130)).astype(np.float32)
    g = rng.normal(size=x.shape).astype(np.float32)
    b = rng.normal(size=x.shape).astype(np.float32)
    ours = np.asarray(
        _streaming_instance_norm(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 1e-5, th=64
        )
    )
    ref = np.asarray(instance_norm(jnp.asarray(x))) * (1.0 + g) + b
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_spade_module_pallas_parity(rng):
    """SPADE(use_pallas=True) in eval == SPADE(use_pallas=False), both norm
    types, same variables."""
    import jax
    from michigan_tpu.models.normalization import SPADE

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 64)).astype(np.float32))
    seg = jnp.asarray(rng.normal(size=(2, 32, 32, 4)).astype(np.float32))
    for cfg in ("spadeinstance3x3", "spadesyncbatch3x3"):
        ref_mod = SPADE(cfg, 64, 4, use_pallas=False)
        pal_mod = SPADE(cfg, 64, 4, use_pallas=True)
        variables = ref_mod.init(jax.random.PRNGKey(0), x, seg)
        a = ref_mod.apply(variables, x, seg, train=False)
        b = pal_mod.apply(variables, x, seg, train=False)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
        ), cfg


def test_conv_in_act_epilogue(rng):
    """Fused conv3x3+IN+act(+residual) kernel vs the exact XLA composition."""
    from michigan_tpu.ops.pallas.epilogue import conv3x3_in_act, _xla_reference

    for d, act, with_res in [(2, "relu", False), (1, None, True),
                             (1, "lrelu", False)]:
        x = rng.standard_normal((2, 16 + 2 * d, 16 + 2 * d, 128)).astype(np.float32)
        w = (rng.standard_normal((3, 3, 128, 128)) * 0.05).astype(np.float32)
        b = rng.standard_normal(128).astype(np.float32)
        res = (
            rng.standard_normal((2, 16, 16, 128)).astype(np.float32)
            if with_res else None
        )
        args = [jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)]
        resj = jnp.asarray(res) if res is not None else None
        ours = np.asarray(conv3x3_in_act(
            *args, dilation=d, act=act, residual=resj))
        ref = np.asarray(_xla_reference(*args, d, act, 1e-5, resj))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_conv_in_act_epilogue_fallback(rng):
    """Misaligned channels take the XLA fallback and still match."""
    from michigan_tpu.ops.pallas.epilogue import conv3x3_in_act, _xla_reference

    x = rng.standard_normal((1, 10, 10, 20)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 20, 20)) * 0.05).astype(np.float32)
    b = rng.standard_normal(20).astype(np.float32)
    ours = np.asarray(conv3x3_in_act(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), dilation=1, act="relu"))
    ref = np.asarray(_xla_reference(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1, "relu", 1e-5, None))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_ig_epilogue_path_matches(rng):
    """IG forward with --use_pallas_epilogue == plain forward (interpret)."""
    import jax

    from michigan_tpu.config import Options
    from michigan_tpu.models.inpaint import InpaintGenerator

    opt = Options(crop_size=64, load_size=64).finalize()
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
    plain = InpaintGenerator(opt, blocks=2)
    variables = plain.init(jax.random.PRNGKey(0), x)
    ref = plain.apply(variables, x)

    opt_epi = Options(crop_size=64, load_size=64,
                      use_pallas_epilogue=True).finalize()
    fused = InpaintGenerator(opt_epi, blocks=2)
    ours = fused.apply(variables, x)  # identical param tree by construction
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_conv3x3_lowch_parity(rng):
    """Low-channel conv kernel (both strategies) vs the XLA conv."""
    from michigan_tpu.ops.pallas.conv_lowch import (
        _xla_reference, conv3x3_same_lowch)

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32))
    want = np.asarray(_xla_reference(x, w))
    for im2col in (True, False):
        got = np.asarray(conv3x3_same_lowch(
            x, w, tile_rows=4, im2col=im2col))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv3x3_lowch_fallback(rng):
    """Undivisible H falls back to the identical XLA conv."""
    from michigan_tpu.ops.pallas.conv_lowch import (
        _xla_reference, conv3x3_same_lowch)

    x = jnp.asarray(rng.standard_normal((1, 10, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(conv3x3_same_lowch(x, w, tile_rows=4)),
        np.asarray(_xla_reference(x, w)), rtol=1e-5, atol=1e-5)
