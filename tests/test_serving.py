"""Deployment/serving: StableHLO export round-trip and the shape-bucketed
AOT serving session must reproduce the live jitted model exactly."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile tier; fast tier: -m 'not slow'

import jax
import jax.numpy as jnp

from michigan_tpu.config import Options
from michigan_tpu.model import MichiGANModel
from michigan_tpu.serving import (
    InferenceSession,
    export_inference,
    load_exported,
)


def _tiny_model(batch_size=1, size=64):
    opt = Options(
        isTrain=False, crop_size=size, load_size=size, ngf=8,
        use_encoder=True, use_ig=True, noise_background=True,
        num_upsampling_layers="normal", batchSize=batch_size,
        expand_mask_be=True, expand_th=5,
    ).finalize()
    return MichiGANModel(opt)


def _batch(n, s, seed=0):
    r = np.random.default_rng(seed)
    return {
        "label_ref": r.integers(0, 2, (n, s, s, 1)).astype(np.float32),
        "label_tag": r.integers(0, 2, (n, s, s, 1)).astype(np.float32),
        "image_ref": r.uniform(-1, 1, (n, s, s, 3)).astype(np.float32),
        "image_tag": r.uniform(-1, 1, (n, s, s, 3)).astype(np.float32),
        "orient": r.uniform(0, 255, (n, s, s, 1)).astype(np.float32),
        "hole": r.integers(0, 2, (n, s, s, 1)).astype(np.float32),
        "orient_rgb": r.uniform(0, 1, (n, s, s, 3)).astype(np.float32),
        "noise": r.uniform(0, 1, (n, s, s, 3)).astype(np.float32),
    }


def test_export_roundtrip_matches_live_model(tmp_path):
    model = _tiny_model()
    batch = {k: jnp.asarray(v) for k, v in _batch(1, 64).items()}
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    ref_img, ref_orient = jax.jit(model.infer)(variables, batch)

    path = str(tmp_path / "infer.stablehlo")
    export_inference(model, variables, batch, path)

    fn = load_exported(path)
    out_img, out_orient = fn(variables, batch)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(ref_img))
    np.testing.assert_array_equal(
        np.asarray(out_orient), np.asarray(ref_orient)
    )


def test_export_cross_platform_tpu_from_cpu(tmp_path):
    """Cross-lowering: a TPU serving artifact exported on this CPU host."""
    model = _tiny_model()
    batch = {k: jnp.asarray(v) for k, v in _batch(1, 64).items()}
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    path = str(tmp_path / "infer_tpu.stablehlo")
    try:
        exported = export_inference(
            model, variables, batch, path, platforms=("tpu",)
        )
    except Exception as e:  # pragma: no cover - depends on jax build
        pytest.skip(f"cross-platform lowering unavailable: {e}")
    assert exported.platforms == ("tpu",)
    import os
    assert os.path.getsize(path) > 0


def test_session_buckets_pad_split_and_match():
    model = _tiny_model()
    s = 64
    init_batch = {k: jnp.asarray(v) for k, v in _batch(1, s).items()}
    variables = model.init_variables(jax.random.PRNGKey(0), init_batch)

    session = InferenceSession(
        model, variables, image_shape=(s, s), buckets=(1, 2)
    )
    session.precompile()
    assert set(session._compiled) == {1, 2}

    # n=3 exercises: full max bucket (2) + padded bucket (1 -> exact fit 1)
    batch = _batch(3, s, seed=7)
    img, orient = session.infer(batch)
    assert img.shape[0] == 3 and orient.shape[0] == 3

    jit_infer = jax.jit(model.infer)
    for i in range(3):
        one = {k: jnp.asarray(v[i:i + 1]) for k, v in batch.items()}
        ref_img, ref_orient = jit_infer(variables, one)
        # per-sample math is batch-size independent (no cross-sample ops in
        # inference: BN is eval-mode, norms are per-instance)
        np.testing.assert_allclose(
            img[i], np.asarray(ref_img)[0], atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            orient[i], np.asarray(ref_orient)[0], atol=1e-5, rtol=1e-5
        )


def test_session_rejects_inconsistent_batch():
    model = _tiny_model()
    variables = None  # never dispatched
    session = InferenceSession(model, variables, image_shape=(64, 64))
    bad = _batch(2, 64)
    bad["hole"] = bad["hole"][:1]
    with pytest.raises(ValueError, match="inconsistent"):
        session.infer(bad)
