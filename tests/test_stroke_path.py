"""The SIG stroke-inpaint path: the lax.cond two-stage branch must match an
eager re-expression of pix2pix_model.py:431-464 for both branch outcomes."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile tier; fast tier: -m 'not slow'

import jax
import jax.numpy as jnp

from michigan_tpu.config import Options
from michigan_tpu.model import MichiGANModel


@pytest.fixture(scope="module")
def setup():
    opt = Options(
        isTrain=False, crop_size=64, load_size=64, ngf=8,
        use_encoder=True, use_ig=True, use_stroke=True, inpaint_mode="stroke",
        noise_background=True, num_upsampling_layers="normal", batchSize=1,
    ).finalize()
    model = MichiGANModel(opt)
    rng = np.random.default_rng(0)
    s = 64
    batch = {
        "label_ref": jnp.asarray(rng.integers(0, 2, (1, s, s, 1)), jnp.float32),
        "label_tag": jnp.asarray(rng.integers(0, 2, (1, s, s, 1)), jnp.float32),
        "image_ref": jnp.asarray(rng.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
        "image_tag": jnp.asarray(rng.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
        "orient": jnp.asarray(rng.uniform(0, 255, (1, s, s, 1)), jnp.float32),
        "hole": jnp.asarray(rng.integers(0, 2, (1, s, s, 1)), jnp.float32),
        "orient_rgb": jnp.asarray(rng.uniform(0, 1, (1, s, s, 3)), jnp.float32),
        "noise": jnp.asarray(rng.uniform(0, 1, (1, s, s, 3)), jnp.float32),
        "orient_stroke": jnp.asarray(rng.uniform(0, 1, (1, s, s, 3)), jnp.float32),
        "mask_stroke": jnp.asarray(rng.integers(0, 2, (1, s, s, 1)), jnp.float32),
    }
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    return opt, model, variables, batch, rng


def eager_stroke(model, variables, hole, orient_rgb, noise, mask, stroke,
                 stroke_mask, mask_orient_rgb):
    """Python-if version of the reference's two-stage logic."""
    if float(jnp.max(mask - mask_orient_rgb)) != 0:
        orient_rgb_1, _ = model.inpaint_orient(
            variables, mask - mask_orient_rgb, orient_rgb, noise, mask
        )
    else:
        orient_rgb_1 = orient_rgb
    comp = (orient_rgb_1 * (1 - hole) + noise * (hole - stroke_mask)
            + stroke * stroke_mask)
    inp = jnp.concatenate([comp, hole, stroke_mask], axis=-1)
    out = model._run_ig(model.netSIG, variables["netSIG"], inp)
    out = out * hole + orient_rgb_1 * (1 - hole)
    return out


@pytest.mark.parametrize("prefill", [True, False])
def test_stroke_cond_matches_eager(setup, prefill):
    opt, model, variables, batch, rng = setup
    pre = model.preprocess(batch)
    mask = pre["input_tag"][..., 1:2]
    if prefill:
        mask_orient_rgb = jnp.zeros_like(mask)  # forces the two-stage branch
    else:
        mask_orient_rgb = mask  # orient covers the mask: single stage
    rgb_cond, _ = model.inpaint_stroke_orient(
        variables, pre["hole"], pre["orient_rgb"], pre["noise"], mask,
        pre["orient_stroke"], pre["mask_stroke"], mask_orient_rgb,
    )
    rgb_eager = eager_stroke(
        model, variables, pre["hole"], pre["orient_rgb"], pre["noise"], mask,
        pre["orient_stroke"], pre["mask_stroke"], mask_orient_rgb,
    )
    np.testing.assert_allclose(
        np.asarray(rgb_cond), np.asarray(rgb_eager), rtol=1e-5, atol=1e-5
    )


def test_infer_inpaint_mode_is_explicit_static_arg(setup):
    """model.infer selects the ref/stroke inpaint branch from its
    `inpaint_mode` argument without mutating shared config (regression:
    DemoEngine._get_infer used to flip opt.inpaint_mode around the trace —
    thread-unsafe mutation of nominally-static config)."""
    opt, model, variables, batch, rng = setup
    assert opt.inpaint_mode == "stroke"
    batch = dict(batch)
    batch["orient_rgb_mask"] = jnp.zeros_like(batch["mask_stroke"])

    out_default, rgb_default = model.infer(variables, batch)
    out_stroke, rgb_stroke = model.infer(variables, batch, inpaint_mode="stroke")
    out_ref, rgb_ref = model.infer(variables, batch, inpaint_mode="ref")
    assert opt.inpaint_mode == "stroke"  # config untouched

    # default == explicit opt mode; 'ref' takes the other branch
    np.testing.assert_array_equal(np.asarray(out_default), np.asarray(out_stroke))
    np.testing.assert_array_equal(np.asarray(rgb_default), np.asarray(rgb_stroke))
    assert not np.array_equal(np.asarray(rgb_ref), np.asarray(rgb_stroke))


def test_select_tag_image_recon_semantics():
    """Reconstructed-tag selection (reference demo.py:330-333): recon image
    used iff hair pixels were REMOVED by a user mask edit."""
    from PIL import Image as PILImage

    from michigan_tpu.demo.engine import select_tag_image

    tag = PILImage.new("RGB", (8, 8), (10, 10, 10))
    recon = PILImage.new("RGB", (8, 8), (200, 200, 200))
    mask = np.zeros((8, 8), np.uint8)
    mask[2:6, 2:6] = 1

    shrunk = mask.copy()
    shrunk[2:4] = 0  # removes hair -> 1 in (mask - mask_m)
    grown = mask.copy()
    grown[6:8, 2:6] = 1  # only adds hair -> no 1 in diff

    out = select_tag_image(tag, recon, mask, shrunk)
    assert np.asarray(out)[0, 0, 0] == 200  # recon selected
    out = select_tag_image(tag, recon, mask, grown)
    assert np.asarray(out)[0, 0, 0] == 10  # original kept
    out = select_tag_image(tag, recon, mask, shrunk, use_reference_mask=True)
    assert np.asarray(out)[0, 0, 0] == 10  # reference-mask mode never swaps
    out = select_tag_image(tag, None, mask, shrunk)
    assert np.asarray(out)[0, 0, 0] == 10  # no recon available
