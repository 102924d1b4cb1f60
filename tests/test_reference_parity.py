"""End-to-end numerical parity: converted reference-torch weights must make
the Flax nets reproduce the torch outputs (the SURVEY §4 golden-test gate,
applied at module level since the released checkpoints are not downloadable
in this environment)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from michigan_tpu.config import Options
from michigan_tpu import models as M
from michigan_tpu.training import convert as CV
from tests.reference_oracle import import_reference, torch_opt

REF = import_reference()


def nchw_t(x_nhwc):
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


def to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def base_opt(**kw):
    d = dict(
        isTrain=False, crop_size=64, load_size=64, ngf=8, ndf=8,
        use_encoder=True, use_ig=True, noise_background=True,
        num_upsampling_layers="normal", batchSize=1, expand_mask_be=True,
        expand_th=5,
    )
    d.update(kw)
    return Options(**d).finalize()


def make_gen_inputs(opt, rng, n=1):
    s = opt.generator_input_size()
    lab_ref = rng.integers(0, 2, (n, s, s)).astype(np.int64)
    lab_tag = rng.integers(0, 2, (n, s, s)).astype(np.int64)
    one = lambda l: np.stack([(l == 0), (l == 1)], -1).astype(np.float32)
    input_ref, input_tag = one(lab_ref), one(lab_tag)
    if opt.use_ig:
        orient = rng.uniform(-1, 1, (n, s, s, 2)).astype(np.float32)
    else:
        orient = rng.uniform(0, 255, (n, s, s, 1)).astype(np.float32)
    image_ref = rng.uniform(-1, 1, (n, s, s, 3)).astype(np.float32)
    image_tag = rng.uniform(-1, 1, (n, s, s, 3)).astype(np.float32)
    noise = rng.uniform(0, 1, (n, s, s, 3)).astype(np.float32)
    return input_ref, input_tag, orient, image_ref, image_tag, noise


@pytest.mark.parametrize("cfg", [
    {},                                     # flagship-ish: partialconv + IG + noise bg
    {"use_ig": False},                      # raw orient decode path
    {"use_encoder": False, "use_vae": False},  # conv-seed path
    {"Image_encoder_mode": "instance"},
    {"Image_encoder_mode": "norm"},
    {"num_upsampling_layers": "more", "crop_size": 128, "load_size": 128},
    {"bf_direct_add": True},
    {"use_clip": True, "clip_th": 0.5},
    {"orient_random_disturb": True},
])
def test_generator_parity(cfg, rng):
    """Training-mode forward (batch-stat BN): with random weights, eval-mode
    BN running stats (0/1) let activations blow past tanh saturation, which
    makes eval parity meaningless; train-mode stats keep the network in its
    operating regime.  Eval-mode running-stat BN is covered at op level
    (test_ops_parity.test_batch_norm_train_and_eval) and by converted real
    checkpoints when available."""
    opt = base_opt(**cfg)
    topt = torch_opt(opt)
    torch.manual_seed(0)  # order-independent reference weights
    ref_net = REF.generator.SPADEBGenerator(topt)
    ref_net.train()

    variables = CV.convert_generator(ref_net.state_dict(), opt)
    gen = M.SPADEBGenerator(opt=opt)

    inputs = make_gen_inputs(opt, rng, n=2)
    input_ref, input_tag, orient, image_ref, image_tag, noise = inputs

    out, _ = gen.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        *[jnp.asarray(a) for a in inputs],
        train=True,
        mutable=["batch_stats", "spectral"],
    )

    with torch.no_grad():
        ref_out = ref_net(
            input=nchw_t(input_ref),
            orient_mask=nchw_t(orient),
            image_ref=nchw_t(image_ref),
            input_tag=nchw_t(input_tag),
            noise=nchw_t(noise),
            image_tag=nchw_t(image_tag),
        )
    np.testing.assert_allclose(
        np.asarray(out), to_nhwc(ref_out), rtol=1e-3, atol=2e-3
    )


def test_inpaint_generator_parity(rng):
    opt = base_opt()
    topt = torch_opt(opt)
    torch.manual_seed(0)
    ref_net = REF.generator.InpaintGenerator(topt)
    ref_net.eval()
    variables = CV.convert_inpaint(ref_net.state_dict())
    ig = M.InpaintGenerator(opt=opt)

    x = rng.uniform(0, 1, (1, 64, 64, 4)).astype(np.float32)
    out = ig.apply(jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x))
    with torch.no_grad():
        ref_out = ref_net(nchw_t(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref_out), rtol=1e-3, atol=1e-3)


def test_sinpaint_generator_parity(rng):
    opt = base_opt()
    topt = torch_opt(opt)
    torch.manual_seed(0)
    ref_net = REF.generator.SInpaintGenerator(topt)
    ref_net.eval()
    variables = CV.convert_inpaint(ref_net.state_dict())
    sig = M.SInpaintGenerator(opt=opt)

    x = rng.uniform(0, 1, (1, 64, 64, 5)).astype(np.float32)
    out = sig.apply(jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x))
    with torch.no_grad():
        ref_out = ref_net(nchw_t(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref_out), rtol=1e-3, atol=1e-3)


def test_discriminator_parity(rng):
    opt = base_opt(isTrain=True)
    topt = torch_opt(opt)
    torch.manual_seed(0)
    ref_net = REF.discriminator.MultiscaleDiscriminator(topt)
    ref_net.eval()
    variables = CV.convert_discriminator(ref_net.state_dict(), opt)
    disc = M.MultiscaleDiscriminator(opt=opt)

    x = rng.standard_normal((2, 64, 64, opt.d_input_nc())).astype(np.float32)
    outs = disc.apply(jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x))
    with torch.no_grad():
        ref_outs = ref_net(nchw_t(x))
    assert len(outs) == len(ref_outs)
    for ds, rs in zip(outs, ref_outs):
        assert len(ds) == len(rs)
        for d, r in zip(ds, rs):
            np.testing.assert_allclose(
                np.asarray(d), to_nhwc(r), rtol=1e-3, atol=2e-4
            )


def test_vae_encoder_parity(rng):
    opt = base_opt(use_vae=True, crop_size=256, load_size=256)
    topt = torch_opt(opt)
    torch.manual_seed(0)
    ref_net = REF.encoder.ConvEncoder(topt)
    ref_net.eval()
    variables = CV.convert_vae_encoder(ref_net.state_dict(), opt)
    enc = M.ConvEncoder(opt=opt)

    x = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
    mu, logvar = enc.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)
    )
    with torch.no_grad():
        ref_mu, ref_logvar = ref_net(nchw_t(x))
    np.testing.assert_allclose(np.asarray(mu), ref_mu.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), ref_logvar.numpy(), rtol=1e-3, atol=1e-4)
