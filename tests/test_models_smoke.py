"""Shape/finiteness smoke tests for the Flax network zoo."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile tier; fast tier: -m 'not slow'

from michigan_tpu.config import Options
from michigan_tpu import models as M


def small_opt(**kw):
    base = dict(
        isTrain=False, crop_size=128, load_size=128, ngf=16, ndf=16,
        use_encoder=True, use_ig=True, noise_background=True,
        num_upsampling_layers="more", batchSize=1,
    )
    base.update(kw)
    return Options(**base).finalize()


def gen_inputs(opt, key, n=1):
    s = opt.generator_input_size()
    ks = jax.random.split(key, 6)
    input_ref = jax.nn.one_hot(
        jax.random.randint(ks[0], (n, s, s), 0, 2), 2, dtype=jnp.float32
    )
    input_tag = jax.nn.one_hot(
        jax.random.randint(ks[1], (n, s, s), 0, 2), 2, dtype=jnp.float32
    )
    orient_ch = 2 if opt.use_ig else 1
    orient = jax.random.uniform(ks[2], (n, s, s, orient_ch))
    image_ref = jax.random.uniform(ks[3], (n, s, s, 3)) * 2 - 1
    image_tag = jax.random.uniform(ks[4], (n, s, s, 3)) * 2 - 1
    noise = jax.random.uniform(ks[5], (n, s, s, 3))
    return input_ref, input_tag, orient, image_ref, image_tag, noise


@pytest.mark.parametrize("ups,extra", [
    ("more", {}),
    ("normal", {}),
    ("most", {}),
    ("more", {"add_feat_zeros": True, "add_th": 64}),
    ("more", {"use_encoder": False, "use_vae": True}),
    ("more", {"use_ig": False}),
    # non-noise BackgroundEncode path: dead-broken in the reference
    # (unreversed pyramid, PARITY.md) — rebuilt to the working contract
    ("more", {"noise_background": False}),
    ("most", {"noise_background": False}),
])
def test_generator_forward(ups, extra):
    opt = small_opt(num_upsampling_layers=ups, **extra)
    key = jax.random.PRNGKey(0)
    gen = M.SPADEBGenerator(opt=opt)
    inputs = gen_inputs(opt, key)
    z = jax.random.normal(key, (1, opt.z_dim)) if opt.use_vae else None
    variables = gen.init(key, *inputs, z=z)
    out = gen.apply(variables, *inputs, z=z)
    s = opt.generator_input_size()
    assert out.shape == (1, s, s, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_generator_train_mode_mutates_state():
    opt = small_opt(isTrain=True, random_expand_mask=True)
    key = jax.random.PRNGKey(0)
    gen = M.SPADEBGenerator(opt=opt)
    inputs = gen_inputs(opt, key, n=2)
    variables = gen.init(key, *inputs, train=True)
    assert "batch_stats" in variables and "spectral" in variables
    out, updates = gen.apply(
        variables, *inputs, train=True, mutable=["batch_stats", "spectral"]
    )
    # running stats must actually move
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_discriminator_forward():
    opt = small_opt(isTrain=True)
    key = jax.random.PRNGKey(1)
    disc = M.MultiscaleDiscriminator(opt=opt)
    x = jax.random.normal(key, (2, 128, 128, opt.d_input_nc()))
    variables = disc.init(key, x)
    out = disc.apply(variables, x)
    assert len(out) == opt.num_D
    assert len(out[0]) == opt.n_layers_D + 1  # intermediate feats + pred
    assert out[0][-1].shape[-1] == 1


def test_inpaint_generators():
    opt = small_opt()
    key = jax.random.PRNGKey(2)
    ig = M.InpaintGenerator(opt=opt)
    x = jax.random.uniform(key, (1, 64, 64, 4))
    v = ig.init(key, x)
    y = ig.apply(v, x)
    assert y.shape == (1, 64, 64, 3)
    assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()

    sig = M.SInpaintGenerator(opt=opt)
    x5 = jax.random.uniform(key, (1, 64, 64, 5))
    v = sig.init(key, x5)
    y = sig.apply(v, x5)
    assert y.shape == (1, 64, 64, 3)


def test_vae_encoder():
    opt = small_opt(use_vae=True, crop_size=256, load_size=256)
    key = jax.random.PRNGKey(3)
    enc = M.ConvEncoder(opt=opt)
    x = jax.random.normal(key, (2, 256, 256, 3))
    v = enc.init(key, x)
    mu, logvar = enc.apply(v, x)
    assert mu.shape == (2, 256) and logvar.shape == (2, 256)


def test_blend_generator():
    opt = small_opt(use_blender=True)
    key = jax.random.PRNGKey(4)
    net = M.Blend2Generator(opt=opt)
    hair = jax.random.normal(key, (1, 64, 64, 3))
    bg = jax.random.normal(key, (1, 64, 64, 3))
    mask = jax.nn.one_hot(jax.random.randint(key, (1, 64, 64), 0, 2), 2)
    v = net.init(key, hair, bg, mask)
    y = net.apply(v, hair, bg, mask)
    assert y.shape == (1, 64, 64, 3)


def test_vgg19_slices():
    key = jax.random.PRNGKey(5)
    vgg = M.VGG19()
    x = jax.random.normal(key, (1, 64, 64, 3))
    v = vgg.init(key, x)
    outs = vgg.apply(v, x)
    assert [o.shape[-1] for o in outs] == [64, 128, 256, 512, 512]
    assert [o.shape[1] for o in outs] == [64, 32, 16, 8, 4]


@pytest.mark.parametrize("extra", [
    {"use_clip": True, "clip_th": 5.0},
    {"bf_direct_add": True},
    {"weight_norm_G": True},
])
def test_generator_flag_paths(extra):
    """Config paths without dedicated round-1 coverage (ROADMAP): activation
    clipping (generator.py:173-175), direct background add, weight-norm-G."""
    opt = small_opt(**extra)
    key = jax.random.PRNGKey(0)
    gen = M.SPADEBGenerator(opt=opt)
    inputs = gen_inputs(opt, key)
    variables = gen.init(key, *inputs)
    out = gen.apply(variables, *inputs)
    assert np.isfinite(np.asarray(out)).all()


def test_generator_orient_disturb_needs_rng():
    """--orient_random_disturb injects edge noise (generator.py:137-140):
    output must differ from the undisturbed path and stay finite."""
    opt = small_opt(orient_random_disturb=True, use_ig=False)
    key = jax.random.PRNGKey(0)
    gen = M.SPADEBGenerator(opt=opt)
    inputs = gen_inputs(opt, key)
    variables = gen.init(key, *inputs)
    out_a = gen.apply(variables, *inputs, rngs={"disturb": jax.random.PRNGKey(1)},
                      train=True)
    opt2 = small_opt(orient_random_disturb=False, use_ig=False)
    gen2 = M.SPADEBGenerator(opt=opt2)
    out_b = gen2.apply(variables, *inputs, train=True)
    assert np.isfinite(np.asarray(out_a)).all()
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
