"""End-to-end numerical parity: converted reference-torch weights must make
the Flax nets reproduce the torch outputs (the SURVEY §4 golden-test gate,
applied at module level since the released checkpoints are not downloadable
in this environment)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile tier; fast tier: -m 'not slow'
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


# ---------------------------------------------------------------------------
# cal_orientation.py exact oracle (VERDICT round-2 item 3): the reference
# extractor is pure CPU torch and runnable here — assert near-bit parity of
# the 32 DoG responses, argmax/confidence, and the final blurred/encoded map
# on a real hair crop of sample 67172.
# ---------------------------------------------------------------------------

def _import_ref_cal_orientation():
    """Load /root/reference/cal_orientation.py under a non-clashing module
    name (the repo root has its own cal_orientation.py)."""
    import importlib.util
    import sys
    import types

    try:
        import matplotlib.pyplot  # noqa: F401  (module-level import in the ref)
    except Exception:
        mpl = types.ModuleType("matplotlib")
        plt = types.ModuleType("matplotlib.pyplot")
        mpl.pyplot = plt
        sys.modules.setdefault("matplotlib", mpl)
        sys.modules.setdefault("matplotlib.pyplot", plt)
    spec = importlib.util.spec_from_file_location(
        "ref_cal_orientation", "/root/reference/cal_orientation.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def hair_crop():
    """A 128x128 crop of 67172 with real hair pixels + its mask, as the
    reference __main__ would see them (cal_orientation.py:89-99)."""
    from PIL import Image

    img = np.asarray(
        Image.open("datasets/FFHQ_single/val_images/67172.jpg").convert("RGB"),
        np.float32,
    )  # 0..255
    mask = np.array(Image.open("datasets/FFHQ_single/val_labels/67172.png"))
    if mask.ndim == 3:
        mask = mask[..., 0]
    if mask.max() > 1:
        mask = (mask > 130) * 1
    sl = (slice(64, 192), slice(192, 320))
    img_c, mask_c = img[sl], mask[sl]
    assert mask_c.sum() > 500, "crop must contain real hair"
    gray = 0.299 * img_c[..., 0] + 0.587 * img_c[..., 1] + 0.144 * img_c[..., 2]
    return gray.astype(np.float32), mask_c


def test_cal_orientation_filter_responses_oracle(hair_crop):
    """32 DoG conv responses vs the reference loop (cal_orientation.py:60-68)."""
    import math

    from michigan_tpu.ops.filters import dog_bank, filter_bank_conv_direct

    ref = _import_ref_cal_orientation()
    gray, _ = hair_crop
    gray_t = torch.from_numpy(gray)[None, None]
    cal = ref.orient()
    refs = []
    with torch.no_grad():
        for i in range(cal.numKernels):
            theta = torch.ones(1) * (math.pi * i / cal.numKernels)
            k = ref.DoG_fn(cal.kernel_size, 1, 1, theta).float()
            refs.append(
                torch.nn.functional.conv2d(gray_t, k, padding=cal.padding)
            )
    ref_resp = to_nhwc(torch.cat(refs, dim=1))[0]

    mine = np.asarray(
        filter_bank_conv_direct(jnp.asarray(gray[None, ..., None]), dog_bank())
    )[0]
    # responses reach ~1e3 on 0..255 gray; 1e-2 abs == ~1e-5 relative
    np.testing.assert_allclose(mine, ref_resp, rtol=1e-4, atol=1e-2)


def test_cal_orientation_argmax_confidence_oracle(hair_crop):
    """argmax index + confidence vs reference calOrientation
    (cal_orientation.py:70-80); isolated flips allowed only at numerical
    ties of the clamped responses."""
    from michigan_tpu.ops.filters import dense_orientation

    ref = _import_ref_cal_orientation()
    gray, _ = hair_crop
    with torch.no_grad():
        ref_idx, ref_conf = ref.orient().calOrientation(
            torch.from_numpy(gray)[None, None]
        )
    ref_idx = ref_idx.numpy()[0]
    ref_conf = ref_conf.numpy()[0, 0]

    idx, conf = dense_orientation(
        jnp.asarray(gray[None, ..., None]), mode="dog"
    )
    idx = np.asarray(idx)[0, ..., 0]
    conf = np.asarray(conf)[0, ..., 0]

    np.testing.assert_allclose(conf, ref_conf, rtol=1e-4, atol=1e-2)
    flips = idx != ref_idx
    assert flips.mean() < 0.002, f"{flips.sum()} argmax flips"
    # every flip must be a genuine near-tie, not a real disagreement:
    # the confidences of the two chosen filters agree to fp noise
    if flips.any():
        np.testing.assert_allclose(
            conf[flips], ref_conf[flips], rtol=1e-4, atol=1e-2
        )


def test_cal_orientation_end_to_end_oracle(hair_crop):
    """Final uint8 orientation map vs a faithful execution of the reference
    __main__ pipeline (cal_orientation.py:96-110) on the same crop."""
    import math

    import cv2

    from cal_orientation import compute_orientation_map

    ref = _import_ref_cal_orientation()
    gray, mask = hair_crop

    # reference pipeline, driven through the imported reference module
    with torch.no_grad():
        o_t, c_t = ref.orient().calOrientation(torch.from_numpy(gray)[None, None])
    o_t = o_t * math.pi / 31 * 2
    m_t = torch.from_numpy(mask).float()
    fx = (torch.cos(o_t) * c_t * m_t).numpy().squeeze()
    fy = (torch.sin(o_t) * c_t * m_t).numpy().squeeze()
    fx = cv2.GaussianBlur(fx, (0, 0), 4)
    fy = cv2.GaussianBlur(fy, (0, 0), 4)
    out = np.arctan2(fy, fx) * 0.5
    out[out < 0] += math.pi
    ref_map = np.uint8(out * 255.0 / math.pi * mask)

    # my CLI core (takes [0,1] RGB); reconstruct the RGB crop it expects
    from PIL import Image

    img = np.asarray(
        Image.open("datasets/FFHQ_single/val_images/67172.jpg").convert("RGB"),
        np.float32,
    ) / 255.0
    my_map = compute_orientation_map(
        img[64:192, 192:320], mask.astype(np.float64)
    )

    diff = np.abs(my_map.astype(np.int32) - ref_map.astype(np.int32))
    # uint8 truncation at the boundary of a bit-identical float pipeline:
    # allow off-by-one on a small fraction of pixels, nothing larger except
    # angle wraparound (0 <-> 255 encode the same orientation mod pi)
    wrap = np.minimum(diff, 256 - diff)
    assert (wrap > 1).mean() < 0.001, f"max diff {wrap.max()}, frac {(wrap>1).mean()}"
    assert (wrap > 0).mean() < 0.05


@pytest.mark.parametrize("cfg", [
    {},                  # flagship: partialconv encoder + IG orient + noise bg
    {"use_ig": False},   # raw orient decode path
])
def test_generator_eval_mode_composed_parity(cfg, rng):
    """EVAL-mode composed forward vs torch — the mode inference actually uses
    (VERDICT round-2 weak item 3).  Random-init running stats (0,1) would
    saturate tanh meaninglessly, so the torch net first runs ~25 train-mode
    forwards to pull its BN running stats toward the operating regime
    (sync_batchnorm/batchnorm.py:137-145 momentum-0.1 rule); the state_dict
    (incl. running_mean/var and spectral u/v) is then converted and both
    frameworks compare in eval mode, where BN normalizes by running stats
    (batchnorm.py:64-68) and spectral norm stops power-iterating."""
    opt = base_opt(**cfg)
    topt = torch_opt(opt)
    torch.manual_seed(0)
    ref_net = REF.generator.SPADEBGenerator(topt)

    inputs = make_gen_inputs(opt, rng, n=2)
    input_ref, input_tag, orient, image_ref, image_tag, noise = inputs
    targs = dict(
        input=nchw_t(input_ref), orient_mask=nchw_t(orient),
        image_ref=nchw_t(image_ref), input_tag=nchw_t(input_tag),
        noise=nchw_t(noise), image_tag=nchw_t(image_tag),
    )

    ref_net.train()
    with torch.no_grad():
        for _ in range(25):  # running stats ~90% of the way to batch stats
            ref_net(**targs)
    ref_net.eval()
    with torch.no_grad():
        ref_out = ref_net(**targs)
    assert np.abs(to_nhwc(ref_out)).max() < 1.0 - 1e-4, (
        "warmup failed: torch eval output saturated tanh — parity would be "
        "vacuous"
    )

    variables = CV.convert_generator(ref_net.state_dict(), opt)
    gen = M.SPADEBGenerator(opt=opt)
    out = gen.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        *[jnp.asarray(a) for a in inputs],
        train=False,
    )
    if isinstance(out, tuple):
        out = out[0]
    np.testing.assert_allclose(
        np.asarray(out), to_nhwc(ref_out), rtol=1e-3, atol=2e-3
    )
