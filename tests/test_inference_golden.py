"""Composed-pipeline golden: the full inference flow (demo flag set) on the
bundled FFHQ sample 67172 must reproduce a committed golden image at
PSNR > 40 dB.

This exercises the composition the module-level oracles can't: data loading
and transforms -> IG orientation inpainting -> appearance encoder ->
background encoder -> SPADE generator (eval-mode running stats) -> pad crop.
Reference flow: inference.py:23-56, data/base_dataset.py:49-160.

The golden is a self-fixture from seeded random weights (the released .pth
checkpoints are not downloadable in this environment — PARITY.md).  When
checkpoints/MichiGAN/50_net_G.pth exists, the same test gates against the
reference's released output instead (BASELINE.md PSNR>40 north star).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile tier; fast tier: -m 'not slow'

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures_inference_golden_67172.npz")


def golden_opt():
    from michigan_tpu.config import Options

    return Options(
        isTrain=False, phase="test", batchSize=1, serial_batches=True,
        no_flip=True, crop_size=256, load_size=256, netG="spadeb",
        use_encoder=True, use_ig=True, use_stroke=False, noise_background=True,
        expand_mask_be=True, expand_th=5, add_feat_zeros=True,
        num_upsampling_layers="more", seed=0,
        data_dir=os.path.join(REPO, "datasets", "FFHQ_single"),
        inference_ref_name="67172", inference_tag_name="67172",
        inference_orient_name="67172", use_pallas=False,
        # torch-default init ('none') keeps activations O(1) through depth;
        # the reference xavier gain 0.02 collapses random-weight outputs to
        # ~1e-5, which would quantize to a constant (vacuous) golden image
        init_type="none",
    ).finalize()


def run_pipeline(opt):
    from michigan_tpu.data.single import single_inference_data
    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.utils.imaging import tensor2im

    model = MichiGANModel(opt)
    data = single_inference_data(opt)
    batch = {
        k: jnp.asarray(v) for k, v in data.items() if isinstance(v, np.ndarray)
    }
    rng = jax.random.PRNGKey(opt.seed)
    variables = model.init_variables(rng, batch)
    out, _ = jax.jit(lambda v, b: model.infer(v, b, rng=rng))(variables, batch)
    out = np.asarray(out)
    r = opt.add_th // 2
    out = out[:, r : r + opt.crop_size, r : r + opt.crop_size, :]
    return tensor2im(out[0])  # uint8 HWC


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def test_composed_inference_golden():
    assert os.path.exists(FIXTURE), (
        "golden fixture missing — regenerate with "
        "`python -m tests.test_inference_golden`"
    )
    img = run_pipeline(golden_opt())
    gold = np.load(FIXTURE)["image"]
    assert img.shape == gold.shape
    p = psnr(img, gold)
    assert p > 40.0, f"composed pipeline drifted from golden: PSNR={p:.2f} dB"


def test_composed_inference_deterministic():
    """Same seed, same output — the whole host pipeline (noise pyramid, hole
    generation, transforms) must be deterministic under --seed."""
    a = run_pipeline(golden_opt())
    b = run_pipeline(golden_opt())
    np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(
    not os.path.exists(
        os.path.join(REPO, "checkpoints", "MichiGAN", "50_net_G.pth")
    ),
    reason="released checkpoints not present",
)
def test_released_checkpoint_psnr():
    """The real north-star gate: released weights, 512^2, PSNR>40 vs the
    reference's saved output (drops in the moment checkpoints exist)."""
    import dataclasses

    from michigan_tpu.training import checkpoint as CK
    from michigan_tpu.data.single import single_inference_data
    from michigan_tpu.model import MichiGANModel
    from michigan_tpu.utils.imaging import tensor2im

    opt = dataclasses.replace(
        golden_opt(), crop_size=512, load_size=512, name="MichiGAN",
        which_epoch="50", checkpoints_dir=os.path.join(REPO, "checkpoints"),
    ).finalize()
    model = MichiGANModel(opt)
    data = single_inference_data(opt)
    batch = {
        k: jnp.asarray(v) for k, v in data.items() if isinstance(v, np.ndarray)
    }
    rng = jax.random.PRNGKey(opt.seed)
    variables = model.init_variables(rng, batch)
    variables = CK.load_pretrained_torch(opt, variables)
    out, _ = jax.jit(lambda v, b: model.infer(v, b, rng=rng))(variables, batch)
    r = opt.add_th // 2
    img = tensor2im(np.asarray(out)[0, r : r + 512, r : r + 512])
    ref_path = os.path.join(REPO, "inference_samples", "reference_67172.png")
    assert os.path.exists(ref_path), "save the reference output here first"
    from PIL import Image

    gold = np.asarray(Image.open(ref_path).convert("RGB"))
    assert psnr(img, gold) > 40.0



def test_batch_inference_renders_val_list(tmp_path, monkeypatch):
    """--batch_inference: renders every val-list name in compiled batches,
    padding the tail batch to the compiled shape (inference.py)."""
    import dataclasses

    from inference import batch_inference
    from michigan_tpu.model import MichiGANModel

    opt = dataclasses.replace(
        golden_opt(), crop_size=128, load_size=128, batchSize=2,
        add_feat_zeros=False, use_ig=True,
        results_dir=str(tmp_path / "out"),
        val_list_dir=str(tmp_path / "val.txt"),
        how_many=3,
    ).finalize()
    # 3 names, batch 2 -> one full batch + a padded tail batch
    with open(opt.val_list_dir, "w") as f:
        f.write("67172\n67172\n67172\n")

    model = MichiGANModel(opt)
    from michigan_tpu.data.single import single_inference_data

    data = single_inference_data(opt)
    batch = {
        k: jnp.asarray(v) for k, v in data.items() if isinstance(v, np.ndarray)
    }
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, batch)
    batch_inference(opt, model, variables, rng)
    rendered = sorted(os.listdir(opt.results_dir))
    assert rendered == ["67172.jpg"]  # same name overwritten 3x, but rendered
if __name__ == "__main__":
    # regenerate the golden fixture (run on the CPU backend like the tests)
    img = run_pipeline(golden_opt())
    np.savez_compressed(FIXTURE, image=img)
    print(f"wrote {FIXTURE} shape={img.shape}")
