"""End-to-end train.py CLI regression: the DEFAULT flag set (non-noise
background path) through the full epoch loop — dataloader, jit'd G/D
steps, visualizer, checkpoint save, and resume.  This is the surface where
a broken default (e.g. the reference's dead non-noise BackgroundEncode
pyramid) hides from module-level tests."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile tier; fast tier: -m 'not slow'
from PIL import Image

import train as train_cli


@pytest.fixture
def tiny_train_dataset(tmp_path):
    base = tmp_path / "ds"
    rng = np.random.default_rng(0)
    for sub in ("train_labels", "train_images", "train_dense_orients"):
        (base / sub).mkdir(parents=True)
    for i in range(8):
        name = f"{i:05d}"
        lab = (rng.integers(0, 2, (64, 64)) * 1).astype(np.uint8)
        Image.fromarray(lab, "L").save(base / "train_labels" / f"{name}.png")
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        Image.fromarray(img).save(base / "train_images" / f"{name}.jpg")
        ori = rng.integers(0, 255, (64, 64)).astype(np.uint8)
        Image.fromarray(ori, "L").save(
            base / "train_dense_orients" / f"{name}.png"
        )
    return str(base)


def test_train_cli_default_flags_and_resume(tiny_train_dataset, tmp_path):
    ck = str(tmp_path / "ck")
    args = [
        "--name", "clirun", "--checkpoints_dir", ck,
        "--data_dir", tiny_train_dataset,
        "--niter", "1", "--batchSize", "8",
        "--crop_size", "64", "--load_size", "64",
        "--ngf", "4", "--ndf", "4", "--gpu_ids", "-1",
        "--print_freq", "1", "--display_freq", "1", "--save_epoch_freq", "1",
        "--save_latest_freq", "8",
        "--nThreads", "1",
    ]
    train_cli.main(args)
    run_dir = os.path.join(ck, "clirun")
    assert os.path.exists(os.path.join(run_dir, "loss_log.txt"))
    assert os.path.exists(os.path.join(run_dir, "opt.json"))
    assert os.path.exists(os.path.join(run_dir, "iter.txt"))
    assert os.path.exists(os.path.join(run_dir, "web", "index.html"))
    # checkpoints landed: orbax dir per epoch tag + 'latest'
    saved = os.listdir(run_dir)
    assert "latest" in saved and "1" in saved, saved

    # resume: --continue_train restores and runs one more epoch
    train_cli.main(args + ["--continue_train", "--niter", "2"])
    log = open(os.path.join(run_dir, "loss_log.txt")).read()
    assert "epoch: 2" in log


def test_train_cli_device_noise(tiny_train_dataset, tmp_path):
    """--device_noise: the loader ships NO noise tensor; the jitted
    transfer path draws the pyramid on device.  Must train end-to-end
    through the noise-background encoder (the noise consumer) with the
    full 8-virtual-device mesh sharding the generated batch."""
    from michigan_tpu.config import train_options
    from michigan_tpu.data.dataset import create_dataloader

    args = [
        "--name", "clinoise", "--checkpoints_dir", str(tmp_path / "ckn"),
        "--data_dir", tiny_train_dataset,
        "--niter", "1", "--batchSize", "8",
        "--crop_size", "64", "--load_size", "64",
        "--ngf", "4", "--ndf", "4", "--gpu_ids", "-1",
        "--noise_background", "--device_noise",
        "--print_freq", "1", "--no_html",
    ]
    opt = train_options(args)
    batch = next(iter(create_dataloader(opt)))
    assert "noise" not in batch, "loader must not ship noise under --device_noise"

    train_cli.main(args)
    log = open(os.path.join(str(tmp_path / "ckn"), "clinoise", "loss_log.txt")).read()
    assert "GAN:" in log and "nan" not in log.lower()


def test_device_noise_statistics_match_host_pyramid():
    """generate_noise_jax draws from the same process as the host pyramid:
    equal octave count => matching mean/std/adjacent-pixel correlation."""
    import jax
    import numpy as np

    from michigan_tpu.ops.noise import generate_noise, generate_noise_jax

    dev = np.asarray(generate_noise_jax(jax.random.PRNGKey(0), 128, 128))
    host = generate_noise(128, 128, np.random.default_rng(0))
    assert dev.shape == host.shape == (128, 128, 3)
    assert abs(dev.mean() - host.mean()) < 0.02
    assert abs(dev.std() - host.std()) < 0.03

    def adj_corr(x):
        return np.corrcoef(x[:-1, :, 0].ravel(), x[1:, :, 0].ravel())[0, 1]

    assert abs(adj_corr(dev) - adj_corr(host)) < 0.1


def test_train_cli_bf16_compact_transfer(tiny_train_dataset, tmp_path):
    """--dtype bfloat16 enables the compact host->device transfer (bf16
    images/noise, uint8 masks); the epoch loop must train to finite
    losses through it."""
    ck = str(tmp_path / "ck16")
    train_cli.main([
        "--name", "clirun16", "--checkpoints_dir", ck,
        "--data_dir", tiny_train_dataset,
        "--niter", "1", "--batchSize", "8",
        "--crop_size", "64", "--load_size", "64",
        "--ngf", "4", "--ndf", "4", "--gpu_ids", "-1",
        "--dtype", "bfloat16", "--print_freq", "1", "--no_html",
    ])
    log = open(os.path.join(ck, "clirun16", "loss_log.txt")).read()
    assert "GAN:" in log and "nan" not in log.lower()
