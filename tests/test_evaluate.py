"""evaluate.py: PSNR math, FID plumbing (tiny images, random VGG), CLI."""

import subprocess
import sys

import numpy as np
from PIL import Image

import evaluate as ev


def test_psnr_math():
    a = np.zeros((8, 8, 3), np.uint8)
    assert ev.psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 255  # one max-diff pixel in 192
    expected = 10 * np.log10(255**2 / (255.0**2 / 192))
    np.testing.assert_allclose(ev.psnr(a, b), expected, rtol=1e-6)


def test_fid_identical_dirs_is_zero(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    d1 = tmp_path / "real"
    d2 = tmp_path / "fake"
    d1.mkdir(), d2.mkdir()
    for i in range(4):
        img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(img).save(d1 / f"{i}.png")
        Image.fromarray(img).save(d2 / f"{i}.png")
    monkeypatch.chdir(tmp_path)  # no vgg weights -> random backbone, warned
    real = ev._load_images(str(d1), size=32)
    fake = ev._load_images(str(d2), size=32)
    f1 = ev._vgg_features(real)
    f2 = ev._vgg_features(fake)
    fid = ev.frechet_distance(f1, f2)
    assert abs(fid) < 1e-3  # identical sets -> ~0


def test_psnr_cli(tmp_path):
    a = tmp_path / "a.png"
    b = tmp_path / "b.png"
    img = np.random.default_rng(0).integers(0, 255, (16, 16, 3)).astype(np.uint8)
    Image.fromarray(img).save(a)
    Image.fromarray(img).save(b)
    out = subprocess.run(
        [sys.executable, "evaluate.py", "psnr", "--a", str(a), "--b", str(b)],
        capture_output=True, text=True, cwd=".",
    )
    assert out.returncode == 0
    assert "inf" in out.stdout.lower() or "PSNR" in out.stdout
