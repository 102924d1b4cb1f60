"""scripts/grad_shares.py smoke: per-loss generator gradient norms on a
tiny config (the ORIENT-gap analysis tool, VERDICT r4 weak #1)."""

import json
import os
import shutil

import pytest

pytestmark = pytest.mark.slow

DATA = "datasets/FFHQ_demo"


def _make_run(tmp_path):
    from michigan_tpu.config import Options

    root = tmp_path / "ds"
    for sub, src, suffix in [("train_images", "images", ""),
                             ("train_labels", "labels", ""),
                             ("train_dense_orients", "orients", "_orient_dense")]:
        os.makedirs(root / sub)
        for ident in ("59144", "60429", "67172"):
            ext = ".jpg" if sub == "train_images" else ".png"
            shutil.copyfile(f"{DATA}/{src}/{ident}{suffix}{ext}",
                            root / sub / f"{ident}{suffix}{ext}")
    ck = tmp_path / "ck"
    opt = Options(
        isTrain=True, crop_size=64, load_size=72, ngf=8, ndf=8,
        num_upsampling_layers="normal",
        batchSize=2, name="gs", checkpoints_dir=str(ck),
        data_dir=str(root), use_encoder=True,
        # keep the term set small so the per-term backward compiles stay
        # cheap: GAN + GAN_Feat + ORIENT + lab
        no_vgg_loss=True, no_style_loss=True, no_content_loss=True,
        no_rgb_loss=True, no_background_loss=True, no_confidence_loss=True,
    ).finalize()
    opt.save(str(ck / "gs" / "opt.json"))
    return root, ck


def test_grad_shares_smoke(tmp_path, capsys):
    from scripts.grad_shares import main

    root, ck = _make_run(tmp_path)
    out = tmp_path / "gs.json"
    main(["--checkpoints_dir", str(ck), "--name", "gs",
          "--data_dir", str(root), "--out", str(out), "--batchSize", "2"])
    rec = json.load(open(out))
    terms = rec["terms"]
    assert {"GAN", "GAN_Feat", "ORIENT", "lab"} <= set(terms)
    for k, v in terms.items():
        assert v["grad_norm"] >= 0 and 0 <= v["share_of_sum"] <= 1, k
    assert abs(sum(v["share_of_sum"] for v in terms.values()) - 1) < 0.01
    assert rec["total_grad_norm"] > 0
