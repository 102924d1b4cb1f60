"""Bound the spectral-norm / BN update-cadence divergence (torch-vs-torch A/B).

This repo persists spectral u/v and BN running stats once per optimizer step
(the variables written back by that step's program — models/layers.py,
ops/norms.py), while the reference mutates them on EVERY train-mode forward:
the G step's forward, the D step's no-grad G forward, and the D forward
inside the G loss all iterate u/v and update running stats
(sync_batchnorm/batchnorm.py:137-145, torch spectral_norm hooks).

Cross-framework trajectory comparison would confound this cadence question
with backend numerics, so the A/B runs BOTH cadences in the reference's own
torch trainer, identically seeded:

  A (reference): stock Pix2PixTrainer G-step + D-step per batch.
  B (this repo's cadence): identical, except buffer mutations that this
    repo does NOT persist are rolled back each phase —
      - netD's u/v+running stats are restored after the G step (here, the D
        forward inside the G loss never writes netD variables), and
      - netG's u/v+running stats are restored after the D step (here, the
        D step's G recompute never writes netG variables).

Reported: per-step loss deltas and final parameter drift between A and B
over N steps.  Small numbers close VERDICT r3 weak-item 5 quantitatively.

Usage:  python scripts/cadence_ab.py [--steps 100] [--out PERF_cadence.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _buffers(net, kinds=("weight_u", "weight_v", "running_mean",
                         "running_var", "num_batches_tracked")):
    import torch

    out = {}
    for k, v in net.state_dict().items():
        if any(k.endswith(s) or s in k for s in kinds):
            out[k] = v.clone() if isinstance(v, torch.Tensor) else v
    return out


def _restore(net, saved):
    sd = net.state_dict()
    for k, v in saved.items():
        sd[k].copy_(v)


def _make_batches(opt, n_batches, seed=0):
    import torch

    g = np.random.default_rng(seed)
    s, n = opt.crop_size, opt.batchSize
    batches = []
    for _ in range(n_batches):
        lab = g.integers(0, 2, (n, 1, s, s)).astype(np.float32)
        batches.append({
            "label_ref": torch.tensor(lab),
            "label_tag": torch.tensor(lab),  # paired: ref_is_tag losses on
            "instance": torch.tensor(0),
            "image_ref": torch.tensor(g.uniform(-1, 1, (n, 3, s, s)).astype(np.float32)),
            "image_tag": torch.tensor(g.uniform(-1, 1, (n, 3, s, s)).astype(np.float32)),
            "orient": torch.tensor(g.uniform(0, 255, (n, 1, s, s)).astype(np.float32)),
            "hole": torch.tensor(g.integers(0, 2, (n, 1, s, s)).astype(np.float32)),
            "orient_rgb": torch.tensor(g.uniform(0, 1, (n, 3, s, s)).astype(np.float32)),
            "noise": torch.tensor(g.uniform(0, 1, (n, 3, s, s)).astype(np.float32)),
        })
    return batches


def _build(opt_ns):
    import torch

    from reference_oracle import import_reference_pipeline

    REF = import_reference_pipeline()  # noqa: F841 — installs stubs/sys.path
    # the reference hardcodes .cuda() in a few constructors
    # (e.g. StyleContentLoss, loss.py:659) — no-op them for the CPU A/B;
    # both arms run under the same shim so the comparison is unaffected
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    # the reference's TTUR branch passes betas=(0, 0.9) (pix2pix_model.py:141);
    # newer torch rejects mixed int/float betas — coerce for both arms
    _adam_init = torch.optim.Adam.__init__

    def _patched(self, params, lr=1e-3, betas=(0.9, 0.999), **kw):
        torch.optim.Adam.__init__ = _adam_init
        try:
            _adam_init(self, params, lr=lr,
                       betas=tuple(float(b) for b in betas), **kw)
        finally:
            torch.optim.Adam.__init__ = _patched

    torch.optim.Adam.__init__ = _patched
    torch.manual_seed(0)
    sys.path.insert(0, "/root/reference")
    # the reference's xyz2lab helper indexes with `1 - mask` on a bool
    # tensor (loss.py:443), rejected by modern torch — replace with the
    # equivalent torch.where (same substitution test_loss_parity.py uses)
    from models.networks import loss as ref_loss

    ref_loss.LabColorLoss.f = lambda self, x: torch.where(
        x > 0.008856, x.clamp(min=1e-20) ** (1 / 3), 7.787 * x + 0.137931
    )

    def _xyz2lab(self, x):
        xyz_f = self.f(x)
        y = x[:, 1]
        l = torch.where(y > 0.008856, 116 * xyz_f[:, 1] - 16, 903.3 * y)
        a = 500 * (xyz_f[:, 0] - xyz_f[:, 1])
        b = 200 * (xyz_f[:, 1] - xyz_f[:, 2])
        return torch.stack([l, a, b], dim=1)

    ref_loss.LabColorLoss.xyz2lab = _xyz2lab
    from trainers.pix2pix_trainer import Pix2PixTrainer

    return Pix2PixTrainer(opt_ns)


def run(steps: int, our_cadence: bool, perturb: float = 0.0):
    import torch

    from michigan_tpu.config import Options
    from reference_oracle import torch_opt

    opt = Options(
        isTrain=True, crop_size=64, load_size=64, ngf=8, ndf=8, batchSize=2,
        use_encoder=True, use_ig=False, noise_background=True,
        expand_mask_be=True,
        no_vgg_loss=True, no_style_loss=True, no_content_loss=True,
        no_orient_loss=True, num_upsampling_layers="normal",
        serial_batches=True, nThreads=0,
    ).finalize()
    topt = torch_opt(opt)
    topt.gpu_ids = []
    topt.continue_train = False
    # newer torch.optim.Adam rejects mixed int/float betas
    topt.beta1, topt.beta2 = float(topt.beta1), float(topt.beta2)

    trainer = _build(topt)
    model = trainer.pix2pix_model_on_one_gpu
    if perturb:
        # chaos yardstick: stock cadence, one weight nudged by `perturb`.
        # GAN training amplifies any epsilon; cadence drift only matters
        # if it exceeds this inherent divergence rate.
        with torch.no_grad():
            w = next(model.netG.parameters())
            w.view(-1)[0] += perturb
    batches = _make_batches(opt, 4)

    g_curve, d_curve = [], []
    for step in range(steps):
        data = batches[step % len(batches)]
        if our_cadence:
            d_buf = _buffers(model.netD)
        trainer.run_generator_one_step(data)
        if our_cadence:
            _restore(model.netD, d_buf)
            g_buf = _buffers(model.netG)
        trainer.run_discriminator_one_step(data)
        if our_cadence:
            _restore(model.netG, g_buf)
        g_curve.append(float(sum(trainer.g_losses.values()).mean()))
        d_curve.append(float(sum(trainer.d_losses.values()).mean()))
    params = {
        "G": {k: v.detach().clone() for k, v in model.netG.named_parameters()},
        "D": {k: v.detach().clone() for k, v in model.netD.named_parameters()},
    }
    buffers = {
        "G": {k: v.detach().clone() for k, v in model.netG.state_dict().items()
              if k not in params["G"]},
        "D": {k: v.detach().clone() for k, v in model.netD.state_dict().items()
              if k not in params["D"]},
    }
    with torch.no_grad():
        probe = model(batches[0], mode="inference").float().clone()
    return g_curve, d_curve, params, buffers, probe


def rel_drift(pa, pb):
    import torch

    num = den = 0.0
    for k in pa:
        a, b = pa[k].float(), pb[k].float()
        num += float(((a - b) ** 2).sum())
        den += float((a ** 2).sum())
    return (num / max(den, 1e-12)) ** 0.5


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--out", default="artifacts/cadence_ab.json")
    args = ap.parse_args(argv)

    ga, da, pa, ba, oa = run(args.steps, our_cadence=False)
    gb, db, pb, bb, ob = run(args.steps, our_cadence=True)
    # chaos control: stock cadence, single weight nudged 1e-6 at step 0
    gc_, dc_, pc, bc, oc = run(args.steps, our_cadence=False, perturb=1e-6)

    g_delta = [abs(a - b) for a, b in zip(ga, gb)]
    d_delta = [abs(a - b) for a, b in zip(da, db)]
    result = {
        "steps": args.steps,
        "config": "64^2 ngf8 ndf8 bs2 paired, GAN+GANFeat+background+rgb+lab",
        "g_loss_mean_abs_delta": float(np.mean(g_delta)),
        "g_loss_max_abs_delta": float(np.max(g_delta)),
        "g_loss_final_a": ga[-1], "g_loss_final_b": gb[-1],
        "d_loss_mean_abs_delta": float(np.mean(d_delta)),
        "d_loss_max_abs_delta": float(np.max(d_delta)),
        "g_loss_mean_abs": float(np.mean(np.abs(ga))),
        "d_loss_mean_abs": float(np.mean(np.abs(da))),
        "netG_weight_rel_drift": rel_drift(pa["G"], pb["G"]),
        "netD_weight_rel_drift": rel_drift(pa["D"], pb["D"]),
        "netG_buffer_rel_drift": rel_drift(ba["G"], bb["G"]),
        "netD_buffer_rel_drift": rel_drift(ba["D"], bb["D"]),
        "probe_mean_abs_delta": float((oa - ob).abs().mean()),
        "probe_mean_abs": float(oa.abs().mean()),
        # same metrics for the 1e-6-perturbation control (inherent GAN
        # divergence under the STOCK cadence): cadence is only a material
        # divergence if its numbers exceed these
        "control": {
            "g_loss_mean_abs_delta": float(np.mean(
                [abs(a - b) for a, b in zip(ga, gc_)])),
            "netG_weight_rel_drift": rel_drift(pa["G"], pc["G"]),
            "netD_weight_rel_drift": rel_drift(pa["D"], pc["D"]),
            "probe_mean_abs_delta": float((oa - oc).abs().mean()),
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(result, open(args.out, "w"), indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
