"""Training-path behavior: step configs, LR schedule, checkpoint roundtrip."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile tier; fast tier: -m 'not slow'

import jax
import jax.numpy as jnp

from michigan_tpu.config import Options
from michigan_tpu.training.state import TrainState, learning_rates
from michigan_tpu.training.train_step import make_train_steps


def tiny_opt(**kw):
    d = dict(
        isTrain=True, crop_size=64, load_size=64, ngf=8, ndf=8, batchSize=2,
        use_encoder=True, use_ig=True, noise_background=True,
        num_upsampling_layers="normal", donate_buffers=False,
    )
    d.update(kw)
    return Options(**d).finalize()


def tiny_batch(opt, n=2, seed=0):
    rng = np.random.default_rng(seed)
    s = opt.crop_size
    return {
        "label_ref": jnp.asarray(rng.integers(0, 2, (n, s, s, 1)), jnp.float32),
        "label_tag": jnp.asarray(rng.integers(0, 2, (n, s, s, 1)), jnp.float32),
        "image_ref": jnp.asarray(rng.uniform(-1, 1, (n, s, s, 3)), jnp.float32),
        "image_tag": jnp.asarray(rng.uniform(-1, 1, (n, s, s, 3)), jnp.float32),
        "orient": jnp.asarray(rng.uniform(0, 255, (n, s, s, 1)), jnp.float32),
        "hole": jnp.asarray(rng.integers(0, 2, (n, s, s, 1)), jnp.float32),
        "orient_rgb": jnp.asarray(rng.uniform(0, 1, (n, s, s, 3)), jnp.float32),
        "noise": jnp.asarray(rng.uniform(0, 1, (n, s, s, 3)), jnp.float32),
    }


def run_one_gd(opt):
    model, g_step, d_step = make_train_steps(opt)
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, batch)
    state = TrainState.create(opt, variables)
    extra = jnp.asarray(1, jnp.int32)
    state, g_losses, fake, orient = g_step(state, batch, rng, extra)
    state, d_losses = d_step(state, batch, rng, extra, orient=orient)
    for k, v in {**g_losses, **d_losses}.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    return state, g_losses, d_losses


def test_vae_config():
    opt = tiny_opt(use_vae=True, use_encoder=False)
    state, g_losses, _ = run_one_gd(opt)
    assert "KLD" in g_losses


def test_blender_config():
    opt = tiny_opt(use_blender=True)
    state, g_losses, _ = run_one_gd(opt)
    assert "GAN" in g_losses


def test_unpair_step2_config():
    opt = tiny_opt(unpairTrain=True, curr_step=2)
    state, g_losses, d_losses = run_one_gd(opt)
    assert "hairAvgLab" in g_losses
    # step 2 must have trained netD2's optimizer
    assert state.opt_d2_state is not None


def test_unpair_stage_alternation_not_stale():
    """Regression: with --unpairTrain the reference alternates stage-2 then
    stage-1 per epoch (reference train.py:42-95).  Mutating opt.curr_step must
    select a *different* compiled program — a single traced step would bake in
    whichever stage ran first (the round-1 stale-jit bug)."""
    opt = tiny_opt(unpairTrain=True, curr_step=2)
    model, g_step, d_step = make_train_steps(opt)
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, batch)
    state = TrainState.create(opt, variables)
    extra = jnp.asarray(1, jnp.int32)

    # epoch part A: stage 2 (unpair)
    d2_before = jax.tree_util.tree_leaves(
        state.variables["netD2"]["params"])[0].copy()
    state, g2, _, _ = g_step(state, batch, rng, extra)
    state, _ = d_step(state, batch, rng, extra)
    assert "hairAvgLab" in g2 and "VGG" not in g2 and "GAN_Feat" not in g2
    d2_after = jax.tree_util.tree_leaves(
        state.variables["netD2"]["params"])[0]
    assert not np.allclose(np.asarray(d2_before), np.asarray(d2_after))

    # epoch part B: stage 1 (paired) through the SAME step product
    opt.curr_step = 1
    d1_before = jax.tree_util.tree_leaves(
        state.variables["netD"]["params"])[0].copy()
    d2_snap = jax.tree_util.tree_leaves(
        state.variables["netD2"]["params"])[0].copy()
    state, g1, _, _ = g_step(state, batch, rng, extra)
    state, _ = d_step(state, batch, rng, extra)
    assert "VGG" in g1 and "GAN_Feat" in g1 and "hairAvgLab" not in g1
    d1_after = jax.tree_util.tree_leaves(state.variables["netD"]["params"])[0]
    d2_still = jax.tree_util.tree_leaves(state.variables["netD2"]["params"])[0]
    assert not np.allclose(np.asarray(d1_before), np.asarray(d1_after)), (
        "stage-1 D step must train netD")
    np.testing.assert_array_equal(np.asarray(d2_snap), np.asarray(d2_still))


def test_no_ig_remat_config():
    opt = tiny_opt(use_ig=False, remat=True)
    run_one_gd(opt)


def test_params_change_and_frozen_nets_do_not():
    opt = tiny_opt()
    model, g_step, d_step = make_train_steps(opt)
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, batch)
    state = TrainState.create(opt, variables)
    g0 = jax.tree_util.tree_leaves(variables["netG"]["params"])[0].copy()
    ig0 = jax.tree_util.tree_leaves(variables["netIG"]["params"])[0].copy()
    state, _, _, _ = g_step(state, batch, rng, jnp.asarray(0))
    g1 = jax.tree_util.tree_leaves(state.variables["netG"]["params"])[0]
    ig1 = jax.tree_util.tree_leaves(state.variables["netIG"]["params"])[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1)), "netG did not train"
    np.testing.assert_array_equal(np.asarray(ig0), np.asarray(ig1))  # IG frozen


def test_learning_rate_schedule():
    opt = tiny_opt(niter=10, niter_decay=10, lr=0.0002)
    g, d = learning_rates(opt, epoch=1)
    assert g == pytest.approx(0.0001) and d == pytest.approx(0.0004)  # TTUR
    g, d = learning_rates(opt, epoch=15)
    assert g == pytest.approx(0.0001 / 2) and d == pytest.approx(0.0004 / 2)
    opt2 = tiny_opt(no_TTUR=True, niter=10, niter_decay=10)
    g, d = learning_rates(opt2, epoch=1)
    assert g == d == pytest.approx(0.0002)


def test_checkpoint_roundtrip(tmp_path):
    from michigan_tpu.training import checkpoint as CK

    opt = tiny_opt(checkpoints_dir=str(tmp_path), name="t")
    model, g_step, d_step = make_train_steps(opt)
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, batch)
    state = TrainState.create(opt, variables)
    state, _, _, _ = g_step(state, batch, rng, jnp.asarray(0))

    CK.save_checkpoint(opt, "latest", state)
    restored = CK.load_checkpoint(opt, "latest")
    assert restored is not None
    a = jax.tree_util.tree_leaves(state.variables["netG"]["params"])[0]
    b = jax.tree_util.tree_leaves(restored["variables"]["netG"]["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["step"]) == 1


def test_reuse_fake_for_d_matches_recompute():
    """--reuse_fake_for_d: feeding d_step the CURRENT-weights fake must give
    exactly the losses of the recompute path (proves only the generator
    forward is skipped, nothing else changes)."""
    opt = tiny_opt(reuse_fake_for_d=True)
    model, g_step, d_step = make_train_steps(opt)
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, batch)
    state = TrainState.create(opt, variables)
    extra = jnp.asarray(1, jnp.int32)

    # fake from the current weights, exactly as discriminator_loss builds it
    pre = model.preprocess(batch)
    orient = model._orient_for_training(state.variables, pre)
    fake, _, _, _ = model.generate_fake(
        state.variables, pre, orient, rng=rng, train=True, mutable=False,
        extra_dilate_steps=extra,
    )
    _, losses_reuse = d_step(state, batch, rng, extra, fake=fake)
    _, losses_recompute = d_step(state, batch, rng, extra)
    for k in losses_recompute:
        np.testing.assert_allclose(
            np.asarray(losses_reuse[k]), np.asarray(losses_recompute[k]),
            rtol=1e-5, atol=1e-6,
        )


def test_fused_step_matches_sequential():
    """--fused_step: the one-program G+D update must reproduce the sequential
    g_step -> d_step pair (same post-step params, same losses) — it is the
    same computation handed to XLA as a single module."""
    opt = tiny_opt(fused_step=True)
    model, g_step, d_step, fused_step = make_train_steps(opt, with_fused=True)
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, batch)
    extra = jnp.asarray(1, jnp.int32)

    state_a = TrainState.create(opt, variables)
    state_a, g_a, fake_a, orient_a = g_step(state_a, batch, rng, extra)
    state_a, d_a = d_step(state_a, batch, rng, extra, orient=orient_a)

    state_b = TrainState.create(opt, variables)
    state_b, g_b, d_b, _fake = fused_step(state_b, batch, rng, extra)

    # Not bit-exact: the single module lets XLA fuse/reassociate float
    # reductions differently than the two-program pair.  For params there is
    # a known amplifier: where the TRUE gradient is numerically ~0, the two
    # compilations can disagree on its SIGN, and Adam's first step turns a
    # sign flip into a full ±lr update (m/sqrt(v) = sign(g) at step 1) — a
    # per-element diff up to 2*lr that grows with XLA-version reassociation
    # drift.  So params are compared with (a) a hard per-element bound of
    # 2.5x the largest LR (the sign-flip ceiling) and (b) a cap on how many
    # elements exceed float-noise tolerance (isolated noise gradients only);
    # a semantic divergence (wrong stage/loss/params) moves most elements.
    for k in g_a:
        np.testing.assert_allclose(
            np.asarray(g_a[k]), np.asarray(g_b[k]), rtol=1e-4, atol=1e-5)
    for k in d_a:
        np.testing.assert_allclose(
            np.asarray(d_a[k]), np.asarray(d_b[k]), rtol=1e-4, atol=1e-5)
    max_lr = 2.0 * opt.lr  # TTUR D side
    n_bad = n_tot = 0
    for net in ("netG", "netD"):
        for a, b in zip(
            jax.tree_util.tree_leaves(state_a.variables[net]["params"]),
            jax.tree_util.tree_leaves(state_b.variables[net]["params"]),
        ):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            diff = np.abs(a - b)
            assert diff.max() <= 2.5 * max_lr, (
                f"{net}: param diff {diff.max():.2e} exceeds the Adam "
                f"sign-flip ceiling {2.5 * max_lr:.2e}"
            )
            n_bad += int((diff > (1e-4 * np.abs(b) + 1e-5)).sum())
            n_tot += diff.size
    assert n_bad <= max(1e-3 * n_tot, 8), (
        f"{n_bad}/{n_tot} param elements diverge beyond float noise — "
        "that is semantic, not reassociation"
    )


def test_fused_step_unpair_stage_alternation():
    """--fused_step with --unpairTrain: one fused program is compiled per
    stage; mutating opt.curr_step must dispatch to the other stage's program
    (stage-2 losses = hairAvgLab/no VGG training netD2, stage-1 the reverse)
    — the fused path must not reintroduce the round-1 stale-jit bug."""
    opt = tiny_opt(unpairTrain=True, curr_step=2, fused_step=True)
    model, _g, _d, fused_step = make_train_steps(opt, with_fused=True)
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, batch)
    state = TrainState.create(opt, variables)
    extra = jnp.asarray(1, jnp.int32)

    d2_before = jax.tree_util.tree_leaves(
        state.variables["netD2"]["params"])[0].copy()
    state, g2, d2, _ = fused_step(state, batch, rng, extra)
    assert "hairAvgLab" in g2 and "VGG" not in g2 and "GAN_Feat" not in g2
    d2_after = jax.tree_util.tree_leaves(
        state.variables["netD2"]["params"])[0]
    assert not np.allclose(np.asarray(d2_before), np.asarray(d2_after))

    opt.curr_step = 1
    d1_before = jax.tree_util.tree_leaves(
        state.variables["netD"]["params"])[0].copy()
    d2_snap = jax.tree_util.tree_leaves(
        state.variables["netD2"]["params"])[0].copy()
    state, g1, d1, _ = fused_step(state, batch, rng, extra)
    assert "VGG" in g1 and "GAN_Feat" in g1 and "hairAvgLab" not in g1
    d1_after = jax.tree_util.tree_leaves(state.variables["netD"]["params"])[0]
    d2_still = jax.tree_util.tree_leaves(state.variables["netD2"]["params"])[0]
    assert not np.allclose(np.asarray(d1_before), np.asarray(d1_after)), (
        "stage-1 fused step must train netD")
    np.testing.assert_array_equal(np.asarray(d2_snap), np.asarray(d2_still))


def test_reuse_orient_for_d_is_exact():
    """reuse_orient_for_d (default on): handing d_step the G step's
    frozen-IG inpainted orientation must give EXACTLY the recompute losses —
    the IG output is a pure function of frozen weights + the batch."""
    opt = tiny_opt()
    model, g_step, d_step = make_train_steps(opt)
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, batch)
    state = TrainState.create(opt, variables)
    extra = jnp.asarray(1, jnp.int32)

    pre = jax.jit(model.preprocess)(batch)
    orient = jax.jit(
        lambda v: model._orient_for_training(v, pre)
    )(state.variables)
    _, losses_reuse = d_step(state, batch, rng, extra, orient=orient)
    _, losses_recompute = d_step(state, batch, rng, extra)
    for k in losses_recompute:
        np.testing.assert_array_equal(
            np.asarray(losses_reuse[k]), np.asarray(losses_recompute[k])
        )


def test_diagnostics_stream():
    """make_diag_fn returns finite param norms, spectral sigmas, BN stats."""
    from michigan_tpu.training.diagnostics import make_diag_fn

    opt = tiny_opt()
    state, _, _ = run_one_gd(opt)
    diag = make_diag_fn()(state.variables)
    for want in ("pnorm_netG", "pnorm_netD", "sn_sigma_mean_netD",
                 "sn_sigma_max_netD", "bn_mean_absmax_netG", "bn_var_max_netG"):
        assert want in diag, f"missing diagnostic {want}: {sorted(diag)}"
    for k, v in diag.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(diag["pnorm_netG"]) > 0
    assert float(diag["sn_sigma_max_netD"]) >= float(diag["sn_sigma_mean_netD"])


def test_netd2_copy_materializes_fresh_buffers():
    """--same_netD_model must COPY netD, not alias it: aliased leaves put
    one buffer under two donated state leaves, which the TPU backend
    rejects with InvalidArgument (donation is ignored on CPU, so this
    asserts buffer identity directly)."""
    import jax
    import jax.numpy as jnp

    from michigan_tpu.training.state import init_netd2_from_netd

    variables = {
        "netD": {"params": {"w": jnp.arange(8.0), "b": jnp.zeros((4, 4))}},
    }
    out = init_netd2_from_netd(variables)
    leaves_d = jax.tree_util.tree_leaves(out["netD"])
    leaves_d2 = jax.tree_util.tree_leaves(out["netD2"])
    assert len(leaves_d) == len(leaves_d2)
    for a, b in zip(leaves_d, leaves_d2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert a.unsafe_buffer_pointer() != b.unsafe_buffer_pointer()
