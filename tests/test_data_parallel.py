"""SPMD correctness: the 8-way sharded train step must reproduce the
single-device step exactly — same global batch, same losses, same updated
params (cross-replica BN via psum == full-batch BN; pmean'd shard gradients
== full-batch gradients).  This is the 'fake multi-node' validation the
reference never had (SURVEY §4)."""

import numpy as np

import jax
import jax.numpy as jnp

from michigan_tpu.config import Options
from michigan_tpu.parallel.mesh import make_mesh
from michigan_tpu.training.state import TrainState
from michigan_tpu.training.train_step import make_train_steps
import pytest

pytestmark = pytest.mark.slow  # heavy compile tier; fast tier: -m 'not slow'


def tiny_opt():
    # use_ig=False keeps the compiled program small: the 256^2 inpainting
    # stage is stop-gradient w.r.t. DP equivalence, and outsized XLA:CPU
    # programs have aborted the compiler on some of this container's hosts
    return Options(
        isTrain=True, crop_size=64, load_size=64, ngf=8, ndf=8, batchSize=8,
        use_encoder=True, use_ig=False, noise_background=True,
        num_upsampling_layers="normal", donate_buffers=False,
    ).finalize()


def tiny_batch(opt, n=8, seed=0):
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


def test_sharded_step_matches_single_device():
    assert jax.device_count() >= 8, "conftest provides 8 virtual devices"
    opt = tiny_opt()
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    extra = jnp.asarray(1, jnp.int32)

    model_s, g_single, d_single = make_train_steps(opt, mesh=None)
    variables = model_s.init_variables(rng, batch)
    state_s = TrainState.create(opt, variables)
    state_s, g_losses_s, _, _ = g_single(state_s, batch, rng, extra)
    state_s, d_losses_s = d_single(state_s, batch, rng, extra)

    mesh = make_mesh("data:-1", jax.devices()[:8])
    model_m, g_multi, d_multi = make_train_steps(opt, mesh=mesh)
    # same init: param trees are identical pytrees regardless of mesh
    state_m = TrainState.create(opt, variables)
    state_m, g_losses_m, _, _ = g_multi(state_m, batch, rng, extra)
    state_m, d_losses_m = d_multi(state_m, batch, rng, extra)

    # losses: the sharded path folds a per-shard rng, so VAE-free configs
    # must agree to float tolerance
    for k in g_losses_s:
        np.testing.assert_allclose(
            float(g_losses_s[k]), float(g_losses_m[k]), rtol=5e-3, atol=5e-4,
            err_msg=f"G loss {k} diverges between 1-dev and 8-dev",
        )
    for k in d_losses_s:
        np.testing.assert_allclose(
            float(d_losses_s[k]), float(d_losses_m[k]), rtol=5e-3, atol=5e-4,
            err_msg=f"D loss {k} diverges",
        )

    # updated generator params must match closely (Adam amplifies tiny grad
    # diffs by design; tolerance reflects fp32 reduction-order noise)
    pa = jax.tree_util.tree_leaves(state_s.variables["netG"]["params"])
    pb = jax.tree_util.tree_leaves(state_m.variables["netG"]["params"])
    worst = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(pa, pb)
    )
    assert worst < 5e-4, f"params diverge: max abs {worst}"

    # BN running stats identical (psum of shard sums == full-batch sums)
    sa = jax.tree_util.tree_leaves(state_s.variables["netG"]["batch_stats"])
    sb = jax.tree_util.tree_leaves(state_m.variables["netG"]["batch_stats"])
    for a, b in zip(sa, sb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_step_sharded_matches_single_device():
    """The fused one-program G+D step (the 512^2 config of record) must give
    the same losses/params over the 8-way data mesh as on one device — the
    shard_map wrapping composes with the fused body exactly like the
    sequential pair."""
    assert jax.device_count() >= 8
    opt = tiny_opt()
    opt.fused_step = True
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    extra = jnp.asarray(1, jnp.int32)

    model_s, *_rest, fused_single = make_train_steps(
        opt, mesh=None, with_fused=True)
    variables = model_s.init_variables(rng, batch)
    state_s = TrainState.create(opt, variables)
    state_s, g_losses_s, d_losses_s, _ = fused_single(state_s, batch, rng, extra)

    mesh = make_mesh("data:-1", jax.devices()[:8])
    _m, *_rest2, fused_multi = make_train_steps(opt, mesh=mesh, with_fused=True)
    state_m = TrainState.create(opt, variables)
    state_m, g_losses_m, d_losses_m, _ = fused_multi(state_m, batch, rng, extra)

    for k in g_losses_s:
        np.testing.assert_allclose(
            float(g_losses_s[k]), float(g_losses_m[k]), rtol=5e-3, atol=5e-4,
            err_msg=f"G loss {k} diverges between 1-dev and 8-dev fused",
        )
    for k in d_losses_s:
        np.testing.assert_allclose(
            float(d_losses_s[k]), float(d_losses_m[k]), rtol=5e-3, atol=5e-4,
            err_msg=f"D loss {k} diverges",
        )
    pa = jax.tree_util.tree_leaves(state_s.variables["netG"]["params"])
    pb = jax.tree_util.tree_leaves(state_m.variables["netG"]["params"])
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(pa, pb))
    assert worst < 5e-4, f"fused sharded params diverge: max abs {worst}"


def test_bf16_grad_allreduce_close_to_fp32():
    """--bf16_grad_allreduce halves the wire volume of the G/D grad pmean
    (the multi-chip lever from PERF.md).  The bf16 reduction must stay a
    *numerical* variant, not a semantic one: one sharded step with the flag
    must land within bf16 rounding of the fp32-reduction step."""
    assert jax.device_count() >= 8
    opt = tiny_opt()
    batch = tiny_batch(opt)
    rng = jax.random.PRNGKey(0)
    extra = jnp.asarray(1, jnp.int32)
    mesh = make_mesh("data:-1", jax.devices()[:8])

    model, g32, d32 = make_train_steps(opt, mesh=mesh)
    variables = model.init_variables(rng, batch)
    s32 = TrainState.create(opt, variables)
    s32, gl32, _, _ = g32(s32, batch, rng, extra)
    s32, dl32 = d32(s32, batch, rng, extra)

    opt_bf = tiny_opt()
    opt_bf.bf16_grad_allreduce = True
    _m, g16, d16 = make_train_steps(opt_bf, mesh=mesh)
    s16 = TrainState.create(opt_bf, variables)
    s16, gl16, _, _ = g16(s16, batch, rng, extra)
    s16, dl16 = d16(s16, batch, rng, extra)

    for k in gl32:
        a, b = float(gl32[k]), float(gl16[k])
        assert np.isfinite(b), f"G loss {k} not finite under bf16 all-reduce"
        # losses are computed BEFORE the update and pmean'd in fp32 either
        # way — they must match to shard-reduction noise
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4, err_msg=k)
    for k in dl32:
        assert np.isfinite(float(dl16[k])), f"D loss {k} not finite"

    # updated params: Adam normalizes by grad magnitude, so bf16 rounding of
    # the reduced grads perturbs the update by O(2^-8) relative — bounded,
    # not exact
    pa = jax.tree_util.tree_leaves(s32.variables["netG"]["params"])
    pb = jax.tree_util.tree_leaves(s16.variables["netG"]["params"])
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(pa, pb))
    assert worst < 5e-3, f"bf16 all-reduce params diverge: max abs {worst}"
    assert worst > 0.0, "bf16 all-reduce produced bit-identical params; flag inert?"
