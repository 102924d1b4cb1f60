"""Sharded G/D train steps.

The reference alternates `run_generator_one_step` / `run_discriminator_one_step`
under DataParallel (pix2pix_trainer.py:39-77).  Here each step is one
`shard_map`-wrapped pure function over the data mesh axis: batch sharded on N,
state replicated, gradients averaged with a single `psum`, BN statistics
psum'd inside the forward (ops/norms.batch_stats), optimizer update applied
identically on every shard.  Buffers are donated so params update in place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from michigan_tpu.model import MichiGANModel
from michigan_tpu.parallel.mesh import DATA_AXIS
from michigan_tpu.utils.xla_options import compiler_options
from michigan_tpu.training.state import (
    TrainState,
    g_net_names,
    make_optimizers,
)


def _merge_params(variables, part_params):
    out = dict(variables)
    for name, p in part_params.items():
        net = dict(out[name])
        net["params"] = p
        out[name] = net
    return out


def _merge_updates(variables, net_name, updates):
    """Fold mutable-collection updates (batch_stats/spectral) back in."""
    out = dict(variables)
    net = dict(out[net_name])
    for coll, tree in updates.items():
        net[coll] = tree
    out[net_name] = net
    return out


def make_train_steps(opt, mesh=None, ab_count=None, with_fused=False):
    """Builds the model (with the mesh's axis name threaded into the
    syncbatch-norm modules) and returns (model, g_step, d_step):
      g_step(state, batch, rng, extra_dilate) -> (state, losses, fake, orient)
      d_step(state, batch, rng, extra_dilate, fake=None, orient=None)
        -> (state, losses)

    With `with_fused=True` a 4th element is returned:
      fused_step(state, batch, rng, extra_dilate)
        -> (state, g_losses, d_losses, fake)
    — the G update and the D update compiled as ONE program (same
    semantics as g_step followed by d_step: D's recompute sees the
    post-update G params, exactly like the sequential pair and the
    reference's eager alternation).  One dispatch per step instead of two,
    and XLA's scheduler can overlap the G optimizer update with the start
    of the D pass.  Only meaningful for 1:1 G/D alternation.

    With --unpairTrain, the reference re-dispatches the stage eagerly every
    step (pix2pix_trainer.py:61-77; train.py:42-95 alternates per epoch).
    Under jit, the stage must be a trace-time constant: one program is
    compiled per `curr_step` value and the wrappers below pick the right
    compiled function per call from `opt.curr_step` (a Python-level read,
    never traced), so mutating `opt.curr_step` between epochs works.
    """
    axis = DATA_AXIS if mesh is not None else None
    model = MichiGANModel(opt, axis_name=axis)
    opt_g_tx, opt_d_tx = make_optimizers(opt)
    g_names = g_net_names(opt)

    def _grad_pmean(grads):
        """Cross-shard gradient mean.  With --bf16_grad_allreduce the
        reduction itself runs in bfloat16 — halving the wire volume of the
        step's dominant collective (the fp32 G-grad tree; PERF.md) — and
        the mean is upcast back before the fp32 optimizer update."""
        if opt.bf16_grad_allreduce:
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.bfloat16), grads)
            grads = jax.lax.pmean(grads, axis)
            return jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32), grads)
        return jax.lax.pmean(grads, axis)

    def _f32(batch):
        """Decode the compact device batch INSIDE the program (the casts
        and scales fuse into consumers, so only the ~quarter-size wire
        batch persists in HBM between steps).  The uint8 wire
        (dataset.py get_sample / train.py device_batch) ships raw pixels:
        images decode with the exact ToTensor+Normalize math
        (v/127.5 - 1 == (v/255 - 0.5)/0.5 bitwise for uint8 v); labels /
        orient / hole are value-preserving casts.  bf16 and fp32 entries
        pass through as plain upcasts."""
        out = {}
        for k, v in batch.items():
            if v.dtype == jnp.uint8 and k in ("image_ref", "image_tag"):
                out[k] = v.astype(jnp.float32) / 127.5 - 1.0
            else:
                out[k] = v.astype(jnp.float32)
        return out

    def make_g_step_local(curr_step):
        def g_step_local(state: TrainState, batch, rng, extra_dilate):
            batch = _f32(batch)
            if axis is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

            def loss_fn(g_params):
                variables = _merge_params(state.variables, g_params)
                total, aux = model.generator_loss(
                    variables, batch, rng, ab_count=ab_count,
                    extra_dilate_steps=extra_dilate, curr_step=curr_step,
                )
                return total, aux

            g_params = {n: state.variables[n]["params"] for n in g_names}
            (total, (losses, fake, updates, orient)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(g_params)
            if axis is not None:
                grads = _grad_pmean(grads)
                losses = jax.lax.pmean(losses, axis)

            upd, new_opt_state = opt_g_tx.update(grads, state.opt_g_state, g_params)
            new_params = optax.apply_updates(g_params, upd)
            variables = _merge_params(state.variables, new_params)
            variables = _merge_updates(variables, "netG", updates)
            state = state.replace(
                variables=variables, opt_g_state=new_opt_state, step=state.step + 1
            )
            return state, losses, fake, orient

        return g_step_local

    def make_d_body(curr_step):
        d_name = "netD2" if (opt.unpairTrain and curr_step == 2) else "netD"

        def body(state: TrainState, batch, rng, extra_dilate, fake, orient):
            batch = _f32(batch)
            if axis is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

            def loss_fn(d_params):
                variables = _merge_params(state.variables, d_params)
                total, losses = model.discriminator_loss(
                    variables, batch, rng, extra_dilate_steps=extra_dilate,
                    curr_step=curr_step, fake_image=fake, orient=orient,
                )
                return total, losses

            d_params = {d_name: state.variables[d_name]["params"]}
            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
            if axis is not None:
                grads = _grad_pmean(grads)
                losses = jax.lax.pmean(losses, axis)

            opt_state = (
                state.opt_d2_state if d_name == "netD2" else state.opt_d_state
            )
            upd, new_opt_state = opt_d_tx.update(grads, opt_state, d_params)
            new_params = optax.apply_updates(d_params, upd)
            variables = _merge_params(state.variables, new_params)
            if d_name == "netD2":
                state = state.replace(variables=variables, opt_d2_state=new_opt_state)
            else:
                state = state.replace(variables=variables, opt_d_state=new_opt_state)
            return state, losses

        return body

    def make_d_step_local(curr_step, reuse_fake=False, reuse_orient=False):
        body = make_d_body(curr_step)

        if reuse_fake and reuse_orient:
            def d_step_local(state, batch, rng, extra_dilate, fake, orient):
                return body(state, batch, rng, extra_dilate, fake, orient)
        elif reuse_fake:
            def d_step_local(state, batch, rng, extra_dilate, fake):
                return body(state, batch, rng, extra_dilate, fake, None)
        elif reuse_orient:
            def d_step_local(state, batch, rng, extra_dilate, orient):
                return body(state, batch, rng, extra_dilate, None, orient)
        else:
            def d_step_local(state, batch, rng, extra_dilate):
                return body(state, batch, rng, extra_dilate, None, None)

        return d_step_local

    donate = (0,) if opt.donate_buffers else ()
    batch_spec = P(DATA_AXIS)
    rep = P()

    def compile_step(fn, out_specs, n_extra_sharded=0):
        if mesh is not None:
            in_specs = (rep, batch_spec, rep, rep) + (batch_spec,) * n_extra_sharded
            fn = shard_map(
                fn, mesh=mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_rep=False,
            )
        return jax.jit(fn, donate_argnums=donate,
                       compiler_options=compiler_options())

    stages = (1, 2) if opt.unpairTrain else (1,)
    g_steps = {
        s: compile_step(
            make_g_step_local(s), (rep, rep, batch_spec, batch_spec)
        )
        for s in stages
    }
    # reuse_orient_for_d (default on): the D step reuses the G step's
    # frozen-IG inpainted orientation — bit-exact (pure function of frozen
    # weights + batch), skips one IG forward per step.
    # --reuse_fake_for_d additionally skips the generator forward — the most
    # expensive op in the step (PERF.md) — but trains D on the pre-G-update
    # fake (documented divergence; off by default); not available with
    # use_blender (the G step's aux output is the pre-blend fake).
    reuse_fake = getattr(opt, "reuse_fake_for_d", False) and not opt.use_blender
    reuse_orient = getattr(opt, "reuse_orient_for_d", True) and opt.use_ig
    d_steps = {}
    for s in stages:
        for rf in ({False, reuse_fake}):
            for ro in ({False, reuse_orient}):
                n_shard = int(rf) + int(ro)
                d_steps[(s, rf, ro)] = compile_step(
                    make_d_step_local(s, reuse_fake=rf, reuse_orient=ro),
                    (rep, rep), n_extra_sharded=n_shard,
                )

    def g_step(state, batch, rng, extra_dilate):
        return g_steps[opt.curr_step if opt.unpairTrain else 1](
            state, batch, rng, extra_dilate
        )

    def d_step(state, batch, rng, extra_dilate, fake=None, orient=None):
        s = opt.curr_step if opt.unpairTrain else 1
        rf = reuse_fake and fake is not None
        ro = reuse_orient and orient is not None
        args = (
            ((fake,) if rf else ()) + ((orient,) if ro else ())
        )
        return d_steps[(s, rf, ro)](state, batch, rng, extra_dilate, *args)

    if not with_fused:
        return model, g_step, d_step

    def make_fused_local(curr_step):
        g_local = make_g_step_local(curr_step)
        d_body = make_d_body(curr_step)

        def fused_local(state, batch, rng, extra_dilate):
            state, g_losses, fake, orient = g_local(state, batch, rng, extra_dilate)
            state, d_losses = d_body(
                state, batch, rng, extra_dilate,
                fake if reuse_fake else None,
                orient if reuse_orient else None,
            )
            return state, g_losses, d_losses, fake

        return fused_local

    fused_steps = {
        s: compile_step(make_fused_local(s), (rep, rep, rep, batch_spec))
        for s in stages
    }

    def fused_step(state, batch, rng, extra_dilate):
        return fused_steps[opt.curr_step if opt.unpairTrain else 1](
            state, batch, rng, extra_dilate
        )

    return model, g_step, d_step, fused_step
