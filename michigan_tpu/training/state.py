"""Train state: parameter partitioning, TTUR optimizers, LR schedule.

Mirrors Pix2PixModel.create_optimizers (pix2pix_model.py:124-152) and the
trainer's epoch-level linear LR decay with the TTUR split
(trainers/pix2pix_trainer.py:99-119): G trains netG (+netE, +netB), D trains
netD (netD2 for the unpair stage); TTUR uses betas (0, 0.9) and lr/2 / lr*2.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct


def g_net_names(opt) -> tuple:
    names = []
    if not opt.fix_netG:
        names.append("netG")
    if opt.use_vae:
        names.append("netE")
    if opt.use_instance_feat:
        names.append("netFE")
    if opt.use_blender:
        names.append("netB")
    return tuple(names)


def d_net_names(opt) -> tuple:
    names = ["netD"]
    if opt.unpairTrain:
        names.append("netD2")
    return tuple(names)


def learning_rates(opt, epoch: int) -> tuple:
    """(G_lr, D_lr) after the reference's linear decay + TTUR split
    (pix2pix_trainer.py:99-119): decay starts after `niter` epochs."""
    if epoch > opt.niter:
        lrd = opt.lr / max(opt.niter_decay, 1)
        new_lr = opt.lr - lrd * (epoch - opt.niter)
    else:
        new_lr = opt.lr
    if opt.no_TTUR:
        return new_lr, new_lr
    return new_lr / 2.0, new_lr * 2.0


def make_optimizers(opt):
    if opt.no_TTUR:
        b1, b2 = opt.beta1, opt.beta2
        g_lr, d_lr = opt.lr, opt.lr
    else:
        b1, b2 = 0.0, 0.9
        g_lr, d_lr = opt.lr / 2.0, opt.lr * 2.0
    opt_g = optax.inject_hyperparams(optax.adam)(learning_rate=g_lr, b1=b1, b2=b2)
    opt_d = optax.inject_hyperparams(optax.adam)(learning_rate=d_lr, b1=b1, b2=b2)
    return opt_g, opt_d


def init_netd2_from_netd(variables):
    """--same_netD_model: start netD2 as a copy of netD (reference
    train_options.py:40 / util.load_network D2 logic).

    The copy MATERIALIZES fresh device buffers (a + 0): a structural copy
    that aliases netD's arrays puts the same buffer under two leaves of
    the donated train-step state, which the TPU backend rejects with
    InvalidArgument (donation is a no-op on CPU, so only device runs see
    it)."""
    variables = dict(variables)
    variables["netD2"] = jax.tree_util.tree_map(
        lambda a: a + 0, variables["netD"]
    )
    return variables


class TrainState(struct.PyTreeNode):
    """All device-resident training state (a single pytree for donation)."""

    variables: Dict[str, Any]       # per-net flax variable trees
    opt_g_state: Any
    opt_d_state: Any
    opt_d2_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, opt, variables):
        opt_g, opt_d = make_optimizers(opt)
        g_params = {n: variables[n]["params"] for n in g_net_names(opt)}
        d_params = {"netD": variables["netD"]["params"]}
        opt_g_state = opt_g.init(g_params)
        opt_d_state = opt_d.init(d_params)
        opt_d2_state = None
        if opt.unpairTrain:
            opt_d2_state = opt_d.init({"netD2": variables["netD2"]["params"]})
        return cls(
            variables=variables,
            opt_g_state=opt_g_state,
            opt_d_state=opt_d_state,
            opt_d2_state=opt_d2_state,
            step=jnp.zeros((), jnp.int32),
        )

    def set_learning_rate(self, opt, epoch: int) -> "TrainState":
        """Epoch-level LR update (host-side, between epochs)."""
        g_lr, d_lr = learning_rates(opt, epoch)

        def set_lr(state, lr):
            if state is None:
                return None
            # optax InjectHyperparamsState is a NamedTuple
            return state._replace(
                hyperparams={**state.hyperparams, "learning_rate": jnp.asarray(lr)}
            )

        return self.replace(
            opt_g_state=set_lr(self.opt_g_state, g_lr),
            opt_d_state=set_lr(self.opt_d_state, d_lr),
            opt_d2_state=set_lr(self.opt_d2_state, d_lr),
        )
