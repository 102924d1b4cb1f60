"""Checkpoint save/load via Orbax (replacing util/util.py:195-272's
torch.save/load of per-net state_dicts).

Layout: checkpoints/<name>/<epoch>/ orbax PyTree of
  {"variables": {net: tree}, "opt_g": ..., "opt_d": ..., "opt_d2": ...,
   "step": int}
`latest` is a directory symlink-free copy (epoch tag string, like the
reference's `latest_net_G.pth` naming).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(opt, epoch: str) -> str:
    return os.path.abspath(os.path.join(opt.checkpoints_dir, opt.name, str(epoch)))


def save_checkpoint(opt, epoch, state) -> str:
    """Save full TrainState (training/state.TrainState) or a bare variables
    dict (inference-only)."""
    path = _ckpt_dir(opt, epoch)
    payload = state if isinstance(state, dict) else {
        "variables": state.variables,
        "opt_g": state.opt_g_state,
        "opt_d": state.opt_d_state,
        "opt_d2": state.opt_d2_state,
        "step": state.step,
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, payload), force=True)
    return path


def load_checkpoint(opt, epoch) -> Optional[Dict[str, Any]]:
    path = _ckpt_dir(opt, epoch)
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path)


def restore_train_state(opt, epoch, state):
    """Restore a saved TrainState INTO `state`'s pytree structure.

    A raw orbax restore yields plain dicts, which silently destroys the
    optax NamedTuple states (e.g. InjectHyperparamsState) — the first
    resumed optimizer update then crashes on `.hyperparams`.  Restoring
    against an `item=` template rebuilds the exact structure.  Returns
    None when no checkpoint exists.
    """
    import jax.numpy as jnp

    path = _ckpt_dir(opt, epoch)
    if not os.path.exists(path):
        return None
    template = {
        "variables": state.variables,
        "opt_g": state.opt_g_state,
        "opt_d": state.opt_d_state,
        "opt_d2": state.opt_d2_state,
        "step": state.step,
    }
    ckptr = ocp.PyTreeCheckpointer()
    data = ckptr.restore(
        path, item=jax.tree_util.tree_map(np.asarray, template)
    )
    as_dev = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    return state.replace(
        variables=as_dev(data["variables"]),
        opt_g_state=as_dev(data["opt_g"]),
        opt_d_state=as_dev(data["opt_d"]),
        opt_d2_state=as_dev(data["opt_d2"]),
        step=jnp.asarray(data["step"]),
    )


def load_variables(opt, epoch) -> Optional[Dict[str, Any]]:
    data = load_checkpoint(opt, epoch)
    if data is None:
        return None
    return data["variables"] if "variables" in data else data


def load_pretrained_torch(opt, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Load the released torch checkpoints when present
    (pix2pix_model.py:178-201 + util/util.py:245-272):
      checkpoints/<name>/<which_epoch>_net_G.pth  -> netG
      checkpoints/<name>/InpaintingModel_gen.pth  -> netIG (key 'generator')
      checkpoints/<name>/SInpaintingModel_gen.pth -> netSIG
    Missing files leave the randomly-initialized variables in place.
    """
    from michigan_tpu.training import convert as CV

    base = os.path.join(opt.checkpoints_dir, opt.name)
    g_path = os.path.join(base, f"{opt.which_epoch}_net_G.pth")
    if os.path.exists(g_path):
        state = CV.load_pth(g_path)
        variables = dict(variables)
        variables["netG"] = jax.tree_util.tree_map(
            np.asarray, CV.convert_generator(state, opt)
        )
        print(f"loaded converted torch generator from {g_path}")
    if opt.use_ig:
        ig_path = os.path.join(base, opt.ig_model_name)
        if os.path.exists(ig_path):
            state = CV.load_pth(ig_path, key="generator")
            variables = dict(variables)
            variables["netIG"] = jax.tree_util.tree_map(
                np.asarray, CV.convert_inpaint(state)
            )
            print(f"loaded converted torch IG from {ig_path}")
    if opt.use_stroke:
        sig_path = os.path.join(base, opt.sig_model_name)
        if os.path.exists(sig_path):
            state = CV.load_pth(sig_path, key="generator")
            variables = dict(variables)
            variables["netSIG"] = jax.tree_util.tree_map(
                np.asarray, CV.convert_inpaint(state)
            )
            print(f"loaded converted torch SIG from {sig_path}")
    return variables
