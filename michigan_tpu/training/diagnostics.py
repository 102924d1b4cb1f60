"""On-device training diagnostics for long-run monitoring.

The reference's only training-health instrumentation was a commented-out NaN
counter (trainers/pix2pix_trainer.py:45-56).  For GAN-stability evidence a
soak run needs more: parameter-norm drift per net, the spectral-norm sigma
the power iteration is actually estimating (from the persisted u/v state),
and the batch-norm running-stat trajectory.  All of it is computed on device
in ONE jitted program returning a handful of scalars, so sampling it at
print cadence costs microseconds of compute and a tiny host fetch (the
remote-TPU relay makes bulk fetches expensive — PERF.md).
"""

from __future__ import annotations

from typing import Any, Dict


def _sigma_leaves(spectral: Dict, params: Dict, out: list, path: str = ""):
    """Walk the 'spectral' collection; at each {u, v} leaf pair the params
    tree holds the matching 'kernel' at the same module path.  sigma = u·Wv
    with torch's (O, I*kh*kw) flatten — exact for TorchConv layers (netG /
    netD have no transpose convs; IG/SIG are frozen so their constant sigma
    is not worth the flip correction)."""
    import jax.numpy as jnp

    if not isinstance(spectral, dict):
        return
    if "u" in spectral and "v" in spectral and isinstance(params, dict):
        kernel = params.get("kernel")
        if kernel is not None:
            from michigan_tpu.ops.norms import l2_normalize

            u = spectral["u"]
            w_mat = jnp.transpose(kernel.astype(jnp.float32), (3, 2, 0, 1))
            w_mat = w_mat.reshape(u.shape[0], -1)
            # one read-only power iteration: the stored (u, v) lag one
            # optimizer step behind W (they were iterated against the
            # pre-update weight), so raw u.Wv can even go negative; a
            # fresh iteration gives the true sigma>=0 estimate without
            # touching the persisted state
            v = l2_normalize(w_mat.T @ u)
            u = l2_normalize(w_mat @ v)
            out.append((path, jnp.vdot(u, w_mat @ v)))
        return
    for k, sub in spectral.items():
        _sigma_leaves(sub, params.get(k, {}) if isinstance(params, dict) else {},
                      out, f"{path}/{k}" if path else k)


def make_diag_fn(nets=("netG", "netD", "netD2")):
    """Returns a jitted `diag(variables) -> {name: scalar}`:

    - ``pnorm_<net>``     global L2 norm of trainable params
    - ``sn_sigma_mean/max_<net>``  spectral-norm sigma estimate u·Wv over
      every spectral conv of the net (tracks the power-iteration state)
    - ``bn_mean_absmax_<net>``, ``bn_var_max_<net>``  running-stat extremes
      over all batch-norm layers (divergence shows up here first)
    """
    import jax
    import jax.numpy as jnp

    def diag(variables: Dict[str, Any]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for net in nets:
            coll = variables.get(net)
            if not coll:
                continue
            params = coll.get("params")
            if params:
                sq = sum(
                    jnp.sum(jnp.square(leaf.astype(jnp.float32)))
                    for leaf in jax.tree_util.tree_leaves(params)
                )
                out[f"pnorm_{net}"] = jnp.sqrt(sq)
            spectral = coll.get("spectral")
            if spectral and params:
                sig: list = []
                _sigma_leaves(spectral, params, sig)
                if sig:
                    sigmas = jnp.stack([s for _, s in sig])
                    out[f"sn_sigma_mean_{net}"] = jnp.mean(sigmas)
                    out[f"sn_sigma_max_{net}"] = jnp.max(sigmas)
            bstats = coll.get("batch_stats")
            if bstats:
                flat = jax.tree_util.tree_flatten_with_path(bstats)[0]
                means = [v for p, v in flat if "running_mean" in str(p)]
                vars_ = [v for p, v in flat if "running_var" in str(p)]
                if means:
                    out[f"bn_mean_absmax_{net}"] = jnp.max(
                        jnp.concatenate([jnp.abs(m.ravel()) for m in means])
                    )
                if vars_:
                    out[f"bn_var_max_{net}"] = jnp.max(
                        jnp.concatenate([v.ravel() for v in vars_])
                    )
        return out

    return jax.jit(diag)
