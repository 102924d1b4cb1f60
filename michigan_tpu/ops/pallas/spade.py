"""Fused SPADE normalization kernels.

The SPADE block normalizes x then applies `(1 + gamma) * x_hat + beta`
(reference normalization.py:101-118).  Composed in XLA this reads x from HBM
at least twice (stat pass + normalize pass) and gamma/beta once each; the
Pallas kernels below do the whole thing in one resident VMEM tile per
(batch, channel-block):

  fused_instance_norm(x[, gamma, beta])  per-(N,C) stats + modulate, 1 pass
  spade_modulate(x, mean, invstd, gamma, beta)  elementwise modulate for the
      syncbatch path (stats arrive from the cross-replica psum)

Layout: NHWC with C innermost (lane dim).  H*W is flattened to the sublane
axis, channels tiled in blocks of 128 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Interpret mode executes the grid as a trace-time Python loop — fine for
# test-sized grids, catastrophic for production shapes (the unrolled HLO
# explodes compile time).  Off-TPU, grids beyond this fall back to XLA.
MAX_INTERPRET_GRID_STEPS = 64


def _xla_instance_norm(x, gamma, beta, eps, act):
    from michigan_tpu.ops.norms import instance_norm

    y = instance_norm(x, eps)
    if gamma is not None:
        y = y * (1.0 + gamma) + beta
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "lrelu":
        y = jax.nn.leaky_relu(y, 0.2)
    return y


def _act(y, act):
    """Optional fused activation — saves one HBM round-trip per norm."""
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "lrelu":
        return jnp.where(y > 0, y, 0.2 * y)
    assert act is None, act
    return y


def _in_kernel(x_ref, out_ref, *, eps, act=None):
    """One (1, HW, Cb) block: stats over HW then normalize, all in VMEM."""
    x = x_ref[0].astype(jnp.float32)  # (HW, Cb)
    n = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) / n
    var = jnp.sum((x - mean) ** 2, axis=0, keepdims=True) / n
    inv = jax.lax.rsqrt(var + eps)
    out_ref[0] = _act((x - mean) * inv, act).astype(out_ref.dtype)


def _in_mod_kernel(x_ref, g_ref, b_ref, out_ref, *, eps, act=None):
    x = x_ref[0].astype(jnp.float32)
    n = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) / n
    var = jnp.sum((x - mean) ** 2, axis=0, keepdims=True) / n
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * inv
    out_ref[0] = _act(
        xhat * (1.0 + g_ref[0].astype(jnp.float32)) + b_ref[0].astype(jnp.float32),
        act,
    ).astype(out_ref.dtype)


def _in_stream_kernel(x_ref, out_ref, acc_ref, *, eps, hw, th, act=None):
    """Two-pass streaming instance norm: grid (N, CB, 2, T).

    Pass 0 accumulates (sum, ssq) per channel into VMEM scratch while tiles
    stream HBM->VMEM; pass 1 re-streams the same tiles and normalizes.  TPU
    grids iterate sequentially (last dim fastest) and scratch persists across
    steps, so the accumulator carries over tiles within one (n, cb) cell.
    Exactly 2 HBM reads + 1 write at ANY plane size — XLA's decomposition
    (mean pass, var pass, normalize pass) reads x three times.
    """
    p = pl.program_id(2)
    t = pl.program_id(3)

    @pl.when((p == 0) & (t == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # (th, cb)
    # rows beyond hw are zero padding; mask them out of the statistics
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + t * th
    valid = (row < hw).astype(jnp.float32)

    @pl.when(p == 0)
    def _():
        xv = x * valid
        acc_ref[0, :] += jnp.sum(xv, axis=0)
        acc_ref[1, :] += jnp.sum(xv * x, axis=0)

    @pl.when(p == 1)
    def _():
        mean = acc_ref[0, :] / hw
        var = acc_ref[1, :] / hw - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        out_ref[0] = _act(
            (x - mean[None, :]) * inv[None, :], act
        ).astype(out_ref.dtype)


def _in_stream_mod_kernel(x_ref, g_ref, b_ref, out_ref, acc_ref, *, eps, hw, th,
                          act=None):
    p = pl.program_id(2)
    t = pl.program_id(3)

    @pl.when((p == 0) & (t == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + t * th
    valid = (row < hw).astype(jnp.float32)

    @pl.when(p == 0)
    def _():
        xv = x * valid
        acc_ref[0, :] += jnp.sum(xv, axis=0)
        acc_ref[1, :] += jnp.sum(xv * x, axis=0)

    @pl.when(p == 1)
    def _():
        mean = acc_ref[0, :] / hw
        var = acc_ref[1, :] / hw - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        xhat = (x - mean[None, :]) * inv[None, :]
        out_ref[0] = _act(
            xhat * (1.0 + g_ref[0].astype(jnp.float32))
            + b_ref[0].astype(jnp.float32),
            act,
        ).astype(out_ref.dtype)


def _streaming_instance_norm(x, gamma, beta, eps, th=512, act=None):
    n, h, w, c = x.shape
    hw = h * w
    cb = 128
    c_pad = ((c + cb - 1) // cb) * cb
    th = min(th, hw)
    hw_pad = ((hw + th - 1) // th) * th

    def prep(a):
        a = a.reshape(n, hw, c)
        return jnp.pad(a, ((0, 0), (0, hw_pad - hw), (0, c_pad - c)))

    if _interpret() and n * (c_pad // cb) * 2 * (hw_pad // th) > MAX_INTERPRET_GRID_STEPS:
        return _xla_instance_norm(x, gamma, beta, eps, act)

    xf = prep(x)
    grid = (n, c_pad // cb, 2, hw_pad // th)
    tile = pl.BlockSpec(
        (1, th, cb), lambda i, j, p, t: (i, t, j), memory_space=pltpu.VMEM
    )
    # pass 0 only accumulates stats: pin gamma/beta/out to tile 0 there, so
    # the revisit optimization skips their fetch/flush until pass 1 (out gets
    # exactly one garbage flush at the p transition, then valid writes)
    lazy = pl.BlockSpec(
        (1, th, cb),
        lambda i, j, p, t: (i, jnp.where(p == 0, 0, t), j),
        memory_space=pltpu.VMEM,
    )
    scratch = [pltpu.VMEM((2, cb), jnp.float32)]
    if gamma is None:
        out = pl.pallas_call(
            functools.partial(_in_stream_kernel, eps=eps, hw=hw, th=th, act=act),
            out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
            grid=grid,
            in_specs=[tile],
            out_specs=lazy,
            scratch_shapes=scratch,
            interpret=_interpret(),
        )(xf)
    else:
        out = pl.pallas_call(
            functools.partial(
                _in_stream_mod_kernel, eps=eps, hw=hw, th=th, act=act
            ),
            out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
            grid=grid,
            in_specs=[tile, lazy, lazy],
            out_specs=lazy,
            scratch_shapes=scratch,
            interpret=_interpret(),
        )(xf, prep(gamma), prep(beta))
    return out[:, :hw, :c].reshape(n, h, w, c)


def fused_instance_norm(
    x: jax.Array,
    gamma: jax.Array | None = None,
    beta: jax.Array | None = None,
    eps: float = 1e-5,
    act: str | None = None,
) -> jax.Array:
    """Instance norm (+ optional SPADE modulation), fused.

    x, gamma, beta: (N,H,W,C).  Channel dim padded to a 128 multiple.
    Small planes run fully VMEM-resident (1 HBM read); larger planes stream
    HW tiles with a two-pass grid (2 reads) — no size limit.
    """
    n, h, w, c = x.shape
    hw = h * w
    cb = min(128, ((c + 127) // 128) * 128)
    c_pad = ((c + cb - 1) // cb) * cb
    resident = hw * cb * 4 <= 5 * 1024 * 1024

    if not _interpret():
        # Measured policy (PERF.md, TPU v5e, bs32 flagship shapes): the
        # one-pass VMEM-resident kernel beats XLA 1.3x; the streaming
        # two-pass kernel only matches it on aligned channels (1.13x) and
        # LOSES end-to-end once the c<128 pad copy and the broken
        # producer/consumer fusion are paid.  Compiled TPU therefore runs
        # Pallas only for resident, lane-aligned planes.
        if not resident or c % 128 != 0:
            return _xla_instance_norm(x, gamma, beta, eps, act)
    else:
        if not resident:
            return _streaming_instance_norm(x, gamma, beta, eps, act=act)
        if n * (c_pad // cb) > MAX_INTERPRET_GRID_STEPS:
            return _xla_instance_norm(x, gamma, beta, eps, act)

    xf = x.reshape(n, hw, c)
    if c_pad != c:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, c_pad - c)))
    grid = (n, c_pad // cb)
    specs = pl.BlockSpec((1, hw, cb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)

    if gamma is None:
        out = pl.pallas_call(
            functools.partial(_in_kernel, eps=eps, act=act),
            out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
            grid=grid,
            in_specs=[specs],
            out_specs=specs,
            interpret=_interpret(),
        )(xf)
    else:
        gf = gamma.reshape(n, hw, c)
        bf = beta.reshape(n, hw, c)
        if c_pad != c:
            gf = jnp.pad(gf, ((0, 0), (0, 0), (0, c_pad - c)))
            bf = jnp.pad(bf, ((0, 0), (0, 0), (0, c_pad - c)))
        out = pl.pallas_call(
            functools.partial(_in_mod_kernel, eps=eps, act=act),
            out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
            grid=grid,
            in_specs=[specs, specs, specs],
            out_specs=specs,
            interpret=_interpret(),
        )(xf, gf, bf)
    if c_pad != c:
        out = out[..., :c]
    return out.reshape(n, h, w, c)


def _mod_kernel(x_ref, mean_ref, inv_ref, g_ref, b_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)
    xhat = (x - mean_ref[...]) * inv_ref[...]
    out_ref[...] = (
        xhat * (1.0 + g_ref[...].astype(jnp.float32))
        + b_ref[...].astype(jnp.float32)
    ).astype(out_ref.dtype)


def spade_modulate(
    x: jax.Array, mean: jax.Array, invstd: jax.Array,
    gamma: jax.Array, beta: jax.Array,
) -> jax.Array:
    """(x - mean) * invstd * (1 + gamma) + beta, tiled over rows.

    mean/invstd are per-channel (C,) — the syncbatch statistics."""
    n, h, w, c = x.shape
    rows = n * h * w
    xf = x.reshape(rows, c)
    gf = gamma.reshape(rows, c)
    bf = beta.reshape(rows, c)
    block_r = 512
    r_pad = ((rows + block_r - 1) // block_r) * block_r
    c_pad = ((c + 127) // 128) * 128
    padder = lambda a: jnp.pad(a, ((0, r_pad - rows), (0, c_pad - c)))
    xf, gf, bf = padder(xf), padder(gf), padder(bf)
    mean_p = jnp.pad(mean.astype(jnp.float32), (0, c_pad - c)).reshape(1, c_pad)
    inv_p = jnp.pad(invstd.astype(jnp.float32), (0, c_pad - c)).reshape(1, c_pad)

    unaligned = c % 128 != 0 or rows % block_r != 0
    if (not _interpret() and unaligned) or (
        _interpret() and r_pad // block_r > MAX_INTERPRET_GRID_STEPS
    ):
        # pad copies cost more than the fusion saves (PERF.md policy)
        m = mean.astype(jnp.float32).reshape(1, 1, 1, c)
        iv = invstd.astype(jnp.float32).reshape(1, 1, 1, c)
        return ((x - m) * iv * (1.0 + gamma) + beta).astype(x.dtype)

    grid = (r_pad // block_r,)
    row_spec = pl.BlockSpec((block_r, c_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mod_kernel,
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=grid,
        in_specs=[row_spec, vec_spec, vec_spec, row_spec, row_spec],
        out_specs=row_spec,
        interpret=_interpret(),
    )(xf, mean_p, inv_p, gf, bf)
    return out[:rows, :c].reshape(n, h, w, c)
