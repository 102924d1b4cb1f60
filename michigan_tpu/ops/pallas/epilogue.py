"""Fused conv3x3 + instance-norm + activation (+ residual) epilogue kernel.

PERF.md's Pallas policy found that *norm-only* kernels lose end-to-end:
XLA fuses each norm's elementwise passes into the surrounding convolutions,
which a standalone pallas_call cannot join.  The round-2 verdict's open
question is whether a kernel that includes the convolution wins — conv,
stats, normalize, activation and the residual add in ONE VMEM residency,
writing the block output exactly once to HBM.

Target class: the IG/SIG dilated resblock stack (models/inpaint.py) —
12 blocks of 3x3 conv (dil 2 then 1) + IN + ReLU at 64^2 x 256, the
VMEM-resident lane-aligned shape where the norm-only kernels tied.  The
convolution is expressed as 9 shifted (HW, C) x (C, Co) MXU matmuls over the
reflect-padded input, accumulated in fp32.

IG/SIG run frozen under stop_gradient (pix2pix_model.py:196-201), so no VJP
is needed — the same condition that gates the norm-only kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from michigan_tpu.ops.pallas.spade import MAX_INTERPRET_GRID_STEPS, _interpret


def _xla_reference(x_pad, w, b, dilation, act, eps, residual):
    """The exact unfused composition this kernel replaces."""
    from michigan_tpu.models.layers import _conv
    from michigan_tpu.ops.norms import instance_norm

    y = _conv(x_pad, w, 1, ((0, 0), (0, 0)),
              rhs_dilation=(dilation, dilation) if dilation != 1 else None)
    if b is not None:
        y = y + b.astype(y.dtype)
    y = instance_norm(y, eps)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "lrelu":
        y = jax.nn.leaky_relu(y, 0.2)
    if residual is not None:
        y = residual + y
    return y


def _kernel(x_ref, w_ref, b_ref, *rest, H, W, d, act, eps):
    """One (batch, Co-block) cell: conv as 9 shifted MXU matmuls -> IN ->
    act (+res).  Instance-norm statistics are per-channel over HW, so the
    output-channel tiling is exact; the x block is revisited (fetched once)
    across consecutive Co steps.

    Argument order is (inputs..., outputs...): with a residual there are
    four input refs, so `rest` is either (out_ref,) or (res_ref, out_ref).
    """
    res_ref = rest[:-1]
    out_ref = rest[-1]
    cob = out_ref.shape[3]
    x = x_ref[0]  # (Hp, Wp, C) VMEM-resident
    # contract C in-place on the (H, W, C) layout — no (HW, C) reshape,
    # whose sublane<->lane relayout materializes per-tap copies on the
    # Mosaic stack and blows the scoped-VMEM limit
    acc = jnp.zeros((H, W, cob), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = x[dy * d:dy * d + H, dx * d:dx * d + W, :]
            acc = acc + jax.lax.dot_general(
                sl, w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0].astype(jnp.float32)[None, None, :]
    mean = jnp.sum(acc, axis=(0, 1), keepdims=True) / (H * W)
    var = jnp.sum((acc - mean) ** 2, axis=(0, 1), keepdims=True) / (H * W)
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "lrelu":
        y = jnp.where(y > 0, y, 0.2 * y)
    if res_ref:
        y = y + res_ref[0][0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def conv3x3_in_act(
    x_pad: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    dilation: int = 1,
    act: str | None = None,
    eps: float = 1e-5,
    residual: jax.Array | None = None,
) -> jax.Array:
    """Fused [3x3 conv (pre-padded input) -> instance norm -> act (+res)].

    x_pad: (N, H + 2*dilation, W + 2*dilation, C) — already reflect-padded.
    w: (3, 3, C, Co) HWIO (spectral normalization applied by the caller).
    Falls back to the identical XLA composition when the plane doesn't fit
    the VMEM-resident single-pass budget or channels are lane-misaligned.
    """
    n, hp, wp, c = x_pad.shape
    d = dilation
    H, W = hp - 2 * d, wp - 2 * d
    co = w.shape[3]
    cob = min(co, 128)

    # per-cell VMEM: x block + fp32 accumulator + out/res/w blocks, with
    # pipeline double-buffering headroom — budget well under the 16M limit
    resident = (
        hp * wp * c * 2 + H * W * cob * 4 + 2 * H * W * cob * 2
        + 9 * c * cob * 2
    ) <= 8 * 1024 * 1024
    aligned = c % 128 == 0 and co % 128 == 0
    if not (resident and aligned) or (
        _interpret() and n * (co // cob) > MAX_INTERPRET_GRID_STEPS
    ):
        return _xla_reference(x_pad, w, b, dilation, act, eps, residual)

    wk = w.astype(x_pad.dtype)
    bk = b.reshape(1, co).astype(jnp.float32)
    x_spec = pl.BlockSpec((1, hp, wp, c), lambda i, j: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((3, 3, c, cob), lambda i, j: (0, 0, 0, j),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, cob), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, H, W, cob), lambda i, j: (i, 0, 0, j),
                          memory_space=pltpu.VMEM)
    operands = [x_pad, wk, bk]
    in_specs = [x_spec, w_spec, b_spec]
    if residual is not None:
        operands.append(residual)
        in_specs.append(o_spec)
    return pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, d=d, act=act, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, H, W, co), x_pad.dtype),
        grid=(n, co // cob),
        in_specs=in_specs,
        out_specs=o_spec,
        # double-buffered blocks + the fp32 accumulator and its elementwise
        # temps overflow Mosaic's default 16M scoped budget; v5e has the
        # physical VMEM to run this resident
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*operands)
