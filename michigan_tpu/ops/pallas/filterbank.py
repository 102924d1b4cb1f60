"""Fused 32-orientation filter bank: conv + relu + argmax/max in one kernel.

The XLA path (ops/filters.py) materializes the (N,H,W,32) response tensor in
HBM before the argmax.  Here the whole padded gray plane for one image sits
in VMEM and a fori_loop walks row tiles, accumulating all 32 responses
across the 17x17 taps and reducing to (argmax index, max response) in
registers — only the 2 reduced channels ever reach HBM.

Falls back to the XLA path when the plane exceeds the VMEM budget (e.g.
1024^2 inputs), where tiled-HBM streaming would be needed.

KNOWN LIMITATION: the current Mosaic compiler rejects two formulations of
this kernel — unaligned halo row loads ("cannot statically prove that index
in dimension 1 is a multiple of 8"; fixed by the aligned-superblock loads
below) and the (th,w)->(th,w,1) rank-expansion reshape feeding the
broadcast accumulate (tpu.reshape layout unsupported).  Compiled-TPU
execution therefore routes to the XLA conv+argmax path (`force=True`
attempts the kernel anyway); interpret-mode correctness is tested
(tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from michigan_tpu.ops.filters import (
    KERNEL_SIZE,
    NUM_KERNELS,
    _dog_bank_np,
    _gabor_bank_np,
)

VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def filterbank_orientation(gray: jax.Array, mode: str = "gabor", tile_h: int = 64,
                           force: bool = False):
    """(N,H,W,1) gray -> (idx int32 (N,H,W), raw max response (N,H,W)).

    Matches ops.filters.orientation_response (same clamp-then-argmax,
    first-index tie-break).
    """
    # numpy bank (the jnp variant would be a tracer under jit), laid out
    # (orientation, tap) to match the kernel's leading-axis accumulation
    bank = _gabor_bank_np() if mode == "gabor" else _dog_bank_np()
    kmat = jnp.asarray(bank[:, :, 0, :].reshape(-1, NUM_KERNELS).T.copy())
    n, h, w = gray.shape[0], gray.shape[1], gray.shape[2]
    pad = KERNEL_SIZE // 2

    th = min(tile_h, h)
    h_pad = ((h + th - 1) // th) * th
    plane_bytes = (h_pad + 2 * pad) * (w + 2 * pad) * 4
    if plane_bytes > VMEM_BUDGET_BYTES or (not _interpret() and not force):
        # compiled-TPU path blocked on Mosaic sublane alignment (see module
        # docstring) — XLA's conv+argmax is used there
        from michigan_tpu.ops.filters import orientation_response

        idx, conf = orientation_response(gray, mode)
        return idx, conf

    x = jnp.pad(gray[..., 0], ((0, 0), (pad, pad + h_pad - h), (pad, pad)))
    # note: bottom padding rows only feed discarded tile outputs

    blk_rows = th + 2 * pad  # 8-aligned when th is (pad=8)

    def kernel(x_ref, k_ref, idx_ref, conf_ref):
        def body(j, _):
            # one aligned superblock load per tile (dynamic start j*th is a
            # multiple of the sublane count); halo offsets become static
            # value slices, which Mosaic can lower.  The response carries the
            # orientation index on the LEADING axis — trailing-axis rank
            # expansion is unsupported by this Mosaic version.
            blk = x_ref[0, pl.ds(j * th, blk_rows), :]
            resp = jnp.zeros((NUM_KERNELS, th, w), jnp.float32)
            for dy in range(KERNEL_SIZE):
                for dx in range(KERNEL_SIZE):
                    tap = jax.lax.slice(blk, (dy, dx), (dy + th, dx + w))
                    wgt = k_ref[:, dy * KERNEL_SIZE + dx]  # (NUM,)
                    resp = resp + wgt[:, None, None] * tap[None, :, :]
            resp = jnp.maximum(resp, 0.0)
            idx_ref[0, pl.ds(j * th, th), :] = jnp.argmax(resp, 0).astype(jnp.int32)
            conf_ref[0, pl.ds(j * th, th), :] = jnp.max(resp, 0)
            return 0

        jax.lax.fori_loop(0, h_pad // th, body, 0)

    idx, conf = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, h_pad, w), jnp.int32),
            jax.ShapeDtypeStruct((n, h_pad, w), jnp.float32),
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, h_pad + 2 * pad, w + 2 * pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h_pad, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_pad, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(x, kmat)
    return idx[:, :h, :], conf[:, :h, :]
