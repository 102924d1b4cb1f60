"""3x3 SAME conv kernel for the low-channel / large-spatial shape class.

Round-4 probe evidence (PERF.md "Per-shape lever probes"): XLA's conv
emitter runs the 64-channel 256² shapes at 43 TFLOP/s effective — 101 % of
its own cost model's `optimal_seconds`, because its lowering re-reads
**5.0×** the tensor bytes (2.68 GB vs 0.54 GB naive for bs32 IG-enc),
turning a nominally MXU-bound conv into an HBM-bound one.  Every XLA-level
lever (NCHW, channel padding, output-phase packing, int8, AUTO layout,
flag search) measured unprofitable; the one remaining lever is a kernel
that keeps each input row-tile in VMEM and reads x exactly once.

This kernel: grid over batch, the whole (H+2, W+2, C) zero-padded plane
VMEM-resident per cell (8.5 MB at 258²×64 bf16 — v5e has the physical
VMEM, cf. ops/pallas/epilogue.py), an in-kernel loop over row tiles.  Two
compute strategies, selected by `im2col`:

  im2col=True  — build the (TH·W, 9·C) patch matrix by lane-concatenating
                 the 9 shifted slices, then ONE MXU matmul against the
                 (9·C, Co) reshaped kernel: contraction dim 9·64 = 576
                 fills the 128-lane MXU; Co=64 stays half-filled
                 (structural — the op's real output width).
  im2col=False — 9 shifted (TH·W, C) × (C, Co) matmuls accumulated in
                 fp32 (the epilogue kernel's strategy; K=64 quarter-fills
                 the MXU at this channel count).

Used for inference-path (frozen-tower) convs only — no VJP is defined;
training paths keep the XLA conv.  Falls back to XLA for shapes that
don't divide the tile or don't fit residency.

MEASURED OUTCOME (round-4 TPU A/B, PERF.md "low-channel conv kernel"):
both strategies LOSE to XLA at the target shapes (im2col 8.0 ms /
9-tap 8.3 ms vs XLA 5.6 ms at bs32 256² 64→64; 6.8 / 7.2 vs 6.0 at
64→128) — the HBM re-reads the kernel eliminates are replaced by
in-kernel VPU relayout traffic for the 9 shifted taps, and Co=64
leaves half the MXU lanes idle.  Kept in-tree, parity-tested (im2col
matches the XLA conv bit-for-bit on TPU), as the measured record that
closes the "custom conv" lever from the round-3 gap analysis.

Reference op: torch F.conv2d inside the reference's InpaintGenerator
encoder stack (/root/reference/models/networks/generator.py:472-520 class
usage; conv shapes from models/inpaint.py here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from michigan_tpu.ops.pallas.spade import MAX_INTERPRET_GRID_STEPS, _interpret


def _xla_reference(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _kernel(x_ref, w_ref, y_ref, scratch, *, H, W, C, TH, im2col):
    def body(t, _):
        r0 = t * TH
        taps = []
        for ky in range(3):
            rows = x_ref[0, pl.ds(r0 + ky, TH), :, :]  # (TH, W+2, C)
            for kx in range(3):
                taps.append(rows[:, kx:kx + W, :])  # (TH, W, C)
        if im2col:
            # a direct lane-concatenate of the 9 shifted slices does not
            # compile (Mosaic: "result/input offset mismatch on non-concat
            # dimension" — the kx shifts leave mismatched vector offsets);
            # staging each tap through VMEM scratch normalizes the layouts
            # and matches the XLA conv bit-for-bit on TPU
            for i, tap in enumerate(taps):
                scratch[:, :, pl.ds(i * C, C)] = tap
            a = scratch[...].reshape(TH * W, 9 * C)
            acc = jax.lax.dot_general(
                a, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc = None
            for i, tap in enumerate(taps):
                part = jax.lax.dot_general(
                    tap.reshape(TH * W, C),
                    w_ref[pl.ds(i * C, C), :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        y_ref[0, pl.ds(r0, TH), :, :] = (
            acc.reshape(TH, W, -1).astype(y_ref.dtype))
        return 0

    jax.lax.fori_loop(0, H // TH, body, 0)


def conv3x3_same_lowch(x, w, *, tile_rows: int = 16, im2col: bool = True):
    """y = SAME 3x3 conv (stride 1, no dilation), NHWC x HWIO.

    x: (N, H, W, C); w: (3, 3, C, Co).  Forward-only (no VJP) — intended
    for the frozen inference towers.  Falls back to the XLA conv when the
    shape doesn't fit the kernel's residency/tiling contract.
    """
    n, h, wd, c = x.shape
    co = w.shape[3]
    th = tile_rows
    hp, wp = h + 2, wd + 2
    resident = (
        hp * wp * c * 2 + h * wd * co * 2  # x + y blocks (bf16)
        + th * wd * 9 * c * 2 + th * wd * co * 4  # im2col + fp32 acc
    ) * 2 <= 100 * 1024 * 1024  # double-buffered pipeline headroom
    if h % th or not resident or (
            _interpret() and n > MAX_INTERPRET_GRID_STEPS):
        return _xla_reference(x, w)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2 = w.reshape(9 * c, co).astype(x.dtype)  # (ky,kx,ci) row order
    return pl.pallas_call(
        functools.partial(_kernel, H=h, W=wd, C=c, TH=th, im2col=im2col),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, co), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th, wd, 9 * c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xp, w2)
