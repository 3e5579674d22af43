"""Whole-sequence (multi-step) LSTM as a single Pallas TPU kernel.

The encoder's recurrent scan is the residual hot spot after the input
projections are hoisted (models/layers.py:lstm_scan): XLA's ``lax.scan``
executes 80 sequential loop iterations, each a small (2·B, H)x(H, 4H)
matmul fusion (~117 TFLOP/s at B=256 — 2.1x off the bf16 MXU floor) plus a
dynamic-update-slice to stage the step output, re-fetching the recurrent
weights from HBM every step.

This kernel runs the ENTIRE recurrence in one pallas_call: the per-
direction recurrent weights live in VMEM across all T steps (fetched
once), the (h, c) state lives in scratch, the precomputed input
projections stream in per-step blocks (double-buffered by the pipeline),
and step outputs are written straight to their output block — no
update-slices, no weight re-fetch, no scan-carry copies.

Matches ``layers.lstm_scan``'s masked packed-sequence semantics: padded
steps carry state through and emit zeros, so the final (h, c) is the state
at each row's last valid step. Operand precision matches the XLA path on
TPU (bf16 matmul operands via XLA's DEFAULT policy; gates accumulate and
combine in fp32).

Used for the encoder's direction-stacked layers (ND=2); eval paths only —
the kernel defines no custom VJP (training keeps the lax.scan).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(
    xproj_ref,   # (1, ND, BM, 4H) f32 — this step's input projections (+biases)
    w_ref,       # (ND, H, 4H) bf16 — recurrent weights, resident across steps
    mask_ref,    # (BM, T) f32 — full row-tile mask (1 = valid)
    out_ref,     # (1, ND, BM, H) f32 out — this step's hidden output
    h_last_ref,  # (ND, BM, H) f32 out — final state (written at t == T-1)
    c_last_ref,  # (ND, BM, H) f32 out
    h_scr,       # (ND, BM, H) f32 scratch
    c_scr,       # (ND, BM, H) f32 scratch
    *,
    nd: int,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    # Per-direction recurrent matmul (weights differ per direction).
    gates = xproj_ref[0]  # (ND, BM, 4H)
    recur = jnp.stack(
        [
            jnp.dot(
                h[d].astype(jnp.bfloat16),
                w_ref[d],
                preferred_element_type=jnp.float32,
            )
            for d in range(nd)
        ]
    )
    gates = gates + recur
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)

    # Select column t of the resident (BM, T) mask with an iota compare —
    # lane-dim dynamic slicing is awkward on TPU, a masked reduce is free.
    BM, T = mask_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (BM, T), dimension=1)
    m_t = jnp.sum(jnp.where(lane == t, mask_ref[:], 0.0), axis=1)  # (BM,)
    m = m_t[None, :, None]  # (1, BM, 1)
    h_keep = jnp.where(m > 0, h_new, h)
    c_keep = jnp.where(m > 0, c_new, c)
    h_scr[:] = h_keep
    c_scr[:] = c_keep
    out_ref[0] = jnp.where(m > 0, h_new, jnp.zeros_like(h_new))

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        h_last_ref[:] = h_keep
        c_last_ref[:] = c_keep


def lstm_seq_pallas(
    xproj: Array,             # (T, ND, B, 4H) input projections + biases, f32
    w_hh: Array,              # (ND, H, 4H)
    mask: Optional[Array],    # (B, T) 1=valid, or None
    block_b: int = 128,
    interpret: bool = False,
) -> Tuple[Array, Tuple[Array, Array]]:
    """Full LSTM recurrence over T steps for ND direction-stacked rows.

    Returns (outputs (T, ND, B, H), (h_last, c_last) each (ND, B, H)).
    """
    T, ND, B, H4 = xproj.shape
    H = H4 // 4
    if B % block_b != 0:
        block_b = 8 if B % 8 == 0 else 1
    if mask is None:
        mask_bt = jnp.ones((B, T), jnp.float32)
    else:
        mask_bt = mask.astype(jnp.float32)  # (B, T)

    grid = (B // block_b, T)  # T innermost: state folds sequentially per tile
    kern = functools.partial(_kernel, nd=ND)
    outs, h_last, c_last = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, ND, block_b, H4), lambda i, t: (t, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((ND, H, H4), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, T), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, ND, block_b, H), lambda i, t: (t, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((ND, block_b, H), lambda i, t: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ND, block_b, H), lambda i, t: (0, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, ND, B, H), jnp.float32),
            jax.ShapeDtypeStruct((ND, B, H), jnp.float32),
            jax.ShapeDtypeStruct((ND, B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ND, block_b, H), jnp.float32),
            pltpu.VMEM((ND, block_b, H), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * ND * B * H * H4,
            bytes_accessed=4 * T * ND * B * (H4 + H) + 2 * ND * H * H4,
            transcendentals=4 * T * ND * B * H,
        ),
    )(xproj, w_hh.astype(jnp.bfloat16), mask_bt)
    return outs, (h_last, c_last)
