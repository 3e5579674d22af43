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

Used for the encoder's direction-stacked layers (ND=2). Two entry points:

* ``lstm_seq_pallas`` — eval paths (no residuals written, no VJP).
* ``lstm_seq_train`` — training: a ``jax.custom_vjp`` pair of kernels. The
  forward additionally streams out the per-step residuals the backward
  needs (activated gates, carried h/c states); the backward sweeps time in
  REVERSE inside one pallas_call per direction-group, with the recurrent
  weights AND the ``dW_hh`` accumulator VMEM-resident across all T steps —
  replacing XLA's reverse scan plus its per-step weight re-fetch and
  dynamic-slice residual reads (profiled at ~4.4 ms of a 38 ms training
  step at B=256 bf16, benchmarks/profile_train.py).
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
    xproj_ref,   # (1, ND, BM, 4H) — this step's input projections (+biases)
    w_ref,       # (ND, H, 4H) bf16 — recurrent weights, resident across steps
    mask_ref,    # (BM, T) f32 — full row-tile mask (1 = valid)
    out_ref,     # (1, ND, BM, H) out — this step's hidden output
    h_last_ref,  # (ND, BM, H) out — final state (written at t == T-1)
    c_last_ref,  # (ND, BM, H) out
    h_scr,       # (ND, BM, H) f32 scratch — state stays fp32 in any dtype
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
    gates = xproj_ref[0].astype(jnp.float32)  # (ND, BM, 4H)
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
    out_dtype = out_ref.dtype
    out_ref[0] = jnp.where(m > 0, h_new, jnp.zeros_like(h_new)).astype(out_dtype)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        h_last_ref[:] = h_keep.astype(out_dtype)
        c_last_ref[:] = c_keep.astype(out_dtype)


def lstm_seq_pallas(
    xproj: Array,             # (T, ND, B, 4H) input projections + biases
    w_hh: Array,              # (ND, H, 4H)
    mask: Optional[Array],    # (B, T) 1=valid, or None
    block_b: int = 128,
    interpret: bool = False,
) -> Tuple[Array, Tuple[Array, Array]]:
    """Full LSTM recurrence over T steps for ND direction-stacked rows.

    Accepts fp32 or bf16 ``xproj``; the carried (h, c) state accumulates in
    fp32 either way and outputs match ``xproj.dtype`` (under the bf16
    serving policy this is *better* state precision than the bf16
    ``lax.scan`` it replaces).
    Returns (outputs (T, ND, B, H), (h_last, c_last) each (ND, B, H)).
    """
    T, ND, B, H4 = xproj.shape
    dt = xproj.dtype
    H = H4 // 4
    if B % block_b != 0:
        # Pallas requires the row-block dim be 8-divisible OR equal to
        # the full array dim; block 1 with 1 < B < 8 is ILLEGAL (hit by
        # the B=4 decode-pipeline path), so small batches take the
        # whole-dim block.
        block_b = 8 if B % 8 == 0 else B
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
            jax.ShapeDtypeStruct((T, ND, B, H), dt),
            jax.ShapeDtypeStruct((ND, B, H), dt),
            jax.ShapeDtypeStruct((ND, B, H), dt),
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


# ---------------------------------------------------------------------------
# Training: custom-VJP forward + backward kernels
# ---------------------------------------------------------------------------


def _fwd_train_kernel(
    xproj_ref,   # (1, ND, BM, 4H) — this step's input projections (+biases)
    w_ref,       # (ND, H, 4H) bf16 — recurrent weights, resident across steps
    mask_ref,    # (BM, T) f32 — full row-tile mask (1 = valid)
    out_ref,     # (1, ND, BM, H) out — this step's hidden output
    h_last_ref,  # (ND, BM, H) out — final state (written at t == T-1)
    c_last_ref,  # (ND, BM, H) out
    gact_ref,    # (1, ND, BM, 4H) out — activated gates [i,f,g,o] (residual)
    hk_ref,      # (1, ND, BM, H) out — carried h state (residual)
    ck_ref,      # (1, ND, BM, H) out — carried c state (residual)
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
    gates = xproj_ref[0].astype(jnp.float32)  # (ND, BM, 4H)
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
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(gi)
    f = jax.nn.sigmoid(gf)
    g = jnp.tanh(gg)
    o = jax.nn.sigmoid(go)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    BM, T = mask_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (BM, T), dimension=1)
    m_t = jnp.sum(jnp.where(lane == t, mask_ref[:], 0.0), axis=1)  # (BM,)
    m = m_t[None, :, None]
    h_keep = jnp.where(m > 0, h_new, h)
    c_keep = jnp.where(m > 0, c_new, c)
    h_scr[:] = h_keep
    c_scr[:] = c_keep
    out_dtype = out_ref.dtype
    out_ref[0] = jnp.where(m > 0, h_new, jnp.zeros_like(h_new)).astype(out_dtype)
    gact_ref[0] = jnp.concatenate([i, f, g, o], axis=-1).astype(gact_ref.dtype)
    hk_ref[0] = h_keep
    ck_ref[0] = c_keep

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        h_last_ref[:] = h_keep.astype(out_dtype)
        c_last_ref[:] = c_keep.astype(out_dtype)


def _bwd_kernel(
    gact_ref,    # (1, 1, BM, 4H) — activated gates at step rt
    ck_ref,      # (1, 1, BM, H) f32 — carried c at rt
    ckp_ref,     # (1, 1, BM, H) f32 — carried c at max(rt-1, 0)
    hkp_ref,     # (1, 1, BM, H) f32 — carried h at max(rt-1, 0)
    w_ref,       # (1, H, 4H) bf16 — recurrent weights (this direction)
    mask_ref,    # (BM, T) f32
    dout_ref,    # (1, 1, BM, H) — cotangent of this step's output
    dhl_ref,     # (1, BM, H) — cotangent of the final h (read at rt == T-1)
    dcl_ref,     # (1, BM, H) — cotangent of the final c
    dxp_ref,     # (1, 1, BM, 4H) out — cotangent of xproj at rt
    dw_ref,      # (1, H, 4H) f32 out — dW_hh accumulator (VMEM-resident)
    dh_scr,      # (BM, H) f32 scratch — running dL/dh_keep[rt]
    dc_scr,      # (BM, H) f32 scratch
):
    b = pl.program_id(1)
    tr = pl.program_id(2)           # reverse index: 0 .. T-1
    T = pl.num_programs(2)
    rt = T - 1 - tr                 # real time index

    @pl.when(tr == 0)
    def _():
        dh_scr[:] = dhl_ref[0].astype(jnp.float32)
        dc_scr[:] = dcl_ref[0].astype(jnp.float32)

    @pl.when(jnp.logical_and(b == 0, tr == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    DH = dh_scr[:]
    DC = dc_scr[:]

    gact = gact_ref[0, 0].astype(jnp.float32)  # (BM, 4H)
    i, f, g, o = jnp.split(gact, 4, axis=-1)
    c_new = ck_ref[0, 0]
    first = (rt == 0).astype(jnp.float32)
    c_prev = ckp_ref[0, 0] * (1.0 - first)
    h_prev = hkp_ref[0, 0] * (1.0 - first)

    BM, T_m = mask_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (BM, T_m), dimension=1)
    m_t = jnp.sum(jnp.where(lane == rt, mask_ref[:], 0.0), axis=1)  # (BM,)
    m = m_t[:, None]  # (BM, 1)

    dout = dout_ref[0, 0].astype(jnp.float32)
    dh_new = m * (dout + DH)
    tanh_c = jnp.tanh(c_new)
    do_ = dh_new * tanh_c
    dc_new = m * DC + dh_new * o * (1.0 - tanh_c * tanh_c)
    di = dc_new * g
    dg = dc_new * i
    df = dc_new * c_prev
    dc_prev = dc_new * f + (1.0 - m) * DC

    dgates = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do_ * o * (1.0 - o),
        ],
        axis=-1,
    )  # (BM, 4H) f32

    # dL/dh_prev = dgates @ W_hh^T  (contract the 4H axis)
    dh_prev = jax.lax.dot_general(
        dgates.astype(jnp.bfloat16),
        w_ref[0],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + (1.0 - m) * DH

    # dW_hh += h_prev^T @ dgates  (contract the BM axis)
    dw_ref[0] += jax.lax.dot_general(
        h_prev.astype(jnp.bfloat16),
        dgates.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dxp_ref[0, 0] = dgates.astype(dxp_ref.dtype)
    dh_scr[:] = dh_prev
    dc_scr[:] = dc_prev


def _fwd_train(xproj, w_hh, mask_bt, block_b, interpret):
    T, ND, B, H4 = xproj.shape
    H = H4 // 4
    if B % block_b != 0:
        # Pallas requires the row-block dim be 8-divisible OR equal to
        # the full array dim; block 1 with 1 < B < 8 is ILLEGAL (hit by
        # the B=4 decode-pipeline path), so small batches take the
        # whole-dim block.
        block_b = 8 if B % 8 == 0 else B
    dt = xproj.dtype
    grid = (B // block_b, T)
    kern = functools.partial(_fwd_train_kernel, nd=ND)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ND, block_b, H4), lambda i, t: (t, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ND, H, H4), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, T), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ND, block_b, H), lambda i, t: (t, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ND, block_b, H), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ND, block_b, H), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ND, block_b, H4), lambda i, t: (t, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ND, block_b, H), lambda i, t: (t, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ND, block_b, H), lambda i, t: (t, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, ND, B, H), dt),
            jax.ShapeDtypeStruct((ND, B, H), dt),
            jax.ShapeDtypeStruct((ND, B, H), dt),
            jax.ShapeDtypeStruct((T, ND, B, H4), dt),       # gact
            jax.ShapeDtypeStruct((T, ND, B, H), jnp.float32),  # h_keep
            jax.ShapeDtypeStruct((T, ND, B, H), jnp.float32),  # c_keep
        ),
        scratch_shapes=[
            pltpu.VMEM((ND, block_b, H), jnp.float32),
            pltpu.VMEM((ND, block_b, H), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * ND * B * H * H4,
            bytes_accessed=4 * T * ND * B * (2 * H4 + 3 * H) + 2 * ND * H * H4,
            transcendentals=4 * T * ND * B * H,
        ),
    )(xproj, w_hh.astype(jnp.bfloat16), mask_bt)


def _bwd_train(res, douts, dh_last, dc_last, block_b, interpret):
    gact, h_keep, c_keep, w_hh, mask_bt = res
    T, ND, B, H4 = gact.shape
    H = H4 // 4
    if B % block_b != 0:
        # Pallas requires the row-block dim be 8-divisible OR equal to
        # the full array dim; block 1 with 1 < B < 8 is ILLEGAL (hit by
        # the B=4 decode-pipeline path), so small batches take the
        # whole-dim block.
        block_b = 8 if B % 8 == 0 else B
    dt = gact.dtype

    grid = (ND, B // block_b, T)  # t innermost (reverse), then rows, then dir

    def at_rt(t_to_rt):
        return lambda d, i, t: (t_to_rt(t), d, i, 0)

    rt = lambda t: T - 1 - t
    rt_prev = lambda t: jnp.maximum(T - 1 - t - 1, 0)

    dxproj, dw = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_b, H4), at_rt(rt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_b, H), at_rt(rt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_b, H), at_rt(rt_prev),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_b, H), at_rt(rt_prev),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, H4), lambda d, i, t: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, T), lambda d, i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_b, H), at_rt(rt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, H), lambda d, i, t: (d, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, H), lambda d, i, t: (d, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_b, H4), at_rt(rt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, H4), lambda d, i, t: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, ND, B, H4), dt),
            jax.ShapeDtypeStruct((ND, H, H4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * T * ND * B * H * H4,
            bytes_accessed=4 * T * ND * B * (2 * H4 + 4 * H) + 6 * ND * H * H4,
            transcendentals=T * ND * B * H,
        ),
    )(
        gact,
        c_keep,
        c_keep,
        h_keep,
        w_hh.astype(jnp.bfloat16),
        mask_bt,
        douts,
        dh_last,
        dc_last,
    )
    return dxproj, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_seq_train(
    xproj: Array,            # (T, ND, B, 4H) input projections + biases
    w_hh: Array,             # (ND, H, 4H)
    mask_bt: Array,          # (B, T) f32, 1 = valid
    block_b: int = 128,
    interpret: bool = False,
) -> Tuple[Array, Tuple[Array, Array]]:
    """Differentiable whole-sequence LSTM (training path).

    Same semantics and operand precision as ``lstm_seq_pallas`` (masked
    packed-sequence carry-through; bf16 matmul operands, fp32 state and
    accumulation), but with a Pallas backward pass. Outputs match
    ``xproj.dtype``; gradients are exact for the kernel's own forward
    numerics (not a finite-difference approximation of the XLA scan's).
    """
    outs, h_last, c_last, _, _, _ = _fwd_train(
        xproj, w_hh, mask_bt, block_b, interpret
    )
    return outs, (h_last, c_last)


def _lstm_seq_train_fwd(xproj, w_hh, mask_bt, block_b, interpret):
    outs, h_last, c_last, gact, h_keep, c_keep = _fwd_train(
        xproj, w_hh, mask_bt, block_b, interpret
    )
    res = (gact, h_keep, c_keep, w_hh, mask_bt)
    return (outs, (h_last, c_last)), res


def _lstm_seq_train_bwd(block_b, interpret, res, cotangents):
    douts, (dh_last, dc_last) = cotangents
    w_hh = res[3]
    mask_bt = res[4]
    dxproj, dw = _bwd_train(res, douts, dh_last, dc_last, block_b, interpret)
    return (
        dxproj,
        dw.astype(w_hh.dtype),
        jnp.zeros_like(mask_bt),
    )


lstm_seq_train.defvjp(_lstm_seq_train_fwd, _lstm_seq_train_bwd)
