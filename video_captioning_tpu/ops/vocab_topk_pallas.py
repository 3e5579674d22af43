"""Fused vocab-projection + exact top-k + logsumexp Pallas TPU kernel.

The beam-search expansion step needs, per beam row, only three things from
the (N, V) logits: the top-K raw logits, their token ids, and the row
logsumexp (generation/beam.py). Under XLA that costs a full (N, V) logits
materialization (51 MB at N=1280, V=10000 fp32), a TopK custom call that
re-reads it (~227 µs measured on v5e), and reduction passes over it again.

This kernel never materializes the logits in HBM: it streams the vocab
projection ``x @ W + b`` in (N, VT) column blocks (MXU, bf16 operands /
fp32 accumulation — the same operand precision XLA's DEFAULT matmul policy
uses on TPU), extracts each block's top-k on the VMEM-resident block, and
folds blocks into a running (top-k, online-logsumexp) state in scratch.
HBM traffic drops from ~3 logits round-trips to just x + W once.

Tie order matches ``jax.lax.top_k`` (equal values → ascending index):
block extraction takes first occurrences, and the cross-block merge lists
the running (lower-index) candidates first.

The vocabulary axis is padded to a lane multiple by the caller with
``pad_vocab_weights`` (pad bias = -3.4e38 ⇒ never selected, exp = 0).

WHAT IS AND IS NOT EXACT (reconciling the 0.9727 beam clip agreement in
benchmarks/ab_beam_flags.json with this kernel's tests): the top-k
extraction and its tie order are exact GIVEN the computed logits, and the
logits use the same bf16-operand/f32-accumulate precision as the XLA
path. The row LOGSUMEXP, however, folds per-vocab-block partial sums in
an online rescaled accumulation — a different SUMMATION ORDER than XLA's
one-pass reduction — so it matches only to f32 rounding (the test gates
it at rtol 1e-5, not bitwise). In the beam update the lse shifts every
candidate of one beam row uniformly, so a last-bit lse difference can
reorder candidates ACROSS beams where expansions are near-tied; with
near-tie-dense random-init logits ~2.7%% of clips pick a different
(equal-scoring) hypothesis somewhere in 20 steps. Under trained,
sharpened logits the margin dwarfs the rounding (the int8/bf16 gates'
sharpen-3 regime). Bitwise token identity with the XLA path is therefore
NOT this kernel's contract; top-k values/indices/tie order are.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_PAD_FILL = float(jnp.finfo(jnp.float32).min)
_NEG_INF = float("-inf")


def _extract_topk(x: Array, col: Array, k: int, sentinel: int):
    """k (max, first-occurrence index) extractions over axis 1."""
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(x, axis=1)
        is_max = x == m[:, None]
        idx = jnp.min(jnp.where(is_max, col, sentinel), axis=1)
        vals.append(m)
        idxs.append(idx)
        x = jnp.where(col == idx[:, None], _NEG_INF, x)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)  # (N, k)


def _kernel(
    x_ref,      # (N, H) bf16 — constant across grid steps
    w_ref,      # (H, VT) bf16 — j-th vocab block
    b_ref,      # (1, VT) f32
    vals_ref,   # (N, k) f32 out
    idx_ref,    # (N, k) i32 out
    lse_ref,    # (N, 1) f32 out
    rvals,      # (N, k) f32 scratch: running top-k values
    ridx,       # (N, k) i32 scratch: running top-k indices
    rstat,      # (N, 2) f32 scratch: running (max, scaled sum-exp)
    *,
    k: int,
    vt: int,
    v_padded: int,
):
    j = pl.program_id(1)  # vocab-block index (inner, fastest-varying)
    logits = (
        jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )  # (N, VT) f32
    N = logits.shape[0]

    local_col = jax.lax.broadcasted_iota(jnp.int32, (N, vt), dimension=1)
    col = local_col + j * vt
    bvals, bidx = _extract_topk(logits, col, k, sentinel=v_padded)

    bmax = bvals[:, 0]  # block max = first extraction
    bsum = jnp.sum(jnp.exp(logits - bmax[:, None]), axis=1)

    @pl.when(j == 0)
    def _():
        rvals[:] = bvals
        ridx[:] = bidx
        rstat[:, 0] = bmax
        rstat[:, 1] = bsum

    @pl.when(j > 0)
    def _():
        # Merge running and block top-k (running first: its vocab indices
        # are all smaller, preserving lax.top_k's ascending-index ties).
        cv = jnp.concatenate([rvals[:], bvals], axis=1)   # (N, 2k)
        ci = jnp.concatenate([ridx[:], bidx], axis=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * k), dimension=1)
        mvals, midx = [], []
        for _ in range(k):
            m = jnp.max(cv, axis=1)
            is_max = cv == m[:, None]
            p = jnp.min(jnp.where(is_max, pos, 2 * k), axis=1)
            sel = pos == p[:, None]
            mvals.append(m)
            midx.append(jnp.sum(jnp.where(sel, ci, 0), axis=1))
            cv = jnp.where(sel, _NEG_INF, cv)
        rvals[:] = jnp.stack(mvals, axis=1)
        ridx[:] = jnp.stack(midx, axis=1)

        # Online logsumexp fold.
        m_old = rstat[:, 0]
        s_old = rstat[:, 1]
        m_new = jnp.maximum(m_old, bmax)
        rstat[:, 0] = m_new
        rstat[:, 1] = s_old * jnp.exp(m_old - m_new) + bsum * jnp.exp(bmax - m_new)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        vals_ref[:] = rvals[:]
        idx_ref[:] = ridx[:]
        lse_ref[:, 0] = rstat[:, 0] + jnp.log(rstat[:, 1])


def pad_vocab_weights(
    kernel: Array, bias: Array, vt: int = 256
) -> Tuple[Array, Array, int]:
    """Pad (H, V) weights / (V,) bias to a multiple of ``vt`` columns and
    cast the kernel to bf16 (XLA-DEFAULT matmul operand precision). Pad
    bias is float32-min so padded tokens are never selected and contribute
    exp(·)=0 to the logsumexp. Call OUTSIDE the decode loop."""
    H, V = kernel.shape
    v_padded = -(-V // vt) * vt
    if v_padded != V:
        kernel = jnp.pad(kernel, ((0, 0), (0, v_padded - V)))
        bias = jnp.pad(bias, (0, v_padded - V), constant_values=_PAD_FILL)
    return kernel.astype(jnp.bfloat16), bias.astype(jnp.float32), v_padded


def vocab_topk_lse(
    x: Array,
    w_padded: Array,
    b_padded: Array,
    k: int,
    vt: int = 256,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """(top-k values, top-k indices, logsumexp) of ``x @ W + b`` rows.

    x: (N, H) — cast to bf16 inside; w_padded/b_padded from
    :func:`pad_vocab_weights`. Returns ((N, k) f32, (N, k) i32, (N,) f32).

    Grid: (row tiles, vocab blocks) — vocab innermost so the running
    scratch state folds sequentially per row tile (TPU grids execute
    sequentially). Row tiling keeps the lane-padded (BM, k) scratch and
    the logits block inside the 16 MB VMEM budget at any N.
    """
    N, H = x.shape
    v_padded = w_padded.shape[1]
    bm = min(N, 256)
    if N % bm != 0:
        # Mosaic needs the row-block dim 8-divisible OR equal to the full
        # dim (a 1-row block is ILLEGAL — see lstm_seq_pallas.py). Take
        # the largest 8-divisible tile that divides N, else the whole N
        # (at the beam gate's N <= 2560 the full-N block still fits VMEM).
        bm = next((t for t in (128, 64, 32, 16, 8) if N % t == 0), N)
    grid = (N // bm, v_padded // vt)
    kern = functools.partial(_kernel, k=k, vt=vt, v_padded=v_padded)
    vals, idx, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, vt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, k), jnp.float32),
            jax.ShapeDtypeStruct((N, k), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.float32),
            pltpu.VMEM((bm, k), jnp.int32),
            pltpu.VMEM((bm, 2), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * v_padded + 4 * k * N * v_padded,
            bytes_accessed=2 * N * H + 2 * H * v_padded + 4 * N * (2 * k + 1),
            transcendentals=N * v_padded,
        ),
    )(x.astype(jnp.bfloat16), w_padded, b_padded.reshape(1, -1))
    return vals, idx, lse[:, 0]
