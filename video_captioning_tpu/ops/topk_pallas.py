"""Exact row-wise top-k as a Pallas TPU kernel.

The beam-search expansion needs the top-K (K=beam, typically 5) logits per
beam row over the vocabulary — shape (B·K, V) with V=10000 at reference
scale. XLA lowers ``jax.lax.top_k`` to its TopK custom call, measured at
~227 µs for (1280, 10000) fp32 on v5e (≈225 GB/s effective, ~3.6x short of
HBM bandwidth); it was the single hottest op in the beam loop even after
the hierarchical-top-k rewrite (generation/beam.py).

This kernel streams row blocks through VMEM once and extracts the top-k by
k sequential (max, argmax, mask) passes on the resident block — k·3
VPU ops per element, no sort, no index materialization beyond the k
outputs. For small k that is far below the memory roofline, so the kernel
runs at streaming speed.

Tie semantics match ``jax.lax.top_k`` exactly: equal values are returned
in ascending index order (argmax takes the first occurrence, masking
removes exactly that occurrence). Bit-parity with lax.top_k is pinned in
tests/test_pallas_kernels.py including crafted ties.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = float("-inf")


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int):
    BM, V = x_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (BM, V), dimension=1)

    def body(i, x):
        m = jnp.max(x, axis=1)  # (BM,)
        # First-occurrence argmax via min-index-of-max, matching
        # lax.top_k's ascending-index tie order (Mosaic's native argmax
        # returns the LAST occurrence on ties — measured).
        is_max = x == m[:, None]
        idx = jnp.min(jnp.where(is_max, col, V), axis=1)
        vals_ref[:, i] = m
        idx_ref[:, i] = idx
        return jnp.where(col == idx[:, None], _NEG_INF, x)

    jax.lax.fori_loop(0, k, body, x_ref[:], unroll=True)


def _topk_lse_kernel(x_ref, vals_ref, idx_ref, lse_ref, *, k: int):
    """Top-k + per-row logsumexp in the same VMEM residency. The row block
    is already resident for the k max/argmax passes; the logsumexp adds
    one exp+reduce pass over it instead of a second full HBM read of the
    logits by a separate XLA fusion (the beam loop needs lse every step
    for log-softmax normalization, generation/beam.py)."""
    x0 = x_ref[:]
    m = jnp.max(x0, axis=1)  # (BM,) — also the top-1 value
    lse_ref[:, 0] = m + jnp.log(
        jnp.sum(jnp.exp(x0 - m[:, None]), axis=1)
    )  # -inf pad columns contribute exp(-inf) = 0
    _topk_kernel(x_ref, vals_ref, idx_ref, k=k)


def topk2d_pallas(
    x: Array, k: int, block_rows: int = 64, interpret: bool = False
) -> Tuple[Array, Array]:
    """Exact (values, indices) top-k over the last axis of a 2-D fp32 array.

    Drop-in for ``jax.lax.top_k`` (same values, same tie order). Rows are
    processed in blocks of ``block_rows``; N must be divisible by it.
    """
    N, V = x.shape
    if N % block_rows != 0:
        # Mosaic needs the row-block dim 8-divisible OR equal to the full
        # dim (a 1-row block is ILLEGAL otherwise — see lstm_seq_pallas).
        block_rows = next((t for t in (32, 16, 8) if N % t == 0), N)
    grid = (N // block_rows,)

    kernel = functools.partial(_topk_kernel, k=k)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, V), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((block_rows, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, k), x.dtype),
            jax.ShapeDtypeStruct((N, k), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * k * N * V, bytes_accessed=4 * N * V, transcendentals=0
        ),
    )(x)
    return vals, idx


def topk2d_lse_pallas(
    x: Array, k: int, block_rows: int = 64, interpret: bool = False
) -> Tuple[Array, Array, Array]:
    """(values, indices, logsumexp) over the last axis of a 2-D fp32
    array in ONE pass over the logits. Values/indices match lax.top_k
    bit-exactly (same tie order); lse matches
    ``m + log(sum(exp(x - m)))`` up to f32 reduction-order rounding."""
    N, V = x.shape
    if N % block_rows != 0:
        block_rows = next((t for t in (32, 16, 8) if N % t == 0), N)
    grid = (N // block_rows,)

    kernel = functools.partial(_topk_lse_kernel, k=k)
    vals, idx, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, V), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, k), x.dtype),
            jax.ShapeDtypeStruct((N, k), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(3 * k + 3) * N * V, bytes_accessed=4 * N * V,
            transcendentals=N * V,
        ),
    )(x)
    return vals, idx, lse[:, 0]


def topk2d_lse(x: Array, k: int) -> Tuple[Array, Array, Array]:
    """Backend-adaptive fused top-k + logsumexp (see topk2d). Off-TPU
    fallback computes lse the way generation/beam.py's XLA path does."""
    if (
        jax.default_backend() == "tpu"
        and x.ndim == 2
        and x.dtype == jnp.float32
        and k <= 16
        and k <= x.shape[1]
    ):
        V = x.shape[1]
        v_pad = -(-V // 128) * 128
        if v_pad != V:
            x = jnp.pad(x, ((0, 0), (0, v_pad - V)),
                        constant_values=_NEG_INF)
        return topk2d_lse_pallas(x, k)
    vals, idx = jax.lax.top_k(x, k)
    row_max = vals[:, 0]
    lse = row_max + jnp.log(
        jnp.sum(jnp.exp(x - row_max[:, None]), axis=-1)
    )
    return vals, idx, lse


def topk2d(x: Array, k: int) -> Tuple[Array, Array]:
    """Backend-adaptive exact top-k: the Pallas kernel on TPU (measured
    ~3x the TopK custom call's throughput at beam shapes), ``lax.top_k``
    elsewhere. Identical values and tie order on both paths.

    Reachable from the beam loop via ``config.kernels.use_pallas_topk``
    (default off; ``lax.top_k``'s rank-2 custom call is the baseline).
    A non-lane-multiple vocab (e.g. the reference's V=10000) is padded to
    the next multiple of 128 with -inf columns, which are never selected.
    """
    if (
        jax.default_backend() == "tpu"
        and x.ndim == 2
        and x.dtype == jnp.float32
        and k <= 16
        and k <= x.shape[1]
    ):
        V = x.shape[1]
        v_pad = -(-V // 128) * 128
        if v_pad != V:
            x = jnp.pad(x, ((0, 0), (0, v_pad - V)), constant_values=_NEG_INF)
        return topk2d_pallas(x, k)
    return jax.lax.top_k(x, k)
