"""Fused transformer beam-decode attention as Pallas TPU kernels.

Round-3 measurement (docs/PERFORMANCE.md §Transformer): the transformer
family's beam-5 decode trails the LSTM family 1.74x (7,966 vs 13,827
clips/s fp32 at B=256) and REGRESSES under bf16 — the per-step XLA
schedule materializes a K×-expanded (B, K, h, K, T) score tensor plus its
one-hot-selected intermediates between separate fusions, and under bf16
state the cross-attention softmax falls onto a ~4x-slower packed-layout
VPU path (which round 3 dodged by forcing fp32 state, not fixed).

Two kernels replace that schedule inside the beam ``lax.while_loop``
(models/transformer.py decode_step_beam_core):

* ``beam_self_attention`` — ancestry-indexed cached self-attention for
  one layer, one step: the one-hot prefix selection (lazy rebeam), score
  dot, fp32 masked softmax, and context dot run in ONE pass over the
  physical cache rows held in VMEM. Selection happens FIRST (a K-term
  one-hot multiply-accumulate gathering each beam's prefix rows), so the
  K× score expansion and the (B, K, h, T, j) re-expansion of the XLA path
  never exist; each cache row is read exactly once. The caches stay in
  whatever dtype they are stored (fp32 or bf16 — kernels.transformer_
  cache_bf16); softmax statistics are always fp32 in VMEM, which sidesteps
  XLA's bf16 packed-layout softmax cliff *natively*.
* ``beam_cross_attention`` — one-query cross-attention over the
  UN-expanded (B, S, D) precomputed encoder K/V (beam axis broadcast
  in-register, as the XLA path does), again with fp32-in-VMEM softmax so
  bf16 K/V storage halves the dominant per-step HBM read without the
  packed-layout penalty.

Both are flag-gated (``kernels.transformer_fused_beam_attn``) with the
XLA path as reference semantics; numerical parity and token-identity are
gated in tests/test_pallas_kernels.py / tests/test_transformer.py.

Layout notes: the grid tiles the batch axis; per grid step the working
set is (block_b·K, T, D) cache blocks + (block_b·K, D) activations —
~2 MB fp32 at reference scale (block_b=8, K=5, T=21, D=512), well inside
VMEM with double buffering. Head loops are static Python loops emitting
single-batch-dim ``dot_general``s (Mosaic-friendly); K-term selection
loops are static too (K is the beam width, ≤ 10).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e9


def _largest_divisor(n: int, cap: int) -> int:
    for b in range(min(cap, n), 0, -1):
        if n % b == 0:
            return b
    return 1


# ---------------------------------------------------------------------------
# Ancestry-indexed cached self-attention (one layer, one decode step)
# ---------------------------------------------------------------------------


def _self_attn_kernel(
    t_ref,        # SMEM (1, 1) int32 — current position
    q_ref,        # (bt·K, D) activations dtype
    kc_ref,       # (1, bt·K, T, D) cache dtype (layer block of the stack)
    vc_ref,       # (1, bt·K, T, D)
    anc_ref,      # (bt, K, T) int32 ancestry
    ctx_ref,      # out (bt·K, D) activations dtype
    *,
    num_heads: int,
    num_beams: int,
):
    btK, D = q_ref.shape
    K = num_beams
    bt = btK // K
    T = kc_ref.shape[2]
    dh = D // num_heads
    t = t_ref[0, 0]

    kc = kc_ref[0]  # (btK, T, D)
    vc = vc_ref[0]
    anc = anc_ref[:]  # (bt, K, T)

    # --- Selection first: gather each beam's prefix rows with the one-hot
    # ancestry (K-term multiply-accumulate; every physical row read once).
    kc_b = kc.reshape(bt, K, T, D)
    vc_b = vc.reshape(bt, K, T, D)
    compute_dt = jnp.float32
    kc_sel = jnp.zeros((bt, K, T, D), compute_dt)
    vc_sel = jnp.zeros((bt, K, T, D), compute_dt)
    for j in range(K):
        pick = (anc == j)[:, :, :, None]  # (bt, K, T, 1)
        kc_sel = kc_sel + jnp.where(pick, kc_b[:, j][:, None], 0).astype(
            compute_dt)
        vc_sel = vc_sel + jnp.where(pick, vc_b[:, j][:, None], 0).astype(
            compute_dt)

    kc_sel = kc_sel.reshape(btK, T, D)
    vc_sel = vc_sel.reshape(btK, T, D)
    q = q_ref[:].astype(compute_dt)

    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (btK, T), 1) <= t
    )
    scale = 1.0 / math.sqrt(dh)

    ctx = jnp.zeros((btK, D), jnp.float32)
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        q_h = q[:, sl]                      # (btK, dh)
        k_h = kc_sel[:, :, sl]              # (btK, T, dh)
        v_h = vc_sel[:, :, sl]
        # scores[n, τ] = Σ_d q[n, d]·k[n, τ, d]
        scores = jax.lax.dot_general(
            q_h, k_h,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                           # (btK, T)
        scores = jnp.where(valid, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32 softmax in VMEM
        # ctx[n, d] = Σ_τ w[n, τ]·v[n, τ, d]
        ctx_h = jax.lax.dot_general(
            w, v_h,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                    # (btK, dh)
        ctx = jax.lax.dynamic_update_slice(ctx, ctx_h, (0, h * dh))

    ctx_ref[:] = ctx.astype(ctx_ref.dtype)


def beam_self_attention(
    q: Array,        # (B·K, D) current activations (post-wq? no: raw q proj)
    k_all: Array,    # (n_blocks, B·K, T, D) stacked caches (row t written)
    v_all: Array,
    anc: Array,      # (B, K, T) int32
    t: Array,        # scalar int32
    layer: int,
    num_heads: int,
    num_beams: int,
    *,
    block_b: int = 8,
    interpret: bool = False,
) -> Array:
    """Fused ancestry-select + softmax + context for one decode step.

    Semantically identical to models/transformer.py:_cached_self_attn_beam
    AFTER its cache update: caller writes the step's k_t/v_t rows into the
    caches first (one-row dynamic_update_slice), then this kernel attends
    over prefix rows ≤ t with the one-hot ancestry selection. Returns the
    pre-``wo`` context (B·K, D) in q's dtype.
    """
    N, D = q.shape
    K = num_beams
    B = N // K
    T = k_all.shape[2]
    bt = _largest_divisor(B, block_b)
    grid = (B // bt,)

    kernel = functools.partial(
        _self_attn_kernel, num_heads=num_heads, num_beams=num_beams
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bt * K, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt * K, T, D), lambda i: (layer, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt * K, T, D), lambda i: (layer, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, K, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt * K, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), q.dtype),
        interpret=interpret,
    )(jnp.asarray(t, jnp.int32).reshape(1, 1), q, k_all, v_all,
      anc.astype(jnp.int32))


# ---------------------------------------------------------------------------
# One-query cross-attention over un-expanded encoder K/V
# ---------------------------------------------------------------------------


def _cross_attn_kernel(
    q_ref,        # (bt·K, D)
    ck_ref,       # (bt, S, D) cache dtype
    cv_ref,       # (bt, S, D)
    mask_ref,     # (bt, S) float (1 = attend)
    ctx_ref,      # out (bt·K, D)
    w_ref,        # out (bt·K, S) head-averaged weights
    *,
    num_heads: int,
    num_beams: int,
):
    btK, D = q_ref.shape
    K = num_beams
    bt = btK // K
    S = ck_ref.shape[1]
    dh = D // num_heads
    scale = 1.0 / math.sqrt(dh)

    q = q_ref[:].astype(jnp.float32).reshape(bt, K, D)
    ck = ck_ref[:].astype(jnp.float32)   # (bt, S, D)
    cv = cv_ref[:].astype(jnp.float32)
    mask = mask_ref[:] > 0               # (bt, S)

    ctx = jnp.zeros((bt, K, D), jnp.float32)
    w_mean = jnp.zeros((bt, K, S), jnp.float32)
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        q_h = q[:, :, sl]                # (bt, K, dh)
        k_h = ck[:, :, sl]               # (bt, S, dh)
        v_h = cv[:, :, sl]
        scores = jax.lax.dot_general(
            q_h, k_h,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                        # (bt, K, S)
        scores = jnp.where(mask[:, None, :], scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)   # fp32 softmax in VMEM
        ctx_h = jax.lax.dot_general(
            w, v_h,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                # (bt, K, dh)
        ctx = jax.lax.dynamic_update_slice(ctx, ctx_h, (0, 0, h * dh))
        w_mean = w_mean + w

    ctx_ref[:] = ctx.reshape(btK, D).astype(ctx_ref.dtype)
    w_ref[:] = (w_mean / num_heads).reshape(btK, S).astype(w_ref.dtype)


def beam_cross_attention(
    q: Array,               # (B·K, D)
    ck: Array,              # (B, S, D) precomputed keys (un-expanded)
    cv: Array,              # (B, S, D)
    encoder_mask: Optional[Array],  # (B, S) or None
    num_heads: int,
    num_beams: int,
    *,
    block_b: int = 8,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused one-query cross-attention (pre-``wo``): returns
    (context (B·K, D), head-averaged weights (B·K, S)). Semantics match
    models/transformer.py:_cross_attn_step with fp32 softmax regardless of
    the K/V storage dtype."""
    N, D = q.shape
    K = num_beams
    B = N // K
    S = ck.shape[1]
    bt = _largest_divisor(B, block_b)
    grid = (B // bt,)
    if encoder_mask is None:
        encoder_mask = jnp.ones((B, S), jnp.float32)

    kernel = functools.partial(
        _cross_attn_kernel, num_heads=num_heads, num_beams=num_beams
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt * K, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, S, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, S, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt * K, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt * K, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, D), q.dtype),
            jax.ShapeDtypeStruct((N, S), q.dtype),
        ),
        interpret=interpret,
    )(q, ck, cv, encoder_mask.astype(jnp.float32))
