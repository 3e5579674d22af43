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
gated in tests/test_pallas_kernels.py / tests/test_transformer.py
(interpret mode) and on chip by benchmarks/fused_attn_gate.py.

Precision note (measured on chip, f64 ground truth): these kernels are
MORE accurate than the XLA path they replace — the XLA path's fp32
einsums run at DEFAULT MXU precision (single-pass bf16 multiplies,
~5e-3 relative context error), while the kernels compute true fp32 on
the VPU (~1e-6). Token identity therefore holds against the XLA path
under HIGHEST matmul precision (fused_attn_gate: 1.0000 clip agreement),
NOT against DEFAULT (0.81 at sharpen=3 random init — that divergence is
XLA's bf16-pass rounding flipping near-tie beam decisions, not kernel
error).

Layout notes: the caches are PER-LAYER TIME-MAJOR (T, B·K, D) leaves —
see init_decode_state; the kernel works T-leading throughout (selection,
softmax statistics over axis 0), so it needs no in-kernel transposes.
The grid tiles the batch axis; per grid step the working set is
(T, block_b·K, D) cache blocks + (block_b·K, D) activations —
~2 MB fp32 at reference scale (block_b=8, K=5, T=21, D=512), well inside
VMEM with double buffering. Every contraction here is a BATCHED MATVEC
(each query row attends over its own cache rows), so there is no rank-2
matmul for the MXU and Mosaic rejects batched ``dot_general``s outright
(its dot lowering is rank-2 only, verified on hardware) — the kernels
express the score/context contractions as elementwise multiply +
reductions on the VPU instead, which is the honest mapping for this
bandwidth-bound shape (~55 MFLOP/step at reference scale, ≪ the HBM
time of reading the caches). Head and beam loops are static Python
loops; K is the beam width, ≤ 10.
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
    q_ref,        # (bt·K, dblk) activations dtype (lane-block of D)
    kc_ref,       # (T, bt·K, dblk) cache dtype (this layer, TIME-MAJOR)
    vc_ref,       # (T, bt·K, dblk)
    anc_ref,      # (T, bt, K) int32 ancestry (pre-transposed time-major)
    ctx_ref,      # out (bt·K, dblk) activations dtype
    *,
    head_dim: int,
    num_beams: int,
):
    """One (batch-block, lane-block) grid step. ``dblk`` is a whole number
    of heads, so each grid step's softmax+context is self-contained —
    no cross-block accumulation (unlike the cross kernel's head-averaged
    weights). The lane-block grid dim exists for scoped VMEM: full-D
    blocks put the double-buffered K/V windows + the fp32 selection
    accumulators over the 16 MB stack limit once the caches became
    per-layer (T, N, D) operands (chip-measured 18.21M at
    bt·K=40, T=21, D=512)."""
    btK, dblk = q_ref.shape
    K = num_beams
    bt = btK // K
    T = kc_ref.shape[0]
    dh = head_dim
    t = t_ref[0, 0]

    kc = kc_ref[:]  # (T, btK, dblk)
    vc = vc_ref[:]
    anc = anc_ref[:]  # (T, bt, K)

    # --- Selection first: gather each beam's prefix rows with the one-hot
    # ancestry (K-term multiply-accumulate; every physical row read once).
    # Everything stays T-leading — the time-major cache layout means no
    # in-kernel transposes at all.
    kc_b = kc.reshape(T, bt, K, dblk)
    vc_b = vc.reshape(T, bt, K, dblk)
    compute_dt = jnp.float32
    kc_sel = jnp.zeros((T, bt, K, dblk), compute_dt)
    vc_sel = jnp.zeros((T, bt, K, dblk), compute_dt)
    for j in range(K):
        # fp32 one-hot BEFORE the trailing-axis insert: Mosaic only
        # supports non-no-op minor-dim inserts for 32-bit types (i1/i8
        # variants fail to lower), and multiply-accumulate beats where()
        # for the same reason.
        pick = (anc == j).astype(compute_dt)[:, :, :, None]  # (T,bt,K,1)
        kc_sel = kc_sel + pick * kc_b[:, :, j].astype(compute_dt)[:, :, None]
        vc_sel = vc_sel + pick * vc_b[:, :, j].astype(compute_dt)[:, :, None]

    kc_sel = kc_sel.reshape(T, btK, dblk)
    vc_sel = vc_sel.reshape(T, btK, dblk)
    q = q_ref[:].astype(compute_dt)

    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (T, btK), 0) <= t
    )
    scale = 1.0 / math.sqrt(dh)

    heads = []
    for h in range(dblk // dh):
        sl = slice(h * dh, (h + 1) * dh)
        q_h = q[:, sl]                      # (btK, dh)
        k_h = kc_sel[:, :, sl]              # (T, btK, dh)
        v_h = vc_sel[:, :, sl]
        # scores[τ, n] = Σ_d q[n, d]·k[τ, n, d] — batched matvec, so VPU
        # multiply + lane-dim reduction (no rank-2 dot exists here).
        scores = jnp.sum(q_h[None, :, :] * k_h, axis=-1) * scale  # (T, btK)
        scores = jnp.where(valid, scores, NEG_INF)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        w = e / jnp.sum(e, axis=0, keepdims=True)  # fp32 softmax in VMEM
        # ctx[n, d] = Σ_τ w[τ, n]·v[τ, n, d] — leading-dim reduction.
        ctx_h = jnp.sum(w[:, :, None] * v_h, axis=0)  # (btK, dh)
        heads.append(ctx_h)

    ctx_ref[:] = jnp.concatenate(heads, axis=-1).astype(ctx_ref.dtype)


def beam_self_attention(
    q: Array,        # (B·K, D) current activations (post-wq? no: raw q proj)
    k_lyr: Array,    # (T, B·K, D) THIS layer's time-major cache
    v_lyr: Array,    #   (row t already written)
    anc: Array,      # (B, K, T) int32
    t: Array,        # scalar int32
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
    T = k_lyr.shape[0]
    dh = D // num_heads
    bt = _largest_divisor(B, block_b)
    # Lane-block: a whole number of heads, <=128 lanes when possible, and a
    # divisor of D — keeps the scoped-VMEM stack (double-buffered K/V
    # windows + fp32 selection accumulators) under the 16 MB limit at
    # reference scale (full-D blocks measured 18.21M on chip). Measured
    # cost of the split (benchmarks/transformer_results.json, round 4):
    # the fp32 one-hot ancestry selection re-runs once per lane block, and
    # the fused beam path regressed ~13% vs its pre-lane-block form
    # (2,349→2,031 clips/s f32, 2,379→2,044 bf16) — accepted as the price
    # of fitting VMEM while the kernel stays default-off; hoist the
    # selection per batch-block if this is ever defaulted on.
    dblk = D
    cand = (128 // dh) * dh if dh <= 128 else dh
    while cand >= dh:
        if D % cand == 0:
            dblk = cand
            break
        cand -= dh
    grid = (B // bt, D // dblk)

    kernel = functools.partial(
        _self_attn_kernel, head_dim=dh, num_beams=num_beams
    )
    # Ancestry pre-transposed to (T, B, K) so the kernel is transpose-free
    # (tiny int32 tensor; the XLA-side transpose is noise).
    anc_t = jnp.transpose(anc.astype(jnp.int32), (2, 0, 1))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, d: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bt * K, dblk), lambda i, d: (i, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, bt * K, dblk), lambda i, d: (0, i, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, bt * K, dblk), lambda i, d: (0, i, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, bt, K), lambda i, d: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt * K, dblk), lambda i, d: (i, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), q.dtype),
        interpret=interpret,
    )(jnp.asarray(t, jnp.int32).reshape(1, 1), q, k_lyr, v_lyr, anc_t)


# ---------------------------------------------------------------------------
# One-query cross-attention over un-expanded encoder K/V
# ---------------------------------------------------------------------------


def _cross_attn_kernel(
    q_ref,        # (bt·K, dblk) — this head-block's query slice
    ck_ref,       # (bt, S, dblk) cache dtype
    cv_ref,       # (bt, S, dblk)
    mask_ref,     # (bt, S) float (1 = attend)
    ctx_ref,      # out (bt·K, dblk)
    w_ref,        # out (bt·K, S) head-averaged weights, accumulated
                  # across the head-block grid dim
    *,
    num_heads: int,       # total heads (averaging divisor)
    num_beams: int,
    heads_per_blk: int,
):
    btK, dblk = q_ref.shape
    K = num_beams
    bt = btK // K
    S = ck_ref.shape[1]
    dh = dblk // heads_per_blk
    scale = 1.0 / math.sqrt(dh)
    hb = pl.program_id(1)

    q = q_ref[:].astype(jnp.float32)     # (btK, dblk) — stays 2-D
    ck = ck_ref[:].astype(jnp.float32)   # (bt, S, dblk)
    cv = cv_ref[:].astype(jnp.float32)
    # HBM reads stay un-expanded ((bt, S, dblk) per grid step — the win
    # this kernel exists for); the K-fold beam expansion happens in VMEM
    # along the UNTILED leading dim, per head, mirroring the self-attn
    # kernel's shapes exactly — Mosaic rejects the layouts that a
    # (bt, K, D) query reshape + middle-index produces, and its dot
    # lowering is rank-2 only, so these batched matvecs are VPU multiply +
    # reductions. The head-block grid dim keeps the double-buffered K/V
    # blocks at 128 lanes (a full-D block at bt·K = 40 rows overflows the
    # 16 MB scoped-VMEM stack).
    maskb = jnp.broadcast_to(
        mask_ref[:][:, None, :] > 0, (bt, K, S)
    ).reshape(btK, S)

    heads = []                           # each (btK, dh)
    w_sum = jnp.zeros((btK, S), jnp.float32)
    for h in range(heads_per_blk):
        sl = slice(h * dh, (h + 1) * dh)
        # Slice FIRST, newaxis after: `ck[:, None, :, sl]` in one indexing
        # expression traces as a 3-D gather, which Mosaic cannot lower.
        k_h = jnp.broadcast_to(
            ck[:, :, sl][:, None], (bt, K, S, dh)).reshape(btK, S, dh)
        v_h = jnp.broadcast_to(
            cv[:, :, sl][:, None], (bt, K, S, dh)).reshape(btK, S, dh)
        q_h = q[:, sl]                   # (btK, dh)
        scores = jnp.sum(q_h[:, None, :] * k_h, axis=-1) * scale
        scores = jnp.where(maskb, scores, NEG_INF)          # (btK, S)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)   # fp32 softmax in VMEM
        heads.append(jnp.sum(w[:, :, None] * v_h, axis=1))  # (btK, dh)
        w_sum = w_sum + w

    ctx_ref[:] = (heads[0] if len(heads) == 1
                  else jnp.concatenate(heads, axis=-1)).astype(ctx_ref.dtype)
    # The head-block dim is innermost, so w_ref's block stays VMEM-resident
    # across hb steps for a fixed batch block: init at hb == 0, accumulate
    # after (fp32 partials are in w_sum; the output keeps q's dtype).
    part = (w_sum / num_heads).astype(w_ref.dtype)

    @pl.when(hb == 0)
    def _():
        w_ref[:] = part

    @pl.when(hb != 0)
    def _():
        w_ref[:] = w_ref[:] + part


def beam_cross_attention(
    q: Array,               # (B·K, D)
    ck: Array,              # (B, S, D) precomputed keys (un-expanded)
    cv: Array,              # (B, S, D)
    encoder_mask: Optional[Array],  # (B, S) or None
    num_heads: int,
    num_beams: int,
    *,
    block_b: int = 8,  # bt·K must be sublane-divisible (8); the head-block
                       # grid dim keeps this within the 16 MB VMEM stack
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
    dh = D // num_heads
    # Head-block width: the smallest multiple of dh that fills the 128
    # lanes (Mosaic requires block lane dims divisible by 128 or full-D).
    if D % 128 == 0 and 128 % dh == 0:
        heads_per_blk = 128 // dh
    else:
        heads_per_blk = num_heads        # full-D fallback (small models)
    dblk = heads_per_blk * dh
    grid = (B // bt, num_heads // heads_per_blk)  # hb innermost
    if encoder_mask is None:
        encoder_mask = jnp.ones((B, S), jnp.float32)

    kernel = functools.partial(
        _cross_attn_kernel, num_heads=num_heads, num_beams=num_beams,
        heads_per_blk=heads_per_blk,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt * K, dblk), lambda i, hb: (i, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, S, dblk), lambda i, hb: (i, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, S, dblk), lambda i, hb: (i, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, S), lambda i, hb: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt * K, dblk), lambda i, hb: (i, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt * K, S), lambda i, hb: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, D), q.dtype),
            jax.ShapeDtypeStruct((N, S), q.dtype),
        ),
        interpret=interpret,
    )(q, ck, cv, encoder_mask.astype(jnp.float32))
