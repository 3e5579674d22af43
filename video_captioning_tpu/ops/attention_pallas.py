"""Fused Bahdanau attention decode step as a Pallas TPU kernel.

One decode step of additive attention (reference attention.py:49-73)
computes, per batch row:

    dec_proj = W_d · h + b_d                         (MXU)
    scores   = v · tanh(enc_proj + dec_proj) + b_v   (VPU + MXU)
    weights  = softmax(mask ? scores : -1e9)          (VPU)
    context  = weights · enc_outs                     (MXU)

Under XLA this is 3 HLO matmuls with elementwise ops between them, each
round-tripping the (B, S, A) ``tanh`` operand through HBM. The kernel keeps
the whole per-block working set — enc_proj block (BM, S, A), enc_outs block
(BM, S, E), and all intermediates — resident in VMEM, writing only the
(BM, E) context and (BM, S) weights back out.

Used inside the greedy/beam ``lax.while_loop`` decode loops where it runs
max_length times per caption; flag-gated behind
``config.kernels.use_pallas_attention`` with the XLA path as reference
semantics (tests compare the two bit-for-bit in fp32 tolerances).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MASK_FILL = -1e9


def _attend_kernel(
    dec_hidden_ref,  # (BM, D)
    w_d_ref,         # (D, A)
    b_d_ref,         # (1, A)
    enc_proj_ref,    # (BM, S, A)
    enc_outs_ref,    # (BM, S, E)
    v_ref,           # (A, 1)
    b_v_ref,         # (1, 1)
    mask_ref,        # (BM, S)
    context_ref,     # (BM, E) out
    weights_ref,     # (BM, S) out
):
    BM, S, A = enc_proj_ref.shape

    dec_proj = (
        jnp.dot(dec_hidden_ref[:], w_d_ref[:], preferred_element_type=jnp.float32)
        + b_d_ref[:]
    )  # (BM, A)

    combined = jnp.tanh(enc_proj_ref[:] + dec_proj[:, None, :])  # (BM, S, A)

    scores = (
        jax.lax.dot_general(
            combined.reshape(BM * S, A), v_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(BM, S)
        + b_v_ref[0, 0]
    )

    scores = jnp.where(mask_ref[:] > 0, scores, _MASK_FILL)
    # Numerically-stable softmax on the VPU.
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    exp = jnp.exp(scores)
    weights = exp / jnp.sum(exp, axis=-1, keepdims=True)  # (BM, S)
    weights_ref[:] = weights

    # context[b, e] = sum_s weights[b, s] * enc_outs[b, s, e] — batched
    # matvec on the MXU.
    context_ref[:] = jax.lax.dot_general(
        weights[:, None, :], enc_outs_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def bahdanau_attend_pallas(
    dec_hidden: Array,   # (B, D)
    w_d: Array,          # (D, A)
    b_d: Array,          # (A,)
    enc_proj: Array,     # (B, S, A)
    enc_outs: Array,     # (B, S, E)
    v: Array,            # (A,) attention_linear kernel column
    b_v: Array,          # scalar attention_linear bias
    mask: Optional[Array] = None,  # (B, S)
    *,
    block_b: int = 8,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused attention step. Returns (context (B, E), weights (B, S))."""
    B, S, A = enc_proj.shape
    E = enc_outs.shape[-1]
    D = dec_hidden.shape[-1]

    if mask is None:
        mask = jnp.ones((B, S), jnp.float32)

    block_b = min(block_b, B)
    pad_b = (-B) % block_b
    if pad_b:
        dec_hidden = jnp.pad(dec_hidden, ((0, pad_b), (0, 0)))
        enc_proj = jnp.pad(enc_proj, ((0, pad_b), (0, 0), (0, 0)))
        enc_outs = jnp.pad(enc_outs, ((0, pad_b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_b), (0, 0)), constant_values=1.0)
    Bp = B + pad_b

    grid = (Bp // block_b,)
    f32 = jnp.float32

    context, weights = pl.pallas_call(
        _attend_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, S, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_b, S, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((A, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, E), f32),
            jax.ShapeDtypeStruct((Bp, S), f32),
        ],
        interpret=interpret,
    )(
        dec_hidden.astype(f32),
        w_d.astype(f32),
        b_d.reshape(1, A).astype(f32),
        enc_proj.astype(f32),
        enc_outs.astype(f32),
        v.reshape(A, 1).astype(f32),
        b_v.reshape(1, 1).astype(f32),
        mask.astype(f32),
    )

    if pad_b:
        context = context[:B]
        weights = weights[:B]
    return context, weights
