"""int8 1x1-conv (matmul) with a fused requant epilogue — Pallas TPU.

VERDICT r3 item 7: the per-op profile of the int8 ResNet50 forward
(benchmarks/profile_cnn.py --variant int8, 19.4 ms/dispatch) attributes
the remaining non-roofline time to stage-1 requant (``clamp_convert``)
fusions and an s32-emitting 1x1-conv fusion — XLA materializes the int32
accumulator of the widest 1x1 convs in HBM (e.g. the bottleneck conv3 at
56x56: a (B·3136, 256) s32 tensor, 4x the bytes of the int8 activations
the variant exists to stream), then re-reads it in a separate
dequant+residual+requant fusion.

A 1x1 conv IS a rank-2 matmul over (B·H·W, Cin) rows, which is exactly
the shape Mosaic's dot lowering supports (int8 x int8 -> int32 on the
MXU). These kernels keep the s32 accumulator in VMEM registers and fuse
the whole epilogue — per-channel dequant scale, bias, optional int8
residual join, ReLU, and requantization to the next site's int8 scale —
so HBM sees int8 in and int8 out, nothing else.

Used by models/backbones/resnet_int8.py behind
``kernels.int8_conv1x1_pallas`` (A/B'd on chip in benchmarks/cnn_suite).
Numerics: bit-identical to the XLA composite it replaces up to f32
multiply/rounding order in the epilogue (same quantized weights, same
scales); parity gated in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _epilogue(acc, scale, bias, relu: bool, s_out):
    y = acc.astype(jnp.float32) * scale + bias  # (tm, Cout), per-channel
    if relu:
        y = jnp.maximum(y, 0.0)
    if s_out is None:
        return y
    return jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)


def _mm_kernel(x_ref, w_ref, scale_ref, bias_ref, sout_ref, o_ref,
               *, relu: bool, out_int8: bool):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s_out = sout_ref[0, 0] if out_int8 else None
    o_ref[:] = _epilogue(acc, scale_ref[:], bias_ref[:], relu, s_out)


def _mm_res_kernel(x_ref, w_ref, scale_ref, bias_ref, sout_ref, id_ref,
                   sid_ref, o_ref, *, out_int8: bool):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    y = y + id_ref[:].astype(jnp.float32) * sid_ref[0, 0]
    y = jnp.maximum(y, 0.0)  # residual joins are always followed by ReLU
    if out_int8:
        o_ref[:] = jnp.clip(
            jnp.round(y / sout_ref[0, 0]), -127, 127
        ).astype(jnp.int8)
    else:
        o_ref[:] = y


def _row_block(M: int, target: int = 1024) -> int:
    for bm in (target, 512, 256, 128, 64, 32, 16, 8):
        if M % bm == 0:
            return bm
    return M


def int8_matmul_requant(
    xq: Array,              # (M, Cin) int8
    wq: Array,              # (Cin, Cout) int8
    scale: Array,           # (Cout,) f32 — s_x * per-channel weight scale
    bias: Array,            # (Cout,) f32
    s_out: Optional[Array] = None,  # scalar f32; None -> f32 output
    relu: bool = True,
    interpret: bool = False,
) -> Array:
    """relu(xq @ wq * scale + bias) requantized to int8 (or f32 if
    ``s_out`` is None), accumulator never materialized in HBM."""
    M, Cin = xq.shape
    Cout = wq.shape[1]
    bm = _row_block(M)
    out_int8 = s_out is not None
    kernel = functools.partial(_mm_kernel, relu=relu, out_int8=out_int8)
    s_out_arr = jnp.asarray(
        s_out if out_int8 else 1.0, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, Cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, Cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (M, Cout), jnp.int8 if out_int8 else jnp.float32),
        interpret=interpret,
    )(xq, wq, scale.reshape(1, Cout).astype(jnp.float32),
      bias.reshape(1, Cout).astype(jnp.float32), s_out_arr)


def int8_matmul_residual_requant(
    xq: Array,              # (M, Cin) int8
    wq: Array,              # (Cin, Cout) int8
    scale: Array,           # (Cout,) f32
    bias: Array,            # (Cout,) f32
    idq: Array,             # (M, Cout) int8 residual (quantized identity)
    s_id: Array,            # scalar f32 — identity dequant scale
    s_out: Optional[Array] = None,  # scalar f32; None -> f32 output
    interpret: bool = False,
) -> Array:
    """relu(xq @ wq * scale + bias + idq * s_id), requantized to int8
    (or f32 for the stage-final block that feeds the fp32 pool)."""
    M, Cin = xq.shape
    Cout = wq.shape[1]
    bm = _row_block(M)
    out_int8 = s_out is not None
    kernel = functools.partial(_mm_res_kernel, out_int8=out_int8)
    s_out_arr = jnp.asarray(
        s_out if out_int8 else 1.0, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, Cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, Cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, Cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (M, Cout), jnp.int8 if out_int8 else jnp.float32),
        interpret=interpret,
    )(xq, wq, scale.reshape(1, Cout).astype(jnp.float32),
      bias.reshape(1, Cout).astype(jnp.float32), s_out_arr, idq,
      jnp.asarray(s_id, jnp.float32).reshape(1, 1))
