"""Fully-fused ResNet bottleneck block (1x1 -> 3x3 -> 1x1 + residual).

Why this exists: the BN-folded ResNet50 forward is at the HBM roofline of
its UNFUSED schedule (~21 GB of activation traffic for B=320 at 224x224,
measured 28.9 ms ~ the 26 ms roofline; see benchmarks/profile_cnn.py).
XLA materializes every bottleneck intermediate to HBM: a stage-1 block
moves ~3.1 GB (x -> y1 -> y2 -> y3 -> +residual -> relu). This kernel runs
the whole stride-1 identity-residual block — the 13 of 16 ResNet50 blocks
with no downsample (reference frozen backbone usage:
/root/reference/src/models/encoder.py:157-202) — as ONE Pallas program:

  out = relu( relu(conv3x3(relu(x @ W1 + b1)) + b2) @ W3 + b3 + x )

Only the batch dimension is tiled, so each grid step holds the FULL
spatial extent in VMEM: the 3x3 conv needs no inter-tile halo, y1/y2
never touch HBM, and per-block traffic drops to read x + write out
(~1.0 GB for a stage-1 block, a 3x saving). The 3x3 conv is computed as
9 shifted (dy, dx) matmuls accumulated in fp32 on the MXU — every FLOP
in the block is a matmul.

BN is pre-folded into the weights by models/backbones/resnet.py:fold_bn.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Mosaic's scoped-vmem stack limit is 16 MiB; budget well under it because
# the tile model below approximates the compiler's actual stack allocation
# (the first on-chip compile at B=320 measured 16.78 MiB against a 10 MiB
# model that ignored the fp32 temporaries of the conv/projection chain —
# Mosaic does not reuse stack slots across the unrolled matmuls).
_VMEM_BUDGET = 11 * 1024 * 1024
_SLAB_BYTES = 1024 * 1024  # target fp32 working set of one output slab


def _dot(x: Array, w: Array) -> Array:
    """(..., Cin) @ (Cin, Cout) -> (..., Cout), fp32 accumulation."""
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row_slab(H: int, W: int, C: int) -> int:
    """Rows per final-projection slab so its fp32 temps stay ~_SLAB_BYTES."""
    rows = max(1, _SLAB_BYTES // (W * C * 4))
    while H % rows:
        rows -= 1
    return rows


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref):
    x = x_ref[:]                                   # (bt, H, W, C)
    bt, H, W, C = x.shape
    dtype = x.dtype

    y1 = _dot(x, w1_ref[:]) + b1_ref[:].astype(jnp.float32)
    y1 = jnp.maximum(y1, 0.0).astype(dtype)        # (bt, H, W, Cm)
    y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # Everything past y1p runs in row slabs. Mosaic allocates the kernel's
    # large intermediates on a 16 MiB scoped-vmem stack and (measured) does
    # NOT reuse slots across the unrolled conv matmuls — the whole-tile
    # schedule put ~17 MiB of fp32 conv/projection temporaries live at
    # once at stage-2 shapes. Slab-wise, every fp32 temp is bounded by
    # ~_SLAB_BYTES while the matmul M dim stays >= rows*W (>= 392).
    rows = _row_slab(H, W, C)
    for r0 in range(0, H, rows):
        # 3x3 SAME conv rows [r0, r0+rows) as 9 shifted matmuls over y1p.
        acc = b2_ref[:].astype(jnp.float32)
        for dy in range(3):
            for dx in range(3):
                patch = y1p[:, r0 + dy:r0 + dy + rows, dx:dx + W, :]
                acc = acc + _dot(patch, w2_ref[dy, dx])
        y2 = jnp.maximum(acc, 0.0).astype(dtype)   # (bt, rows, W, Cm)
        o = _dot(y2, w3_ref[:]) + b3_ref[:].astype(jnp.float32)
        o = o + x[:, r0:r0 + rows].astype(jnp.float32)
        o_ref[:, r0:r0 + rows] = jnp.maximum(o, 0.0).astype(dtype)


def batch_tile(B: int, H: int, W: int, C: int, Cm: int,
               itemsize: int) -> Optional[int]:
    """Largest batch tile whose working set fits the VMEM budget.

    x and out blocks are double-buffered by the pipeline; the whole-tile
    tensors are y1 (fp32 first-dot result, then bf16 padded copy); all
    conv/projection temporaries are slab-bounded. The budget sits under
    Mosaic's 16 MiB scoped-vmem stack limit with ~30% headroom to absorb
    model error (first on-chip compile: 16.78 MiB actual vs a 10 MiB
    estimate that ignored the projection temporaries).
    """
    weights = (C * Cm * 2 + 9 * Cm * Cm) * itemsize
    slab = _row_slab(H, W, C)
    for bt in (32, 16, 8, 4, 2, 1):
        if B % bt:
            continue
        per_batch = (
            2 * H * W * C * itemsize * 2           # x + out, double-buffered
            + H * W * Cm * 4                       # fp32 first-dot result
            + H * W * Cm * itemsize                # y1
            + (H + 2) * (W + 2) * Cm * itemsize    # padded y1
            + slab * W * Cm * 4                    # fp32 conv acc slab
            + 2 * (slab + 2) * W * Cm * itemsize   # live patch slices
            + slab * W * Cm * itemsize             # y2 slab
            + 2 * slab * W * C * 4                 # fp32 out slab + residual
        )
        if weights + bt * per_batch <= _VMEM_BUDGET:
            return bt
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck(
    x: Array,
    w1: Array, b1: Array,
    w2: Array, b2: Array,
    w3: Array, b3: Array,
    *,
    interpret: bool = False,
) -> Array:
    """One stride-1 identity-residual bottleneck block, fully fused.

    x: (B, H, W, C); w1: (C, Cm); w2: (3, 3, Cm, Cm) HWIO; w3: (Cm, C).
    Returns (B, H, W, C). Callers must check :func:`batch_tile` first.
    """
    B, H, W, C = x.shape
    Cm = w1.shape[1]
    assert w2.shape == (3, 3, Cm, Cm) and w3.shape == (Cm, C)
    bt = batch_tile(B, H, W, C, Cm, x.dtype.itemsize)
    if bt is None:
        raise ValueError(f"no batch tile fits VMEM for {x.shape}, Cm={Cm}")

    def rep(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    flops = 2 * B * H * W * (C * Cm * 2 + 9 * Cm * Cm)
    bytes_accessed = 2 * B * H * W * C * x.dtype.itemsize
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B // bt,),
        in_specs=[
            x_spec,
            rep(w1.shape), rep(b1.shape),
            rep(w2.shape), rep(b2.shape),
            rep(w3.shape), rep(b3.shape),
        ],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)
