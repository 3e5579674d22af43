"""Fused 1x1-conv (matmul) + bias + residual + ReLU Pallas kernel.

Why this exists: in ResNet50 inference (reference usage:
/root/reference/src/models/encoder.py:157-202 frozen eval-mode backbone),
XLA compiles each bottleneck's 1x1 convs and the residual add+ReLU as
SEPARATE ops — the per-op TPU profile (benchmarks/profile_cnn.py) shows
~13.4 ms of a 27.2 ms B=320 forward spent in standalone
``add_maximum_fusion`` elementwise ops at the HBM roofline: every block
writes its conv3 output to HBM, re-reads it plus the identity tensor, and
writes the sum. A 1x1 conv over NHWC is exactly a matmul over
``(B*H*W, Cin) x (Cin, Cout)``, so the whole bottleneck tail
``relu(x @ W + b + residual)`` runs here as ONE kernel: the MXU matmul
accumulates in fp32 in VMEM and the bias/residual/ReLU epilogue is applied
to the accumulator tile before the single HBM write — the conv3 output
never round-trips.

Batch-norm (frozen running stats) is pre-folded into ``w``/``b`` by the
caller (models/backbones/resnet.py:fold_bn), so the epilogue is affine.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Descending block-size candidates; all multiples of 16 so both fp32 (8)
# and bf16 (16) sublane tiling constraints are met. Large M blocks matter:
# per-grid-step overhead (~2 us measured) swamps the DMA time of small
# blocks when the grid has thousands of steps.
_BLOCK_CANDS = (4096, 3584, 3136, 2048, 1792, 1568, 1024, 896, 784, 512,
                448, 384, 320, 256, 224, 192, 160, 128, 112, 96, 80,
                64, 48, 32, 16)


def pick_block(dim: int, cap: int = 512) -> Optional[int]:
    """Largest multiple-of-16 divisor of ``dim`` that is <= cap."""
    for c in _BLOCK_CANDS:
        if c <= cap and dim % c == 0:
            return c
    return None


_VMEM_BUDGET = 10 * 1024 * 1024  # bytes; leaves headroom in ~16 MiB VMEM


def pick_blocks(
    M: int, K: int, N: int, itemsize: int, *, with_residual: bool,
    cap_m: int = 4096, cap_n: int = 512,
):
    """(bm, bn) maximizing bm under the VMEM budget (inputs/outputs are
    double-buffered by the Pallas pipeline; the fp32 accumulator tile is
    live once)."""
    bn = pick_block(N, cap_n)
    if bn is None:
        return None
    for bm in _BLOCK_CANDS:
        if bm > cap_m or M % bm:
            continue
        per_out = 2 * itemsize * (1 + (1 if with_residual else 0)) + 4
        usage = (2 * bm * K * itemsize          # x block, double-buffered
                 + 2 * K * bn * itemsize        # w block
                 + bm * bn * per_out)           # out [+ residual] + fp32 acc
        if usage <= _VMEM_BUDGET:
            return bm, bn
    return None


def _kernel_res(x_ref, w_ref, b_ref, r_ref, o_ref, *, relu: bool):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    acc = acc + r_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[:] = acc.astype(o_ref.dtype)


def _kernel_plain(x_ref, w_ref, b_ref, o_ref, *, relu: bool):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "block_m", "block_n", "interpret"),
)
def matmul_bias_act(
    x: Array,
    w: Array,
    b: Array,
    residual: Optional[Array] = None,
    *,
    relu: bool = True,
    block_m: int = 4096,
    block_n: int = 512,
    interpret: bool = False,
) -> Array:
    """``relu(x @ w + b [+ residual])`` in one fused Pallas kernel.

    x: (M, K); w: (K, N); b: (N,); residual: (M, N) or None. The matmul
    accumulates fp32 on the MXU; the epilogue runs on the VMEM-resident
    accumulator tile, so the pre-activation never touches HBM. Output
    dtype = x dtype. Callers should route through :func:`conv1x1` or check
    :func:`pick_block` — M and N must be divisible by the block sizes.
    """
    M, K = x.shape
    K2, N = w.shape
    assert K == K2 and b.shape == (N,)
    picked = pick_blocks(M, K, N, x.dtype.itemsize,
                         with_residual=residual is not None,
                         cap_m=block_m, cap_n=block_n)
    if picked is None:
        raise ValueError(f"no block size for M={M}, N={N}")
    bm, bn = picked

    b2 = b.reshape(1, N)
    grid = (M // bm, N // bn)
    # j (the N axis) iterates fastest: the x block's index map is constant
    # in j, so Pallas keeps it resident across the inner sweep.
    x_spec = pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((K, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((M, N), x.dtype)
    flops = 2 * M * K * N
    itemsize = x.dtype.itemsize
    bytes_accessed = (M * K + K * N + M * N * (2 if residual is not None else 1)
                      ) * itemsize

    if residual is not None:
        assert residual.shape == (M, N)
        return pl.pallas_call(
            functools.partial(_kernel_res, relu=relu),
            out_shape=out_shape,
            grid=grid,
            in_specs=[x_spec, w_spec, b_spec, o_spec],
            out_specs=o_spec,
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
            interpret=interpret,
        )(x, w, b2, residual)
    return pl.pallas_call(
        functools.partial(_kernel_plain, relu=relu),
        out_shape=out_shape,
        grid=grid,
        in_specs=[x_spec, w_spec, b_spec],
        out_specs=o_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(x, w, b2)


def conv1x1(
    x: Array,
    w: Array,
    b: Array,
    residual: Optional[Array] = None,
    *,
    stride: int = 1,
    relu: bool = True,
    interpret: bool = False,
) -> Optional[Array]:
    """1x1 conv over NHWC ``x`` with fused bias/residual/ReLU epilogue.

    x: (B, H, W, Cin); w: (Cin, Cout); b: (Cout,); residual: (B, H', W',
    Cout) matching the strided output. A stride-2 1x1 conv with zero
    padding reads exactly every other pixel, so it is a slice + matmul.
    Returns None when no legal Pallas block size exists for the flattened
    shapes (caller falls back to the XLA path).
    """
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    B, H, W, Cin = x.shape
    Cout = w.shape[1]
    M = B * H * W
    if pick_blocks(M, Cin, Cout, x.dtype.itemsize,
                   with_residual=residual is not None) is None:
        return None
    x2 = x.reshape(M, Cin)
    r2 = residual.reshape(M, Cout) if residual is not None else None
    out = matmul_bias_act(x2, w, b, r2, relu=relu, interpret=interpret)
    return out.reshape(B, H, W, Cout)
