"""Fused LSTM cell as a Pallas TPU kernel.

One cell step (torch gate packing [i, f, g, o], matching models.layers):

    gates = x·W_ih + h·W_hh + b_ih + b_hh        (MXU)
    c' = σ(f)·c + σ(i)·tanh(g);  h' = σ(o)·tanh(c')   (VPU)

Blocking: grid = (batch blocks, 4 gates). Each gate's weight panel
(In, H) + (H, H) streams through VMEM one gate at a time — full fp32
weights for the reference 2048-wide gate stack would not fit VMEM at once —
and gate activations accumulate in a VMEM scratch. The elementwise tail
runs on the last gate iteration while the scratch is still resident, so
gates never round-trip HBM.

Flag-gated behind ``config.kernels.use_pallas_lstm``; ``layers.lstm_cell``
is the XLA reference semantics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _lstm_cell_kernel(
    x_ref,      # (BM, In)
    w_ih_ref,   # (In, H)  — gate j's panel
    w_hh_ref,   # (H, H)   — gate j's panel
    b_ref,      # (1, H)   — gate j's combined bias
    h_ref,      # (BM, H)
    c_ref,      # (BM, H)
    h_out_ref,  # (BM, H)
    c_out_ref,  # (BM, H)
    gates_ref,  # scratch (BM, 4H)
):
    j = pl.program_id(1)
    H = h_ref.shape[-1]

    gate = (
        jnp.dot(x_ref[:], w_ih_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h_ref[:], w_hh_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    gates_ref[:, pl.ds(j * H, H)] = gate

    @pl.when(j == 3)
    def _():
        i_g = jax.nn.sigmoid(gates_ref[:, pl.ds(0, H)])
        f_g = jax.nn.sigmoid(gates_ref[:, pl.ds(H, H)])
        g_g = jnp.tanh(gates_ref[:, pl.ds(2 * H, H)])
        o_g = jax.nn.sigmoid(gates_ref[:, pl.ds(3 * H, H)])
        c_new = f_g * c_ref[:] + i_g * g_g
        c_out_ref[:] = c_new
        h_out_ref[:] = o_g * jnp.tanh(c_new)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def lstm_cell_pallas(
    layer: dict,
    x: Array,
    h: Array,
    c: Array,
    *,
    block_b: int = 128,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Drop-in fused replacement for ``layers.lstm_cell``."""
    B, In = x.shape
    H = h.shape[-1]
    f32 = jnp.float32

    block_b = min(block_b, B)
    pad_b = (-B) % block_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
        h = jnp.pad(h, ((0, pad_b), (0, 0)))
        c = jnp.pad(c, ((0, pad_b), (0, 0)))
    Bp = B + pad_b

    bias = (layer["b_ih"] + layer["b_hh"]).reshape(1, 4 * H)

    grid = (Bp // block_b, 4)

    h_new, c_new = pl.pallas_call(
        _lstm_cell_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, In), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((In, H), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, H), f32),
            jax.ShapeDtypeStruct((Bp, H), f32),
        ],
        scratch_shapes=[pltpu.VMEM((block_b, 4 * H), f32)],
        interpret=interpret,
    )(
        x.astype(f32),
        layer["w_ih"].astype(f32),
        layer["w_hh"].astype(f32),
        bias.astype(f32),
        h.astype(f32),
        c.astype(f32),
    )

    if pad_b:
        h_new = h_new[:B]
        c_new = c_new[:B]
    return h_new, c_new
