"""Functional parameter primitives: initializers, linears, embeddings, LSTM.

Design notes (TPU-first, not a port):

* Parameters are plain pytrees (nested dicts/tuples of ``jnp.ndarray``), so
  every model function is a pure ``apply(params, ...)`` usable under ``jit``,
  ``grad``, ``vmap`` and ``pjit`` without framework state.
* Linear kernels are stored ``(in, out)`` so the hot path is ``x @ W`` — the
  layout XLA tiles straight onto the MXU. The torch-weight import tool
  transposes from torch's ``(out, in)``.
* LSTM gates are packed ``[i, f, g, o]`` along the ``4H`` axis — the same
  logical layout as ``torch.nn.LSTM`` (reference encoder.py:35-42,
  decoder.py:44-50) so reference weights can be bit-ported for the greedy
  parity gate.
* Initializers reproduce the reference's *distributions* (orthogonal /
  xavier / uniform / torch-Linear defaults); exact RNG streams differ, which
  is fine because parity is gated on ported weights, not fresh inits.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
PyTree = object

# --------------------------------------------------------------------------
# Initializers
# --------------------------------------------------------------------------


def uniform_init(key: Array, shape: Sequence[int], low: float, high: float) -> Array:
    return jax.random.uniform(key, shape, minval=low, maxval=high, dtype=jnp.float32)


def xavier_uniform_init(key: Array, shape: Sequence[int]) -> Array:
    """Glorot uniform over (fan_in, fan_out) — matches nn.init.xavier_uniform_
    applied to a torch ``(out, in)`` weight, since the bound is symmetric in
    fan_in/fan_out."""
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return uniform_init(key, shape, -bound, bound)


def orthogonal_init(key: Array, shape: Sequence[int]) -> Array:
    """Orthogonal init (rows/cols orthonormal), matching nn.init.orthogonal_."""
    n_rows, n_cols = shape[0], shape[1]
    big, small = max(n_rows, n_cols), min(n_rows, n_cols)
    a = jax.random.normal(key, (big, small), dtype=jnp.float32)
    q, r = jnp.linalg.qr(a)  # q: (big, small), orthonormal columns
    # Sign correction for a unique decomposition
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    if n_rows < n_cols:
        q = q.T  # (small=n_rows, big=n_cols), orthonormal rows
    return q.astype(jnp.float32)


def torch_linear_default_bound(fan_in: int) -> float:
    """torch.nn.Linear default: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in)."""
    return 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0


# --------------------------------------------------------------------------
# Linear
# --------------------------------------------------------------------------


def init_linear(
    key: Array,
    in_dim: int,
    out_dim: int,
    *,
    kernel_init: str = "torch_default",
    use_bias: bool = True,
    zero_bias: bool = False,
) -> dict:
    k_w, k_b = jax.random.split(key)
    if kernel_init == "torch_default":
        bound = torch_linear_default_bound(in_dim)
        kernel = uniform_init(k_w, (in_dim, out_dim), -bound, bound)
    elif kernel_init == "xavier_uniform":
        kernel = xavier_uniform_init(k_w, (in_dim, out_dim))
    elif kernel_init == "orthogonal":
        kernel = orthogonal_init(k_w, (in_dim, out_dim))
    else:
        raise ValueError(f"Unknown kernel_init: {kernel_init}")

    params = {"kernel": kernel}
    if use_bias:
        if zero_bias:
            params["bias"] = jnp.zeros((out_dim,), jnp.float32)
        else:
            bound = torch_linear_default_bound(in_dim)
            params["bias"] = uniform_init(k_b, (out_dim,), -bound, bound)
    return params


def matmul_default(x: Array, w: Array) -> Array:
    """``x @ w`` with XLA's DEFAULT-precision semantics made explicit for
    pre-staged bf16 weights (decode weight staging —
    models/transformer.py:stage_decode_weights_bf16 and
    models/decoder.py:stage_decode_weights_bf16).

    On TPU, a DEFAULT-precision f32 dot already truncates BOTH operands
    to bf16 on the MXU and accumulates f32 — the round-4/5 profiles
    showed the WEIGHT-side conversion copies happening inside the decode
    while-loop every step. Staging casts the weights once; this helper
    casts the (small) activation at the dot and accumulates f32, which is
    bit-identical to the unstaged f32 program on TPU. Plain jnp ``@``
    would instead UPCAST the bf16 weight back to f32 per step."""
    if w.dtype == jnp.bfloat16 and x.dtype == jnp.float32:
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return x @ w


def apply_linear(params: dict, x: Array) -> Array:
    if "kernel_q" in params:
        return int8_linear(params, x)
    y = matmul_default(x, params["kernel"])
    if "bias" in params:
        y = y + params["bias"]
    return y


# --------------------------------------------------------------------------
# W8A8 int8 linear (opt-in quantized decode — models/quantize.py)
# --------------------------------------------------------------------------


def quantize_linear_int8(params: dict) -> dict:
    """fp32/bf16 linear params → W8A8 form: per-output-channel symmetric
    int8 weights + fp32 scales. Consumed transparently by
    :func:`apply_linear` (it dispatches on the ``kernel_q`` key), so every
    decode call site routes through the int8 MXU path once the tree is
    transformed (models/quantize.py:quantize_decode_params)."""
    w = params["kernel"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0  # (out,)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "w_scale": s}
    if "bias" in params:
        out["bias"] = params["bias"].astype(jnp.float32)
    return out


def int8_linear(params: dict, x: Array) -> Array:
    """Dynamic-activation W8A8 matmul: per-row abs-max int8 activation
    quant (computed on device each call — no calibration data needed for
    decode activations), int8×int8→int32 on the MXU (2× the bf16 MXU rate
    on v5e, half the weight HBM bytes of bf16), fp32 dequant + bias.

    Numerics are approximate by construction (the whole point of the
    opt-in): token-agreement rates vs fp32 are measured by
    benchmarks/int8_decode_gate.py, mirroring the bf16 gate."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8
    ) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, params["kernel_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * params["w_scale"])
    if "bias" in params:
        y = y + params["bias"]
    return y.astype(x.dtype)


# --------------------------------------------------------------------------
# Embedding
# --------------------------------------------------------------------------


def init_embedding(
    key: Array, vocab_size: int, dim: int, *, low: float = -0.1, high: float = 0.1
) -> dict:
    """Reference decoder embeddings: U(-0.1, 0.1) (decoder.py:66)."""
    return {"table": uniform_init(key, (vocab_size, dim), low, high)}


def apply_embedding(params: dict, token_ids: Array) -> Array:
    return jnp.take(params["table"], token_ids, axis=0)


# --------------------------------------------------------------------------
# Dropout
# --------------------------------------------------------------------------


def dropout(x: Array, rate: float, rng: Optional[Array], train: bool) -> Array:
    """Inverted dropout matching torch semantics (scale by 1/keep at train)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# --------------------------------------------------------------------------
# LSTM
# --------------------------------------------------------------------------


def init_lstm_layer(
    key: Array,
    input_size: int,
    hidden_size: int,
    *,
    init_style: str = "torch_default",
) -> dict:
    """One LSTM layer's parameters.

    init_style:
      * "torch_default": all params U(±1/√H) — reference encoder LSTM, which
        never overrides torch defaults (encoder.py:35-42).
      * "orthogonal_zero_bias": orthogonal weights, zero bias — reference
        decoder LSTM (decoder.py:68-72).
    """
    k_ih, k_hh, k_bih, k_bhh = jax.random.split(key, 4)
    g4 = 4 * hidden_size
    if init_style == "torch_default":
        bound = 1.0 / math.sqrt(hidden_size)
        w_ih = uniform_init(k_ih, (input_size, g4), -bound, bound)
        w_hh = uniform_init(k_hh, (hidden_size, g4), -bound, bound)
        b_ih = uniform_init(k_bih, (g4,), -bound, bound)
        b_hh = uniform_init(k_bhh, (g4,), -bound, bound)
    elif init_style == "orthogonal_zero_bias":
        # torch orthogonal_ on a (4H, in) weight orthogonalizes its rows; we
        # orthogonalize the transposed layout to match.
        w_ih = orthogonal_init(k_ih, (g4, input_size)).T
        w_hh = orthogonal_init(k_hh, (g4, hidden_size)).T
        b_ih = jnp.zeros((g4,), jnp.float32)
        b_hh = jnp.zeros((g4,), jnp.float32)
    else:
        raise ValueError(f"Unknown init_style: {init_style}")
    return {"w_ih": w_ih, "w_hh": w_hh, "b_ih": b_ih, "b_hh": b_hh}


def lstm_cell(
    layer: dict, x: Array, h: Array, c: Array
) -> Tuple[Array, Array]:
    """Single LSTM cell step. x: (B, in), h/c: (B, H) → (h', c').

    Gate packing [i, f, g, o] along 4H (torch layout). All matmuls are MXU
    ops; the elementwise tail fuses into them under XLA.
    """
    gates = (matmul_default(x, layer["w_ih"]) + matmul_default(h, layer["w_hh"])
             + layer["b_ih"] + layer["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _lstm_gates_tail(gates: Array, c: Array) -> Tuple[Array, Array]:
    """Elementwise LSTM tail from precomputed gate pre-activations."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(
    layer: dict,
    xs: Array,
    h0: Array,
    c0: Array,
    mask: Optional[Array] = None,
    reverse: bool = False,
) -> Tuple[Array, Tuple[Array, Array]]:
    """Run one LSTM layer over time with ``lax.scan``.

    xs: (B, T, in); h0/c0: (B, H); mask: (B, T) with 1=valid.
    Returns outputs (B, T, H) and final (h, c).

    The input-side projection ``x·W_ih`` is hoisted out of the scan as one
    (B·T, in)@(in, 4H) MXU matmul — only the recurrent ``h·W_hh`` stays
    sequential (the cuDNN recipe; math identical, verified against torch).

    Masked semantics mirror torch packed sequences (reference
    encoder.py:74-82): at padded steps the state carries through and the
    output is zero, so the "final" state is the state at each sequence's
    last valid step.
    """
    # Hoist: all timesteps' input projections in one large matmul.
    xs_proj = xs @ layer["w_ih"] + (layer["b_ih"] + layer["b_hh"])  # (B, T, 4H)
    xs_t = jnp.swapaxes(xs_proj, 0, 1)  # (T, B, 4H)
    mask_t = None if mask is None else jnp.swapaxes(mask, 0, 1)  # (T, B)
    w_hh = layer["w_hh"]

    def step(carry, inp):
        h, c = carry
        if mask_t is None:
            gates = inp + h @ w_hh
            h_new, c_new = _lstm_gates_tail(gates, c)
            return (h_new, c_new), h_new
        x_proj, m = inp
        gates = x_proj + h @ w_hh
        h_new, c_new = _lstm_gates_tail(gates, c)
        m = m[:, None]
        h_keep = jnp.where(m > 0, h_new, h)
        c_keep = jnp.where(m > 0, c_new, c)
        out = jnp.where(m > 0, h_new, jnp.zeros_like(h_new))
        return (h_keep, c_keep), out

    inputs = xs_t if mask_t is None else (xs_t, mask_t)
    (h_f, c_f), outs = jax.lax.scan(step, (h0, c0), inputs, reverse=reverse)
    return jnp.swapaxes(outs, 0, 1), (h_f, c_f)


def reverse_sequence(x: Array, lengths: Optional[Array]) -> Array:
    """Reverse each sequence's valid prefix in a padded (B, T, ...) array.

    With ``lengths=None`` this is a plain flip. Otherwise position t maps to
    ``length-1-t`` for t < length and stays put past the end — the transform
    packed-sequence bidirectional LSTMs apply implicitly.
    """
    if lengths is None:
        return jnp.flip(x, axis=1)
    T = x.shape[1]
    t = jnp.arange(T)[None, :]  # (1, T)
    src = lengths[:, None] - 1 - t  # (B, T)
    src = jnp.where(src >= 0, src, t)
    return jnp.take_along_axis(
        x, src.reshape(src.shape + (1,) * (x.ndim - 2)), axis=1
    )


def init_multilayer_lstm(
    key: Array,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    *,
    bidirectional: bool = False,
    init_style: str = "torch_default",
) -> List[dict]:
    """Stack of LSTM layers. For bidirectional stacks each layer holds
    separate ``fwd``/``bwd`` cells and upper layers consume 2H inputs."""
    layers = []
    keys = jax.random.split(key, num_layers)
    for l in range(num_layers):
        in_dim = input_size if l == 0 else hidden_size * (2 if bidirectional else 1)
        if bidirectional:
            kf, kb = jax.random.split(keys[l])
            layers.append(
                {
                    "fwd": init_lstm_layer(kf, in_dim, hidden_size, init_style=init_style),
                    "bwd": init_lstm_layer(kb, in_dim, hidden_size, init_style=init_style),
                }
            )
        else:
            layers.append(init_lstm_layer(keys[l], in_dim, hidden_size, init_style=init_style))
    return layers
