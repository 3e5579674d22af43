"""Attention LSTM caption decoder.

Capability parity with reference src/models/decoder.py:10-289:

* embedding (U(-0.1,0.1)) + dropout (ref :33-34, :66),
* config-selected attention over encoder outputs (fixes the reference's
  hardcoded "bahdanau" at decoder.py:38),
* multi-layer LSTM whose input is ``[embedding ; context]`` (ref :44-50),
  orthogonal weights / zero bias (ref :68-72),
* deep-output head: ``tanh(W [lstm_top ; context ; embedding])`` followed by
  the vocab projection, xavier / zero-bias (ref :53-59, :155-169),
* decoder state initialised by replicating the encoder final state across
  layers with a zero cell (ref :81-106). When ``encoder_dim != hidden_dim``
  the reference instantiates a *fresh random* Linear on every call
  (decoder.py:97-99 — a defect); here the projection is a learned parameter
  created once at init.

TPU-native structure: teacher forcing is a single ``lax.scan`` over the
caption length. Reference-equivalent hoists keep the MXU busy: token
embeddings are gathered for all T steps up front, the embedding slice of
layer-1's input projection runs as one big matmul outside the scan, the
attention's encoder-side projections are precomputed once (see
``models.attention``), and the deep-output head + (H→V) vocab projection
run once over the stacked ``(B·T, ·)`` states instead of T small per-step
matmuls. Under training, ``training.remat_attention`` rematerializes the
(B, S, A) attention-score tensor in the backward pass instead of staging
it per step (~420 MB of residual HBM traffic at reference scale).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from . import attention as attn_mod
from .layers import (
    _lstm_gates_tail,
    apply_embedding,
    apply_linear,
    dropout,
    init_embedding,
    init_linear,
    init_multilayer_lstm,
    lstm_cell,
)

Array = jax.Array
State = Tuple[Array, Array]  # (h, c), each (L, B, H)


def init_decoder(key: Array, config: Config, vocabulary_size: int) -> dict:
    m = config.model
    emb_dim = m.embedding_dim
    H = m.decoder_hidden_dim
    E = m.encoder_hidden_dim
    L = m.decoder_num_layers

    k_emb, k_attn, k_lstm, k_ctx, k_out, k_init = jax.random.split(key, 6)

    lstm_input = emb_dim + E if m.use_attention else emb_dim
    params = {
        "embedding": init_embedding(k_emb, vocabulary_size, emb_dim),
        "lstm": init_multilayer_lstm(
            k_lstm, lstm_input, H, L, init_style="orthogonal_zero_bias"
        ),
        "output_projection": init_linear(
            k_out, H, vocabulary_size, kernel_init="xavier_uniform", zero_bias=True
        ),
    }
    if m.use_attention:
        params["attention"] = attn_mod.init_attention(k_attn, config)
        params["context_projection"] = init_linear(
            k_ctx, E + H + emb_dim, H, kernel_init="xavier_uniform", zero_bias=True
        )
    if E != H:
        # Learned once — fixes reference decoder.py:97-99 (fresh random
        # nn.Linear per call).
        params["init_state_projection"] = init_linear(k_init, E, H)
    return params


def init_hidden_state(params: dict, config: Config, encoder_final_state: Array) -> State:
    """Replicate (projected) encoder final state across layers; zero cell."""
    L = config.model.decoder_num_layers
    if "init_state_projection" in params:
        projected = apply_linear(params["init_state_projection"], encoder_final_state)
    else:
        projected = encoder_final_state
    h = jnp.broadcast_to(projected[None], (L,) + projected.shape)
    c = jnp.zeros_like(h)
    return h, c


def stage_decode_weights_bf16(dec: dict) -> dict:
    """Pre-cast the LSTM decode loop's weight matrices to bfloat16, once.

    Same rationale as models/transformer.py:stage_decode_weights_bf16:
    XLA's DEFAULT dot precision truncates f32 operands to bf16 on the MXU
    anyway, but the conversion of the WEIGHTS happens inside the decode
    while-loop every step. Targets the in-loop matmuls — LSTM cell
    w_ih/w_hh, the deep-output ``context_projection``, the vocab
    ``output_projection``, and the per-step attention linears (the
    precompute-side projections run once outside the loop and are staged
    harmlessly). Biases, embeddings and the init-state projection stay
    f32. TPU-only by construction — callers gate on the backend because
    CPU DEFAULT precision is true f32 (see layers.matmul_default).

    int8-quantized linears ("kernel_q") are left untouched.
    """
    def sl(p):
        if (isinstance(p, dict) and "kernel" in p
                and p["kernel"].dtype == jnp.float32
                # Only MXU-shaped matmuls: XLA's DEFAULT bf16 truncation
                # applies to dots it lowers onto the MXU. Narrow kernels
                # (e.g. bahdanau's (A, 1) score vector) lower to f32 VPU
                # fusions instead — staging those CHANGED tokens on chip
                # (0.9922 agreement, ab_beam_flags round 5) and converts
                # only KBs anyway, so they stay f32.
                and min(p["kernel"].shape) >= 128):
            return {**p, "kernel": p["kernel"].astype(jnp.bfloat16)}
        return p

    def cell(layer):
        out = dict(layer)
        for k in ("w_ih", "w_hh"):
            if out[k].dtype == jnp.float32:
                out[k] = out[k].astype(jnp.bfloat16)
        return out

    out = dict(dec)
    out["lstm"] = [cell(l) for l in dec["lstm"]]
    for k in ("context_projection", "output_projection"):
        if k in out:
            out[k] = sl(out[k])
    if "attention" in out:
        out["attention"] = {k: sl(v) for k, v in out["attention"].items()}
    return out


def _lstm_stack_step(
    params: dict,
    config: Config,
    x: Array,
    state: State,
    *,
    train: bool,
    rng: Optional[Array],
) -> Tuple[Array, State]:
    """One timestep through all decoder LSTM layers. x: (B, in)."""
    h_prev, c_prev = state
    p_drop = config.model.decoder_dropout
    num_layers = len(params["lstm"])
    use_pallas = config.kernels.use_pallas_lstm and not train
    hs, cs = [], []
    inp = x
    for l, layer in enumerate(params["lstm"]):
        if use_pallas:
            from ..ops.lstm_pallas import lstm_cell_pallas

            h_new, c_new = lstm_cell_pallas(
                layer, inp, h_prev[l], c_prev[l],
                interpret=config.kernels.interpret,
            )
        else:
            h_new, c_new = lstm_cell(layer, inp, h_prev[l], c_prev[l])
        hs.append(h_new)
        cs.append(c_new)
        inp = h_new
        if train and l < num_layers - 1 and num_layers > 1 and rng is not None:
            inp = dropout(inp, p_drop, jax.random.fold_in(rng, l), train)
    return inp, (jnp.stack(hs), jnp.stack(cs))


def decoder_core_step(
    params: dict,
    config: Config,
    embedded: Array,
    state: State,
    encoder_outputs: Array,
    attn_cache: Dict[str, Array],
    encoder_mask: Optional[Array],
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Tuple[Array, State, Optional[Array]]:
    """One decode step from an already-embedded token.

    Returns the pre-vocab deep-output state ``(B, H)`` (apply
    ``output_projection`` for logits), the new LSTM state, and attention
    weights ``(B, S)`` (or None without attention).
    """
    r_attn = r_lstm = None
    if rng is not None:
        r_attn, r_lstm = jax.random.split(rng)

    if config.model.use_attention:
        top_hidden = state[0][-1]  # previous top-layer h (ref decoder.py:135)
        context, weights = attn_mod.attend(
            config, params["attention"], attn_cache, encoder_outputs, top_hidden,
            encoder_mask, train=train, rng=r_attn,
        )
        lstm_in = jnp.concatenate([embedded, context], axis=-1)
    else:
        context, weights = None, None
        lstm_in = embedded

    lstm_top, new_state = _lstm_stack_step(
        params, config, lstm_in, state, train=train, rng=r_lstm
    )

    if config.model.use_attention:
        deep_in = jnp.concatenate([lstm_top, context, embedded], axis=-1)
        pre_vocab = jnp.tanh(apply_linear(params["context_projection"], deep_in))
    else:
        pre_vocab = lstm_top
    return pre_vocab, new_state, weights


def decoder_step(
    params: dict,
    config: Config,
    input_token: Array,
    state: State,
    encoder_outputs: Array,
    attn_cache: Dict[str, Array],
    encoder_mask: Optional[Array],
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Tuple[Array, State, Optional[Array]]:
    """One decode step from token ids (B,) → logits (B, V)."""
    embedded = apply_embedding(params["embedding"], input_token)
    if train and rng is not None:
        emb_rng, rng = jax.random.split(rng)
        embedded = dropout(embedded, config.model.decoder_dropout, emb_rng, train)
    pre_vocab, new_state, weights = decoder_core_step(
        params, config, embedded, state, encoder_outputs, attn_cache,
        encoder_mask, train=train, rng=rng,
    )
    logits = apply_linear(params["output_projection"], pre_vocab)
    return logits, new_state, weights


def apply_decoder(
    params: dict,
    config: Config,
    encoder_outputs: Array,
    encoder_final_state: Array,
    target_tokens: Array,
    encoder_mask: Optional[Array] = None,
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Dict[str, Array]:
    """Teacher-forcing forward pass.

    Args:
      encoder_outputs: (B, S, E)
      encoder_final_state: (B, E)
      target_tokens: (B, T) input tokens (already shifted).

    Returns dict with ``logits`` (B, T, V) and, with attention,
    ``attention_weights`` (B, T, S).
    """
    B, T = target_tokens.shape
    state0 = init_hidden_state(params, config, encoder_final_state)
    use_attention = config.model.use_attention

    # Hoist: embed all steps at once (one gather instead of T).
    embedded_all = apply_embedding(params["embedding"], target_tokens)  # (B, T, emb)
    if train and rng is not None:
        emb_rng, rng = jax.random.split(rng)
        embedded_all = dropout(
            embedded_all, config.model.decoder_dropout, emb_rng, train
        )

    attn_cache = (
        attn_mod.precompute(config, params["attention"], encoder_outputs)
        if use_attention
        else {}
    )

    # Hoist: the embedding slice of layer-1's input projection for every
    # step — one (B·T, emb)×(emb, 4H) MXU matmul outside the scan instead
    # of T in-scan slices of it. Only the context slice (which depends on
    # the previous step's attention) stays in the loop.
    lstm_layers = params["lstm"]
    l1 = lstm_layers[0]
    emb_dim = embedded_all.shape[-1]
    emb_gates_all = (
        jnp.einsum("bte,eg->btg", embedded_all, l1["w_ih"][:emb_dim])
        + l1["b_ih"] + l1["b_hh"]
    )  # (B, T, 4H)
    w_ctx = l1["w_ih"][emb_dim:]  # (E, 4H); empty without attention
    p_drop = config.model.decoder_dropout
    n_layers = len(lstm_layers)

    def attn_step(top_hidden, step_rng):
        return attn_mod.attend(
            config, params["attention"], attn_cache, encoder_outputs,
            top_hidden, encoder_mask, train=train, rng=step_rng,
        )

    if use_attention and train and config.training.remat_attention:
        # Recompute the (B, S, A) score tensor in the backward pass instead
        # of staging it per step — ~420 MB of residual HBM traffic at the
        # reference scale (profiled; docs/PERFORMANCE.md) for ~35 µs/step
        # of recompute. Values and gradients are unchanged.
        attn_step = jax.checkpoint(attn_step)

    def step(carry, inp):
        state, step_idx = carry
        emb_gates_t = inp  # (B, 4H)
        h_prev, c_prev = state
        step_rng = (
            jax.random.fold_in(rng, step_idx) if (train and rng is not None) else None
        )
        r_attn = r_lstm = None
        if step_rng is not None:
            r_attn, r_lstm = jax.random.split(step_rng)

        if use_attention:
            context, weights = attn_step(h_prev[-1], r_attn)
            gates1 = emb_gates_t + context @ w_ctx + h_prev[0] @ l1["w_hh"]
        else:
            context = jnp.zeros((B, 0), emb_gates_t.dtype)
            weights = jnp.zeros((B, encoder_outputs.shape[1]), emb_gates_t.dtype)
            gates1 = emb_gates_t + h_prev[0] @ l1["w_hh"]
        h_top, c1 = _lstm_gates_tail(gates1, c_prev[0])
        hs, cs = [h_top], [c1]
        for l in range(1, n_layers):
            inp_l = hs[-1]
            if train and rng is not None:
                # Same stream as _lstm_stack_step: key fold_in(r_lstm, l-1)
                # between layers l-1 and l.
                inp_l = dropout(inp_l, p_drop, jax.random.fold_in(r_lstm, l - 1), train)
            h_l, c_l = lstm_cell(lstm_layers[l], inp_l, h_prev[l], c_prev[l])
            hs.append(h_l)
            cs.append(c_l)
            h_top = h_l
        new_state = (jnp.stack(hs), jnp.stack(cs))
        return (new_state, step_idx + 1), (h_top, context, weights)

    (_, _), (top_seq, context_seq, weights_seq) = jax.lax.scan(
        step, (state0, jnp.int32(0)), jnp.swapaxes(emb_gates_all, 0, 1)
    )
    top_seq = jnp.swapaxes(top_seq, 0, 1)          # (B, T, H)
    context_seq = jnp.swapaxes(context_seq, 0, 1)  # (B, T, E)
    weights_seq = jnp.swapaxes(weights_seq, 0, 1)  # (B, T, S)

    # Hoist: the deep-output head runs once over all stacked steps — the
    # (B·T, ·) context-projection and tanh replace T small in-scan ones.
    if use_attention:
        deep_in = jnp.concatenate([top_seq, context_seq, embedded_all], axis=-1)
        pre_vocab_seq = jnp.tanh(apply_linear(params["context_projection"], deep_in))
    else:
        pre_vocab_seq = top_seq

    # Hoist: one (B·T, H)@(H, V) matmul instead of T small ones.
    logits = apply_linear(params["output_projection"], pre_vocab_seq)

    result = {"logits": logits}
    if config.model.use_attention:
        result["attention_weights"] = weights_seq
    return result


def decoder_step_beam_core(
    params: dict,
    config: Config,
    input_tokens: Array,       # (B, K) token ids
    state: State,              # (L, B·K, H)
    encoder_outputs: Array,    # (B, S, E) — UN-expanded
    attn_cache: Dict[str, Array],
    encoder_mask: Optional[Array],  # (B, S)
) -> Tuple[Array, State, Optional[Array]]:
    """Beam decode step up to the pre-vocab deep-output state (B·K, H),
    with shared (per-video) attention caches.

    Mathematically identical to ``decoder_step`` on beam-expanded inputs,
    but encoder-side tensors are read once per video instead of once per
    beam — K× less HBM traffic in the decode loop's attention.
    Eval-only (generation path). Apply ``output_projection`` for logits, or
    feed the fused vocab-top-k kernel (ops/vocab_topk_pallas.py).
    """
    B, K = input_tokens.shape
    embedded = apply_embedding(params["embedding"], input_tokens)  # (B, K, emb)

    if config.model.use_attention:
        top_hidden = state[0][-1].reshape(B, K, -1)
        context, weights = attn_mod.attend_beam(
            config, params["attention"], attn_cache, encoder_outputs,
            top_hidden, encoder_mask,
        )  # (B, K, E)
        lstm_in = jnp.concatenate([embedded, context], axis=-1).reshape(B * K, -1)
    else:
        context, weights = None, None
        lstm_in = embedded.reshape(B * K, -1)

    lstm_top, new_state = _lstm_stack_step(
        params, config, lstm_in, state, train=False, rng=None
    )

    if config.model.use_attention:
        deep_in = jnp.concatenate(
            [lstm_top, context.reshape(B * K, -1), embedded.reshape(B * K, -1)],
            axis=-1,
        )
        pre_vocab = jnp.tanh(apply_linear(params["context_projection"], deep_in))
    else:
        pre_vocab = lstm_top
    return pre_vocab, new_state, weights


def decoder_step_beam(
    params: dict,
    config: Config,
    input_tokens: Array,
    state: State,
    encoder_outputs: Array,
    attn_cache: Dict[str, Array],
    encoder_mask: Optional[Array],
) -> Tuple[Array, State, Optional[Array]]:
    """Beam decode step → logits (B·K, V). See decoder_step_beam_core."""
    pre_vocab, new_state, weights = decoder_step_beam_core(
        params, config, input_tokens, state, encoder_outputs, attn_cache,
        encoder_mask,
    )
    logits = apply_linear(params["output_projection"], pre_vocab)  # (B·K, V)
    return logits, new_state, weights
