"""Pre-LN encoder-decoder transformer captioner (TPU-first model family).

No reference analog — the reference (src/models/*) is LSTM-only. This is
the framework's second model family, selected with
``config.model.architecture = "transformer"`` and exposed through the same
``captioner.init_model / apply_model / encode`` + ``generation.generate``
surface, trainer, predictor, and checkpoints as the LSTM family.

Why a transformer is the TPU-native shape for this workload:

* **Training is one parallel pass.** The LSTM family's teacher forcing is a
  ``lax.scan`` over 20 sequential steps; here every position is computed at
  once — the whole step is a handful of large ``(B·T, D)`` matmuls that
  tile straight onto the MXU with no sequential dependency.
* **Decode state is a KV cache, not a recurrence.** Incremental decoding
  appends one key/value row per layer per step and attends over the prefix
  — all fixed-shape, all on-device, same ``lax.while_loop`` discipline as
  the LSTM generation paths (no host round-trips per step).
* **Beam search reads encoder tensors once per video.** Cross-attention
  K/V are precomputed from the encoder outputs and stay UN-expanded
  ``(B, S, D)`` with the beam axis broadcast in-register — the same K×
  HBM-traffic saving the LSTM beam path uses (models/decoder.py:
  decoder_step_beam_core).

Structure (pre-LN, GELU MLP, learned positions):

* encoder: feature projection F→D, +pos, N × [LN→self-attn→res,
  LN→MLP→res], final LN. Padded frames are masked out of the attention
  keys (same semantics as the LSTM encoder's packed-sequence masking).
* decoder: token embedding (+pos), M × [LN→causal self-attn→res,
  LN→cross-attn→res, LN→MLP→res], final LN, vocab projection. The last
  block's head-averaged cross-attention weights are returned as
  ``attention_weights`` (B, T, S) so the attention-visualization surface
  (predictor.explain_prediction) works identically across families.

Parameter naming matches the sharding rules in parallel/sharding.py: the
token ``embedding.table`` (V, D) shards vocab rows over the ``model`` mesh
axis and ``decoder.output_projection`` (D, V) shards vocab columns — the
transformer gets tensor parallelism through the exact same specs as the
LSTM family.
"""

from __future__ import annotations

import logging
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from .layers import apply_linear, dropout, init_linear

Array = jax.Array

NEG_INF = -1e9


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------


def _init_layer_norm(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _apply_layer_norm(p: dict, x: Array) -> Array:
    # fp32 statistics regardless of compute dtype (bf16-safe).
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _init_attn(key: Array, d_model: int) -> dict:
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wq": init_linear(kq, d_model, d_model, kernel_init="xavier_uniform",
                          zero_bias=True),
        "wk": init_linear(kk, d_model, d_model, kernel_init="xavier_uniform",
                          zero_bias=True),
        "wv": init_linear(kv, d_model, d_model, kernel_init="xavier_uniform",
                          zero_bias=True),
        "wo": init_linear(ko, d_model, d_model, kernel_init="xavier_uniform",
                          zero_bias=True),
    }


def _init_mlp(key: Array, d_model: int, ratio: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, d_model, ratio * d_model,
                           kernel_init="xavier_uniform", zero_bias=True),
        "fc2": init_linear(k2, ratio * d_model, d_model,
                           kernel_init="xavier_uniform", zero_bias=True),
    }


def _init_encoder_block(key: Array, d_model: int, ratio: int) -> dict:
    ka, km = jax.random.split(key)
    return {
        "ln1": _init_layer_norm(d_model),
        "self_attn": _init_attn(ka, d_model),
        "ln2": _init_layer_norm(d_model),
        "mlp": _init_mlp(km, d_model, ratio),
    }


def _init_decoder_block(key: Array, d_model: int, ratio: int) -> dict:
    ks, kc, km = jax.random.split(key, 3)
    return {
        "ln1": _init_layer_norm(d_model),
        "self_attn": _init_attn(ks, d_model),
        "ln2": _init_layer_norm(d_model),
        "cross_attn": _init_attn(kc, d_model),
        "ln3": _init_layer_norm(d_model),
        "mlp": _init_mlp(km, d_model, ratio),
    }


def init_transformer(key: Array, config: Config, vocabulary_size: int) -> dict:
    m = config.model
    D = m.decoder_hidden_dim
    F = m.cnn_feature_dim
    S = m.video_sequence_length
    T = m.max_sequence_length + 1  # +1: START occupies position 0
    ratio = m.transformer_mlp_ratio

    k_enc, k_dec = jax.random.split(key)

    # Encoder
    k_proj, k_pos_e, k_blocks_e = jax.random.split(k_enc, 3)
    enc_blocks = [
        _init_encoder_block(k, D, ratio)
        for k in jax.random.split(k_blocks_e, m.transformer_num_layers)
    ]
    encoder = {
        "feature_projection": init_linear(k_proj, F, D),
        "pos_embedding": 0.02 * jax.random.normal(k_pos_e, (S, D), jnp.float32),
        "blocks": enc_blocks,
        "ln_f": _init_layer_norm(D),
    }

    # Decoder
    k_emb, k_pos_d, k_blocks_d, k_out = jax.random.split(k_dec, 4)
    dec_blocks = [
        _init_decoder_block(k, D, ratio)
        for k in jax.random.split(k_blocks_d, m.transformer_decoder_layers)
    ]
    decoder = {
        # "embedding"/"table" and "output_projection" names line up with
        # parallel/sharding.py's TP specs (vocab rows / vocab columns).
        "embedding": {
            "table": 0.02 * jax.random.normal(
                k_emb, (vocabulary_size, D), jnp.float32)
        },
        "pos_embedding": 0.02 * jax.random.normal(k_pos_d, (T, D), jnp.float32),
        "blocks": dec_blocks,
        "ln_f": _init_layer_norm(D),
        "output_projection": init_linear(
            k_out, D, vocabulary_size, kernel_init="xavier_uniform",
            zero_bias=True),
    }
    return {"encoder": encoder, "decoder": decoder}


# --------------------------------------------------------------------------
# Attention primitive (full-sequence, batched)
# --------------------------------------------------------------------------


def _heads(x: Array, num_heads: int) -> Array:
    """(B, T, D) → (B, T, h, dh)."""
    B, T, D = x.shape
    return x.reshape(B, T, num_heads, D // num_heads)


def _mha(
    p: dict,
    q_in: Array,            # (B, Tq, D)
    kv_in: Array,           # (B, Tk, D)
    num_heads: int,
    mask: Optional[Array],  # (B, Tq, Tk) or (1, Tq, Tk); 1 = attend
) -> Tuple[Array, Array]:
    """Multi-head attention. Returns (out (B, Tq, D), head-avg weights
    (B, Tq, Tk)). Scores/softmax run in fp32."""
    D = q_in.shape[-1]
    dh = D // num_heads
    q = _heads(apply_linear(p["wq"], q_in), num_heads)  # (B, Tq, h, dh)
    k = _heads(apply_linear(p["wk"], kv_in), num_heads)
    v = _heads(apply_linear(p["wv"], kv_in), num_heads)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    scores = scores / math.sqrt(dh)
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :] > 0, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)  # (B, h, Tq, Tk)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
    out = apply_linear(p["wo"], ctx.reshape(q_in.shape))
    return out, jnp.mean(weights, axis=1).astype(q_in.dtype)


def _mlp(p: dict, x: Array) -> Array:
    return apply_linear(p["fc2"], jax.nn.gelu(apply_linear(p["fc1"], x)))


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def apply_transformer_encoder(
    params: dict,
    config: Config,
    video_features: Array,          # (B, S, F)
    video_mask: Optional[Array],    # (B, S), 1 = valid
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Returns (encoder_outputs (B, S, D), final_hidden (B, D)).

    ``final_hidden`` is the masked mean over valid frames — the interface
    slot the LSTM family fills with its projected last states. The
    transformer decoder doesn't consume it (cross-attention reads the full
    outputs), but the captioner API keeps one shape across families.
    """
    m = config.model
    heads = m.transformer_num_heads
    p_drop = m.transformer_dropout
    B, S, _ = video_features.shape
    rngs = jax.random.split(rng, 1 + 2 * len(params["blocks"])) \
        if rng is not None else [None] * (1 + 2 * len(params["blocks"]))

    if S > params["pos_embedding"].shape[0]:
        raise ValueError(
            f"transformer encoder got {S} frames but its learned position "
            f"table covers {params['pos_embedding'].shape[0]} "
            "(model.video_sequence_length at init); resample the video or "
            "re-init with a larger video_sequence_length"
        )
    x = apply_linear(params["feature_projection"], video_features)  # (B, S, D)
    x = x + params["pos_embedding"][None, :S, :].astype(x.dtype)
    x = dropout(x, p_drop, rngs[0], train)

    attn_mask = None
    if video_mask is not None:
        # Keys at padded frames are masked for every query (B, S_q, S_k).
        attn_mask = jnp.broadcast_to(video_mask[:, None, :], (B, S, S))

    for i, blk in enumerate(params["blocks"]):
        h_in = _apply_layer_norm(blk["ln1"], x)
        h, _ = _mha(blk["self_attn"], h_in, h_in, heads, attn_mask)
        x = x + dropout(h, p_drop, rngs[1 + 2 * i], train)
        h = _mlp(blk["mlp"], _apply_layer_norm(blk["ln2"], x))
        x = x + dropout(h, p_drop, rngs[2 + 2 * i], train)

    x = _apply_layer_norm(params["ln_f"], x)

    if video_mask is not None:
        msk = video_mask.astype(x.dtype)[:, :, None]
        final = (x * msk).sum(axis=1) / jnp.maximum(msk.sum(axis=1), 1.0)
    else:
        final = x.mean(axis=1)
    return x, final


# --------------------------------------------------------------------------
# Decoder — teacher forcing (fully parallel)
# --------------------------------------------------------------------------


def apply_transformer_decoder(
    params: dict,
    config: Config,
    encoder_outputs: Array,        # (B, S, D)
    input_tokens: Array,           # (B, T) already-shifted inputs
    encoder_mask: Optional[Array],  # (B, S)
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Dict[str, Array]:
    """Teacher-forcing decode — every position in one pass (no scan).

    Returns ``logits`` (B, T, V) and ``attention_weights`` (B, T, S): the
    last block's head-averaged cross-attention.
    """
    m = config.model
    heads = m.transformer_num_heads
    p_drop = m.transformer_dropout
    B, T = input_tokens.shape
    S = encoder_outputs.shape[1]
    n_blocks = len(params["blocks"])
    rngs = jax.random.split(rng, 1 + 3 * n_blocks) \
        if rng is not None else [None] * (1 + 3 * n_blocks)

    emb = jnp.take(params["embedding"]["table"], input_tokens, axis=0)
    x = emb.astype(encoder_outputs.dtype)
    x = x + params["pos_embedding"][None, :T, :].astype(x.dtype)
    x = dropout(x, p_drop, rngs[0], train)

    causal = jnp.tril(jnp.ones((1, T, T), jnp.float32))  # (1, T, T)
    cross_mask = None
    if encoder_mask is not None:
        cross_mask = jnp.broadcast_to(encoder_mask[:, None, :], (B, T, S))

    cross_w = None
    for i, blk in enumerate(params["blocks"]):
        h_in = _apply_layer_norm(blk["ln1"], x)
        h, _ = _mha(blk["self_attn"], h_in, h_in, heads, causal)
        x = x + dropout(h, p_drop, rngs[1 + 3 * i], train)
        h, cross_w = _mha(
            blk["cross_attn"], _apply_layer_norm(blk["ln2"], x),
            encoder_outputs, heads, cross_mask,
        )
        x = x + dropout(h, p_drop, rngs[2 + 3 * i], train)
        h = _mlp(blk["mlp"], _apply_layer_norm(blk["ln3"], x))
        x = x + dropout(h, p_drop, rngs[3 + 3 * i], train)

    x = _apply_layer_norm(params["ln_f"], x)
    logits = apply_linear(params["output_projection"], x)  # (B, T, V)
    return {"logits": logits, "attention_weights": cross_w}


# --------------------------------------------------------------------------
# Incremental decode (generation): KV caches, one token per step
# --------------------------------------------------------------------------


def precompute_cross_kv(
    params: dict, encoder_outputs: Array, num_heads: Optional[int] = None,
    operand_layout: bool = False,
) -> Dict[str, Array]:
    """Cross-attention K/V for every decoder block, computed ONCE per
    generation call (analog of models/attention.precompute). Stacked
    (n_blocks, B, S, D); stays un-expanded across beams.

    ``operand_layout=True`` (requires ``num_heads``) instead returns
    per-layer TUPLES of (B, h, dh, S) bfloat16 tensors — S-minor, the
    exact operand layout AND dtype the decode loop's DEFAULT-precision
    attention dots want (chip profile: XLA stages f32-stored cross-KV
    through f32→bf16 {1,2,0}-relayout copies EVERY step). Pre-staging
    removes that per-step conversion by construction; see
    kernels.transformer_cross_kv_bf16 and _cross_attn_step_operand.

    A plain head-major (n_blocks, B, h, S, dh) layout (num_heads accepted
    but otherwise ignored for that call-site symmetry) was A/B'd on chip
    round 3 and LOST ~50% on the greedy path (XLA handles the in-loop
    head split of the (B, S, D) form better than a pre-transposed
    operand; beam neutral), and plain bf16 storage in the (B, S, D) form
    lost 28% on beam (round 4: without the relayout copies XLA runs the
    dots on the unpacked storage layout) — docs/PERFORMANCE.md."""
    ks, vs = [], []
    for blk in params["blocks"]:
        ks.append(apply_linear(blk["cross_attn"]["wk"], encoder_outputs))
        vs.append(apply_linear(blk["cross_attn"]["wv"], encoder_outputs))
    if operand_layout:
        B, S, D = encoder_outputs.shape
        h = num_heads
        dh = D // h

        def to_operand(x):
            return (
                x.reshape(B, S, h, dh)
                .transpose(0, 2, 3, 1)
                .astype(jnp.bfloat16)
            )

        return {
            "k": tuple(to_operand(k) for k in ks),
            "v": tuple(to_operand(v) for v in vs),
        }
    return {"k": jnp.stack(ks), "v": jnp.stack(vs)}


def stage_decode_weights_bf16(dec: dict) -> dict:
    """Pre-cast the decode loop's weight KERNELS to bfloat16, once.

    Targets exactly the matmuls that run INSIDE the per-step decode loop:
    self-attention wq/wk/wv/wo, cross-attention wq/wo (wk/wv only run once
    in precompute_cross_kv and stay f32), MLP fc1/fc2, and the vocab
    output_projection. Biases, layer norms, embeddings and positions stay
    f32.

    Why: under XLA's DEFAULT dot precision every f32 matmul truncates its
    operands to bf16 on the MXU anyway, and the round-5 per-op profile
    showed the WEIGHT-side conversions happening inside the while loop
    every step (bf16[512,512] copy-starts for the block linears and
    chunked f32[10000,512] slice-starts re-staging the vocab projection —
    several ms/batch of loop DMA at B=256 beam-5). Pre-casting produces a
    bit-identical program on TPU (same bf16-rounded operands, same f32
    accumulation — see layers.apply_linear's mixed path) minus the
    per-step conversions. TPU-only by construction: callers gate on the
    backend because on CPU (where DEFAULT precision is true f32) this
    WOULD change numerics.

    int8-quantized linears ("kernel_q") are left untouched.
    """
    def stage_linear(p: dict) -> dict:
        if "kernel" not in p or p["kernel"].dtype != jnp.float32:
            return p
        if min(p["kernel"].shape) < 128:
            # Narrow dots lower to f32 VPU fusions, not truncating MXU
            # matmuls — staging them would change numerics (see
            # decoder.stage_decode_weights_bf16). All current transformer
            # decode kernels are >=512 wide; the guard keeps the
            # bit-identity contract under future model-size knobs.
            return p
        return {**p, "kernel": p["kernel"].astype(jnp.bfloat16)}

    blocks = []
    for blk in dec["blocks"]:
        blocks.append({
            **blk,
            "self_attn": {k: stage_linear(v)
                          for k, v in blk["self_attn"].items()},
            "cross_attn": {
                k: (stage_linear(v) if k in ("wq", "wo") else v)
                for k, v in blk["cross_attn"].items()
            },
            "mlp": {k: stage_linear(v) for k, v in blk["mlp"].items()},
        })
    return {
        **dec,
        "blocks": blocks,
        "output_projection": stage_linear(dec["output_projection"]),
    }


def merge_self_attn_qkv(dec: dict) -> dict:
    """Concatenate each block's self-attention wq/wk/wv into ONE fused
    ``wqkv`` (D, 3D) linear for the decode loop, built once per generation
    call (kernels.transformer_merge_qkv).

    Why: each decode step runs three back-to-back (N, D)x(D, D) matmuls on
    the SAME activation. XLA does not merge separate dots, so each is its
    own MXU dispatch reading x from HBM again. One (N, D)x(D, 3D) matmul
    reads x once and amortizes the dispatch. Bit-identical by
    construction: output columns of a matmul are independent lanes — the
    contraction order per column is unchanged by concatenating kernels
    along the output axis (agreement gated on chip in
    benchmarks/ab_beam_flags.py, arm ``qkv``).

    Composes with stage_decode_weights_bf16 (concat preserves the staged
    dtype — call AFTER staging). int8-quantized linears are left split:
    their per-channel scales already concatenate per-kernel, and the int8
    path is opt-in/approximate anyway.
    """
    blocks = []
    for blk in dec["blocks"]:
        sa = blk["self_attn"]
        if "kernel" not in sa.get("wq", {}):
            blocks.append(blk)
            continue
        wqkv = {
            "kernel": jnp.concatenate(
                [sa["wq"]["kernel"], sa["wk"]["kernel"], sa["wv"]["kernel"]],
                axis=1,
            ),
            "bias": jnp.concatenate(
                [sa["wq"]["bias"], sa["wk"]["bias"], sa["wv"]["bias"]]
            ),
        }
        blocks.append({**blk, "self_attn": {**sa, "wqkv": wqkv}})
    return {**dec, "blocks": blocks}


def _qkv_proj(p: dict, x: Array) -> Tuple[Array, Array, Array]:
    """Self-attention q/k/v projections — fused when ``wqkv`` is present
    (merge_self_attn_qkv), three dots otherwise."""
    if "wqkv" in p:
        qkv = apply_linear(p["wqkv"], x)
        D = x.shape[-1]
        return qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
    return (apply_linear(p["wq"], x), apply_linear(p["wk"], x),
            apply_linear(p["wv"], x))


def init_decode_state(
    params: dict, config: Config, batch: int, dtype,
    max_positions: Optional[int] = None, cache_dtype=None,
    stacked: bool = False,
) -> Dict[str, Array]:
    """Empty self-attention KV caches, TIME-MAJOR: a TUPLE of PER-LAYER
    (T_max, batch, D) arrays under ``"k"`` / ``"v"`` by default, or — with
    ``stacked=True`` — one (n_blocks, T_max, batch, D) array each.

    Layout notes (round-4 chip A/Bs, benchmarks/transformer_results.json):

    * TIME-MAJOR (T, batch, D), not (batch, T, D): with row-major caches
      the beam step's attention dots want a T-major operand, so XLA
      materialized a head-split transpose copy of BOTH caches EVERY step
      (~400 µs/step at B·K=1280 — the single largest non-matmul cost).
      Time-major storage matches the layout the dot wants and the
      per-step row write at ``t`` becomes one contiguous (batch, D) block
      instead of a batch-strided scatter.
    * PER-LAYER vs STACKED is workload-dependent, so BOTH exist and each
      decode path gets the layout that measured faster (B=256, fp32,
      reference scale). BEAM wants per-layer leaves (+10.8% fp32 / +21%
      bf16): the stacked form made XLA materialize the ``k_all[layer]``
      slice as a separate full-cache copy every step for every layer
      before the head-split reshape fed the score dot; separate carry
      leaves keep the static-layer indexing in Python and the slice op
      never exists. GREEDY wants the stacked form (per-layer leaves
      measured −14% fp32 / −4% bf16 there: at K=1 XLA folds the layer
      slice into the attention fusion for free, and the single
      carried buffer schedules better than four).

    ``max_positions`` sizes the caches for a caller-requested decode length
    beyond the config default (positions past the learned-position table
    reuse its last row — dynamic_slice clamps the index — which degrades
    long tails; a warning is logged, the LSTM family stays exact there).

    ``cache_dtype`` (default: ``dtype``) stores the caches narrower than
    the activation dtype — bf16 caches halve the dominant per-step HBM
    read of the beam loop AND remove the fp32→bf16 conversion copies XLA
    otherwise materializes every step for the attention dots (profiled:
    the dots run on bf16 operand copies under DEFAULT precision either
    way, so storage precision beyond bf16 buys only rounding of the
    stored K/V, not of the matmul; see kernels.transformer_cache_bf16)."""
    n_blocks = len(params["blocks"])
    T = config.model.max_sequence_length + 1
    if max_positions is not None:
        T = max(T, max_positions)
    pos_rows = params["pos_embedding"].shape[0]
    if T > pos_rows:
        logging.getLogger(__name__).warning(
            "decoding %d positions but the learned position table has %d "
            "rows; positions >= %d reuse the last row (repetitive long "
            "tails likely — re-init with a larger max_sequence_length, or "
            "use the lstm family which decodes any length exactly)",
            T, pos_rows, pos_rows,
        )
    D = config.model.decoder_hidden_dim
    cdt = dtype if cache_dtype is None else cache_dtype
    if stacked:
        return {
            "k": jnp.zeros((n_blocks, T, batch, D), cdt),
            "v": jnp.zeros((n_blocks, T, batch, D), cdt),
        }
    return {
        "k": tuple(jnp.zeros((T, batch, D), cdt) for _ in range(n_blocks)),
        "v": tuple(jnp.zeros((T, batch, D), cdt) for _ in range(n_blocks)),
    }


def _cached_self_attn(
    p: dict, x: Array, k_lyr: Array, v_lyr: Array, t: Array,
    heads: int, attn_f32: bool = False,
) -> Tuple[Array, Array, Array]:
    """One-query self-attention over the cache prefix.

    x: (N, D) current position's (pre-LN'd) activation; k/v_lyr: THIS
    layer's (T_max, N, D) TIME-MAJOR cache (see init_decode_state) —
    updated in place at row ``t`` so XLA keeps the dynamic-update-slice in
    the donated while-loop carry (the earlier per-layer unstack +
    ``jnp.stack`` rebuilt both full cache tensors every step: ~2x the
    cache HBM traffic at B·K=1280), and the write is one contiguous
    (N, D) block. Attends over positions ≤ t. Returns
    (out (N, D), new_k_lyr, new_v_lyr).
    """
    T_max, N, D = k_lyr.shape
    dh = D // heads
    cdt = k_lyr.dtype
    q, k_t, v_t = _qkv_proj(p, x)                      # (N, D) each
    k_lyr = jax.lax.dynamic_update_slice(
        k_lyr, k_t.astype(cdt)[None, :, :], (t, 0, 0))
    v_lyr = jax.lax.dynamic_update_slice(
        v_lyr, v_t.astype(cdt)[None, :, :], (t, 0, 0))

    qh = q.reshape(N, heads, dh)
    kh = k_lyr.reshape(T_max, N, heads, dh)
    vh = v_lyr.reshape(T_max, N, heads, dh)
    # Query cast to the cache dtype (the MXU truncates operands to bf16
    # under DEFAULT precision anyway); f32 accumulation/output via
    # preferred_element_type keeps the softmax on unpacked f32 layouts
    # under bf16 state (see _cached_self_attn_beam). Bit-identical for f32.
    # attn_f32 (kernels.transformer_attn_dots_f32): true-f32 multi-pass
    # dots instead — no operand cast, no per-step f32→bf16 conversion
    # copies of the cache; the extra MXU passes are noise at this scale.
    prec = jax.lax.Precision.HIGHEST if attn_f32 else None
    qd = qh if attn_f32 else qh.astype(cdt)
    scores = jnp.einsum("nhd,tnhd->nht", qd, kh,
                        preferred_element_type=jnp.float32, precision=prec)
    scores = scores / math.sqrt(dh)
    valid = jnp.arange(T_max)[None, None, :] <= t
    scores = jnp.where(valid, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    wd = w if attn_f32 else w.astype(cdt)
    ctx = jnp.einsum("nht,tnhd->nhd", wd, vh,
                     preferred_element_type=x.dtype,
                     precision=prec).reshape(N, D)
    return apply_linear(p["wo"], ctx), k_lyr, v_lyr


def _cached_self_attn_stacked(
    p: dict, x: Array, k_all: Array, v_all: Array, layer: int, t: Array,
    heads: int, attn_f32: bool = False,
) -> Tuple[Array, Array, Array]:
    """STACKED-cache variant of :func:`_cached_self_attn`: k/v_all are the
    (n_blocks, T_max, N, D) TIME-MAJOR caches, updated in place at
    ``[layer, t]`` with a static layer index. This is the GREEDY (K=1)
    decode layout — see init_decode_state's layout notes for the measured
    per-layer-vs-stacked trade. Same math as the per-layer variant;
    token-identity across the two layouts is pinned by the greedy-vs-beam
    oracle gates in tests/test_transformer.py."""
    _, T_max, N, D = k_all.shape
    dh = D // heads
    cdt = k_all.dtype
    q, k_t, v_t = _qkv_proj(p, x)                      # (N, D) each
    k_all = jax.lax.dynamic_update_slice(
        k_all, k_t.astype(cdt)[None, None, :, :], (layer, t, 0, 0))
    v_all = jax.lax.dynamic_update_slice(
        v_all, v_t.astype(cdt)[None, None, :, :], (layer, t, 0, 0))

    qh = q.reshape(N, heads, dh)
    kh = k_all[layer].reshape(T_max, N, heads, dh)
    vh = v_all[layer].reshape(T_max, N, heads, dh)
    prec = jax.lax.Precision.HIGHEST if attn_f32 else None
    qd = qh if attn_f32 else qh.astype(cdt)
    scores = jnp.einsum("nhd,tnhd->nht", qd, kh,
                        preferred_element_type=jnp.float32, precision=prec)
    scores = scores / math.sqrt(dh)
    valid = jnp.arange(T_max)[None, None, :] <= t
    scores = jnp.where(valid, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    wd = w if attn_f32 else w.astype(cdt)
    ctx = jnp.einsum("nht,tnhd->nhd", wd, vh,
                     preferred_element_type=x.dtype,
                     precision=prec).reshape(N, D)
    return apply_linear(p["wo"], ctx), k_all, v_all


def _cached_self_attn_beam(
    p: dict,
    x: Array,            # (B·K, D) pre-LN'd activations, beam-major rows
    k_lyr: Array,        # (T_max, B·K, D) time-major PHYSICAL-slot cache
    v_lyr: Array,        #   for THIS layer (see init_decode_state)
    anc: Array,          # (B, K, T_max) int32 ancestry (col t = identity)
    t: Array,
    heads: int,
    num_beams: int,
    attn_f32: bool = False,
    select_gather: bool = False,
) -> Tuple[Array, Array, Array]:
    """Ancestry-indexed one-query self-attention for beam search.

    Physical cache rows are NEVER rebeamed: row (b, j) column τ holds the
    K/V written by whatever beam occupied slot j at step τ, and columns
    are write-once (τ strictly increases), so history is immutable.
    ``anc[b, k, τ]`` names the physical slot holding the CURRENT beam k's
    prefix entry at position τ. Scores are computed against all K physical
    rows — a K× expansion of the tiny (B, K, h, T) score tensor — and
    selected with the one-hot ancestry, exactly equal to attending over a
    physically-rebeamed cache (selection picks the same dot products;
    the extra terms are multiplied by 0.0). Net effect per step: both big
    cache tensors are read once and written one row, where physical
    rebeaming (families.py rebeam) read them twice and rewrote them fully
    — the dominant HBM cost of the transformer beam step at B=256
    (86 ms/batch before this path; docs/PERFORMANCE.md round 3).
    """
    T_max, N, D = k_lyr.shape
    K = num_beams
    B = N // K
    dh = D // heads
    cdt = k_lyr.dtype
    q, k_t, v_t = _qkv_proj(p, x)
    k_lyr = jax.lax.dynamic_update_slice(
        k_lyr, k_t.astype(cdt)[None, :, :], (t, 0, 0))
    v_lyr = jax.lax.dynamic_update_slice(
        v_lyr, v_t.astype(cdt)[None, :, :], (t, 0, 0))

    qh = q.reshape(B, K, heads, dh)
    kh = k_lyr.reshape(T_max, B, K, heads, dh)  # j = physical slot
    vh = v_lyr.reshape(T_max, B, K, heads, dh)
    # Query cast to the cache dtype (the MXU truncates operands to bf16
    # under DEFAULT precision anyway), f32 MXU accumulation via
    # preferred_element_type — NOT einsum().astype(f32), which under bf16
    # state hands the select/softmax chain packed-layout bf16 operands
    # (~4x-slower VPU path, round-3 profile). Bit-identical for f32.
    prec = jax.lax.Precision.HIGHEST if attn_f32 else None
    qd = qh if attn_f32 else qh.astype(cdt)
    scores_all = jnp.einsum("bkhd,tbjhd->bkhjt", qd, kh,
                            preferred_element_type=jnp.float32,
                            precision=prec)
    scores_all = scores_all / math.sqrt(dh)
    onehot = (
        anc[:, :, :, None]
        == jnp.arange(K, dtype=jnp.int32)[None, None, None, :]
    )  # (B, K, T, j)
    if select_gather:
        # kernels.transformer_select_gather: pick the ancestry slot with a
        # take_along_axis gather instead of the one-hot reduce einsum, and
        # re-expand the softmax weights with a broadcast multiply instead
        # of an expand einsum. Values are EXACTLY the ones the einsums
        # produce (a gather selects, a x*1/x*0 multiply masks — no
        # summation anywhere), so tokens/scores are bit-identical; only
        # the lowered op mix differs (the profiled (B,K,T,h)-shaped
        # select fusions are lane-padded 6x at reference scale).
        scores = jnp.take_along_axis(
            scores_all, anc[:, :, None, None, :], axis=3
        )[:, :, :, 0, :]  # (B, K, h, T)
    else:
        scores = jnp.einsum(
            "bkhjt,bktj->bkht", scores_all, onehot.astype(jnp.float32)
        )
    valid = jnp.arange(T_max)[None, None, None, :] <= t
    scores = jnp.where(valid, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)  # (B, K, h, T)
    if select_gather:
        w_phys = (
            w[:, :, :, :, None] * onehot[:, :, None, :, :].astype(w.dtype)
        )  # (B, K, h, T, j)
    else:
        w_phys = jnp.einsum(
            "bkht,bktj->bkhtj", w, onehot.astype(jnp.float32))
    wd = w_phys if attn_f32 else w_phys.astype(cdt)
    ctx = jnp.einsum(
        "bkhtj,tbjhd->bkhd", wd, vh,
        preferred_element_type=x.dtype, precision=prec,
    ).reshape(N, D)
    return apply_linear(p["wo"], ctx), k_lyr, v_lyr


def _cached_self_attn_beam_fused(
    p: dict,
    x: Array,
    k_lyr: Array,
    v_lyr: Array,
    anc: Array,
    t: Array,
    heads: int,
    num_beams: int,
    interpret: bool,
) -> Tuple[Array, Array, Array]:
    """Kernel-fused variant of :func:`_cached_self_attn_beam`
    (ops/transformer_attn_pallas.py): same q/k/v projections and one-row
    cache writes, then ancestry selection + fp32 softmax + context in ONE
    Pallas pass over the cache rows — no (B, K, h, j, T) score expansion
    and no packed-layout softmax under bf16 caches. Flag:
    ``kernels.transformer_fused_beam_attn``."""
    from ..ops.transformer_attn_pallas import beam_self_attention

    cdt = k_lyr.dtype
    q, k_t, v_t = _qkv_proj(p, x)
    k_lyr = jax.lax.dynamic_update_slice(
        k_lyr, k_t.astype(cdt)[None, :, :], (t, 0, 0))
    v_lyr = jax.lax.dynamic_update_slice(
        v_lyr, v_t.astype(cdt)[None, :, :], (t, 0, 0))
    ctx = beam_self_attention(
        q, k_lyr, v_lyr, anc, t, heads, num_beams,
        interpret=interpret,
    )
    return apply_linear(p["wo"], ctx), k_lyr, v_lyr


def _cross_attn_step_fused(
    p: dict,
    x: Array,
    ck: Array,
    cv: Array,
    encoder_mask: Optional[Array],
    heads: int,
    num_beams: int,
    interpret: bool,
) -> Tuple[Array, Array]:
    """Kernel-fused variant of :func:`_cross_attn_step`: one Pallas pass
    with fp32-in-VMEM softmax (bf16 K/V storage halves the dominant
    per-step HBM read without XLA's packed-layout softmax cliff)."""
    from ..ops.transformer_attn_pallas import beam_cross_attention

    q = apply_linear(p["wq"], x)
    ctx, w = beam_cross_attention(
        q, ck, cv, encoder_mask, heads, num_beams, interpret=interpret,
    )
    return apply_linear(p["wo"], ctx), w


def _cross_attn_step(
    p: dict,
    x: Array,              # (N, D) pre-LN'd query activations
    ck: Array,             # (B, S, D) precomputed keys (un-expanded)
    cv: Array,             # (B, S, D) precomputed values
    encoder_mask: Optional[Array],  # (B, S)
    heads: int,
    attn_f32: bool = False,
) -> Tuple[Array, Array]:
    """One-query cross-attention; N = B·K beams broadcast over the
    un-expanded (B, S, ·) encoder tensors. Returns (out (N, D),
    head-avg weights (N, S))."""
    B, S, D = ck.shape
    K = x.shape[0] // B
    dh = D // heads
    q = apply_linear(p["wq"], x).reshape(B, K, heads, dh)
    kh = ck.reshape(B, S, heads, dh)
    vh = cv.reshape(B, S, heads, dh)
    # The query is cast DOWN to the K/V storage dtype (under the fp32-state
    # beam hybrid the cross-KV stays bf16 — casting it UP would materialize
    # a full f32 copy of both (B, S, D) tensors every step, the exact
    # conversion-fusion churn the round-4 bf16 profile showed); the MXU
    # truncates operands to bf16 under DEFAULT precision anyway.
    # preferred_element_type=f32 (rather than einsum().astype(f32)): under
    # bf16 activations a bf16-OUTPUT einsum hands the downstream softmax a
    # packed-layout operand — XLA's packed bf16 softmax fusions measured
    # ~4x slower (round 3); an f32-accumulating MXU output keeps the
    # softmax on clean f32 layouts and is bit-identical for f32 inputs
    # (DEFAULT precision already accumulates f32).
    # attn_f32 (kernels.transformer_attn_dots_f32): true-f32 multi-pass
    # dots — skips the operand down-cast AND the per-step f32→bf16
    # conversion copies of the cross-KV the profile showed.
    prec = jax.lax.Precision.HIGHEST if attn_f32 else None
    qd = q if attn_f32 else q.astype(kh.dtype)
    scores = jnp.einsum("bkhd,bshd->bkhs", qd, kh,
                        preferred_element_type=jnp.float32, precision=prec)
    scores = scores / math.sqrt(dh)
    if encoder_mask is not None:
        scores = jnp.where(
            encoder_mask[:, None, None, :] > 0, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)  # (B, K, h, S)
    wd = w if attn_f32 else w.astype(vh.dtype)
    ctx = jnp.einsum("bkhs,bshd->bkhd", wd, vh,
                     preferred_element_type=x.dtype, precision=prec)
    out = apply_linear(p["wo"], ctx.reshape(B * K, D))
    return out, jnp.mean(w, axis=2).reshape(B * K, S).astype(x.dtype)


def _cross_attn_step_operand(
    p: dict,
    x: Array,              # (N, D) pre-LN'd query activations
    ck: Array,             # (B, h, dh, S) bf16 operand-layout keys
    cv: Array,             # (B, h, dh, S) bf16 operand-layout values
    encoder_mask: Optional[Array],  # (B, S)
    heads: int,
) -> Tuple[Array, Array]:
    """Operand-layout variant of :func:`_cross_attn_step`: K/V arrive
    pre-staged as (B, h, dh, S) bfloat16 (S-minor — see
    precompute_cross_kv), so the score and context dots consume them
    directly instead of XLA re-materializing f32→bf16 relayout copies of
    both tensors every decode step. Same math: query cast down, f32 MXU
    accumulation via preferred_element_type."""
    B, h, dh, S = ck.shape
    K = x.shape[0] // B
    D = h * dh
    q = apply_linear(p["wq"], x).reshape(B, K, h, dh)
    scores = jnp.einsum("bkhd,bhds->bkhs", q.astype(ck.dtype), ck,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(dh)
    if encoder_mask is not None:
        scores = jnp.where(
            encoder_mask[:, None, None, :] > 0, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)  # (B, K, h, S)
    ctx = jnp.einsum("bkhs,bhds->bkhd", w.astype(cv.dtype), cv,
                     preferred_element_type=x.dtype)
    out = apply_linear(p["wo"], ctx.reshape(B * K, D))
    return out, jnp.mean(w, axis=2).reshape(B * K, S).astype(x.dtype)


def _cross_attn_step_cp(
    p: dict,
    x: Array,              # (N, D) pre-LN'd query activations, replicated
    ck: Array,             # (B, S, D) keys, frame axis sharded over `axis`
    cv: Array,             # (B, S, D) values, sharded like ck
    encoder_mask: Optional[Array],  # (B, S), sharded like ck
    heads: int,
    axis: str,
) -> Tuple[Array, Array]:
    """Context-parallel one-query cross-attention: the frame axis S is
    sharded over mesh axis ``axis``; softmax statistics combine across
    shards with pmax/psum (the same online-softmax decomposition as
    parallel/context_parallel.attend_cp). Numerically equivalent to
    :func:`_cross_attn_step`; communication per step is O(B·K·h) scalars
    plus the (N, D) context psum. Uses the ambient mesh
    (``jax.sharding.set_mesh``), matching the LSTM family's CP routing."""
    from jax.sharding import PartitionSpec as P

    B, S, D = ck.shape
    K = x.shape[0] // B
    dh = D // heads

    def local(ck_l, cv_l, x, mask_l):
        q = apply_linear(p["wq"], x).reshape(B, K, heads, dh)
        kh = ck_l.reshape(B, -1, heads, dh)
        vh = cv_l.reshape(B, -1, heads, dh)
        # Same dtype discipline as _cross_attn_step: query cast down to
        # the K/V storage dtype, f32 scores via preferred_element_type.
        scores = jnp.einsum("bkhd,bshd->bkhs", q.astype(kh.dtype), kh,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(dh)
        scores = jnp.where(mask_l[:, None, None, :] > 0, scores, NEG_INF)
        m_local = jnp.max(scores, axis=-1)
        m_global = jax.lax.pmax(m_local, axis)
        exp = jnp.exp(scores - m_global[..., None])
        denom = jax.lax.psum(jnp.sum(exp, axis=-1), axis)
        w = exp / denom[..., None]  # (B, K, h, S_l)
        ctx = jnp.einsum("bkhs,bshd->bkhd", w.astype(vh.dtype), vh)
        ctx = jax.lax.psum(ctx.reshape(B * K, D), axis)
        return ctx, jnp.mean(w, axis=2).reshape(B * K, -1).astype(x.dtype)

    if encoder_mask is None:
        encoder_mask = jnp.ones((B, S), x.dtype)
    sharded = jax.shard_map(
        local,
        in_specs=(P(None, axis, None), P(None, axis, None), P(), P(None, axis)),
        out_specs=(P(), P(None, axis)),
    )
    ctx, w = sharded(ck, cv, x, encoder_mask)
    return apply_linear(p["wo"], ctx), w


def decode_step_core(
    params: dict,
    config: Config,
    token_ids: Array,               # (N,) int32; N = B or B·K
    state: Dict[str, Array],        # self-attn KV caches: stacked
                                    #   (n_blocks, T, N, D) arrays OR
                                    #   per-layer (T, N, D) tuple leaves
                                    #   (see init_decode_state)
    t: Array,                       # scalar int32 position
    cross_kv: Dict[str, Array],     # stacked (n_blocks, B, S, D) each, OR
                                    #   per-layer (B, h, dh, S) tuples
                                    #   (precompute_cross_kv operand form)
    encoder_mask: Optional[Array],  # (B, S)
    activation_dtype=None,          # residual-stream dtype override
) -> Tuple[Array, Dict[str, Array], Array]:
    """One incremental decode step up to the pre-vocab hidden state.

    Returns (pre_vocab (N, D), new_state, cross-attention weights (N, S)
    from the last block). Apply ``output_projection`` for logits, or feed
    the fused vocab-top-k kernel (ops/vocab_topk_pallas.py) — the same
    split the LSTM family exposes via decoder_step_beam_core.

    Per-step math is identical to column ``t`` of
    ``apply_transformer_decoder`` in eval mode (gated in
    tests/test_transformer.py::test_incremental_decode_matches_parallel).
    """
    m = config.model
    heads = m.transformer_num_heads
    cp_axis = config.parallel.context_axis
    # Activation dtype: explicit override from the family adapter (the
    # fp32-state beam hybrid keeps the residual stream f32 while the
    # cross-KV stays bf16), else follows the cross-attention K/V. NOT the
    # cache dtype: with transformer_cache_bf16 the caches are stored
    # narrower than the residual stream.
    ck0 = (cross_kv["k"][0] if isinstance(cross_kv["k"], (tuple, list))
           else cross_kv["k"])
    dtype = activation_dtype or ck0.dtype

    emb = jnp.take(params["embedding"]["table"], token_ids, axis=0)
    pos = jax.lax.dynamic_slice_in_dim(params["pos_embedding"], t, 1, axis=0)
    x = emb.astype(dtype) + pos.astype(dtype)  # (N, D)

    attn_f32 = config.kernels.transformer_attn_dots_f32
    # Cache layout dispatch — per-layer tuple leaves vs one stacked array;
    # each decode path initializes the layout that measured faster on chip
    # (see init_decode_state). Structure is static under jit.
    stacked = not isinstance(state["k"], (tuple, list))
    if stacked:
        k_all, v_all = state["k"], state["v"]
        ks, vs = [], []
    else:
        ks, vs = list(state["k"]), list(state["v"])
    cross_w = None
    for i, blk in enumerate(params["blocks"]):
        if stacked:
            h, k_all, v_all = _cached_self_attn_stacked(
                blk["self_attn"], _apply_layer_norm(blk["ln1"], x),
                k_all, v_all, i, t, heads, attn_f32,
            )
        else:
            h, ks[i], vs[i] = _cached_self_attn(
                blk["self_attn"], _apply_layer_norm(blk["ln1"], x),
                ks[i], vs[i], t, heads, attn_f32,
            )
        x = x + h
        if cp_axis is not None:
            h, cross_w = _cross_attn_step_cp(
                blk["cross_attn"], _apply_layer_norm(blk["ln2"], x),
                cross_kv["k"][i], cross_kv["v"][i], encoder_mask, heads,
                cp_axis,
            )
        elif cross_kv["k"][i].ndim == 4:
            # (B, h, dh, S) operand-layout cross-KV (precompute_cross_kv
            # with operand_layout=True).
            h, cross_w = _cross_attn_step_operand(
                blk["cross_attn"], _apply_layer_norm(blk["ln2"], x),
                cross_kv["k"][i], cross_kv["v"][i], encoder_mask, heads,
            )
        else:
            h, cross_w = _cross_attn_step(
                blk["cross_attn"], _apply_layer_norm(blk["ln2"], x),
                cross_kv["k"][i], cross_kv["v"][i], encoder_mask, heads,
                attn_f32,
            )
        x = x + h
        x = x + _mlp(blk["mlp"], _apply_layer_norm(blk["ln3"], x))

    x = _apply_layer_norm(params["ln_f"], x)
    if stacked:
        new_state = dict(state, k=k_all, v=v_all)
    else:
        new_state = dict(state, k=tuple(ks), v=tuple(vs))
    return x, new_state, cross_w


def decode_step(
    params: dict,
    config: Config,
    token_ids: Array,
    state: Dict[str, Array],
    t: Array,
    cross_kv: Dict[str, Array],
    encoder_mask: Optional[Array],
    activation_dtype=None,
) -> Tuple[Array, Dict[str, Array], Array]:
    """One incremental decode step → (logits (N, V), new_state,
    cross-attention weights (N, S)). See decode_step_core."""
    x, new_state, cross_w = decode_step_core(
        params, config, token_ids, state, t, cross_kv, encoder_mask,
        activation_dtype,
    )
    logits = apply_linear(params["output_projection"], x)  # (N, V)
    return logits, new_state, cross_w


def init_beam_ancestry(batch: int, num_beams: int, max_positions: int) -> Array:
    """Initial (B, K, T) ancestry for the lazy-rebeam beam state. Values
    for columns > 0 are placeholders — ``decode_step_beam_core`` overwrites
    column t with the identity before each step's attention, and the
    rebeam compose in families.py only propagates columns ≤ t."""
    return jnp.zeros((batch, num_beams, max_positions), jnp.int32)


def decode_step_beam_core(
    params: dict,
    config: Config,
    token_ids: Array,               # (B·K,) int32, beam-major rows
    state: Dict[str, Array],        # {"k", "v", "anc"}: per-layer
                                    #   (T, B·K, D) tuple leaves + the
                                    #   (B, K, T) ancestry carry
    t: Array,                       # scalar int32 position
    cross_kv: Dict[str, Array],     # stacked (n_blocks, B, S, D) each, OR
                                    #   per-layer (B, h, dh, S) tuples
                                    #   (precompute_cross_kv operand form)
    encoder_mask: Optional[Array],  # (B, S)
    activation_dtype=None,          # residual-stream dtype override
) -> Tuple[Array, Dict[str, Array], Array]:
    """Beam decode step with LAZY cache rebeaming (see
    ``_cached_self_attn_beam``): the carried caches stay physical-slot
    indexed; ``state["anc"]`` is the only tensor families.py rebeams.
    Per-step math is identical to :func:`decode_step_core` over a
    physically-rebeamed cache (gated in tests/test_transformer.py).
    """
    m = config.model
    heads = m.transformer_num_heads
    cp_axis = config.parallel.context_axis
    # Activation dtype; see decode_step_core.
    ck0 = (cross_kv["k"][0] if isinstance(cross_kv["k"], (tuple, list))
           else cross_kv["k"])
    dtype = activation_dtype or ck0.dtype
    B, K, _ = state["anc"].shape
    # Fused Pallas beam attention (ops/transformer_attn_pallas.py): one
    # pass per attention with fp32-in-VMEM softmax. CP keeps the shard_map
    # path (its collectives live outside kernel boundaries).
    fused = config.kernels.transformer_fused_beam_attn and cp_axis is None
    # Cross-only fused arm: the Pallas cross-attention kernel with the XLA
    # ancestry-select self-attention (see the config flag note).
    fused_cross = fused or (
        config.kernels.transformer_fused_cross_attn and cp_axis is None
    )
    interpret = config.kernels.interpret
    attn_f32 = config.kernels.transformer_attn_dots_f32

    emb = jnp.take(params["embedding"]["table"], token_ids, axis=0)
    pos = jax.lax.dynamic_slice_in_dim(params["pos_embedding"], t, 1, axis=0)
    x = emb.astype(dtype) + pos.astype(dtype)  # (B·K, D)

    # The K/V rows written this step land in the writer's own slot.
    anc = jax.lax.dynamic_update_slice_in_dim(
        state["anc"],
        jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, 1)
        ),
        t, axis=2,
    )

    ks, vs, cross_w = list(state["k"]), list(state["v"]), None
    for i, blk in enumerate(params["blocks"]):
        if fused:
            h, ks[i], vs[i] = _cached_self_attn_beam_fused(
                blk["self_attn"], _apply_layer_norm(blk["ln1"], x),
                ks[i], vs[i], anc, t, heads, K, interpret,
            )
        else:
            h, ks[i], vs[i] = _cached_self_attn_beam(
                blk["self_attn"], _apply_layer_norm(blk["ln1"], x),
                ks[i], vs[i], anc, t, heads, K, attn_f32,
                config.kernels.transformer_select_gather,
            )
        x = x + h
        if cp_axis is not None:
            h, cross_w = _cross_attn_step_cp(
                blk["cross_attn"], _apply_layer_norm(blk["ln2"], x),
                cross_kv["k"][i], cross_kv["v"][i], encoder_mask, heads,
                cp_axis,
            )
        elif cross_kv["k"][i].ndim == 4:
            # (B, h, dh, S) operand-layout cross-KV (precompute_cross_kv
            # with operand_layout=True; families.py gates it to the
            # non-fused beam path).
            h, cross_w = _cross_attn_step_operand(
                blk["cross_attn"], _apply_layer_norm(blk["ln2"], x),
                cross_kv["k"][i], cross_kv["v"][i], encoder_mask, heads,
            )
        elif fused_cross:
            h, cross_w = _cross_attn_step_fused(
                blk["cross_attn"], _apply_layer_norm(blk["ln2"], x),
                cross_kv["k"][i], cross_kv["v"][i], encoder_mask, heads, K,
                interpret,
            )
        else:
            h, cross_w = _cross_attn_step(
                blk["cross_attn"], _apply_layer_norm(blk["ln2"], x),
                cross_kv["k"][i], cross_kv["v"][i], encoder_mask, heads,
                attn_f32,
            )
        x = x + h
        x = x + _mlp(blk["mlp"], _apply_layer_norm(blk["ln3"], x))

    x = _apply_layer_norm(params["ln_f"], x)
    return x, {"k": tuple(ks), "v": tuple(vs), "anc": anc}, cross_w


def decode_step_beam(
    params: dict,
    config: Config,
    token_ids: Array,
    state: Dict[str, Array],
    t: Array,
    cross_kv: Dict[str, Array],
    encoder_mask: Optional[Array],
    activation_dtype=None,
) -> Tuple[Array, Dict[str, Array], Array]:
    """Lazy-rebeam beam step → (logits (B·K, V), new_state, cross-attn
    weights (B·K, S)). See decode_step_beam_core."""
    x, new_state, cross_w = decode_step_beam_core(
        params, config, token_ids, state, t, cross_kv, encoder_mask,
        activation_dtype,
    )
    logits = apply_linear(params["output_projection"], x)
    return logits, new_state, cross_w
