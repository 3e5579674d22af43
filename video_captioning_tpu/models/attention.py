"""Attention mechanisms: Bahdanau, Luong (dot/general/concat), multi-head.

Capability parity with reference src/models/attention.py:9-296, with two
deliberate TPU-first design changes:

1. **Precompute/attend split.** Projections of the encoder outputs (Bahdanau's
   ``W_e·enc``, Luong-concat's context projection, MHA's K/V) are invariant
   across decode steps. The reference recomputes them at every timestep
   (attention.py:52, :142, :241-242); here :func:`precompute` runs once per
   sequence and every step inside ``lax.scan`` / ``lax.while_loop`` reuses the
   cache — removing ~T redundant (B·S·E×A) matmuls per caption.
2. **Config dispatch.** The attention type comes from
   ``config.model.attention_type`` instead of the reference's hardcoded
   "bahdanau" (decoder.py:38), making Luong/MHA reachable (BASELINE configs
   #3/#4 require them).

Masking uses the reference's additive −1e9 convention (attention.py:61,
:175, :255) so masked scores survive softmax identically.

All shapes: encoder outputs ``(B, S, E)``, decoder hidden ``(B, D)``, mask
``(B, S)`` with 1 = valid. Returns ``(context (B, E), weights (B, S))``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from .layers import apply_linear, dropout, init_linear

Array = jax.Array

_MASK_FILL = -1e9
_ATTN_DROPOUT = 0.1  # reference attention.py:30,101,218


# ==========================================================================
# Init
# ==========================================================================


def init_attention(key: Array, config: Config) -> dict:
    kind = config.model.attention_type
    E = config.model.encoder_hidden_dim
    D = config.model.decoder_hidden_dim
    A = config.model.attention_dim

    if kind == "bahdanau":
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "encoder_projection": init_linear(k1, E, A),
            "decoder_projection": init_linear(k2, D, A),
            "attention_linear": init_linear(k3, A, 1),
        }

    if kind == "luong":
        score = config.model.luong_score
        params: dict = {}
        if score == "general":
            params["linear_in"] = init_linear(key, D, E, use_bias=False)
        elif score == "concat":
            k1, k2, k3 = jax.random.split(key, 3)
            params["linear_query"] = init_linear(k1, D, A)
            params["linear_context"] = init_linear(k2, E, A)
            params["linear_v"] = init_linear(k3, A, 1, use_bias=False)
        elif score == "dot":
            if D != E:
                raise ValueError("dot attention requires decoder_dim == encoder_dim")
        return params

    if kind == "multihead":
        H = config.model.attention_num_heads
        if E % H != 0:
            raise ValueError("encoder_dim must be divisible by num_heads")
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "query_linear": init_linear(k1, D, E),
            "key_linear": init_linear(k2, E, E),
            "value_linear": init_linear(k3, E, E),
            "output_linear": init_linear(k4, E, E),
        }

    raise ValueError(f"Unsupported attention type: {kind}")


# ==========================================================================
# Precompute (step-invariant encoder-side projections)
# ==========================================================================


def precompute(config: Config, params: dict, encoder_outputs: Array) -> Dict[str, Array]:
    """Cache per-sequence projections reused by every decode step."""
    kind = config.model.attention_type
    if kind == "bahdanau":
        return {"enc_proj": apply_linear(params["encoder_projection"], encoder_outputs)}
    if kind == "luong":
        if config.model.luong_score == "concat":
            return {"enc_proj": apply_linear(params["linear_context"], encoder_outputs)}
        return {}
    if kind == "multihead":
        B, S, E = encoder_outputs.shape
        H = config.model.attention_num_heads
        hd = E // H
        k = apply_linear(params["key_linear"], encoder_outputs).reshape(B, S, H, hd)
        v = apply_linear(params["value_linear"], encoder_outputs).reshape(B, S, H, hd)
        return {"k": k, "v": v}
    raise ValueError(kind)


# ==========================================================================
# Attend (one decode step)
# ==========================================================================


def attend(
    config: Config,
    params: dict,
    cache: Dict[str, Array],
    encoder_outputs: Array,
    decoder_hidden: Array,
    encoder_mask: Optional[Array],
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Tuple[Array, Array]:
    kind = config.model.attention_type
    cp_axis = config.parallel.context_axis
    if cp_axis is not None and not train:
        # Context parallelism: frame axis sharded over the mesh, softmax
        # combined across shards (parallel/context_parallel.py). Eval-only:
        # attention dropout under CP would need per-shard rng streams.
        from ..parallel.context_parallel import attend_cp

        return attend_cp(
            config, params, cache, encoder_outputs, decoder_hidden,
            encoder_mask, axis=cp_axis,
        )
    if kind == "bahdanau":
        if config.kernels.use_pallas_attention and not train:
            from ..ops.attention_pallas import bahdanau_attend_pallas

            return bahdanau_attend_pallas(
                decoder_hidden,
                params["decoder_projection"]["kernel"],
                params["decoder_projection"]["bias"],
                cache["enc_proj"],
                encoder_outputs,
                params["attention_linear"]["kernel"][:, 0],
                params["attention_linear"]["bias"],
                encoder_mask,
                interpret=config.kernels.interpret,
            )
        scores = _bahdanau_scores(
            params, cache, decoder_hidden,
            score_bf16=config.kernels.attention_score_bf16,
        )
    elif kind == "luong":
        scores = _luong_scores(config, params, cache, encoder_outputs, decoder_hidden)
    else:
        return _multihead_attend(
            params, cache, decoder_hidden, encoder_mask, train=train, rng=rng
        )

    if encoder_mask is not None:
        scores = jnp.where(encoder_mask > 0, scores, _MASK_FILL)
    weights = jax.nn.softmax(scores, axis=-1)  # (B, S)
    weights = dropout(weights, _ATTN_DROPOUT, rng, train)
    context = jnp.einsum("bs,bse->be", weights, encoder_outputs)
    return context, weights


def _bahdanau_scores(
    params: dict, cache: Dict[str, Array], dec_hidden: Array,
    score_bf16: bool = False,
) -> Array:
    dec_proj = apply_linear(params["decoder_projection"], dec_hidden)  # (B, A)
    enc_proj = cache["enc_proj"]
    out_dtype = enc_proj.dtype
    if not score_bf16:
        combined = jnp.tanh(enc_proj + dec_proj[:, None, :])  # (B, S, A)
        return apply_linear(params["attention_linear"], combined)[..., 0]
    # VPU runs bf16 elementwise at 2x fp32 rate; the tanh operand is the
    # profiled decode hot spot (PERFORMANCE.md). Accumulate the score
    # reduction in fp32, return in the model's compute dtype.
    combined = jnp.tanh(
        enc_proj.astype(jnp.bfloat16) + dec_proj.astype(jnp.bfloat16)[:, None, :]
    )
    scores = jax.lax.dot_general(
        combined, params["attention_linear"]["kernel"].astype(jnp.bfloat16),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]
    return (scores + params["attention_linear"]["bias"]).astype(out_dtype)


def _luong_scores(
    config: Config, params: dict, cache: Dict[str, Array], enc_outs: Array, dec_hidden: Array
) -> Array:
    score = config.model.luong_score
    if score == "dot":
        return jnp.einsum("bd,bsd->bs", dec_hidden, enc_outs)
    if score == "general":
        proj = apply_linear(params["linear_in"], dec_hidden)  # (B, E)
        return jnp.einsum("be,bse->bs", proj, enc_outs)
    # concat
    dec_proj = apply_linear(params["linear_query"], dec_hidden)  # (B, A)
    combined = jnp.tanh(dec_proj[:, None, :] + cache["enc_proj"])  # (B, S, A)
    return apply_linear(params["linear_v"], combined)[..., 0]


def _multihead_attend(
    params: dict,
    cache: Dict[str, Array],
    dec_hidden: Array,
    encoder_mask: Optional[Array],
    *,
    train: bool,
    rng: Optional[Array],
) -> Tuple[Array, Array]:
    k, v = cache["k"], cache["v"]  # (B, S, H, hd)
    B, S, H, hd = k.shape
    out_dtype = dec_hidden.dtype
    q = apply_linear(params["query_linear"], dec_hidden).reshape(B, H, hd)
    # Scores/softmax in fp32 regardless of compute dtype (the f32 scalar
    # divisor promotes bf16 inputs — keep that deliberate), context cast
    # BACK to the hidden dtype: without the cast a bf16 decode/teacher-
    # forcing carry comes back f32 and every scan/while loop fails its
    # carry-dtype check (caught by benchmarks/quality_rank.py round 5 —
    # multihead was the only attention type missing the out-cast).
    # fp32 inputs are bitwise unchanged (astype is a no-op).
    scores = jnp.einsum("bhd,bshd->bhs", q, k) / jnp.sqrt(jnp.float32(hd))
    if encoder_mask is not None:
        scores = jnp.where(encoder_mask[:, None, :] > 0, scores, _MASK_FILL)
    weights = jax.nn.softmax(scores, axis=-1)  # (B, H, S)
    weights = dropout(weights, _ATTN_DROPOUT, rng, train)
    context = jnp.einsum(
        "bhs,bshd->bhd", weights.astype(v.dtype), v).reshape(B, H * hd)
    context = apply_linear(params["output_linear"], context)
    avg_weights = weights.mean(axis=1)  # (B, S) — head-avg for viz (ref :273)
    return context.astype(out_dtype), avg_weights.astype(out_dtype)


def attention_once(
    config: Config,
    params: dict,
    encoder_outputs: Array,
    decoder_hidden: Array,
    encoder_mask: Optional[Array] = None,
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Single-shot convenience wrapper (precompute + attend)."""
    cache = precompute(config, params, encoder_outputs)
    return attend(
        config, params, cache, encoder_outputs, decoder_hidden, encoder_mask,
        train=train, rng=rng,
    )


def create_attention_mechanism(config: Config, attention_type: str = None):
    """Factory returning (init_fn, attend_fn) for an attention type
    (API familiar from reference attention.py:278-296). Prefer setting
    ``config.model.attention_type`` and using init_attention/attend
    directly; this exists for reference-shaped code."""
    import copy

    cfg = copy.deepcopy(config)
    if attention_type is not None:
        cfg.model.attention_type = attention_type
        cfg.validate()

    def init_fn(key):
        return init_attention(key, cfg)

    def attend_fn(params, encoder_outputs, decoder_hidden, encoder_mask=None,
                  *, train=False, rng=None):
        return attention_once(
            cfg, params, encoder_outputs, decoder_hidden, encoder_mask,
            train=train, rng=rng,
        )

    return init_fn, attend_fn


# ==========================================================================
# Beam-aware attend: queries (B, K, D) against UN-expanded caches (B, S, ·)
# ==========================================================================
#
# Beam search holds K hypotheses per video, but the encoder-side tensors
# (enc_outs, enc_proj, K/V) are identical across the K beams. Expanding
# them to (B·K, S, ·) — as a literal port of the reference's
# video_captioning_model.py:179-189 would — multiplies the decode loop's
# HBM reads by K. These variants read each cache once per step and
# broadcast across the beam axis in-register.


def attend_beam(
    config: Config,
    params: dict,
    cache: Dict[str, Array],
    encoder_outputs: Array,  # (B, S, E) — NOT beam-expanded
    decoder_hidden: Array,   # (B, K, D)
    encoder_mask: Optional[Array],  # (B, S)
) -> Tuple[Array, Array]:
    """Returns (context (B, K, E), weights (B, K, S)). Eval-only (no
    dropout) — generation never trains."""
    kind = config.model.attention_type
    cp_axis = config.parallel.context_axis
    if cp_axis is not None:
        from ..parallel.context_parallel import attend_cp

        return attend_cp(
            config, params, cache, encoder_outputs, decoder_hidden,
            encoder_mask, axis=cp_axis,
        )
    if kind == "bahdanau":
        dec_proj = apply_linear(params["decoder_projection"], decoder_hidden)
        enc_proj = cache["enc_proj"]

        def _bah_scores(ep, dp):
            if not config.kernels.attention_score_bf16:
                combined = jnp.tanh(
                    ep[:, None, :, :] + dp[:, :, None, :]
                )  # (b, K, S, A)
                return apply_linear(
                    params["attention_linear"], combined)[..., 0]
            combined = jnp.tanh(
                ep.astype(jnp.bfloat16)[:, None, :, :]
                + dp.astype(jnp.bfloat16)[:, :, None, :]
            )
            return (
                jax.lax.dot_general(
                    combined,
                    params["attention_linear"]["kernel"].astype(jnp.bfloat16),
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[..., 0]
                + params["attention_linear"]["bias"]
            ).astype(ep.dtype)

        B_rows = enc_proj.shape[0]
        chunk = config.kernels.attention_score_chunk
        if chunk and B_rows > chunk:
            # Batch-chunked score fusion (kernels.attention_score_chunk):
            # the round-5 profile showed the (B, K, S, A) tanh+reduce
            # fusion running at HALF its elementwise rate once the tensor
            # crosses ~26M elements (158 µs/step at B=256 vs 2x42
            # expected — a VMEM tiling cliff; the sharp B=128 serving
            # optimum in beam_batch_scaling.json is its flip side).
            # Chunking the batch axis keeps each fusion below the cliff;
            # values are bit-identical (elementwise ops and the same
            # per-row contraction, concatenated).
            scores = jnp.concatenate(
                [
                    _bah_scores(enc_proj[i:i + chunk],
                                dec_proj[i:i + chunk])
                    for i in range(0, B_rows, chunk)
                ],
                axis=0,
            )
        else:
            scores = _bah_scores(enc_proj, dec_proj)
    elif kind == "luong":
        score = config.model.luong_score
        if score == "dot":
            scores = jnp.einsum("bkd,bsd->bks", decoder_hidden, encoder_outputs)
        elif score == "general":
            proj = apply_linear(params["linear_in"], decoder_hidden)
            scores = jnp.einsum("bke,bse->bks", proj, encoder_outputs)
        else:  # concat
            dec_proj = apply_linear(params["linear_query"], decoder_hidden)
            combined = jnp.tanh(
                dec_proj[:, :, None, :] + cache["enc_proj"][:, None, :, :]
            )
            scores = apply_linear(params["linear_v"], combined)[..., 0]
    elif kind == "multihead":
        k, v = cache["k"], cache["v"]  # (B, S, H, hd)
        B, S, H, hd = k.shape
        K = decoder_hidden.shape[1]
        q = apply_linear(params["query_linear"], decoder_hidden).reshape(B, K, H, hd)
        # fp32 scores/softmax, context cast back to the hidden dtype —
        # same carry-dtype fix as _multihead_attend (the f32 scalar
        # divisor promotes bf16 inputs; fp32 is bitwise unchanged).
        s = jnp.einsum("bkhd,bshd->bkhs", q, k) / jnp.sqrt(jnp.float32(hd))
        if encoder_mask is not None:
            s = jnp.where(encoder_mask[:, None, None, :] > 0, s, _MASK_FILL)
        w = jax.nn.softmax(s, axis=-1)  # (B, K, H, S)
        ctx = jnp.einsum(
            "bkhs,bshd->bkhd", w.astype(v.dtype), v).reshape(B, K, H * hd)
        ctx = apply_linear(params["output_linear"], ctx)
        out_dtype = decoder_hidden.dtype
        return ctx.astype(out_dtype), w.mean(axis=2).astype(out_dtype)
    else:
        raise ValueError(kind)

    if encoder_mask is not None:
        scores = jnp.where(encoder_mask[:, None, :] > 0, scores, _MASK_FILL)
    weights = jax.nn.softmax(scores, axis=-1)  # (B, K, S)
    context = jnp.einsum("bks,bse->bke", weights, encoder_outputs)
    return context, weights
