"""Fully on-device batched beam search.

Reference semantics (src/models/video_captioning_model.py:148-302): expand K
beams per video, per step take the top-K of the live beams' ``score +
log_softmax`` expansions, move END-emitting candidates to a completed pool
with length penalty ``score / (len-1)^alpha``, stop when no live beams
remain or max_length is reached, and return the best completed sequence
(or the best live beam if nothing completed).

The reference runs this as Python loops over (batch, beam) with a host
sync per step (topk indices → Python ints → tensor rebuilds,
video_captioning_model.py:219-267). Here the whole search is one
``jax.lax.while_loop`` over fixed-shape state:

* ``sequences`` (B, K, L+1), ``scores`` (B, K) with dead slots at −inf,
* hidden state (layers, B·K, H) rebeamed with ``take_along_axis`` gathers,
* a top-K *completed* register merged via ``lax.top_k`` each step — which
  also yields the top-K hypotheses that ``generate_multiple_captions``
  needs (the reference could only return one, predictor.py:345-358).

Two reference defects are fixed (documented divergence):

* best-sequence selection respects ``batch_idx`` — the reference returns
  the *globally* best completed sequence for every batch item
  (video_captioning_model.py:276-284),
* live beams never desync from the expanded encoder tensors (the
  reference's live pool shrinks below B·K and misaligns,
  video_captioning_model.py:251-267).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from .families import make_decode_family

Array = jax.Array

NEG_INF = -1e9


def beam_search_generate(
    params: dict,
    config: Config,
    encoder_outputs: Array,
    encoder_final_state: Array,
    start_token_id: int,
    end_token_id: int,
    max_length: int = 20,
    encoder_mask: Optional[Array] = None,
    beam_size: int = 5,
    length_penalty: float = 1.0,
) -> Dict[str, Array]:
    """Batched beam search.

    Returns:
      ``generated_tokens``: (B, max_length+1) best sequence per video,
      beginning with START (reference sequence schema).
      ``all_tokens``: (B, K, max_length+1) top-K completed hypotheses
      (live-beam fallbacks where fewer than K completed).
      ``all_scores``: (B, K) their length-penalized scores (−1e9 padding).
    """
    dec = params["decoder"] if "decoder" in params else params
    B, S, E = encoder_outputs.shape
    K = beam_size
    out_proj = dec["output_projection"]
    vocab_quantized = "kernel_q" in out_proj  # models/quantize.py W8A8 form
    V = out_proj["kernel_q" if vocab_quantized else "kernel"].shape[1]
    L = max_length + 1  # +1 for the START slot

    # Encoder-side tensors stay UN-expanded (B, S, ·): they are identical
    # across the K beams, and the family's beam step broadcasts over the
    # beam axis in-register — K× less HBM traffic per decode step than the
    # reference's literal (B·K) expansion (video_captioning_model.py:179-189).
    family = make_decode_family(
        params, config, encoder_outputs, encoder_final_state, encoder_mask,
        num_beams=K, max_length=max_length,
    )
    state0 = family.state0

    # Fused vocab-projection+top-k+logsumexp kernel (TPU): never
    # materializes the (B·K, V) logits in HBM. Weight padding/cast happens
    # once per call, outside the decode loop.
    use_fused_vocab = (
        config.kernels.use_fused_vocab_topk
        and not vocab_quantized  # int8 decode keeps the hierarchical path
        and jax.default_backend() == "tpu"
        and B * K <= 2560  # VMEM budget for the row-resident block
        and min(K, V) <= 16
    )
    if use_fused_vocab:
        from ..ops.vocab_topk_pallas import pad_vocab_weights, vocab_topk_lse

        w_pad, b_pad, _ = pad_vocab_weights(
            dec["output_projection"]["kernel"].astype(jnp.float32),
            dec["output_projection"]["bias"].astype(jnp.float32),
            vt=2048,
        )

    sequences0 = jnp.full((B, K, L), start_token_id, jnp.int32)
    # Only beam 0 live at step 0 so identical first expansions don't
    # produce K duplicate beams.
    scores0 = jnp.where(
        jnp.arange(K)[None, :] == 0, 0.0, NEG_INF
    ).astype(jnp.float32) * jnp.ones((B, 1), jnp.float32)
    fin_seqs0 = jnp.full((B, K, L), start_token_id, jnp.int32)
    fin_scores0 = jnp.full((B, K), NEG_INF, jnp.float32)

    last_tokens0 = jnp.full((B, K), start_token_id, jnp.int32)

    def cond(carry):
        t, _, _, scores, _, _, _ = carry
        any_live = jnp.any(scores > NEG_INF / 2)
        return jnp.logical_and(t < max_length, any_live)

    def body(carry):
        # last_tokens rides the carry — re-gathering it from `sequences`
        # each step was a latency-bound custom-gather fusion (profiled).
        t, last_tokens, sequences, scores, state, fin_seqs, fin_scores = carry

        # Hierarchical exact top-K (profiled: the naive flat
        # ``top_k(scores + log_softmax(logits), K·V)`` was ~400 µs/step at
        # B=256, V=10000 — 250 µs in the (B, K·V) top-k custom fusion plus
        # ~140 µs of layout copies it forces). The global top-K of
        # ``score_b + log_prob`` can only draw from each beam's own top-K
        # tokens, and the per-row log-softmax shift doesn't change per-row
        # order, so: top-K per beam over raw logits, normalize just those,
        # then top-K over the K·K candidates. Identical results, ~2x less
        # top-k traffic, no (B, K·V) materialization.
        kk = min(K, V)  # a beam can propose at most V distinct tokens
        if use_fused_vocab:
            # Fused path: logits never hit HBM at all.
            pre_vocab, new_state, _ = family.step_beam_core(
                last_tokens, state, t
            )
            top_logits, top_tokens, lse = vocab_topk_lse(pre_vocab, w_pad, b_pad, kk, vt=2048)
            top_logits = top_logits.reshape(B, K, kk)
            top_tokens = top_tokens.reshape(B, K, kk)
            lse = lse.reshape(B, K)
        else:
            logits, new_state, _ = family.step_beam(last_tokens, state, t)
            logits32 = logits.astype(jnp.float32).reshape(B, K, V)
            # rank-2 operand: XLA only lowers top_k to its fast TopK custom
            # fusion for 2-D inputs (3-D falls back to a full per-row sort,
            # measured 45x slower at this shape). use_pallas_topk swaps in
            # the streaming Pallas kernel (ops/topk_pallas.py), identical
            # values/tie order.
            if config.kernels.use_pallas_topk:
                # Fused top-k + logsumexp: ONE pass over the (B·K, V)
                # logits (the separate XLA lse fusion re-read them).
                from ..ops.topk_pallas import topk2d_lse

                top_logits, top_tokens, lse = topk2d_lse(
                    logits32.reshape(B * K, V), kk
                )
                top_logits = top_logits.reshape(B, K, kk)
                top_tokens = top_tokens.reshape(B, K, kk)
                lse = lse.reshape(B, K)
            else:
                top_logits, top_tokens = jax.lax.top_k(
                    logits32.reshape(B * K, V), kk
                )
                top_logits = top_logits.reshape(B, K, kk)
                top_tokens = top_tokens.reshape(B, K, kk)
                row_max = top_logits[..., 0]  # top-1 IS the row max
                lse = row_max + jnp.log(
                    jnp.sum(jnp.exp(logits32 - row_max[..., None]), axis=-1)
                )  # (B, K)
        cand = scores[:, :, None] + (top_logits - lse[..., None])  # (B, K, kk)
        # Dead slots stay dead: their score is NEG_INF already, which
        # dominates every candidate they could propose.
        top_scores, flat_idx = jax.lax.top_k(cand.reshape(B, K * kk), K)
        beam_idx = flat_idx // kk  # (B, K)
        token_idx = jnp.take_along_axis(
            top_tokens.reshape(B, K * kk), flat_idx, axis=1
        ).astype(jnp.int32)

        # Rebeaming as one-hot selects (see families.py: one-hot reduces
        # beat take_along_axis custom-gather fusions at beam scale).
        onehot = (
            beam_idx[:, :, None] == jnp.arange(K, dtype=jnp.int32)[None, None, :]
        )  # (B, Knew, Kold)

        # Rebeam sequences and append the chosen token at slot t+1.
        gathered = jnp.sum(
            jnp.where(onehot[:, :, :, None], sequences[:, None, :, :], 0),
            axis=2,
        )  # (B, K, L)
        new_sequences = jnp.where(
            (jnp.arange(L)[None, None, :] == t + 1),
            token_idx[:, :, None],
            gathered,
        )

        # Rebeam the decode state (LSTM hidden tuple / transformer KV
        # caches) along the beam axis.
        new_state = family.rebeam(new_state, onehot)

        is_end = token_idx == end_token_id
        # Length penalty: at step t the hypothesis holds t+1 generated
        # tokens → penalty ((len(seq)-1)^alpha), ref :237-242.
        gen_len = (t + 1).astype(jnp.float32)
        penalized = top_scores / jnp.power(gen_len, length_penalty)

        step_fin_scores = jnp.where(is_end, penalized, NEG_INF)
        # Merge this step's completions into the top-K completed register.
        merged_scores = jnp.concatenate([fin_scores, step_fin_scores], axis=1)
        merged_seqs = jnp.concatenate([fin_seqs, new_sequences], axis=1)
        fin_scores_new, keep = jax.lax.top_k(merged_scores, K)
        fin_seqs_new = jnp.take_along_axis(merged_seqs, keep[:, :, None], axis=1)

        # Completed beams leave the live pool (reference: moved to the
        # completed list, ref :237-249).
        new_scores = jnp.where(is_end, NEG_INF, top_scores)

        return (
            t + 1, token_idx, new_sequences, new_scores, new_state,
            fin_seqs_new, fin_scores_new,
        )

    carry = (
        jnp.int32(0), last_tokens0, sequences0, scores0, state0,
        fin_seqs0, fin_scores0,
    )
    t_final, _, sequences, scores, _, fin_seqs, fin_scores = jax.lax.while_loop(
        cond, body, carry
    )

    # Fallback for items with no completed hypothesis: best live beam
    # (reference falls back to a live beam, ref :283-286; we pick the best
    # rather than an arbitrary slot — documented fix).
    best_live_idx = jnp.argmax(scores, axis=1)  # (B,)
    best_live_seq = jnp.take_along_axis(
        sequences, best_live_idx[:, None, None], axis=1
    )[:, 0]
    has_completed = fin_scores[:, 0] > NEG_INF / 2
    best_seq = jnp.where(has_completed[:, None], fin_seqs[:, 0], best_live_seq)

    # Fill empty register slots with live beams so all_tokens is always
    # meaningful for top-N caption requests. Live fallbacks get the same
    # (gen_len)^alpha normalization as completed hypotheses so callers can
    # rank all_scores on one scale (a live beam at exit holds t_final
    # generated tokens; completed ones were penalized by their length
    # including END).
    live_len = jnp.maximum(t_final, 1).astype(jnp.float32)
    live_penalized = jnp.where(
        scores > NEG_INF / 2,
        scores / jnp.power(live_len, length_penalty),
        NEG_INF,
    )
    live_fill = fin_scores <= NEG_INF / 2
    all_tokens = jnp.where(live_fill[:, :, None], sequences, fin_seqs)
    all_scores = jnp.where(live_fill, live_penalized, fin_scores)

    return {
        "generated_tokens": best_seq,
        "all_tokens": all_tokens,
        "all_scores": all_scores,
    }
