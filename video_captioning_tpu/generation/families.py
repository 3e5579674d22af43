"""Model-family decode adapters for the generation loops.

The greedy / sampling / beam loops (greedy.py, sampling.py, beam.py) are
family-agnostic: fixed-shape ``lax.while_loop``s over (tokens, scores,
decode state). What differs between the LSTM family (models/decoder.py)
and the transformer family (models/transformer.py) is only

* how decode state is initialised (LSTM hidden tuple vs. per-layer KV
  caches),
* what one decode step looks like (recurrence vs. cached attention — the
  transformer step also needs the position ``t``),
* how state is rebeamed after a beam-search re-ranking step.

``make_decode_family`` packages those three behind one interface so the
loop code — including the tuned pieces: beam-shared un-expanded encoder
tensors, hierarchical exact top-k, the fused vocab-projection+top-k Pallas
path, one-hot rebeaming — is written once and serves both families.

No reference analog: the reference (src/models/*) is LSTM-only and its
decode loops are host-side Python per step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..models import attention as attn_mod
from ..models import decoder as decoder_mod

Array = jax.Array


class DecodeFamily(NamedTuple):
    """Decode-loop interface for one model family.

    state0: initial decode state for B·K rows (K = num_beams).
    step:           (tokens (N,), state, t) → (logits (N, V), state, weights|None)
    step_beam:      (tokens (B, K), state, t) → (logits (B·K, V), state, weights|None)
    step_beam_core: same, but stops at the pre-vocab hidden (B·K, H) for
                    the fused vocab-top-k kernel.
    rebeam:         (state, onehot (B, K_new, K_old) bool) → state
    has_weights:    whether ``step`` yields per-step attention weights.
    """

    state0: Any
    step: Callable
    step_beam: Callable
    step_beam_core: Callable
    rebeam: Callable
    has_weights: bool


def make_decode_family(
    params: dict,
    config: Config,
    encoder_outputs: Array,
    encoder_final_state: Array,
    encoder_mask: Optional[Array],
    num_beams: int = 1,
    max_length: int = 20,
) -> DecodeFamily:
    dec = params["decoder"] if "decoder" in params else params
    if config.model.architecture == "transformer":
        return _transformer_family(
            dec, config, encoder_outputs, encoder_mask, num_beams, max_length
        )
    return _lstm_family(
        dec, config, encoder_outputs, encoder_final_state, encoder_mask,
        num_beams,
    )


# --------------------------------------------------------------------------
# LSTM family (models/decoder.py) — reference-parity recurrence
# --------------------------------------------------------------------------


def _lstm_family(
    dec: dict,
    config: Config,
    encoder_outputs: Array,
    encoder_final_state: Array,
    encoder_mask: Optional[Array],
    K: int,
) -> DecodeFamily:
    use_attn = config.model.use_attention
    attn_cache = (
        attn_mod.precompute(config, dec["attention"], encoder_outputs)
        if use_attn
        else {}
    )
    enc_final = (
        jnp.repeat(encoder_final_state, K, axis=0) if K > 1
        else encoder_final_state
    )
    state0 = decoder_mod.init_hidden_state(dec, config, enc_final)
    # Decode weight staging (kernels.lstm_decode_weights_bf16): hoist the
    # loop's per-step f32→bf16 weight conversions by pre-casting the
    # in-loop matrices once — AFTER the attention precompute and the
    # init-state projection above, which stay f32-exact. Bit-identical on
    # TPU (DEFAULT dot precision truncates to bf16 anyway); CPU keeps f32
    # so the reference greedy-parity gates stay exact. The opt-in Pallas
    # cell stages its own operands, so the flag defers to it.
    if (config.kernels.lstm_decode_weights_bf16
            and not config.kernels.use_pallas_lstm
            and not config.kernels.use_pallas_attention
            and jax.default_backend() == "tpu"):
        dec = decoder_mod.stage_decode_weights_bf16(dec)

    def step(tokens, state, t):
        return decoder_mod.decoder_step(
            dec, config, tokens, state, encoder_outputs, attn_cache,
            encoder_mask, train=False,
        )

    def step_beam(tokens_bk, state, t):
        return decoder_mod.decoder_step_beam(
            dec, config, tokens_bk, state, encoder_outputs, attn_cache,
            encoder_mask,
        )

    def step_beam_core(tokens_bk, state, t):
        return decoder_mod.decoder_step_beam_core(
            dec, config, tokens_bk, state, encoder_outputs, attn_cache,
            encoder_mask,
        )

    def rebeam(state, onehot):
        # Rebeaming as one-hot selects: K is tiny (beams), so a masked
        # reduce over the beam axis is a handful of VPU ops, where
        # take_along_axis lowers to latency-bound custom-gather fusions
        # (profiled at ~10-40 µs each at B=256 despite touching only KBs).
        oh_f = onehot.astype(state[0].dtype)
        B, Kn, Ko = onehot.shape

        def rb(x):
            layers, _, H = x.shape
            xr = x.reshape(layers, B, Ko, H)
            return jnp.einsum("bnk,lbkh->lbnh", oh_f, xr).reshape(
                layers, B * Kn, H
            )

        return (rb(state[0]), rb(state[1]))

    return DecodeFamily(state0, step, step_beam, step_beam_core, rebeam, use_attn)


# --------------------------------------------------------------------------
# Transformer family (models/transformer.py) — KV-cache attention decode
# --------------------------------------------------------------------------


def _transformer_family(
    dec: dict,
    config: Config,
    encoder_outputs: Array,
    encoder_mask: Optional[Array],
    K: int,
    max_length: int,
) -> DecodeFamily:
    from ..models import transformer as tr

    B = encoder_outputs.shape[0]
    fused_attn = (
        config.kernels.transformer_fused_beam_attn
        and config.kernels.transformer_lazy_rebeam
        and config.parallel.context_axis is None
    )
    # Beam decode under bf16 params: upcast the decoder weights to fp32
    # ONCE per generation call (kernels.transformer_beam_params_f32).
    # The fp32-state hybrid below otherwise re-stages the bf16 weights
    # against f32 activations every step (round-4 profile: per-step
    # bf16[512,512] copy-starts), and the bf16-params beam arm measured
    # SLOWER than fp32 params (8,046 vs 8,846 clips/s, B=256). With the
    # upcast the loop compiles to the same program as the fp32 arm;
    # weight VALUES are unchanged (bf16 exactly representable in f32).
    # Greedy (K=1) keeps bf16 params — measured +48% there.
    if (K > 1 and config.kernels.transformer_beam_params_f32
            and not config.kernels.transformer_bf16_beam_state
            and dec["output_projection"].get("kernel") is not None
            and dec["output_projection"]["kernel"].dtype == jnp.bfloat16):
        dec = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == jnp.bfloat16 else x,
            dec,
        )
    # Weight staging (kernels.transformer_decode_weights_bf16): hoist the
    # decode loop's per-step f32→bf16 weight conversions by pre-casting
    # the in-loop kernels once — greedy and beam. Bit-identical ON TPU
    # (DEFAULT dot precision truncates to bf16 anyway) — see
    # stage_decode_weights_bf16. CPU keeps f32 so the CPU-run parity
    # gates stay exact.
    if (config.kernels.transformer_decode_weights_bf16
            and not config.kernels.transformer_bf16_beam_state
            and jax.default_backend() == "tpu"):
        dec = tr.stage_decode_weights_bf16(dec)
    # Fused per-block wqkv for the BEAM decode loop (AFTER staging so the
    # merge concatenates the staged dtype). Beam only: there it is
    # bit-identical (chip agreement 1.0, +1.3%); at K=1 it is neutral
    # (+0.1%) and under true-bf16 greedy params the merged matmul's
    # different contraction blocking flips ~16% of random-init clips —
    # see the config flag note.
    if config.kernels.transformer_merge_qkv and K > 1:
        dec = tr.merge_self_attn_qkv(dec)
    # Cross-attention K/V computed ONCE per generation call; stays
    # UN-expanded (B, S, D) — the decode step broadcasts over the beam
    # axis in-register (same HBM saving as the LSTM beam path).
    # kernels.transformer_cross_kv_bf16 (beam only): pre-stage the K/V in
    # the (B, h, dh, S) bfloat16 OPERAND layout the decode loop's
    # DEFAULT-precision attention dots want, hoisting XLA's per-step
    # f32→bf16 relayout copies out of the loop by construction
    # (precompute_cross_kv docstring; _cross_attn_step_operand). Greedy
    # keeps the (B, S, D) form — a pre-transposed operand measured ~50%
    # SLOWER there (round-3 A/B, precompute_cross_kv docstring). The
    # fused-Pallas beam path keeps (B, S, D) too (its kernel stages K/V
    # itself).
    operand_kv = (
        config.kernels.transformer_cross_kv_bf16 and K > 1 and not fused_attn
    )
    cross_kv = tr.precompute_cross_kv(
        dec, encoder_outputs, config.model.transformer_num_heads,
        operand_layout=operand_kv,
    )
    # Beam decode state dtype: fp32 even under bf16 params. Measured on
    # chip (docs/PERFORMANCE.md round 3): with bf16 caches the beam loop's
    # cross-attention softmax fusions hit a 4x-slower packed-layout path
    # (46 vs 32 ms/batch at B=256) while fp32 state costs nothing extra —
    # XLA's DEFAULT dot precision already streams bf16 operand copies for
    # the score/context dots, so fp32 state + bf16 params IS the fast
    # hybrid. Greedy (K=1) keeps bf16 state: measured faster there
    # (6.7 vs 10.5 ms/batch).
    state_dtype = encoder_outputs.dtype
    if (K > 1 and state_dtype == jnp.bfloat16 and not fused_attn
            and not config.kernels.transformer_bf16_beam_state):
        # fp32 state INCLUDING an up-cast cross-KV. Keeping the cross-KV
        # bf16 in the SAME (B, S, D) layout (query cast down, f32 scores
        # via preferred_element_type) looked like it should remove the
        # per-step f32<->bf16 conversion fusions the round-4 profile
        # showed — measured on chip it LOST 16% instead (5,592 vs 6,639
        # clips/s; ab_beam_flags round 3): XLA schedules the f32-operand
        # dots + overlapped conversion DMA better than the mixed-dtype
        # schedule. Recorded negative; the up-cast stays unless the
        # operand-layout flag below supersedes it.
        state_dtype = jnp.float32
        if not operand_kv:
            cross_kv = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), cross_kv
            )
    if config.kernels.transformer_cross_kv_bf16 and not operand_kv:
        # Greedy (K=1) arm of the flag: plain bf16 storage in the
        # (B, S, D) form. The step casts the query down and accumulates
        # f32, so the dots see the same bf16 operands either way.
        cross_kv = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), cross_kv
        )
    # Narrow cache storage (kernels.transformer_cache_bf16): the caches —
    # the dominant per-step HBM read of the beam loop — are stored bf16
    # while the residual stream keeps state_dtype. The decode steps read
    # the activation dtype from cross_kv, so only init_decode_state needs
    # the cache dtype.
    cache_dtype = (
        jnp.bfloat16 if config.kernels.transformer_cache_bf16 else None
    )
    # Cache layout: stacked (n_blocks, T, N, D) for greedy/K=1, per-layer
    # (T, N, D) tuple leaves for beam — each path's chip-measured faster
    # layout (init_decode_state layout notes: beam +10.8% fp32 / +21% bf16
    # per-layer; greedy −14% fp32 / −4% bf16 per-layer).
    state0 = tr.init_decode_state(
        dec, config, B * K, state_dtype, max_positions=max_length,
        cache_dtype=cache_dtype, stacked=(K == 1),
    )
    # Lazy (ancestry) rebeam: caches stay physical-slot indexed, the
    # per-step rebeam touches only a (B, K, T) int32 carry, and the beam
    # attention selects prefixes with the one-hot ancestry
    # (models/transformer.py:_cached_self_attn_beam). Identical tokens and
    # scores; ~3x less cache HBM traffic per step than physically
    # gathering both (n_blocks, B·K, T, D) tensors.
    lazy = K > 1 and config.kernels.transformer_lazy_rebeam
    if lazy:
        T_state = state0["k"][0].shape[0]  # per-layer (T, N, D) time-major
        state0 = dict(state0, anc=tr.init_beam_ancestry(B, K, T_state))

    def step(tokens, state, t):
        return tr.decode_step(
            dec, config, tokens, state, t, cross_kv, encoder_mask,
            state_dtype,
        )

    def step_beam(tokens_bk, state, t):
        b, k = tokens_bk.shape
        fn = tr.decode_step_beam if lazy else tr.decode_step
        return fn(
            dec, config, tokens_bk.reshape(b * k), state, t, cross_kv,
            encoder_mask, state_dtype,
        )

    def step_beam_core(tokens_bk, state, t):
        b, k = tokens_bk.shape
        fn = tr.decode_step_beam_core if lazy else tr.decode_step_core
        return fn(
            dec, config, tokens_bk.reshape(b * k), state, t, cross_kv,
            encoder_mask, state_dtype,
        )

    def rebeam(state, onehot):
        B_, Kn, Ko = onehot.shape
        if lazy:
            # Compose ancestry: new beam n inherits old beam k's mapping
            # for every column (column t is already k-identity, so it
            # composes to beam_idx — the slot the row was written in).
            anc = jnp.sum(
                jnp.where(onehot[:, :, :, None], state["anc"][:, None], 0),
                axis=2,
                dtype=jnp.int32,
            )
            return dict(state, anc=anc)

        # Physical rebeam (flag off): candidate n's prefix is old beam k's
        # prefix including the K/V row the step just wrote at position t,
        # so the full (T, D) cache rows are selected per beam. Caches are
        # per-layer TIME-MAJOR (T, B·K, D) leaves for K>1, or one stacked
        # (n_blocks, T, B·K, D) array at K=1 — see tr.init_decode_state.
        per_layer = isinstance(state["k"], (tuple, list))
        first = state["k"][0] if per_layer else state["k"]
        oh_f = onehot.astype(first.dtype)

        def rb(x):
            T, _, D = x.shape[-3:]
            lead = x.shape[:-3]
            xr = x.reshape(*lead, T, B_, Ko, D)
            return jnp.einsum("bnk,...tbkd->...tbnd", oh_f, xr).reshape(
                *lead, T, B_ * Kn, D
            )

        if per_layer:
            return {
                "k": tuple(rb(x) for x in state["k"]),
                "v": tuple(rb(x) for x in state["v"]),
            }
        return {"k": rb(state["k"]), "v": rb(state["v"])}

    return DecodeFamily(state0, step, step_beam, step_beam_core, rebeam, True)
