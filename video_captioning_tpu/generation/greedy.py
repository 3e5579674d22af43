"""On-device greedy decoding.

Token-for-token parity with reference src/models/decoder.py:223-289: start
from START, at each step take ``argmax(logits / temperature)``, feed the
argmax back, and stop only when *all* sequences have emitted END (ref :275).

TPU-native structure: a single ``jax.lax.while_loop`` whose carry is fixed
shape ``(B, max_length)`` — no per-step host round-trips (the reference
syncs argmax results to Python every step via its loop). Steps past a
sequence's END keep generating exactly like the reference does until the
all-ended condition trips; positions never reached are left as PAD, which
``decode_caption`` ignores.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from .families import make_decode_family

Array = jax.Array


def greedy_generate(
    params: dict,
    config: Config,
    encoder_outputs: Array,
    encoder_final_state: Array,
    start_token_id: int,
    end_token_id: int,
    max_length: int = 20,
    encoder_mask: Optional[Array] = None,
    temperature: float = 1.0,
) -> Dict[str, Array]:
    """Greedy decode. Returns ``generated_tokens`` (B, max_length) padded
    with PAD(0) after the all-ended step, plus ``attention_weights``
    (B, max_length, S) when attention is enabled. Model family (LSTM or
    transformer) is selected by ``config.model.architecture``."""
    B, S, _ = encoder_outputs.shape

    family = make_decode_family(
        params, config, encoder_outputs, encoder_final_state, encoder_mask,
        num_beams=1, max_length=max_length,
    )
    state0 = family.state0

    tokens0 = jnp.zeros((B, max_length), jnp.int32)
    weights0 = jnp.zeros((B, max_length, S), encoder_outputs.dtype)
    input0 = jnp.full((B,), start_token_id, jnp.int32)
    ended0 = jnp.zeros((B,), jnp.bool_)

    def cond(carry):
        t, _, _, _, _, ended = carry
        return jnp.logical_and(t < max_length, jnp.logical_not(jnp.all(ended)))

    def body(carry):
        t, input_tok, state, tokens, weights, ended = carry
        logits, new_state, w = family.step(input_tok, state, t)
        if temperature != 1.0:
            logits = logits / temperature
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tokens = tokens.at[:, t].set(next_tok)
        if w is not None:
            weights = weights.at[:, t, :].set(w)
        ended = jnp.logical_or(ended, next_tok == end_token_id)
        return (t + 1, next_tok, new_state, tokens, weights, ended)

    _, _, _, tokens, weights, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), input0, state0, tokens0, weights0, ended0)
    )

    result = {"generated_tokens": tokens}
    if family.has_weights:
        result["attention_weights"] = weights
    return result
