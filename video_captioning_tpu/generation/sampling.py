"""On-device stochastic sampling decode (temperature / top-k).

The reference approximates "diverse captions" with a greedy temperature
sweep (predictor.py:361-376) because its greedy path takes argmax after
temperature division — which is temperature-invariant. This module adds
real ancestral sampling as a third generation method: per-step categorical
draws from ``softmax(logits / T)``, optionally truncated to the top-k
tokens, all inside one ``lax.while_loop`` with a threaded PRNG key.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from .families import make_decode_family

Array = jax.Array


def sample_generate(
    params: dict,
    config: Config,
    encoder_outputs: Array,
    encoder_final_state: Array,
    start_token_id: int,
    end_token_id: int,
    max_length: int = 20,
    encoder_mask: Optional[Array] = None,
    temperature: float = 1.0,
    top_k: int = 0,
    rng: Optional[Array] = None,
) -> Dict[str, Array]:
    """Sample captions. ``top_k > 0`` truncates the distribution per step.

    Returns ``generated_tokens`` (B, max_length) and per-sequence
    ``logprobs`` (B,) summed over the sampled tokens up to END.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    B, S, _ = encoder_outputs.shape

    family = make_decode_family(
        params, config, encoder_outputs, encoder_final_state, encoder_mask,
        num_beams=1, max_length=max_length,
    )
    state0 = family.state0

    tokens0 = jnp.zeros((B, max_length), jnp.int32)
    input0 = jnp.full((B,), start_token_id, jnp.int32)
    ended0 = jnp.zeros((B,), jnp.bool_)
    logprob0 = jnp.zeros((B,), jnp.float32)

    def cond(carry):
        t = carry[0]
        ended = carry[5]
        return jnp.logical_and(t < max_length, jnp.logical_not(jnp.all(ended)))

    def body(carry):
        t, key, input_tok, state, tokens, ended, logprob = carry
        logits, new_state, _ = family.step(input_tok, state, t)
        logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)

        if top_k and top_k > 0:
            kth = jax.lax.top_k(logits, top_k)[0][:, -1]  # (B,)
            logits = jnp.where(logits >= kth[:, None], logits, -jnp.inf)

        key, sub = jax.random.split(key)
        next_tok = jax.random.categorical(sub, logits).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_logp = jnp.take_along_axis(logp, next_tok[:, None], axis=-1)[:, 0]

        # Ended sequences stop accumulating and keep emitting PAD.
        next_tok = jnp.where(ended, 0, next_tok)
        logprob = logprob + jnp.where(ended, 0.0, tok_logp)
        tokens = tokens.at[:, t].set(next_tok)
        ended = jnp.logical_or(ended, next_tok == end_token_id)
        # Feed END back for already-ended rows so the recurrence stays sane.
        feed = jnp.where(ended & (next_tok == 0), end_token_id, next_tok)
        return (t + 1, key, feed, new_state, tokens, ended, logprob)

    carry = (jnp.int32(0), rng, input0, state0, tokens0, ended0, logprob0)
    _, _, _, _, tokens, _, logprob = jax.lax.while_loop(cond, body, carry)
    return {"generated_tokens": tokens, "logprobs": logprob}
