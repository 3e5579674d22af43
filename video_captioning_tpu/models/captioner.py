"""Composed video-captioning model (encoder + decoder).

Capability parity with reference src/models/video_captioning_model.py:10-125:
training forward (encode → teacher-forced decode, with an all-ones encoder
mask default, ref :58-62) and a ``generate`` dispatch to greedy / beam
search. Generation itself lives in :mod:`video_captioning_tpu.generation`
as fully on-device ``lax`` loops — no host round-trips per step.

Family dispatch happens in exactly one place (:func:`_is_transformer`);
the per-surface decode adapters live in generation/families.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from . import decoder as decoder_mod
from . import encoder as encoder_mod
from . import transformer as transformer_mod

Array = jax.Array


def _is_transformer(config: Config) -> bool:
    """Single source of truth for model-family dispatch."""
    return config.model.architecture == "transformer"


def init_model(key: Array, config: Config, vocabulary_size: int) -> dict:
    if _is_transformer(config):
        return transformer_mod.init_transformer(key, config, vocabulary_size)
    k_enc, k_dec = jax.random.split(key)
    return {
        "encoder": encoder_mod.init_encoder(k_enc, config),
        "decoder": decoder_mod.init_decoder(k_dec, config, vocabulary_size),
    }


def encode(
    params: dict,
    config: Config,
    video_features: Array,
    video_mask: Optional[Array] = None,
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Encode features; returns (encoder_outputs, final_state, mask)."""
    apply_encoder = (
        transformer_mod.apply_transformer_encoder
        if _is_transformer(config)
        else encoder_mod.apply_encoder
    )
    enc_outs, final = apply_encoder(
        params["encoder"], config, video_features, video_mask,
        train=train, rng=rng,
    )
    if video_mask is None:
        video_mask = jnp.ones(video_features.shape[:2], enc_outs.dtype)
    return enc_outs, final, video_mask


def apply_model(
    params: dict,
    config: Config,
    video_features: Array,
    input_tokens: Array,
    video_mask: Optional[Array] = None,
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Dict[str, Array]:
    """Training forward pass (teacher forcing).

    Returns dict with ``logits`` (B, T, V), ``encoder_outputs`` and
    ``attention_weights`` when attention is enabled.
    """
    r_enc = r_dec = None
    if rng is not None:
        r_enc, r_dec = jax.random.split(rng)

    enc_outs, final, mask = encode(
        params, config, video_features, video_mask, train=train, rng=r_enc
    )
    if _is_transformer(config):
        dec_out = transformer_mod.apply_transformer_decoder(
            params["decoder"], config, enc_outs, input_tokens,
            None if video_mask is None else mask, train=train, rng=r_dec,
        )
    else:
        dec_out = decoder_mod.apply_decoder(
            params["decoder"], config, enc_outs, final, input_tokens, mask,
            train=train, rng=r_dec,
        )
    return {
        "logits": dec_out["logits"],
        "encoder_outputs": enc_outs,
        "attention_weights": dec_out.get("attention_weights"),
    }


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
