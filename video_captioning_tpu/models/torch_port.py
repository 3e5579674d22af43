"""Import reference (torch) checkpoint weights into our parameter pytree.

The reference stores ``VideoCaptioningModel.state_dict()`` tensors
(src/utils/checkpoint.py:49-55, :183-204). This module maps those names to
our pytree so users can migrate trained checkpoints, and so the parity
tests can demand token-identical greedy outputs between frameworks.

Layout conversions: torch Linear ``(out, in)`` → ours ``(in, out)``; torch
LSTM ``weight_ih_l{k}(_reverse)`` ``(4H, in)`` → ``w_ih`` ``(in, 4H)`` with
the same ``[i, f, g, o]`` gate packing; embeddings copy as-is.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ..config import Config


def _arr(value) -> np.ndarray:
    if hasattr(value, "detach"):
        value = value.detach().cpu().numpy()
    return np.asarray(value, dtype=np.float32)


def _linear(state: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": jnp.asarray(_arr(state[f"{prefix}.weight"]).T)}
    if bias and f"{prefix}.bias" in state:
        out["bias"] = jnp.asarray(_arr(state[f"{prefix}.bias"]))
    return out


def _lstm_layer(state: Mapping, prefix: str, layer: int, suffix: str = "") -> dict:
    return {
        "w_ih": jnp.asarray(_arr(state[f"{prefix}.weight_ih_l{layer}{suffix}"]).T),
        "w_hh": jnp.asarray(_arr(state[f"{prefix}.weight_hh_l{layer}{suffix}"]).T),
        "b_ih": jnp.asarray(_arr(state[f"{prefix}.bias_ih_l{layer}{suffix}"])),
        "b_hh": jnp.asarray(_arr(state[f"{prefix}.bias_hh_l{layer}{suffix}"])),
    }


def _attention(state: Mapping, config: Config) -> dict:
    kind = config.model.attention_type
    p = "decoder.attention"
    if kind == "bahdanau":
        return {
            "encoder_projection": _linear(state, f"{p}.encoder_projection"),
            "decoder_projection": _linear(state, f"{p}.decoder_projection"),
            "attention_linear": _linear(state, f"{p}.attention_linear"),
        }
    if kind == "luong":
        score = config.model.luong_score
        if score == "general":
            return {"linear_in": _linear(state, f"{p}.linear_in", bias=False)}
        if score == "concat":
            return {
                "linear_query": _linear(state, f"{p}.linear_query"),
                "linear_context": _linear(state, f"{p}.linear_context"),
                "linear_v": _linear(state, f"{p}.linear_v", bias=False),
            }
        return {}
    if kind == "multihead":
        return {
            "query_linear": _linear(state, f"{p}.query_linear"),
            "key_linear": _linear(state, f"{p}.key_linear"),
            "value_linear": _linear(state, f"{p}.value_linear"),
            "output_linear": _linear(state, f"{p}.output_linear"),
        }
    raise ValueError(kind)


def import_reference_state_dict(state: Mapping, config: Config) -> Dict:
    """Reference ``VideoCaptioningModel`` state dict → our model params."""
    m = config.model

    encoder = {
        "feature_projection": _linear(state, "encoder.feature_projection"),
        "output_projection": _linear(state, "encoder.output_projection"),
        "lstm": [
            {
                "fwd": _lstm_layer(state, "encoder.lstm", l),
                "bwd": _lstm_layer(state, "encoder.lstm", l, "_reverse"),
            }
            for l in range(m.encoder_num_layers)
        ],
    }

    decoder = {
        "embedding": {"table": jnp.asarray(_arr(state["decoder.embedding.weight"]))},
        "lstm": [
            _lstm_layer(state, "decoder.lstm", l)
            for l in range(m.decoder_num_layers)
        ],
        "output_projection": _linear(state, "decoder.output_projection"),
    }
    if m.use_attention:
        decoder["attention"] = _attention(state, config)
        decoder["context_projection"] = _linear(state, "decoder.context_projection")

    return {"encoder": encoder, "decoder": decoder}
