"""BiLSTM video encoder.

Capability parity with reference src/models/encoder.py:10-98:
feature projection (F→H) → dropout → N-layer bidirectional LSTM →
output projection (2H→H) → dropout, plus a final state built from the last
layer's forward/backward hidden states passed through the same output
projection (encoder.py:90-97).

TPU-native design: each direction of each layer is a ``jax.lax.scan`` over
time (no packed sequences — masked carry-through reproduces packing
semantics, see ``layers.lstm_scan``), all projections are batched matmuls
over ``(B·T, ·)`` so they tile onto the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from .layers import (
    apply_linear,
    dropout,
    init_linear,
    init_multilayer_lstm,
    lstm_scan,
    reverse_sequence,
)

Array = jax.Array


def init_encoder(key: Array, config: Config) -> dict:
    F = config.model.cnn_feature_dim
    H = config.model.encoder_hidden_dim
    L = config.model.encoder_num_layers
    k_proj, k_lstm, k_out = jax.random.split(key, 3)
    return {
        "feature_projection": init_linear(k_proj, F, H),
        "lstm": init_multilayer_lstm(
            k_lstm, H, H, L, bidirectional=True, init_style="torch_default"
        ),
        "output_projection": init_linear(k_out, 2 * H, H),
    }


def apply_encoder(
    params: dict,
    config: Config,
    video_features: Array,
    video_mask: Optional[Array] = None,
    *,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Encode video features.

    Args:
      video_features: (B, T, F)
      video_mask: optional (B, T), 1 = valid frame.

    Returns:
      encoded_features (B, T, H), final_hidden (B, H).
    """
    p_drop = config.model.encoder_dropout
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4

    x = apply_linear(params["feature_projection"], video_features)  # (B, T, H)
    x = dropout(x, p_drop, rngs[0], train)

    lengths = None if video_mask is None else video_mask.sum(axis=1).astype(jnp.int32)

    num_layers = len(params["lstm"])
    h_fwd_last = c_fwd_last = h_bwd_last = None
    for l, layer in enumerate(params["lstm"]):
        B = x.shape[0]
        Hdim = layer["fwd"]["w_hh"].shape[0]
        h0 = jnp.zeros((B, Hdim), x.dtype)
        c0 = jnp.zeros((B, Hdim), x.dtype)

        # Both directions run as ONE vmapped scan: the per-step gate
        # matmuls become a single batched (2, B, in)x(2, in, 4H) GEMM and
        # the sequential op count halves vs two separate scans. The
        # backward direction consumes each valid prefix reversed — the
        # packed-sequence bidirectional semantics (reference encoder.py:
        # 74-82) — and its outputs are un-reversed afterwards.
        x_rev = reverse_sequence(x, lengths)
        stacked_layer = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]), layer["fwd"], layer["bwd"]
        )
        xs2 = jnp.stack([x, x_rev])  # (2, B, T, in)
        on_pallas_backend = (
            jax.default_backend() == "tpu" or config.kernels.interpret
        )
        use_seq_kernel = (
            config.kernels.use_pallas_lstm_seq
            and not train  # eval path: no residuals written
            and x.dtype in (jnp.float32, jnp.bfloat16)
            and on_pallas_backend
        )
        use_seq_train_kernel = (
            config.kernels.use_pallas_lstm_seq_train
            and train
            and x.dtype in (jnp.float32, jnp.bfloat16)
            and on_pallas_backend
        )
        if use_seq_kernel or use_seq_train_kernel:
            # Whole recurrence in one Pallas kernel: recurrent weights
            # VMEM-resident across all T steps, no per-step update-slices
            # (ops/lstm_seq_pallas.py). Input projections hoisted here,
            # identical to lstm_scan's hoist. The training variant pairs it
            # with a Pallas backward sweep via jax.custom_vjp.
            from ..ops.lstm_seq_pallas import lstm_seq_pallas, lstm_seq_train

            xproj = jnp.einsum(
                "dbti,dio->dbto", xs2, stacked_layer["w_ih"]
            ) + (stacked_layer["b_ih"] + stacked_layer["b_hh"])[:, None, None, :]
            xproj_t = jnp.transpose(xproj, (2, 0, 1, 3))  # (T, 2, B, 4H)
            if use_seq_train_kernel:
                mask_bt = (
                    jnp.ones((x.shape[0], x.shape[1]), jnp.float32)
                    if video_mask is None
                    else video_mask.astype(jnp.float32)
                )
                outs_t, (h_last2, c_last2) = lstm_seq_train(
                    xproj_t, stacked_layer["w_hh"], mask_bt,
                    128, config.kernels.interpret,
                )
            else:
                outs_t, (h_last2, c_last2) = lstm_seq_pallas(
                    xproj_t,
                    stacked_layer["w_hh"],
                    video_mask,
                    interpret=config.kernels.interpret,
                )
            outs2 = jnp.transpose(outs_t, (1, 2, 0, 3))  # (2, B, T, H)
        else:
            outs2, (h_last2, c_last2) = jax.vmap(
                lambda lyr, xs: lstm_scan(lyr, xs, h0, c0, mask=video_mask)
            )(stacked_layer, xs2)
        out_f, out_b_rev = outs2[0], outs2[1]
        h_f, h_b = h_last2[0], h_last2[1]
        c_f = c_last2[0]
        out_b = reverse_sequence(out_b_rev, lengths)

        x = jnp.concatenate([out_f, out_b], axis=-1)  # (B, T, 2H)
        # torch inter-layer dropout: applied to every layer's output except
        # the last (encoder.py:40 dropout=p only when num_layers > 1).
        if train and l < num_layers - 1 and num_layers > 1 and rngs[1] is not None:
            x = dropout(x, p_drop, jax.random.fold_in(rngs[1], l), train)
        h_fwd_last, c_fwd_last, h_bwd_last = h_f, c_f, h_b

    lstm_output = x  # (B, T, 2H)

    encoded = apply_linear(params["output_projection"], lstm_output)  # (B, T, H)
    encoded = dropout(encoded, p_drop, rngs[3], train)

    # Final state: last layer's forward/backward hidden states concatenated
    # (torch hidden[-2:] → fwd then bwd, encoder.py:92-94) and projected by
    # the same output_projection (encoder.py:96).
    final_concat = jnp.concatenate([h_fwd_last, h_bwd_last], axis=-1)  # (B, 2H)
    final_hidden = apply_linear(params["output_projection"], final_concat)

    return encoded, final_hidden
