"""BASELINE gating-config matrix: every driver config shape must build,
train a step, and generate (BASELINE.md configs #1-#4 analogs, small dims).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_captioning_tpu.config import Config
from video_captioning_tpu.generation import generate
from video_captioning_tpu.models import apply_model, init_model
from video_captioning_tpu.training.losses import label_smoothed_cross_entropy


def _cfg(**model_overrides):
    cfg = Config()
    base = dict(
        cnn_feature_dim=24, encoder_hidden_dim=16, decoder_hidden_dim=16,
        embedding_dim=12, attention_dim=16, attention_num_heads=4,
        max_sequence_length=6, video_sequence_length=8,
    )
    base.update(model_overrides)
    for k, v in base.items():
        setattr(cfg.model, k, v)
    cfg.data.frames_per_video = 8
    cfg.data.max_vocab_size = 32
    cfg.validate()
    return cfg


CONFIGS = [
    # 1) "VGG16 features + 1-layer LSTM encoder-decoder, greedy"
    dict(encoder_num_layers=1, decoder_num_layers=1, attention_type="bahdanau"),
    # 2) "ResNet50(2048-d) + BiLSTM + Bahdanau, greedy" — different feat dim
    dict(cnn_feature_dim=20, attention_type="bahdanau"),
    # 3) "Luong(general) + beam"
    dict(attention_type="luong", luong_score="general"),
    # 4) "Multi-head attention, batch inference"
    dict(attention_type="multihead"),
    # extra: no attention at all
    dict(use_attention=False),
    # extra: 3-layer stacks
    dict(encoder_num_layers=3, decoder_num_layers=3),
]


@pytest.mark.parametrize("overrides", CONFIGS)
def test_config_shape_trains_and_generates(overrides):
    cfg = _cfg(**overrides)
    V = 21
    params = init_model(jax.random.PRNGKey(0), cfg, V)
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (4, 8, cfg.model.cnn_feature_dim)
    )
    tokens = jnp.ones((4, 6), jnp.int32)

    # One grad step must produce finite loss and grads.
    def loss_fn(p):
        out = apply_model(p, cfg, feats, tokens, train=True, rng=jax.random.PRNGKey(2))
        return label_smoothed_cross_entropy(out["logits"], tokens, 0, 0.1)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(
        np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads)
    )

    # Greedy and beam generation both produce valid token ids.
    g = generate(params, cfg, feats, 1, 2, max_length=5, method="greedy")
    assert g["generated_tokens"].shape == (4, 5)
    assert int(g["generated_tokens"].max()) < V
    b = generate(params, cfg, feats, 1, 2, max_length=5, method="beam", beam_size=3)
    assert b["generated_tokens"].shape == (4, 6)
    assert int(b["generated_tokens"].max()) < V


def test_bf16_training_step_finite():
    cfg = _cfg()
    cfg.training.compute_dtype = "bfloat16"
    V = 21
    params = init_model(jax.random.PRNGKey(0), cfg, V)
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 24), jnp.bfloat16)
    tokens = jnp.ones((4, 6), jnp.int32)

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
        )

    def loss_fn(p):
        out = apply_model(cast(p), cfg, feats, tokens, train=True,
                          rng=jax.random.PRNGKey(2))
        return label_smoothed_cross_entropy(out["logits"], tokens, 0, 0.1)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # fp32 master grads
    assert jax.tree_util.tree_leaves(grads)[0].dtype == jnp.float32
