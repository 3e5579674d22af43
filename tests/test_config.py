import json

import pytest

from video_captioning_tpu.config import Config, get_config


def test_defaults_match_reference_surface():
    cfg = get_config()
    assert cfg.model.cnn_feature_dim == 4096
    assert cfg.model.encoder_hidden_dim == 512
    assert cfg.model.encoder_num_layers == 2
    assert cfg.model.decoder_num_layers == 2
    assert cfg.model.max_sequence_length == 20
    assert cfg.model.video_sequence_length == 80
    assert cfg.data.vocab_threshold == 5
    assert cfg.data.max_vocab_size == 10000
    assert cfg.training.batch_size == 32
    assert cfg.training.learning_rate == 1e-4
    assert cfg.training.gradient_clip_norm == 5.0
    assert cfg.training.label_smoothing == 0.1
    assert cfg.inference.beam_size == 5
    assert cfg.inference.length_penalty == 1.0


def test_vocab_size_synced_to_max_vocab():
    cfg = Config()
    cfg.data.max_vocab_size = 1234
    cfg.validate()
    assert cfg.model.vocab_size == 1234


def test_split_validation():
    cfg = Config()
    cfg.data.train_split = 0.5
    with pytest.raises(ValueError):
        cfg.validate()


def test_attention_type_validation():
    cfg = Config()
    cfg.model.attention_type = "bogus"
    with pytest.raises(ValueError):
        cfg.validate()


def test_transformer_embedding_dim_must_equal_d_model():
    """The transformer family ties the token-embedding width to d_model
    (models/transformer.py builds the table (V, decoder_hidden_dim));
    a divergent embedding_dim must be rejected loudly, not ignored."""
    cfg = Config()
    cfg.model.architecture = "transformer"
    cfg.validate()  # defaults: 512 == 512
    cfg.model.embedding_dim = 256
    with pytest.raises(ValueError, match="embedding_dim"):
        cfg.validate()


def test_transformer_frames_must_fit_position_table():
    """frames_per_video > video_sequence_length crashes the transformer
    encoder's learned-position add at the first step; validate() must
    reject the combination up front (the LSTM family accepts any length)."""
    cfg = Config()
    cfg.data.frames_per_video = 100
    cfg.model.video_sequence_length = 80
    cfg.validate()  # fine for the LSTM family
    cfg.model.architecture = "transformer"
    with pytest.raises(ValueError, match="frames_per_video"):
        cfg.validate()


def test_resnet50_variant_validation():
    cfg = Config()
    # Every FeatureExtractor-accepted variant must pass config validation
    # (int8 is configured via YAML/--config for serving deployments).
    for v in ("xla", "folded", "fused", "fused_s2d", "int8"):
        cfg.kernels.resnet50_variant = v
        cfg.validate()
    cfg.kernels.resnet50_variant = "bogus"
    with pytest.raises(ValueError):
        cfg.validate()


def test_json_roundtrip(tmp_path):
    cfg = Config()
    cfg.training.batch_size = 7
    cfg.model.attention_type = "luong"
    p = tmp_path / "c.json"
    cfg.save(p)
    loaded = Config.from_file(p)
    assert loaded.training.batch_size == 7
    assert loaded.model.attention_type == "luong"


def test_yaml_loader(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "model:\n  attention_type: multihead\ntraining:\n  batch_size: 3\n"
    )
    cfg = Config.from_file(p)
    assert cfg.model.attention_type == "multihead"
    assert cfg.training.batch_size == 3


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"model": {"nonexistent": 1}}))
    with pytest.raises(KeyError):
        Config.from_file(p)


def test_compilation_cache_roundtrip_and_enable(tmp_path):
    """compilation_cache_dir survives to_dict/from_dict, and enabling it
    makes JAX write serialized executables into the directory."""
    import jax
    import jax.numpy as jnp

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.utils.compile_cache import (
        enable_compilation_cache,
        maybe_enable_from_config,
    )

    cache = tmp_path / "xla_cache"
    cfg = Config()
    cfg.experiment.compilation_cache_dir = cache
    cfg2 = Config.from_dict(cfg.to_dict())
    assert cfg2.experiment.compilation_cache_dir == cache

    assert maybe_enable_from_config(cfg2) is True
    assert enable_compilation_cache(cache) is True  # idempotent

    @jax.jit
    def f(x):
        return jnp.sum(jnp.tanh(x) * 3.0) + jnp.sum(x**2)

    float(f(jnp.arange(1024.0)))
    files = list(cache.rglob("*"))
    assert files, "compilation cache directory stayed empty"

    # Off by default, and None is a no-op.
    assert Config().experiment.compilation_cache_dir is None
    assert maybe_enable_from_config(Config()) is False
