"""Test environment: force JAX onto CPU with 8 virtual devices so mesh /
pjit tests run without TPU hardware (standard JAX practice; the TPU chip is
reserved for benchmarks)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may pre-set a TPU platform
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a TPU backend and overrides
# JAX_PLATFORMS; force CPU again post-import so tests never touch the chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402

from video_captioning_tpu.config import Config  # noqa: E402


@pytest.fixture
def tiny_config() -> Config:
    """Small dims for fast tests; divisible by attention heads."""
    cfg = Config()
    cfg.model.cnn_feature_dim = 24
    cfg.model.encoder_hidden_dim = 16
    cfg.model.encoder_num_layers = 2
    cfg.model.decoder_hidden_dim = 16
    cfg.model.decoder_num_layers = 2
    cfg.model.embedding_dim = 12
    cfg.model.attention_dim = 16
    cfg.model.attention_num_heads = 4
    cfg.model.max_sequence_length = 8
    cfg.model.video_sequence_length = 10
    cfg.data.frames_per_video = 10
    cfg.data.max_vocab_size = 50
    cfg.validate()
    return cfg


@pytest.fixture
def default_config() -> Config:
    return Config()
