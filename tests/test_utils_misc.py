"""Small-surface coverage: logging setup, factory dispatch/error paths
(the PARITY.md rows previously verified only by inspection)."""

import logging

import numpy as np
import pytest

import jax

from video_captioning_tpu.models.attention import (
    create_attention_mechanism,
    init_attention,
)
from video_captioning_tpu.models.backbones import create_feature_extractor
from video_captioning_tpu.utils.logging import setup_logging


def test_setup_logging_console_and_file(tmp_path):
    log_file = tmp_path / "run.log"
    root = setup_logging("debug", log_file)
    try:
        assert root.level == logging.DEBUG
        kinds = {type(h) for h in root.handlers}
        assert logging.StreamHandler in kinds and logging.FileHandler in kinds
        logging.getLogger("vc_test").info("hello from the gate")
        for h in root.handlers:
            h.flush()
        assert "hello from the gate" in log_file.read_text()
        # unknown level falls back to INFO (reference behavior: getattr
        # with default)
        assert setup_logging("not-a-level").level == logging.INFO
    finally:
        for h in list(root.handlers):
            root.removeHandler(h)
            h.close()


def test_attention_factory_dispatch_and_rejects(tiny_config):
    for att_type in ("bahdanau", "luong", "multihead"):
        init_fn, attend_fn = create_attention_mechanism(tiny_config, att_type)
        params = init_fn(jax.random.PRNGKey(0))
        enc = jax.random.normal(
            jax.random.PRNGKey(1), (2, 10, tiny_config.model.encoder_hidden_dim)
        )
        dec = jax.random.normal(
            jax.random.PRNGKey(2), (2, tiny_config.model.decoder_hidden_dim)
        )
        ctx, weights = attend_fn(params, enc, dec)
        assert ctx.shape == (2, tiny_config.model.encoder_hidden_dim)
        w = np.asarray(weights)
        assert w.shape == (2, 10)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    # the factory validates through Config (fixes the reference's
    # hardcoded "bahdanau", decoder.py:38)
    with pytest.raises(ValueError):
        create_attention_mechanism(tiny_config, "nonexistent")


def test_feature_extractor_factory_rejects(tiny_config):
    with pytest.raises(ValueError, match="model type"):
        create_feature_extractor(tiny_config, "alexnet", allow_random_init=True)
    with pytest.raises(ValueError, match="variant"):
        create_feature_extractor(
            tiny_config, "vgg16", allow_random_init=True, variant="folded"
        )
    # random init without the explicit opt-in is a hard error (VERDICT r2
    # item 5: silent random-weight fallback removed)
    with pytest.raises(Exception):
        create_feature_extractor(tiny_config, "vgg16")
