"""Golden regression: fixed-seed generation outputs must never drift.

Unlike the torch-oracle parity tests these run with no torch dependency
and pin OUR numerics across refactors (init streams, scan restructures,
kernel changes). Regenerate deliberately via the script in the golden
file's git history if a semantic change is intended.
"""

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from video_captioning_tpu.config import Config
from video_captioning_tpu.generation.beam import beam_search_generate
from video_captioning_tpu.generation.greedy import greedy_generate
from video_captioning_tpu.models import captioner, init_model

GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "generation_goldens.json").read_text()
)


def _cfg(kind):
    cfg = Config()
    cfg.model.cnn_feature_dim = 24
    cfg.model.encoder_hidden_dim = 16
    cfg.model.decoder_hidden_dim = 16
    cfg.model.embedding_dim = 12
    cfg.model.attention_dim = 16
    cfg.model.attention_type = kind
    cfg.model.attention_num_heads = 4
    cfg.data.max_vocab_size = 29
    cfg.validate()
    return cfg


def test_generation_matches_goldens():
    for kind, want in GOLDEN.items():
        cfg = _cfg(kind)
        params = init_model(jax.random.PRNGKey(42), cfg, 29)
        feats = jax.random.normal(jax.random.PRNGKey(7), (3, 10, 24))
        enc, final, mask = captioner.encode(params, cfg, feats)

        checksum = round(float(jnp.abs(final).sum()), 4)
        assert abs(checksum - want["encoder_final_checksum"]) < 2e-3, kind

        g = greedy_generate(params, cfg, enc, final, 1, 2, 10, mask)[
            "generated_tokens"
        ]
        np.testing.assert_array_equal(np.asarray(g), want["greedy"], err_msg=kind)

        b = beam_search_generate(
            params, cfg, enc, final, 1, 2, 10, mask, beam_size=4
        )
        np.testing.assert_array_equal(
            np.asarray(b["generated_tokens"]), want["beam_best"], err_msg=kind
        )
        np.testing.assert_allclose(
            np.asarray(b["all_scores"]), np.asarray(want["beam_scores"]),
            rtol=1e-3, atol=1e-3, err_msg=kind,
        )
