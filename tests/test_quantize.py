"""Opt-in W8A8 decode quantization (models/quantize.py + layers.int8_linear).

VERDICT round-3 item 2: extend the int8 machinery from the CNN backbones
to the decode loop, with quantified agreement (the chip-scale agreement
numbers come from benchmarks/int8_decode_gate.py; these tests pin the
mechanics: numerics of the int8 linear, tree-transform shape, generation
through both families, and the predictor surface).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_captioning_tpu.config import Config
from video_captioning_tpu.generation.beam import beam_search_generate
from video_captioning_tpu.generation.greedy import greedy_generate
from video_captioning_tpu.models import captioner, init_model
from video_captioning_tpu.models.layers import (
    apply_linear, init_linear, int8_linear, quantize_linear_int8,
)
from video_captioning_tpu.models.quantize import quantize_decode_params

VOCAB = 40


def _tiny(architecture="lstm"):
    cfg = Config()
    cfg.model.architecture = architecture
    cfg.model.cnn_feature_dim = 24
    cfg.model.encoder_hidden_dim = 16
    cfg.model.decoder_hidden_dim = 16
    cfg.model.embedding_dim = 16 if architecture == "transformer" else 12
    cfg.model.attention_dim = 16
    cfg.model.attention_num_heads = 4
    cfg.model.transformer_num_heads = 4
    cfg.model.video_sequence_length = 10
    cfg.data.frames_per_video = 10
    cfg.validate()
    return cfg


def test_int8_linear_close_to_fp32():
    """W8A8 with per-channel weight scales + per-row activation scales is
    within ~1% relative error of the fp32 matmul on well-scaled inputs."""
    key = jax.random.PRNGKey(0)
    lin = init_linear(key, 64, 128)
    q = quantize_linear_int8(lin)
    assert q["kernel_q"].dtype == jnp.int8
    assert q["w_scale"].shape == (128,)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    y32 = apply_linear(lin, x)
    y8 = int8_linear(q, x)
    err = np.linalg.norm(np.asarray(y8 - y32)) / np.linalg.norm(
        np.asarray(y32))
    assert err < 0.015, err
    # apply_linear dispatches on the quantized form transparently.
    np.testing.assert_array_equal(
        np.asarray(apply_linear(q, x)), np.asarray(y8))
    # 3-D inputs (training-shaped) also work.
    x3 = x.reshape(4, 8, 64)
    np.testing.assert_allclose(
        np.asarray(int8_linear(q, x3)), np.asarray(y8).reshape(4, 8, 128),
        rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("architecture", ["lstm", "transformer"])
@pytest.mark.parametrize("level", ["vocab", "full"])
def test_quantized_decode_generates(architecture, level):
    """Quantized trees decode through both families (greedy + beam) with
    valid shapes and finite scores; with sharpened logits (trained-model
    regime) greedy tokens agree with fp32."""
    cfg = _tiny(architecture)
    params = init_model(jax.random.PRNGKey(3), cfg, VOCAB)
    # Sharpen the vocab projection: random-init logits are near-uniform
    # (adversarial tie regime no trained model exhibits).
    op = params["decoder"]["output_projection"]
    op["kernel"] = op["kernel"] * 4.0
    feats = jax.random.normal(jax.random.PRNGKey(4), (3, 10, 24))
    enc, final, mask = captioner.encode(params, cfg, feats)

    ref = greedy_generate(params, cfg, enc, final, 1, 2, 7, mask)
    pq = quantize_decode_params(params, cfg, level)
    assert "kernel_q" in pq["decoder"]["output_projection"]
    assert "kernel" not in pq["decoder"]["output_projection"]
    # Original tree untouched (transform returns a copy).
    assert "kernel" in params["decoder"]["output_projection"]

    got = greedy_generate(pq, cfg, enc, final, 1, 2, 7, mask)
    np.testing.assert_array_equal(
        np.asarray(got["generated_tokens"]),
        np.asarray(ref["generated_tokens"]),
    )

    beam = beam_search_generate(
        pq, cfg, enc, final, 1, 2, 7, mask, beam_size=3
    )
    assert beam["generated_tokens"].shape == (3, 8)
    scores = np.asarray(beam["all_scores"])
    assert np.isfinite(scores[scores > -1e8]).all()

    if architecture == "transformer" and level == "full":
        blk = pq["decoder"]["blocks"][0]
        assert "kernel_q" in blk["self_attn"]["wq"]
        assert "kernel_q" in blk["mlp"]["fc1"]


def test_quantize_rejects_unknown_level():
    cfg = _tiny()
    params = init_model(jax.random.PRNGKey(0), cfg, VOCAB)
    with pytest.raises(ValueError, match="decode_int8"):
        quantize_decode_params(params, cfg, "int4")
    assert quantize_decode_params(params, cfg, "off") is params


def test_predictor_decode_int8_surface(tmp_path):
    """The predictor's decode_int8 load option produces working captions
    and composes with compute_dtype=bfloat16."""
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.inference.predictor import VideoCaptionPredictor
    from video_captioning_tpu.utils.checkpoint import CheckpointManager

    cfg = _tiny()
    cfg.data.vocab_threshold = 1
    cfg.validate()
    vocab = Vocabulary(cfg)
    vocab.build_vocabulary(["a man rides a horse", "a dog runs fast"])
    params = init_model(jax.random.PRNGKey(5), cfg, len(vocab))
    pkg = CheckpointManager(tmp_path).save_model_for_inference(
        params, vocab, cfg)

    rs = np.random.RandomState(0)
    feats = rs.randn(10, 24).astype(np.float32)
    p8 = VideoCaptionPredictor(pkg, decode_int8="vocab",
                               compute_dtype="bfloat16")
    assert "kernel_q" in p8.params["decoder"]["output_projection"]
    res = p8.predict_from_features(feats, method="beam", beam_size=3,
                                   max_length=6)
    assert isinstance(res["caption"], str) and len(res["tokens"]) == 7

    with pytest.raises(ValueError, match="decode_int8"):
        VideoCaptionPredictor(pkg, decode_int8="bogus")
