"""THE parity gate: run the reference's unmodified model code (torch CPU),
port its weights into our JAX model, and demand matching numerics —
token-identical greedy captions included (BASELINE north star).

The reference package can't be imported normally (broken __init__, torch-
vision dependency, Python-3.12-incompatible config dataclasses), so the
loader from benchmarks/reference_baseline.py stubs those seams; the model
code under test (encoder.py / attention.py / decoder.py /
video_captioning_model.py) executes unmodified.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent.parent / "benchmarks"))
from reference_baseline import _ShimConfig, load_reference_modules  # noqa: E402

from video_captioning_tpu.config import Config  # noqa: E402
from video_captioning_tpu.generation.greedy import greedy_generate  # noqa: E402
from video_captioning_tpu.models import captioner  # noqa: E402
from video_captioning_tpu.models.torch_port import (  # noqa: E402
    import_reference_state_dict,
)

VOCAB = 37
B, T_FRAMES, T_TOKENS = 3, 12, 7


@pytest.fixture(scope="module")
def ref_setup():
    _, model_mod = load_reference_modules()

    shim = _ShimConfig()
    # Shrink for speed; keep the architecture shape (2+2 layers, attention).
    shim.model.cnn_feature_dim = 20
    shim.model.encoder_hidden_dim = 16
    shim.model.decoder_hidden_dim = 16
    shim.model.embedding_dim = 12
    shim.model.attention_dim = 16

    torch.manual_seed(0)
    ref_model = model_mod.VideoCaptioningModel(shim, VOCAB)
    ref_model.eval()

    cfg = Config()
    cfg.model.cnn_feature_dim = 20
    cfg.model.encoder_hidden_dim = 16
    cfg.model.decoder_hidden_dim = 16
    cfg.model.embedding_dim = 12
    cfg.model.attention_dim = 16
    cfg.data.max_vocab_size = VOCAB
    cfg.validate()

    params = import_reference_state_dict(ref_model.state_dict(), cfg)

    rs = np.random.RandomState(1)
    feats = rs.randn(B, T_FRAMES, 20).astype(np.float32)
    return ref_model, cfg, params, feats


def test_encoder_outputs_match(ref_setup):
    ref_model, cfg, params, feats = ref_setup
    with torch.no_grad():
        ref_enc, ref_final = ref_model.encoder(torch.from_numpy(feats))
    enc, final, _ = captioner.encode(params, cfg, jnp.asarray(feats))
    np.testing.assert_allclose(
        np.asarray(enc), ref_enc.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(final), ref_final.numpy(), rtol=1e-4, atol=1e-5
    )


def test_teacher_forcing_logits_match(ref_setup):
    ref_model, cfg, params, feats = ref_setup
    rs = np.random.RandomState(2)
    tokens = rs.randint(0, VOCAB, size=(B, T_TOKENS)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref_model(
            video_features=torch.from_numpy(feats),
            input_tokens=torch.from_numpy(tokens),
            target_tokens=torch.from_numpy(tokens),
        )
    out = captioner.apply_model(
        params, cfg, jnp.asarray(feats), jnp.asarray(tokens, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["attention_weights"]),
        ref_out["attention_weights"].numpy(),
        rtol=1e-3, atol=1e-5,
    )


def test_greedy_tokens_identical(ref_setup):
    """The BASELINE gate: token-for-token identical greedy captions."""
    ref_model, cfg, params, feats = ref_setup
    max_len = 10

    with torch.no_grad():
        ref_out = ref_model.generate(
            video_features=torch.from_numpy(feats),
            start_token_id=1, end_token_id=2,
            max_length=max_len, method="greedy",
        )
    ref_tokens = ref_out["generated_tokens"].numpy()

    enc, final, mask = captioner.encode(params, cfg, jnp.asarray(feats))
    ours = np.asarray(
        greedy_generate(params, cfg, enc, final, 1, 2, max_len, mask)[
            "generated_tokens"
        ]
    )
    # Reference stops early when all sequences END; ours PAD-fills after.
    np.testing.assert_array_equal(ours[:, : ref_tokens.shape[1]], ref_tokens)


def test_greedy_identical_across_attention_types(ref_setup):
    """Luong(general) and multihead paths, weight-ported, must also match.
    The reference hardcodes bahdanau in its decoder (decoder.py:38), so we
    instantiate its attention classes directly via create_attention_mechanism
    by patching the built decoder."""
    _, model_mod = load_reference_modules()
    from refsrc.models.attention import (  # type: ignore
        LuongAttention,
        MultiHeadAttention,
    )

    for kind, ctor in [("luong", LuongAttention), ("multihead", MultiHeadAttention)]:
        shim = _ShimConfig()
        shim.model.cnn_feature_dim = 20
        shim.model.encoder_hidden_dim = 16
        shim.model.decoder_hidden_dim = 16
        shim.model.embedding_dim = 12
        shim.model.attention_dim = 16

        torch.manual_seed(3)
        ref_model = model_mod.VideoCaptioningModel(shim, VOCAB)
        ref_model.decoder.attention = ctor(shim)
        ref_model.eval()

        cfg = Config()
        cfg.model.cnn_feature_dim = 20
        cfg.model.encoder_hidden_dim = 16
        cfg.model.decoder_hidden_dim = 16
        cfg.model.embedding_dim = 12
        cfg.model.attention_dim = 16
        cfg.model.attention_type = kind
        cfg.model.attention_num_heads = 8  # reference MultiHeadAttention default
        cfg.data.max_vocab_size = VOCAB
        cfg.validate()

        params = import_reference_state_dict(ref_model.state_dict(), cfg)

        rs = np.random.RandomState(4)
        feats = rs.randn(B, T_FRAMES, 20).astype(np.float32)

        with torch.no_grad():
            ref_out = ref_model.generate(
                video_features=torch.from_numpy(feats),
                start_token_id=1, end_token_id=2,
                max_length=8, method="greedy",
            )
        ref_tokens = ref_out["generated_tokens"].numpy()

        enc, final, mask = captioner.encode(params, cfg, jnp.asarray(feats))
        ours = np.asarray(
            greedy_generate(params, cfg, enc, final, 1, 2, 8, mask)[
                "generated_tokens"
            ]
        )
        np.testing.assert_array_equal(
            ours[:, : ref_tokens.shape[1]], ref_tokens, err_msg=f"attention={kind}"
        )


def test_beam_search_matches_reference_single_video(ref_setup):
    """B=1, weight-ported: our fixed-shape beam must pick the same best
    sequence as the reference's host-side beam search. (At B=1 the
    reference's cross-batch selection bug is inert, so outputs are
    comparable; its live-pool semantics match ours: top-K over live
    expansions, END candidates leave the pool.)"""
    ref_model, cfg, params, feats = ref_setup
    from video_captioning_tpu.generation.beam import beam_search_generate
    from video_captioning_tpu.models import captioner as cap

    for beam_size, penalty, key in [(3, 1.0, 11), (5, 0.8, 12), (4, 1.2, 13)]:
        rs = np.random.RandomState(key)
        f1 = rs.randn(1, T_FRAMES, 20).astype(np.float32)

        with torch.no_grad():
            ref_out = ref_model.generate(
                video_features=torch.from_numpy(f1),
                start_token_id=1, end_token_id=2, max_length=8,
                method="beam", beam_size=beam_size, length_penalty=penalty,
            )
        ref_seq = ref_out["generated_tokens"][0].numpy().tolist()
        # Reference sequences include START and pad completed seqs with
        # START; trim trailing START padding after the first END.
        if 2 in ref_seq:
            ref_seq = ref_seq[: ref_seq.index(2) + 1]

        enc, final, mask = cap.encode(params, cfg, jnp.asarray(f1))
        ours = beam_search_generate(
            params, cfg, enc, final, 1, 2, 8, mask,
            beam_size=beam_size, length_penalty=penalty,
        )
        our_seq = np.asarray(ours["generated_tokens"][0]).tolist()
        if 2 in our_seq:
            our_seq = our_seq[: our_seq.index(2) + 1]

        assert our_seq == ref_seq, (
            f"beam={beam_size} penalty={penalty}: {our_seq} != {ref_seq}"
        )
