"""Pallas kernel correctness vs the XLA reference paths (interpreter mode
on CPU; the real-TPU check runs in benchmarks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_captioning_tpu.models import attention as attn_mod
from video_captioning_tpu.ops.attention_pallas import bahdanau_attend_pallas


def _bahdanau_setup(B=6, S=10, D=16, A=16, E=16, seed=0):
    cfg_key = jax.random.PRNGKey(seed)
    ks = jax.random.split(cfg_key, 6)
    dec_hidden = jax.random.normal(ks[0], (B, D))
    w_d = jax.random.normal(ks[1], (D, A)) * 0.3
    b_d = jax.random.normal(ks[2], (A,)) * 0.1
    enc_outs = jax.random.normal(ks[3], (B, S, E))
    w_e = jax.random.normal(ks[4], (E, A)) * 0.3
    v = jax.random.normal(ks[5], (A,)) * 0.3
    b_v = jnp.asarray(0.05)
    enc_proj = enc_outs @ w_e
    return dec_hidden, w_d, b_d, enc_proj, enc_outs, v, b_v


def _xla_reference(dec_hidden, w_d, b_d, enc_proj, enc_outs, v, b_v, mask):
    dec_proj = dec_hidden @ w_d + b_d
    combined = jnp.tanh(enc_proj + dec_proj[:, None, :])
    scores = combined @ v + b_v
    if mask is not None:
        scores = jnp.where(mask > 0, scores, -1e9)
    weights = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum("bs,bse->be", weights, enc_outs)
    return context, weights


@pytest.mark.parametrize("B", [1, 6, 8, 13])
def test_pallas_attention_matches_xla(B):
    args = _bahdanau_setup(B=B)
    mask = None
    ctx_ref, w_ref = _xla_reference(*args, mask)
    ctx, w = bahdanau_attend_pallas(*args, mask, block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=1e-5, atol=1e-5)


def test_pallas_attention_with_mask():
    args = _bahdanau_setup(B=4)
    mask = jnp.asarray(
        np.array([[1] * 10, [1] * 4 + [0] * 6, [1] * 7 + [0] * 3, [1] * 10],
                 dtype=np.float32)
    )
    ctx_ref, w_ref = _xla_reference(*args, mask)
    ctx, w = bahdanau_attend_pallas(*args, mask, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=1e-5, atol=1e-5)
    # masked positions carry ~zero weight
    assert float(np.asarray(w)[1, 4:].sum()) < 1e-6


def test_pallas_gate_in_attend(tiny_config):
    """config.kernels.use_pallas_attention routes attend() through the
    kernel and must agree with the XLA path."""
    from video_captioning_tpu.models import init_model

    tiny_config.kernels.interpret = True
    params = init_model(jax.random.PRNGKey(0), tiny_config, 19)
    attn = params["decoder"]["attention"]

    enc_outs = jax.random.normal(jax.random.PRNGKey(1), (5, 10, 16))
    dec_hidden = jax.random.normal(jax.random.PRNGKey(2), (5, 16))
    mask = jnp.ones((5, 10))
    cache = attn_mod.precompute(tiny_config, attn, enc_outs)

    tiny_config.kernels.use_pallas_attention = False
    ctx_ref, w_ref = attn_mod.attend(
        tiny_config, attn, cache, enc_outs, dec_hidden, mask
    )
    tiny_config.kernels.use_pallas_attention = True
    ctx, w = attn_mod.attend(tiny_config, attn, cache, enc_outs, dec_hidden, mask)
    tiny_config.kernels.use_pallas_attention = False

    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=1e-5, atol=1e-5)


def test_pallas_lstm_cell_matches_xla():
    from video_captioning_tpu.models import layers
    from video_captioning_tpu.ops.lstm_pallas import lstm_cell_pallas

    key = jax.random.PRNGKey(5)
    layer = layers.init_lstm_layer(key, 24, 16)
    rs = np.random.RandomState(5)
    for B in [1, 4, 9]:
        x = jnp.asarray(rs.randn(B, 24).astype(np.float32))
        h = jnp.asarray(rs.randn(B, 16).astype(np.float32))
        c = jnp.asarray(rs.randn(B, 16).astype(np.float32))
        h_ref, c_ref = layers.lstm_cell(layer, x, h, c)
        h_new, c_new = lstm_cell_pallas(layer, x, h, c, block_b=4, interpret=True)
        np.testing.assert_allclose(np.asarray(h_new), np.asarray(h_ref), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_new), np.asarray(c_ref), rtol=1e-5, atol=1e-5)


def test_pallas_gates_full_greedy_decode(tiny_config):
    """Both kernel gates on: greedy decode must match the XLA decode."""
    from video_captioning_tpu.generation.greedy import greedy_generate
    from video_captioning_tpu.models import captioner, init_model

    params = init_model(jax.random.PRNGKey(0), tiny_config, 19)
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, 10, tiny_config.model.cnn_feature_dim))
    enc, final, mask = captioner.encode(params, tiny_config, feats)

    ref = np.asarray(greedy_generate(params, tiny_config, enc, final, 1, 2, 8, mask)["generated_tokens"])

    tiny_config.kernels.use_pallas_attention = True
    tiny_config.kernels.use_pallas_lstm = True
    tiny_config.kernels.interpret = True
    got = np.asarray(greedy_generate(params, tiny_config, enc, final, 1, 2, 8, mask)["generated_tokens"])
    tiny_config.kernels.use_pallas_attention = False
    tiny_config.kernels.use_pallas_lstm = False
    tiny_config.kernels.interpret = False

    np.testing.assert_array_equal(got, ref)
