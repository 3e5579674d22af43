"""Model forward-pass shape/semantics tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_captioning_tpu.models import (
    apply_model,
    captioner,
    count_params,
    encode,
    init_model,
)

VOCAB = 23


@pytest.fixture
def params(tiny_config):
    return init_model(jax.random.PRNGKey(0), tiny_config, VOCAB)


def _features(tiny_config, B=3, key=1):
    return jax.random.normal(
        jax.random.PRNGKey(key), (B, 10, tiny_config.model.cnn_feature_dim)
    )


def test_forward_shapes(tiny_config, params):
    feats = _features(tiny_config)
    tokens = jnp.ones((3, 7), jnp.int32)
    out = apply_model(params, tiny_config, feats, tokens)
    assert out["logits"].shape == (3, 7, VOCAB)
    assert out["attention_weights"].shape == (3, 7, 10)
    assert out["encoder_outputs"].shape == (3, 10, tiny_config.model.encoder_hidden_dim)


def test_eval_deterministic(tiny_config, params):
    feats = _features(tiny_config)
    tokens = jnp.ones((3, 7), jnp.int32)
    a = apply_model(params, tiny_config, feats, tokens)["logits"]
    b = apply_model(params, tiny_config, feats, tokens)["logits"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_dropout_changes_output(tiny_config, params):
    feats = _features(tiny_config)
    tokens = jnp.ones((3, 7), jnp.int32)
    a = apply_model(
        params, tiny_config, feats, tokens, train=True, rng=jax.random.PRNGKey(1)
    )["logits"]
    b = apply_model(
        params, tiny_config, feats, tokens, train=True, rng=jax.random.PRNGKey(2)
    )["logits"]
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_masked_encode_ignores_padding(tiny_config, params):
    """Encoding [x ; garbage] with a mask must equal encoding x alone."""
    B, T_valid, T_full = 2, 6, 10
    F = tiny_config.model.cnn_feature_dim
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T_valid, F))
    garbage = 1e3 * jax.random.normal(jax.random.PRNGKey(4), (B, T_full - T_valid, F))
    x_padded = jnp.concatenate([x, garbage], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((B, T_valid)), jnp.zeros((B, T_full - T_valid))], axis=1
    )

    enc_full, final_full, _ = encode(params, tiny_config, x_padded, mask)
    enc_short, final_short, _ = encode(params, tiny_config, x)

    np.testing.assert_allclose(
        np.asarray(enc_full[:, :T_valid]), np.asarray(enc_short),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(final_full), np.asarray(final_short), rtol=1e-5, atol=1e-5
    )


def test_all_attention_types_forward(tiny_config):
    feats = _features(tiny_config)
    tokens = jnp.ones((3, 5), jnp.int32)
    for kind in ["bahdanau", "luong", "multihead"]:
        tiny_config.model.attention_type = kind
        tiny_config.validate()
        p = init_model(jax.random.PRNGKey(0), tiny_config, VOCAB)
        out = apply_model(p, tiny_config, feats, tokens)
        assert out["logits"].shape == (3, 5, VOCAB)
    tiny_config.model.attention_type = "bahdanau"


def test_luong_score_variants(tiny_config):
    feats = _features(tiny_config)
    tokens = jnp.ones((3, 4), jnp.int32)
    tiny_config.model.attention_type = "luong"
    for score in ["dot", "general", "concat"]:
        tiny_config.model.luong_score = score
        tiny_config.validate()
        p = init_model(jax.random.PRNGKey(0), tiny_config, VOCAB)
        out = apply_model(p, tiny_config, feats, tokens)
        assert out["logits"].shape == (3, 4, VOCAB)
    tiny_config.model.attention_type = "bahdanau"
    tiny_config.model.luong_score = "general"


def test_no_attention_path(tiny_config):
    tiny_config.model.use_attention = False
    p = init_model(jax.random.PRNGKey(0), tiny_config, VOCAB)
    out = apply_model(p, tiny_config, _features(tiny_config), jnp.ones((3, 5), jnp.int32))
    assert out["logits"].shape == (3, 5, VOCAB)
    assert out["attention_weights"] is None
    tiny_config.model.use_attention = True


def test_init_state_projection_when_dims_differ(tiny_config):
    tiny_config.model.decoder_hidden_dim = 24  # != encoder 16
    p = init_model(jax.random.PRNGKey(0), tiny_config, VOCAB)
    assert "init_state_projection" in p["decoder"]
    out = apply_model(p, tiny_config, _features(tiny_config), jnp.ones((3, 5), jnp.int32))
    assert out["logits"].shape == (3, 5, VOCAB)
    tiny_config.model.decoder_hidden_dim = 16


def test_grads_flow_everywhere(tiny_config, params):
    feats = _features(tiny_config)
    tokens = jnp.ones((3, 5), jnp.int32)

    def loss(p):
        return apply_model(p, tiny_config, feats, tokens)["logits"].sum()

    grads = jax.grad(loss)(params)
    zero_leaves = [
        path
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads)
        if float(jnp.abs(leaf).max()) == 0.0
    ]
    assert not zero_leaves, f"zero grads at {zero_leaves}"


def test_count_params(params):
    assert count_params(params) > 0


def test_attention_score_bf16_close_to_fp32(tiny_config, params):
    """Opt-in bf16 score path: same shapes, close numerics, and the config
    gate defaults off (token parity preserved by default)."""
    from video_captioning_tpu.models import attention as attn_mod

    feats = _features(tiny_config)
    enc_outs, final, mask = encode(params, tiny_config, feats)
    attn = params["decoder"]["attention"]
    cache = attn_mod.precompute(tiny_config, attn, enc_outs)
    dec_hidden = jnp.asarray(np.asarray(final))

    assert tiny_config.kernels.attention_score_bf16 is False
    ctx_ref, w_ref = attn_mod.attend(
        tiny_config, attn, cache, enc_outs, dec_hidden, mask
    )
    tiny_config.kernels.attention_score_bf16 = True
    ctx, w = attn_mod.attend(tiny_config, attn, cache, enc_outs, dec_hidden, mask)
    # beam path
    ctx_b, w_b = attn_mod.attend_beam(
        tiny_config, attn, cache, enc_outs, dec_hidden[:, None, :], mask
    )
    tiny_config.kernels.attention_score_bf16 = False

    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref), rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(ctx_b[:, 0]), np.asarray(ctx), rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# Hoisted teacher-forcing scan (decoder.py:apply_decoder): equivalence to a
# per-step decoder_core_step loop, and remat_attention value-invariance.
# --------------------------------------------------------------------------


def _stepwise_decoder(params, config, enc, fin, tokens, mask, *, train, rng):
    """Oracle: the pre-hoist apply_decoder semantics, built from the still-
    shipping decoder_core_step (used by the greedy/beam step paths)."""
    from video_captioning_tpu.models import attention as attn_mod
    from video_captioning_tpu.models import decoder as dec_mod
    from video_captioning_tpu.models.layers import apply_embedding, apply_linear, dropout

    B, T = tokens.shape
    state = dec_mod.init_hidden_state(params, config, fin)
    embedded_all = apply_embedding(params["embedding"], tokens)
    if train and rng is not None:
        emb_rng, rng = jax.random.split(rng)
        embedded_all = dropout(
            embedded_all, config.model.decoder_dropout, emb_rng, train
        )
    cache = (
        attn_mod.precompute(config, params["attention"], enc)
        if config.model.use_attention
        else {}
    )
    outs, weights = [], []
    for t in range(T):
        step_rng = (
            jax.random.fold_in(rng, t) if (train and rng is not None) else None
        )
        pre_vocab, state, w = dec_mod.decoder_core_step(
            params, config, embedded_all[:, t], state, enc, cache, mask,
            train=train, rng=step_rng,
        )
        outs.append(pre_vocab)
        weights.append(w)
    logits = apply_linear(params["output_projection"], jnp.stack(outs, axis=1))
    return logits, (jnp.stack(weights, axis=1) if weights[0] is not None else None)


@pytest.mark.parametrize("attn_type", ["bahdanau", "luong", "multihead"])
@pytest.mark.parametrize("train", [False, True])
def test_apply_decoder_matches_stepwise(tiny_config, attn_type, train):
    """The hoisted scan (embedding gate-projection + deep-output head moved
    out of the loop) reproduces per-step decoder_core_step semantics —
    values, attention weights, and gradients (same dropout streams)."""
    from video_captioning_tpu.models import decoder as dec_mod

    cfg = tiny_config
    cfg.model.attention_type = attn_type
    params = dec_mod.init_decoder(jax.random.PRNGKey(3), cfg, VOCAB)
    B, S, T = 3, 10, 6
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, S, cfg.model.encoder_hidden_dim))
    fin = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.model.encoder_hidden_dim))
    tokens = jax.random.randint(jax.random.PRNGKey(4), (B, T), 0, VOCAB)
    mask = np.ones((B, S), np.float32)
    mask[1, 7:] = 0
    mask = jnp.asarray(mask)
    rng = jax.random.PRNGKey(42) if train else None

    def loss_new(p):
        out = dec_mod.apply_decoder(
            p, cfg, enc, fin, tokens, mask, train=train, rng=rng
        )
        return jnp.sum(out["logits"] ** 2), out

    def loss_ref(p):
        logits, w = _stepwise_decoder(
            p, cfg, enc, fin, tokens, mask, train=train, rng=rng
        )
        return jnp.sum(logits**2), (logits, w)

    (_, out), g_new = jax.value_and_grad(loss_new, has_aux=True)(params)
    (_, (logits_ref, w_ref)), g_ref = jax.value_and_grad(loss_ref, has_aux=True)(params)

    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(logits_ref), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["attention_weights"]), np.asarray(w_ref), rtol=1e-5, atol=1e-6
    )
    gscale = max(
        float(jnp.abs(leaf).max()) for leaf in jax.tree_util.tree_leaves(g_ref)
    )
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_new), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6 * gscale,
            err_msg=jax.tree_util.keystr(path),
        )


def test_remat_attention_is_value_invariant(tiny_config):
    """training.remat_attention changes residual staging only — logits and
    gradients are bitwise identical with it on or off."""
    from video_captioning_tpu.models import decoder as dec_mod

    cfg = tiny_config
    params = dec_mod.init_decoder(jax.random.PRNGKey(3), cfg, VOCAB)
    B, S, T = 3, 10, 6
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, S, cfg.model.encoder_hidden_dim))
    fin = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.model.encoder_hidden_dim))
    tokens = jax.random.randint(jax.random.PRNGKey(4), (B, T), 0, VOCAB)
    rng = jax.random.PRNGKey(42)

    def run():
        def loss(p):
            out = dec_mod.apply_decoder(
                p, cfg, enc, fin, tokens, None, train=True, rng=rng
            )
            return jnp.sum(out["logits"] ** 2)

        return jax.value_and_grad(loss)(params)

    assert cfg.training.remat_attention is True
    l_on, g_on = run()
    cfg.training.remat_attention = False
    try:
        l_off, g_off = run()
    finally:
        cfg.training.remat_attention = True

    assert float(l_on) == float(l_off)
    for a, b in zip(jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("attention", ["bahdanau", "luong", "multihead"])
def test_bf16_compute_all_attention_types(tiny_config, attention):
    """Teacher forcing AND both decode loops must run end-to-end with
    bfloat16 params/activations for every attention type. Regression for
    the round-5 quality_rank crash: multihead attention promoted its
    context to f32 (the fp32 scalar score divisor), so every bf16 scan/
    while carry failed its dtype check — bahdanau/luong had out-casts,
    multihead didn't."""
    from video_captioning_tpu import generation

    cfg = tiny_config
    cfg.model.attention_type = attention
    cfg.validate()
    params = init_model(jax.random.PRNGKey(0), cfg, VOCAB)
    params16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    feats = _features(cfg).astype(jnp.bfloat16)
    tokens = jnp.ones((3, 7), jnp.int32)

    out = apply_model(params16, cfg, feats, tokens)
    assert out["logits"].dtype == jnp.bfloat16
    # And through grad (the training path the crash hit):
    def loss(p):
        return apply_model(p, cfg, feats, tokens)["logits"].astype(
            jnp.float32).sum()
    g = jax.grad(loss)(params16)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda x: bool(jnp.all(jnp.isfinite(x.astype(jnp.float32)))), g))

    for method in ("greedy", "beam"):
        r = generation.generate(params16, cfg, feats, 1, 2, method=method)
        assert r["generated_tokens"].shape[0] == 3
