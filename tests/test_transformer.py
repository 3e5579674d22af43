"""Transformer model family: forward semantics, incremental-decode parity,
generation correctness (greedy oracle, exhaustive beam), TP/DP sharding
equivalence, and trainer/predictor integration.

No reference analog — the reference (src/models/*) is LSTM-only; this
family is selected with ``config.model.architecture = "transformer"`` and
must behave identically through every shared surface (captioner API,
generation methods, trainer, checkpoints, predictor).
"""

import itertools

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from video_captioning_tpu.generation.beam import beam_search_generate
from video_captioning_tpu.generation.greedy import greedy_generate
from video_captioning_tpu.generation.sampling import sample_generate
from video_captioning_tpu.models import captioner, init_model
from video_captioning_tpu.models import transformer as tr
from video_captioning_tpu.parallel import make_mesh, param_specs
from jax.sharding import PartitionSpec as P

START, END = 1, 2
VOCAB = 32


@pytest.fixture
def tr_config(tiny_config):
    cfg = tiny_config
    cfg.model.architecture = "transformer"
    cfg.model.embedding_dim = cfg.model.decoder_hidden_dim  # tied to d_model
    cfg.model.transformer_num_layers = 2
    cfg.model.transformer_decoder_layers = 2
    cfg.model.transformer_num_heads = 4
    cfg.model.transformer_dropout = 0.1
    cfg.validate()
    return cfg


def _setup(cfg, vocab=VOCAB, B=2, key=0):
    params = init_model(jax.random.PRNGKey(key), cfg, vocab)
    feats = jax.random.normal(
        jax.random.PRNGKey(key + 1), (B, 10, cfg.model.cnn_feature_dim)
    )
    enc_outs, final, mask = captioner.encode(params, cfg, feats)
    return params, feats, enc_outs, final, mask


# --------------------------------------------------------------------------
# Forward semantics
# --------------------------------------------------------------------------


def test_forward_shapes(tr_config):
    params, feats, enc_outs, final, mask = _setup(tr_config, B=3)
    D = tr_config.model.decoder_hidden_dim
    assert enc_outs.shape == (3, 10, D)
    assert final.shape == (3, D)

    toks = jnp.zeros((3, 7), jnp.int32)
    out = captioner.apply_model(params, tr_config, feats, toks)
    assert out["logits"].shape == (3, 7, VOCAB)
    assert out["attention_weights"].shape == (3, 7, 10)
    assert bool(jnp.all(jnp.isfinite(out["logits"])))


def test_padded_frames_do_not_affect_logits(tr_config):
    """Content at masked (padded) frame positions must be invisible to both
    the encoder self-attention and the decoder cross-attention."""
    params, feats, _, _, _ = _setup(tr_config, B=2)
    feats = np.asarray(feats)
    mask = np.ones((2, 10), np.float32)
    mask[:, 7:] = 0.0

    toks = jnp.zeros((2, 5), jnp.int32)
    out_a = captioner.apply_model(
        params, tr_config, jnp.asarray(feats), toks, jnp.asarray(mask)
    )
    feats_b = feats.copy()
    feats_b[:, 7:] = 99.0  # garbage in the padded slots
    out_b = captioner.apply_model(
        params, tr_config, jnp.asarray(feats_b), toks, jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(out_a["logits"]), np.asarray(out_b["logits"]),
        rtol=1e-5, atol=1e-5,
    )


def test_decoder_causality(tr_config):
    """Changing the input token at position j must leave logits at
    positions < j bit-unchanged (causal self-attention)."""
    params, _, enc_outs, _, mask = _setup(tr_config, B=2)
    dec = params["decoder"]
    T = 6
    toks_a = jnp.asarray(
        np.random.RandomState(0).randint(0, VOCAB, (2, T)), jnp.int32
    )
    j = 3
    toks_b = toks_a.at[:, j].set((toks_a[:, j] + 1) % VOCAB)

    la = tr.apply_transformer_decoder(dec, tr_config, enc_outs, toks_a, mask)["logits"]
    lb = tr.apply_transformer_decoder(dec, tr_config, enc_outs, toks_b, mask)["logits"]
    np.testing.assert_array_equal(np.asarray(la[:, :j]), np.asarray(lb[:, :j]))
    # and it must actually change position j (sanity that the test bites)
    assert not np.allclose(np.asarray(la[:, j]), np.asarray(lb[:, j]))


def test_dropout_train_eval_modes(tr_config):
    """train=True with an rng perturbs outputs; eval is deterministic."""
    params, feats, _, _, _ = _setup(tr_config, B=2)
    toks = jnp.zeros((2, 5), jnp.int32)
    e1 = captioner.apply_model(params, tr_config, feats, toks)["logits"]
    e2 = captioner.apply_model(params, tr_config, feats, toks)["logits"]
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = captioner.apply_model(
        params, tr_config, feats, toks, train=True, rng=jax.random.PRNGKey(0)
    )["logits"]
    assert not np.allclose(np.asarray(e1), np.asarray(t1))


# --------------------------------------------------------------------------
# Incremental decode == parallel decode
# --------------------------------------------------------------------------


def test_incremental_decode_matches_parallel(tr_config):
    """The KV-cache decode_step at position t must reproduce column t of
    the fully parallel teacher-forcing pass (eval mode)."""
    params, _, enc_outs, _, mask = _setup(tr_config, B=2)
    dec = params["decoder"]
    T = 7
    toks = jnp.asarray(
        np.random.RandomState(1).randint(0, VOCAB, (2, T)), jnp.int32
    )
    want = tr.apply_transformer_decoder(dec, tr_config, enc_outs, toks, mask)

    cross_kv = tr.precompute_cross_kv(dec, enc_outs)
    state = tr.init_decode_state(dec, tr_config, 2, enc_outs.dtype)
    for t in range(T):
        logits, state, w = tr.decode_step(
            dec, tr_config, toks[:, t], state, jnp.int32(t), cross_kv, mask
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(want["logits"][:, t]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(want["attention_weights"][:, t]),
            rtol=1e-5, atol=1e-5,
        )


# --------------------------------------------------------------------------
# Generation
# --------------------------------------------------------------------------


def _manual_greedy(params, config, enc_outs, mask, max_len):
    """Oracle: grow the prefix and re-run the PARALLEL decoder each step —
    no KV cache involved, so it cross-checks the whole incremental path."""
    dec = params["decoder"]
    B = enc_outs.shape[0]
    toks = [np.full((B,), START, np.int32)]
    for _ in range(max_len):
        inp = jnp.asarray(np.stack(toks, axis=1), jnp.int32)
        out = tr.apply_transformer_decoder(dec, config, enc_outs, inp, mask)
        nxt = np.asarray(jnp.argmax(out["logits"][:, -1], axis=-1), np.int32)
        toks.append(nxt)
        if (nxt == END).all():
            break
    return np.stack(toks[1:], axis=1)


def test_greedy_matches_parallel_oracle(tr_config):
    params, _, enc_outs, final, mask = _setup(tr_config)
    got = np.asarray(
        greedy_generate(params, tr_config, enc_outs, final, START, END, 8, mask)[
            "generated_tokens"
        ]
    )
    want = _manual_greedy(params, tr_config, enc_outs, mask, 8)
    np.testing.assert_array_equal(got[:, : want.shape[1]], want)


def _sequence_logprob(params, config, enc_outs, mask, tokens):
    """Teacher-forced log-prob of `tokens` (ending with END) for item 0 —
    one parallel pass."""
    dec = params["decoder"]
    inp = jnp.asarray([[START] + list(tokens[:-1])], jnp.int32)
    inp = jnp.broadcast_to(inp, (enc_outs.shape[0], inp.shape[1]))
    out = tr.apply_transformer_decoder(dec, config, enc_outs, inp, mask)
    logp = jax.nn.log_softmax(out["logits"].astype(jnp.float32), axis=-1)
    return sum(float(logp[0, i, tok]) for i, tok in enumerate(tokens))


@pytest.mark.slow
def test_beam_matches_exhaustive_search(tr_config):
    """Beam >= number of live prefixes == exhaustive: best hypothesis must
    equal brute-force argmax of the length-penalized sequence score."""
    V, max_len, K, alpha = 6, 3, 30, 0.7
    params, _, enc_outs, final, mask = _setup(tr_config, vocab=V, B=1, key=7)

    out = beam_search_generate(
        params, tr_config, enc_outs, final, START, END, max_len, mask,
        beam_size=K, length_penalty=alpha,
    )
    got_tokens = np.asarray(out["generated_tokens"][0]).tolist()
    got_score = float(np.asarray(out["all_scores"][0]).max())

    best_score, best_seq = -np.inf, None
    non_end = [t for t in range(V) if t != END]
    for gen_len in range(1, max_len + 1):
        for prefix in itertools.product(non_end, repeat=gen_len - 1):
            seq = list(prefix) + [END]
            lp = _sequence_logprob(params, tr_config, enc_outs, mask, seq)
            score = lp / (gen_len ** alpha)
            if score > best_score:
                best_score, best_seq = score, seq

    assert abs(got_score - best_score) < 1e-3, (got_score, best_score)
    np.testing.assert_array_equal(got_tokens[1 : 1 + len(best_seq)], best_seq)


def test_beam_batch_items_independent(tr_config):
    params, _, enc_outs, final, mask = _setup(tr_config, B=3, key=3)
    full = beam_search_generate(
        params, tr_config, enc_outs, final, START, END, 6, mask, beam_size=4
    )["generated_tokens"]
    for i in range(3):
        solo = beam_search_generate(
            params, tr_config, enc_outs[i : i + 1], final[i : i + 1], START,
            END, 6, mask[i : i + 1], beam_size=4,
        )["generated_tokens"]
        np.testing.assert_array_equal(np.asarray(full[i]), np.asarray(solo[0]))


def test_lazy_rebeam_matches_physical_rebeam(tr_config):
    """The ancestry-indexed (lazy) KV rebeam must reproduce the physical
    cache-gather path exactly: same tokens, same completed register, same
    scores. Run at several beam sizes and with a ragged mask so dead
    beams, END completions, and masked frames all cross the rebeam."""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=3, key=11)
    ragged = mask.at[1, 6:].set(0)
    for K in (2, 4, 7):
        tr_config.kernels.transformer_lazy_rebeam = True
        lazy = beam_search_generate(
            params, tr_config, enc_outs, final, START, END, 6, ragged,
            beam_size=K, length_penalty=0.8,
        )
        tr_config.kernels.transformer_lazy_rebeam = False
        phys = beam_search_generate(
            params, tr_config, enc_outs, final, START, END, 6, ragged,
            beam_size=K, length_penalty=0.8,
        )
        tr_config.kernels.transformer_lazy_rebeam = True
        np.testing.assert_array_equal(
            np.asarray(lazy["generated_tokens"]),
            np.asarray(phys["generated_tokens"]),
        )
        np.testing.assert_array_equal(
            np.asarray(lazy["all_tokens"]), np.asarray(phys["all_tokens"])
        )
        np.testing.assert_allclose(
            np.asarray(lazy["all_scores"]), np.asarray(phys["all_scores"]),
            rtol=0, atol=1e-5,
        )


def test_cache_bf16_lazy_matches_physical(tr_config):
    """With bf16 cache storage (kernels.transformer_cache_bf16) the lazy
    ancestry rebeam and the physical cache-gather rebeam must STILL be
    bit-identical to each other: both store the same bf16-rounded K/V rows
    and compute the same bf16-operand/fp32-accumulate dots; gathering
    rounds nothing."""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=3, key=5)
    tr_config.kernels.transformer_cache_bf16 = True
    try:
        tr_config.kernels.transformer_lazy_rebeam = True
        lazy = beam_search_generate(
            params, tr_config, enc_outs, final, START, END, 6, mask,
            beam_size=4, length_penalty=1.0,
        )
        tr_config.kernels.transformer_lazy_rebeam = False
        phys = beam_search_generate(
            params, tr_config, enc_outs, final, START, END, 6, mask,
            beam_size=4, length_penalty=1.0,
        )
    finally:
        tr_config.kernels.transformer_cache_bf16 = False
        tr_config.kernels.transformer_lazy_rebeam = True
    np.testing.assert_array_equal(
        np.asarray(lazy["generated_tokens"]),
        np.asarray(phys["generated_tokens"]),
    )
    np.testing.assert_allclose(
        np.asarray(lazy["all_scores"]), np.asarray(phys["all_scores"]),
        rtol=0, atol=1e-5,
    )


def test_cache_bf16_token_agreement(tr_config):
    """bf16 cache storage only rounds the STORED K/V (the dots already run
    on bf16 operands under DEFAULT TPU precision); at this scale and seed
    the greedy and beam tokens must agree with fp32 cache storage, and the
    scores must be close. (Token identity is not contractual for the flag
    — this pins the fixed-seed behavior so a regression that silently
    widens the divergence trips.)"""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=4, key=7)
    outs = {}
    for flag in (False, True):
        tr_config.kernels.transformer_cache_bf16 = flag
        try:
            g = greedy_generate(
                params, tr_config, enc_outs, final, START, END, 8, mask)
            b = beam_search_generate(
                params, tr_config, enc_outs, final, START, END, 8, mask,
                beam_size=3, length_penalty=1.0,
            )
        finally:
            tr_config.kernels.transformer_cache_bf16 = False
        outs[flag] = (g, b)
    np.testing.assert_array_equal(
        np.asarray(outs[False][0]["generated_tokens"]),
        np.asarray(outs[True][0]["generated_tokens"]),
    )
    np.testing.assert_array_equal(
        np.asarray(outs[False][1]["generated_tokens"]),
        np.asarray(outs[True][1]["generated_tokens"]),
    )
    np.testing.assert_allclose(
        np.asarray(outs[False][1]["all_scores"]),
        np.asarray(outs[True][1]["all_scores"]),
        rtol=0, atol=0.02,
    )


def test_cross_kv_bf16_token_agreement(tr_config):
    """kernels.transformer_cross_kv_bf16 only rounds the stored cross-K/V
    to bf16 (greedy: plain (B, S, D) cast; beam: the (B, h, dh, S)
    operand-layout pre-staging — families.py routes each). The dots run on
    bf16 operands under DEFAULT TPU precision either way, so at this scale
    and seed greedy and beam tokens must agree with the flag off, and the
    scores must be close. Pins the fixed-seed behavior, as for
    transformer_cache_bf16 above."""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=4, key=7)
    outs = {}
    for flag in (False, True):
        tr_config.kernels.transformer_cross_kv_bf16 = flag
        try:
            g = greedy_generate(
                params, tr_config, enc_outs, final, START, END, 8, mask)
            b = beam_search_generate(
                params, tr_config, enc_outs, final, START, END, 8, mask,
                beam_size=3, length_penalty=1.0,
            )
        finally:
            tr_config.kernels.transformer_cross_kv_bf16 = False
        outs[flag] = (g, b)
    np.testing.assert_array_equal(
        np.asarray(outs[False][0]["generated_tokens"]),
        np.asarray(outs[True][0]["generated_tokens"]),
    )
    np.testing.assert_array_equal(
        np.asarray(outs[False][1]["generated_tokens"]),
        np.asarray(outs[True][1]["generated_tokens"]),
    )
    np.testing.assert_allclose(
        np.asarray(outs[False][1]["all_scores"]),
        np.asarray(outs[True][1]["all_scores"]),
        rtol=0, atol=0.02,
    )


def test_beam_params_f32_upcast_token_agreement(tr_config):
    """kernels.transformer_beam_params_f32 upcasts bf16 decoder params to
    fp32 for the beam loop (once per call). Weight VALUES are unchanged,
    so at this scale and seed the beam tokens must agree with the flag
    off, and greedy (which never upcasts) must be unaffected."""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=4, key=9)
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    enc_bf16, final_bf16, _ = captioner.encode(
        params_bf16, tr_config, feats.astype(jnp.bfloat16))
    outs = {}
    for flag in (False, True):
        tr_config.kernels.transformer_beam_params_f32 = flag
        try:
            b = beam_search_generate(
                params_bf16, tr_config, enc_bf16, final_bf16, START, END, 8,
                mask, beam_size=3, length_penalty=1.0,
            )
        finally:
            tr_config.kernels.transformer_beam_params_f32 = True
        outs[flag] = b
    np.testing.assert_array_equal(
        np.asarray(outs[False]["generated_tokens"]),
        np.asarray(outs[True]["generated_tokens"]),
    )
    np.testing.assert_allclose(
        np.asarray(outs[False]["all_scores"]),
        np.asarray(outs[True]["all_scores"]),
        rtol=0, atol=0.05,
    )


def test_cross_kv_operand_layout_matches_plain(tr_config):
    """_cross_attn_step_operand over the (B, h, dh, S) pre-transposed K/V
    must equal _cross_attn_step over the same values in (B, S, D) form —
    layout is a performance decision, not a numeric one. Compared in f32
    so the check isolates the transpose/reshape math (bf16 rounding
    behavior is pinned by test_cross_kv_bf16_token_agreement)."""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=3, key=13)
    heads = tr_config.model.transformer_num_heads
    dec = params["decoder"]
    blk = dec["blocks"][0]["cross_attn"]
    B, S, D = enc_outs.shape
    K = 4
    dh = D // heads

    ck = tr.apply_linear(blk["wk"], enc_outs)
    cv = tr.apply_linear(blk["wv"], enc_outs)
    x = jax.random.normal(jax.random.PRNGKey(21), (B * K, D))

    out_plain, w_plain = tr._cross_attn_step(blk, x, ck, cv, mask, heads)

    def to_operand(t):  # same transpose as precompute_cross_kv, minus bf16
        return t.reshape(B, S, heads, dh).transpose(0, 2, 3, 1)

    out_op, w_op = tr._cross_attn_step_operand(
        blk, x, to_operand(ck), to_operand(cv), mask, heads)

    np.testing.assert_allclose(
        np.asarray(out_op), np.asarray(out_plain), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(w_op), np.asarray(w_plain), rtol=1e-5, atol=1e-5)


def test_beam_fused_vocab_topk_path_transformer(tr_config):
    """The fused vocab-projection+top-k Pallas path (taken on TPU) must be
    token-identical to the XLA path for the transformer family too — its
    pre-vocab hidden feeds the same kernel via family.step_beam_core."""
    import unittest.mock as mock

    import video_captioning_tpu.generation.beam as beam_mod
    from video_captioning_tpu.ops import vocab_topk_pallas as vtp

    cfg = tr_config
    params, _, enc_outs, final, mask = _setup(cfg, B=3, key=9)
    ref = beam_mod.beam_search_generate(
        params, cfg, enc_outs, final, START, END, 8, mask, beam_size=4
    )

    cfg.kernels.use_fused_vocab_topk = True
    orig = vtp.vocab_topk_lse
    try:
        with mock.patch.object(jax, "default_backend", return_value="tpu"), \
             mock.patch.object(
                 vtp, "vocab_topk_lse",
                 lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
             ):
            got = beam_mod.beam_search_generate(
                params, cfg, enc_outs, final, START, END, 8, mask, beam_size=4
            )
    finally:
        cfg.kernels.use_fused_vocab_topk = False

    np.testing.assert_array_equal(
        np.asarray(got["generated_tokens"]), np.asarray(ref["generated_tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(got["all_scores"]), np.asarray(ref["all_scores"]),
        rtol=5e-2, atol=5e-2,
    )


def test_sampling_logprobs_match_teacher_forcing(tr_config):
    """sample_generate's accumulated logprob must equal the teacher-forced
    log-prob of the sequence it sampled (temperature 1, no top-k)."""
    params, _, enc_outs, final, mask = _setup(tr_config, B=1, key=5)
    out = sample_generate(
        params, tr_config, enc_outs, final, START, END, 8, mask,
        rng=jax.random.PRNGKey(11),
    )
    toks = np.asarray(out["generated_tokens"][0]).tolist()
    # truncate at END (inclusive); drop PAD tail
    seq = []
    for t in toks:
        seq.append(t)
        if t == END:
            break
    assert seq, toks
    # Teacher-forced log-prob of exactly the generated prefix.
    inp = jnp.asarray([[START] + seq[:-1]], jnp.int32)
    o = tr.apply_transformer_decoder(
        params["decoder"], tr_config, enc_outs, inp, mask
    )
    logp = jax.nn.log_softmax(o["logits"].astype(jnp.float32), axis=-1)
    want = sum(float(logp[0, i, tok]) for i, tok in enumerate(seq))
    np.testing.assert_allclose(float(out["logprobs"][0]), want, rtol=1e-4)


# --------------------------------------------------------------------------
# Sharding: the transformer rides the same (data, model) mesh specs
# --------------------------------------------------------------------------


def test_param_specs_target_vocab_matrices(tr_config):
    params = init_model(jax.random.PRNGKey(0), tr_config, VOCAB)
    specs = param_specs(params)
    assert specs["decoder"]["embedding"]["table"] == P("model", None)
    assert specs["decoder"]["output_projection"]["kernel"] == P(None, "model")
    assert specs["decoder"]["output_projection"]["bias"] == P("model")
    assert specs["encoder"]["feature_projection"]["kernel"] == P()
    assert specs["decoder"]["blocks"][0]["self_attn"]["wq"]["kernel"] == P()


def _loss_and_grads(cfg, mesh, params, batch):
    from video_captioning_tpu.parallel import param_shardings, shard_batch
    from video_captioning_tpu.training import losses

    shardings = param_shardings(mesh, params)
    params = jax.tree_util.tree_map(jax.device_put, params, shardings)

    def loss_fn(p, batch):
        out = captioner.apply_model(
            p, cfg, batch["video_features"], batch["input_tokens"]
        )
        return losses.label_smoothed_cross_entropy(
            out["logits"], batch["target_tokens"], 0, 0.1
        )

    device_batch = shard_batch(mesh, batch)
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, device_batch)
    return (
        float(loss),
        [np.asarray(x) for x in jax.tree_util.tree_leaves(grads)],
    )


def test_tp_matches_dp(tr_config):
    """One transformer fwd+bwd: DP-only == DP×TP numerically (XLA inserts
    different collectives; the math cannot change). Gradients — not
    post-Adam params — are compared: Adam's g/sqrt(v) normalization blows
    fp32 reduction-order noise on near-zero grads up to sign scale."""
    cfg = tr_config
    params = init_model(jax.random.PRNGKey(0), cfg, VOCAB)
    rs = np.random.RandomState(0)
    batch = {
        "video_features": rs.randn(8, 10, cfg.model.cnn_feature_dim).astype(np.float32),
        "input_tokens": rs.randint(0, VOCAB, (8, 6)).astype(np.int32),
        "target_tokens": rs.randint(0, VOCAB, (8, 6)).astype(np.int32),
    }

    cfg.parallel.model_axis = 1
    cfg.parallel.data_axis = 4
    loss_dp, grads_dp = _loss_and_grads(cfg, make_mesh(cfg), params, batch)

    cfg.parallel.model_axis = 2
    cfg.parallel.data_axis = 4
    loss_tp, grads_tp = _loss_and_grads(cfg, make_mesh(cfg), params, batch)

    assert abs(loss_dp - loss_tp) < 1e-5, (loss_dp, loss_tp)
    for a, b in zip(grads_dp, grads_tp):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------------
# Trainer + checkpoint + predictor integration
# --------------------------------------------------------------------------


@pytest.mark.slow
def test_trainer_memorizes_and_predictor_roundtrips(tr_config, tmp_path):
    from video_captioning_tpu.data.pipeline import create_data_loaders
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.inference import VideoCaptionPredictor
    from video_captioning_tpu.training import VideoCaptioningTrainer
    from video_captioning_tpu.utils.checkpoint import CheckpointManager

    cfg = tr_config
    cfg.data.vocab_threshold = 1
    cfg.training.batch_size = 4
    cfg.training.learning_rate = 2e-3
    cfg.experiment.checkpoint_dir = tmp_path / "ckpt"
    cfg.experiment.use_tensorboard = False
    cfg.experiment.use_wandb = False
    cfg.validate()

    captions = [
        "a man is running",
        "a dog is barking",
        "a cat is sleeping",
        "a bird is flying",
    ]
    rs = np.random.RandomState(0)
    patterns = rs.randn(4, cfg.model.cnn_feature_dim).astype(np.float32)
    rows = []
    for i in range(16):
        cls = i % 4
        feats = patterns[cls][None].repeat(cfg.data.frames_per_video, 0)
        feats = feats + 0.01 * rs.randn(*feats.shape).astype(np.float32)
        path = tmp_path / f"v{i}.npy"
        np.save(path, feats)
        rows.append(
            {"video_id": f"v{i}", "video_path": "", "feature_path": str(path),
             "caption": captions[cls]}
        )
    df = pd.DataFrame(rows)
    vocab = Vocabulary(cfg)
    vocab.build_vocabulary(captions)
    train_loader, val_loader, _ = create_data_loaders(
        cfg, vocab, df.iloc[:12], df.iloc[12:]
    )
    params = init_model(jax.random.PRNGKey(0), cfg, len(vocab))

    mesh = make_mesh(cfg, jax.devices()[:4])
    trainer = VideoCaptioningTrainer(
        params, cfg, vocab, train_loader, val_loader, mesh=mesh
    )
    first = trainer.train_epoch()
    for _ in range(14):
        trainer.current_epoch += 1
        last = trainer.train_epoch()
    assert last["loss"] < first["loss"] * 0.7, (first, last)

    val = trainer.validate_epoch()
    assert val["bleu_1"] > 0.3, val

    # Inference package → predictor, both methods.
    mgr = CheckpointManager(cfg.experiment.checkpoint_dir)
    pkg_path = mgr.save_model_for_inference(trainer.params, vocab, cfg)
    predictor = VideoCaptionPredictor(pkg_path)
    feats0 = np.load(df.iloc[0]["feature_path"])
    greedy = predictor.predict_from_features(feats0, method="greedy", max_length=8)
    assert isinstance(greedy["caption"], str) and greedy["tokens"]
    beam = predictor.predict_from_features(
        feats0, method="beam", max_length=8, beam_size=3
    )
    assert isinstance(beam["caption"], str)
    multi = predictor.generate_multiple_captions(
        feats0, num_captions=3, method="beam", beam_size=5, max_length=8
    )
    assert len(multi) == 3 and multi[0]["score"] >= multi[-1]["score"]


def test_fused_beam_attention_matches_xla_path(tr_config):
    """kernels.transformer_fused_beam_attn (interpret mode on CPU): the
    Pallas ancestry-select self-attention + one-query cross-attention
    kernels must reproduce the XLA lazy-rebeam path — same tokens, same
    completed register, scores equal to fp32 tolerance — across beam
    sizes and a ragged mask."""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=3, key=13)
    ragged = mask.at[1, 6:].set(0)
    for K in (2, 5):
        tr_config.kernels.transformer_fused_beam_attn = False
        ref = beam_search_generate(
            params, tr_config, enc_outs, final, START, END, 6, ragged,
            beam_size=K, length_penalty=0.8,
        )
        tr_config.kernels.transformer_fused_beam_attn = True
        tr_config.kernels.interpret = True
        try:
            fused = beam_search_generate(
                params, tr_config, enc_outs, final, START, END, 6, ragged,
                beam_size=K, length_penalty=0.8,
            )
        finally:
            tr_config.kernels.transformer_fused_beam_attn = False
            tr_config.kernels.interpret = False
        np.testing.assert_array_equal(
            np.asarray(fused["generated_tokens"]),
            np.asarray(ref["generated_tokens"]),
        )
        np.testing.assert_array_equal(
            np.asarray(fused["all_tokens"]), np.asarray(ref["all_tokens"])
        )
        np.testing.assert_allclose(
            np.asarray(fused["all_scores"]), np.asarray(ref["all_scores"]),
            rtol=0, atol=2e-5,
        )


def test_fused_beam_attention_bf16_cache(tr_config):
    """Fused kernels with bf16 cache storage: tokens must match the XLA
    bf16-cache path (both read the same bf16-rounded rows; the kernel's
    softmax is fp32 either way)."""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=2, key=19)
    tr_config.kernels.transformer_cache_bf16 = True
    try:
        tr_config.kernels.transformer_fused_beam_attn = False
        ref = beam_search_generate(
            params, tr_config, enc_outs, final, START, END, 6, mask,
            beam_size=4,
        )
        tr_config.kernels.transformer_fused_beam_attn = True
        tr_config.kernels.interpret = True
        fused = beam_search_generate(
            params, tr_config, enc_outs, final, START, END, 6, mask,
            beam_size=4,
        )
    finally:
        tr_config.kernels.transformer_cache_bf16 = False
        tr_config.kernels.transformer_fused_beam_attn = False
        tr_config.kernels.interpret = False
    np.testing.assert_array_equal(
        np.asarray(fused["generated_tokens"]),
        np.asarray(ref["generated_tokens"]),
    )


def test_merge_qkv_token_identity(tr_config):
    """kernels.transformer_merge_qkv (one fused (D, 3D) self-attention
    projection per block, merge_self_attn_qkv) must be numerically
    inert: the merged matmul computes each output column by the same
    contraction as the three split matmuls. Greedy and beam tokens must
    match exactly on CPU (f32 dots), and the merged tree must carry one
    concatenated kernel per block."""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=3, key=23)

    tr_config.kernels.transformer_merge_qkv = False
    ref_g = greedy_generate(
        params, tr_config, enc_outs, final, START, END, 8, mask)
    ref_b = beam_search_generate(
        params, tr_config, enc_outs, final, START, END, 8, mask,
        beam_size=4)
    tr_config.kernels.transformer_merge_qkv = True
    try:
        merged = tr.merge_self_attn_qkv(params["decoder"])
        D = tr_config.model.decoder_hidden_dim
        for blk in merged["blocks"]:
            assert blk["self_attn"]["wqkv"]["kernel"].shape == (D, 3 * D)
        got_g = greedy_generate(
            params, tr_config, enc_outs, final, START, END, 8, mask)
        got_b = beam_search_generate(
            params, tr_config, enc_outs, final, START, END, 8, mask,
            beam_size=4)
    finally:
        tr_config.kernels.transformer_merge_qkv = True  # the default
    np.testing.assert_array_equal(
        np.asarray(got_g["generated_tokens"]),
        np.asarray(ref_g["generated_tokens"]))
    np.testing.assert_array_equal(
        np.asarray(got_b["generated_tokens"]),
        np.asarray(ref_b["generated_tokens"]))
    np.testing.assert_allclose(
        np.asarray(got_b["all_scores"]), np.asarray(ref_b["all_scores"]),
        rtol=1e-6, atol=1e-6)


def test_fused_cross_attention_only_matches_xla_path(tr_config):
    """kernels.transformer_fused_cross_attn routes ONLY the beam loop's
    cross-attention through the Pallas kernel (XLA self-attention stays).
    Tokens must match the all-XLA path; the kernel's fp32 softmax mirrors
    _cross_attn_step's preferred_element_type=f32 discipline."""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=3, key=29)
    ref = beam_search_generate(
        params, tr_config, enc_outs, final, START, END, 7, mask,
        beam_size=4,
    )
    tr_config.kernels.transformer_fused_cross_attn = True
    tr_config.kernels.interpret = True
    try:
        got = beam_search_generate(
            params, tr_config, enc_outs, final, START, END, 7, mask,
            beam_size=4,
        )
    finally:
        tr_config.kernels.transformer_fused_cross_attn = False
        tr_config.kernels.interpret = False
    np.testing.assert_array_equal(
        np.asarray(got["generated_tokens"]),
        np.asarray(ref["generated_tokens"]),
    )


def test_select_gather_bit_identity(tr_config):
    """kernels.transformer_select_gather swaps the ancestry one-hot
    einsums for a gather + broadcast multiply — values must be BIT
    identical (selection, not summation), so beam tokens AND scores
    match exactly."""
    params, feats, enc_outs, final, mask = _setup(tr_config, B=3, key=31)
    ref = beam_search_generate(
        params, tr_config, enc_outs, final, START, END, 8, mask,
        beam_size=4,
    )
    tr_config.kernels.transformer_select_gather = True
    try:
        got = beam_search_generate(
            params, tr_config, enc_outs, final, START, END, 8, mask,
            beam_size=4,
        )
    finally:
        tr_config.kernels.transformer_select_gather = False
    np.testing.assert_array_equal(
        np.asarray(got["generated_tokens"]),
        np.asarray(ref["generated_tokens"]))
    np.testing.assert_array_equal(
        np.asarray(got["all_scores"]), np.asarray(ref["all_scores"]))
