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


def test_pallas_topk2d_matches_lax_top_k():
    """Streaming top-k kernel: same values AND tie order as lax.top_k."""
    from video_captioning_tpu.ops.topk_pallas import topk2d_pallas

    rs = np.random.RandomState(0)
    x = rs.randn(64, 512).astype(np.float32)
    x[3, 10] = x[3, 200] = x[3, 77] = 2.5  # ties -> ascending index order
    x[10, :] = 1.0  # full-row tie
    for k in (1, 5, 8):
        v1, i1 = topk2d_pallas(jnp.asarray(x), k, interpret=True)
        v2, i2 = jax.lax.top_k(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_pallas_topk2d_irregular_rows_and_vocab_padding():
    """Row counts not divisible by 8 must take a LEGAL full-dim block (a
    1-row block fails Mosaic lowering), and -inf vocab padding (topk2d's
    lane-alignment path for V=10000-style vocabs) must never be selected."""
    from video_captioning_tpu.ops.topk_pallas import topk2d_pallas

    rs = np.random.RandomState(1)
    for N in (20, 300):  # N % 8 != 0 -> block_rows falls back to N
        x = rs.randn(N, 256).astype(np.float32)
        v1, i1 = topk2d_pallas(jnp.asarray(x), 5, interpret=True)
        v2, i2 = jax.lax.top_k(jnp.asarray(x), 5)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # -inf padding columns (what topk2d appends for V % 128 != 0).
    x = rs.randn(16, 200).astype(np.float32)
    xp = np.pad(x, ((0, 0), (0, 56)), constant_values=float("-inf"))
    v1, i1 = topk2d_pallas(jnp.asarray(xp), 5, interpret=True)
    v2, i2 = jax.lax.top_k(jnp.asarray(x), 5)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert int(np.asarray(i1).max()) < 200


def test_pallas_topk2d_lse_matches_composite():
    """Fused top-k+logsumexp kernel: values/indices bit-match lax.top_k
    (same tie order), lse matches m + log(sum(exp(x - m))) to f32
    reduction-order rounding, -inf padding columns contribute nothing."""
    from video_captioning_tpu.ops.topk_pallas import topk2d_lse_pallas

    rs = np.random.RandomState(2)
    x = rs.randn(64, 512).astype(np.float32) * 3
    x[5, 7] = x[5, 400] = 4.2  # tie
    xp = np.pad(x, ((0, 0), (0, 128)), constant_values=float("-inf"))
    for k in (1, 5):
        v1, i1, lse1 = topk2d_lse_pallas(jnp.asarray(xp), k, interpret=True)
        v2, i2 = jax.lax.top_k(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        m = x.max(axis=1)
        want = m + np.log(np.exp(x - m[:, None]).sum(axis=1))
        np.testing.assert_allclose(np.asarray(lse1), want, rtol=1e-6)


def test_beam_pallas_topk_flag_tokens_identical(tiny_config):
    """kernels.use_pallas_topk routes the beam expansion through topk2d;
    on CPU the gate falls back to lax.top_k, so the flag must be a strict
    no-op on tokens AND scores (exercises the beam.py routing)."""
    from video_captioning_tpu import generation
    from video_captioning_tpu.models import init_model

    cfg = tiny_config
    params = init_model(jax.random.PRNGKey(0), cfg, 31)
    feats = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, 10, 24)))
    ref = generation.generate(params, cfg, feats, 1, 2, method="beam",
                              beam_size=4)
    cfg.kernels.use_pallas_topk = True
    try:
        got = generation.generate(params, cfg, feats, 1, 2, method="beam",
                                  beam_size=4)
    finally:
        cfg.kernels.use_pallas_topk = False
    np.testing.assert_array_equal(np.asarray(got["generated_tokens"]),
                                  np.asarray(ref["generated_tokens"]))
    np.testing.assert_array_equal(np.asarray(got["all_scores"]),
                                  np.asarray(ref["all_scores"]))


def test_fused_vocab_topk_lse_matches_xla():
    """Fused vocab-projection+top-k+lse kernel vs the XLA composite with
    matching operand precision (bf16 operands, f32 accumulation), including
    vocab padding and cross-block ties."""
    from video_captioning_tpu.ops.vocab_topk_pallas import (
        pad_vocab_weights,
        vocab_topk_lse,
    )

    rs = np.random.RandomState(1)
    N, H, V, K = 16, 32, 700, 5  # V=700: not a lane multiple -> padding path
    x = jnp.asarray(rs.randn(N, H).astype(np.float32))
    W = jnp.asarray(rs.randn(H, V).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(V).astype(np.float32) * 0.1)

    wp, bp, _ = pad_vocab_weights(W, b, vt=128)
    vals, idx, lse = vocab_topk_lse(x, wp, bp, K, vt=128, interpret=True)

    logits = jax.lax.dot(
        x.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + b
    ref_v, ref_i = jax.lax.top_k(logits, K)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(jax.nn.logsumexp(logits, axis=1)),
        rtol=1e-5, atol=1e-5,
    )

    # exact ties spanning 128-column blocks keep ascending-index order
    x2 = np.zeros((8, 32), np.float32); x2[:, 0] = 1.0
    W2 = np.zeros((32, 700), np.float32)
    W2[0, [3, 130, 131, 500, 699]] = 2.0
    wp2, bp2, _ = pad_vocab_weights(jnp.asarray(W2), jnp.zeros(700), vt=128)
    _, i2, _ = vocab_topk_lse(jnp.asarray(x2), wp2, bp2, K, vt=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(i2[0]), [3, 130, 131, 500, 699])

    # Row counts with no 8-divisible tile (N=20) must take the full-N
    # block (a 1-row block is an illegal Mosaic shape).
    x3 = jnp.asarray(rs.randn(20, H).astype(np.float32))
    vals3, idx3, lse3 = vocab_topk_lse(x3, wp, bp, K, vt=128, interpret=True)
    logits3 = jax.lax.dot(
        x3.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + b
    ref_v3, ref_i3 = jax.lax.top_k(logits3, K)
    np.testing.assert_allclose(np.asarray(vals3), np.asarray(ref_v3),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx3), np.asarray(ref_i3))


def test_beam_fused_vocab_topk_path(tiny_config):
    """End-to-end beam with kernels.use_fused_vocab_topk forced through the
    interpret-mode kernel matches the XLA path token-for-token."""
    import video_captioning_tpu.generation.beam as beam_mod
    from video_captioning_tpu.models import init_model
    from video_captioning_tpu.models import captioner

    cfg = tiny_config
    params = init_model(jax.random.PRNGKey(3), cfg, 29)
    feats = jax.random.normal(jax.random.PRNGKey(4), (3, 10, cfg.model.cnn_feature_dim))
    enc, final, mask = captioner.encode(params, cfg, feats)

    ref = beam_mod.beam_search_generate(
        params, cfg, enc, final, 1, 2, 8, mask, beam_size=4
    )

    # Force the fused path on CPU by monkeypatching the backend gate and
    # running the kernel in interpreter mode.
    import unittest.mock as mock
    from video_captioning_tpu.ops import vocab_topk_pallas as vtp

    cfg.kernels.use_fused_vocab_topk = True
    orig = vtp.vocab_topk_lse
    try:
        with mock.patch.object(jax, "default_backend", return_value="tpu"), \
             mock.patch.object(
                 vtp, "vocab_topk_lse",
                 lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
             ):
            got = beam_mod.beam_search_generate(
                params, cfg, enc, final, 1, 2, 8, mask, beam_size=4
            )
    finally:
        cfg.kernels.use_fused_vocab_topk = False

    # bf16 operand rounding in the kernel's matmul can flip exact ties only;
    # tokens must agree on CPU where the XLA path is fp32? -> compare scores
    # loosely and tokens exactly (random weights: no ties in practice).
    np.testing.assert_array_equal(
        np.asarray(got["generated_tokens"]), np.asarray(ref["generated_tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(got["all_scores"]), np.asarray(ref["all_scores"]),
        rtol=5e-2, atol=5e-2,
    )


def test_lstm_seq_kernel_matches_scan():
    """Whole-sequence LSTM kernel vs lstm_scan: masked packed-sequence
    semantics (state carry-through, zero outputs past length, final state
    at last valid step), both directions stacked."""
    from video_captioning_tpu.models import layers
    from video_captioning_tpu.ops.lstm_seq_pallas import lstm_seq_pallas

    B, T, H = 8, 10, 16
    fwd = layers.init_lstm_layer(jax.random.PRNGKey(1), H, H)
    bwd = layers.init_lstm_layer(jax.random.PRNGKey(2), H, H)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, T, H).astype(np.float32))
    xr = jnp.asarray(rs.randn(B, T, H).astype(np.float32))
    mask = np.ones((B, T), np.float32)
    mask[2, 6:] = 0
    mask[5, 3:] = 0
    mask = jnp.asarray(mask)
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))

    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), fwd, bwd)
    xs2 = jnp.stack([x, xr])
    outs_ref, (h_ref, c_ref) = jax.vmap(
        lambda lyr, xs: layers.lstm_scan(lyr, xs, h0, c0, mask=mask)
    )(stacked, xs2)

    xproj = jnp.einsum("dbti,dio->dbto", xs2, stacked["w_ih"]) + (
        stacked["b_ih"] + stacked["b_hh"]
    )[:, None, None, :]
    outs, (h_last, c_last) = lstm_seq_pallas(
        jnp.transpose(xproj, (2, 0, 1, 3)), stacked["w_hh"], mask, interpret=True
    )
    outs = jnp.transpose(outs, (1, 2, 0, 3))
    # bf16 recurrent matmul operands (matching XLA's TPU DEFAULT policy)
    # vs the CPU scan's fp32: tolerance covers operand rounding only.
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(h_ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(c_last), np.asarray(c_ref), rtol=2e-2, atol=2e-2)


def _lstm_seq_reference(xproj, w_hh, mask):
    """lax.scan implementation matching lstm_seq_train's numerics exactly
    (bf16 matmul operands, fp32 state/accumulation, masked carry-through) —
    the oracle for the custom-VJP kernel's values AND autodiff gradients."""
    T, ND, B, H4 = xproj.shape

    def dir_scan(xp_d, w_d):  # xp_d: (T, B, 4H), w_d: (H, 4H)
        H = H4 // 4

        def step(carry, inp):
            h, c = carry
            xp_t, m = inp
            recur = jax.lax.dot(
                h.astype(jnp.bfloat16),
                w_d.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            gates = xp_t.astype(jnp.float32) + recur
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            mm = m[:, None]
            h_keep = jnp.where(mm > 0, h_new, h)
            c_keep = jnp.where(mm > 0, c_new, c)
            out = jnp.where(mm > 0, h_new, jnp.zeros_like(h_new))
            return (h_keep, c_keep), out

        h0 = jnp.zeros((B, H), jnp.float32)
        (h_f, c_f), outs = jax.lax.scan(
            step, (h0, h0), (xp_d, jnp.swapaxes(mask, 0, 1))
        )
        return outs, h_f, c_f

    outs, h_f, c_f = jax.vmap(dir_scan, in_axes=(1, 0), out_axes=(1, 0, 0))(
        xproj, w_hh
    )
    dt = xproj.dtype
    return outs.astype(dt), (h_f.astype(dt), c_f.astype(dt))


def _seq_loss(fn, probes):
    p_out, p_h, p_c = probes

    def loss(xproj, w_hh, mask):
        outs, (h_last, c_last) = fn(xproj, w_hh, mask)
        return (
            jnp.sum(outs.astype(jnp.float32) * p_out)
            + jnp.sum(h_last.astype(jnp.float32) * p_h)
            + jnp.sum(c_last.astype(jnp.float32) * p_c)
        )

    return loss


def test_lstm_seq_train_values_and_grads_match_reference():
    """Custom-VJP whole-sequence kernel: forward values match the
    numerics-identical scan reference tightly, and jax.grad through the
    Pallas backward kernel matches autodiff through that reference."""
    from video_captioning_tpu.ops.lstm_seq_pallas import lstm_seq_train

    B, T, H, ND = 8, 12, 16, 2
    rs = np.random.RandomState(3)
    xproj = jnp.asarray(rs.randn(T, ND, B, 4 * H).astype(np.float32) * 0.5)
    w_hh = jnp.asarray(rs.randn(ND, H, 4 * H).astype(np.float32) * 0.2)
    mask = np.ones((B, T), np.float32)
    mask[2, 7:] = 0
    mask[5, 1:] = 0
    mask = jnp.asarray(mask)
    probes = tuple(
        jnp.asarray(rs.randn(*s).astype(np.float32))
        for s in [(T, ND, B, H), (ND, B, H), (ND, B, H)]
    )

    kern = lambda xp, w, m: lstm_seq_train(xp, w, m, 4, True)
    outs, (h_l, c_l) = kern(xproj, w_hh, mask)
    outs_r, (h_r, c_r) = _lstm_seq_reference(xproj, w_hh, mask)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_l), np.asarray(h_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_l), np.asarray(c_r),
                               rtol=1e-5, atol=1e-5)

    g_kern = jax.grad(_seq_loss(kern, probes), argnums=(0, 1))(
        xproj, w_hh, mask
    )
    g_ref = jax.grad(_seq_loss(_lstm_seq_reference, probes), argnums=(0, 1))(
        xproj, w_hh, mask
    )
    # The Pallas backward casts the outgoing cotangent to bf16 for its two
    # matmuls (operand parity with the forward); autodiff keeps it fp32 —
    # tolerance covers that operand rounding only.
    for got, ref, name in zip(g_kern, g_ref, ["dxproj", "dw_hh"]):
        scale = np.abs(np.asarray(ref)).max()
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2 * scale,
            err_msg=name,
        )


def test_lstm_seq_train_bf16_interface():
    """bf16 xproj/w_hh (the trainer's compute policy): runs, outputs bf16,
    gradients finite and near the fp32 path."""
    from video_captioning_tpu.ops.lstm_seq_pallas import lstm_seq_train

    B, T, H, ND = 4, 6, 16, 2
    rs = np.random.RandomState(4)
    xproj32 = jnp.asarray(rs.randn(T, ND, B, 4 * H).astype(np.float32) * 0.5)
    w32 = jnp.asarray(rs.randn(ND, H, 4 * H).astype(np.float32) * 0.2)
    mask = jnp.ones((B, T), jnp.float32)
    probes = tuple(
        jnp.asarray(rs.randn(*s).astype(np.float32))
        for s in [(T, ND, B, H), (ND, B, H), (ND, B, H)]
    )

    kern = lambda xp, w, m: lstm_seq_train(xp, w, m, 4, True)
    loss = _seq_loss(kern, probes)
    g32 = jax.grad(loss, argnums=(0, 1))(xproj32, w32, mask)
    outs16, _ = kern(xproj32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16), mask)
    assert outs16.dtype == jnp.bfloat16
    g16 = jax.grad(loss, argnums=(0, 1))(
        xproj32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16), mask
    )
    for a, b in zip(g16, g32):
        assert a.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(a.astype(jnp.float32)).all())
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b),
            rtol=0.1, atol=0.1 * float(np.abs(np.asarray(b)).max()),
        )


def test_encoder_train_kernel_grads_match_scan(tiny_config):
    """apply_encoder with the training kernel enabled: loss gradients wrt
    the encoder params match the lax.scan path (ragged mask, train=True)."""
    from video_captioning_tpu.models.encoder import apply_encoder, init_encoder

    cfg = tiny_config
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (4, 10, cfg.model.cnn_feature_dim)
    )
    mask = np.ones((4, 10), np.float32)
    mask[1, 7:] = 0
    mask = jnp.asarray(mask)
    rng = jax.random.PRNGKey(7)

    def loss(p):
        enc, fin = apply_encoder(p, cfg, feats, mask, train=True, rng=rng)
        return jnp.sum(enc**2) + jnp.sum(fin**2)

    g_ref = jax.grad(loss)(params)
    cfg.kernels.use_pallas_lstm_seq_train = True
    cfg.kernels.interpret = True
    try:
        g_kern = jax.grad(loss)(params)
    finally:
        cfg.kernels.use_pallas_lstm_seq_train = False
        cfg.kernels.interpret = False

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_kern = jax.tree_util.tree_leaves(g_kern)
    for (path, r), k in zip(flat_ref, flat_kern):
        scale = max(float(np.abs(np.asarray(r)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(r), rtol=3e-2, atol=3e-2 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


def test_encoder_seq_kernel_path_matches_scan(tiny_config):
    """apply_encoder routed through the seq kernel (interpret mode) agrees
    with the lax.scan path end-to-end, ragged mask included."""
    from video_captioning_tpu.models.encoder import apply_encoder, init_encoder

    cfg = tiny_config
    params = init_encoder(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (4, 10, cfg.model.cnn_feature_dim)
    )
    mask = np.ones((4, 10), np.float32)
    mask[1, 7:] = 0
    mask = jnp.asarray(mask)

    enc_ref, fin_ref = apply_encoder(params, cfg, feats, mask)
    cfg.kernels.use_pallas_lstm_seq = True
    cfg.kernels.interpret = True
    try:
        enc, fin = apply_encoder(params, cfg, feats, mask)
    finally:
        cfg.kernels.use_pallas_lstm_seq = False
        cfg.kernels.interpret = False
    np.testing.assert_allclose(np.asarray(enc), np.asarray(enc_ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(fin), np.asarray(fin_ref), rtol=2e-2, atol=2e-2)


def test_lstm_seq_kernel_bf16_inputs():
    """bf16 xproj (the serving policy): kernel runs, outputs bf16, and the
    fp32-state recurrence stays close to the fp32 kernel result (the bf16
    path's state is fp32 in-kernel — better than a bf16 lax.scan's)."""
    from video_captioning_tpu.ops.lstm_seq_pallas import lstm_seq_pallas

    B, T, H, ND = 8, 10, 16, 2
    rs = np.random.RandomState(5)
    xproj = jnp.asarray(rs.randn(T, ND, B, 4 * H).astype(np.float32) * 0.5)
    w_hh = jnp.asarray(rs.randn(ND, H, 4 * H).astype(np.float32) * 0.2)
    mask = np.ones((B, T), np.float32)
    mask[3, 6:] = 0
    mask = jnp.asarray(mask)

    outs32, (h32, c32) = lstm_seq_pallas(xproj, w_hh, mask, interpret=True)
    outs16, (h16, c16) = lstm_seq_pallas(
        xproj.astype(jnp.bfloat16), w_hh.astype(jnp.bfloat16), mask,
        interpret=True,
    )
    assert outs16.dtype == jnp.bfloat16
    assert h16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(outs16, np.float32), np.asarray(outs32),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(h16, np.float32), np.asarray(h32), rtol=5e-2, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(c16, np.float32), np.asarray(c32), rtol=5e-2, atol=5e-2
    )
    # Zero outputs past each row's length survive the bf16 path bitwise.
    assert float(jnp.abs(outs16[6:, :, 3]).max()) == 0.0


# --- conv1x1 / fused-bottleneck kernels (round 3, CNN backbone path) ------


def test_conv1x1_matmul_bias_act_matches_xla():
    from video_captioning_tpu.ops.conv1x1_pallas import matmul_bias_act

    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    x = jax.random.normal(k1, (448, 96))
    w = jax.random.normal(k2, (96, 64))
    b = jax.random.normal(k3, (64,))
    r = jax.random.normal(k4, (448, 64))
    ref = jnp.maximum(x @ w + b + r, 0.0)
    got = matmul_bias_act(x, w, b, r, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    ref2 = x @ w + b
    got2 = matmul_bias_act(x, w, b, relu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)
    # residual WITHOUT relu: the fused kernel must honor relu=False (it
    # used to apply ReLU unconditionally whenever a residual was given,
    # silently diverging from the XLA fallback).
    ref3 = x @ w + b + r
    got3 = matmul_bias_act(x, w, b, r, relu=False, interpret=True)
    assert float(np.asarray(ref3).min()) < 0  # vacuity guard
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3),
                               rtol=1e-5, atol=1e-5)


def test_conv1x1_stride2_matches_slice_matmul():
    from video_captioning_tpu.ops.conv1x1_pallas import conv1x1

    k = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(k, 3)
    x = jax.random.normal(k1, (1, 56, 56, 32))
    w = jax.random.normal(k2, (32, 64))
    b = jax.random.normal(k3, (64,))
    got = conv1x1(x, w, b, stride=2, relu=False, interpret=True)
    ref = jnp.einsum("bhwc,cd->bhwd", x[:, ::2, ::2, :], w) + b
    assert got.shape == (1, 28, 28, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv1x1_returns_none_on_illegal_shapes():
    from video_captioning_tpu.ops.conv1x1_pallas import conv1x1

    # M = 1*7*7 = 49 has no multiple-of-16 divisor -> XLA fallback signal.
    x = jnp.zeros((1, 7, 7, 32))
    w = jnp.zeros((32, 64))
    b = jnp.zeros((64,))
    assert conv1x1(x, w, b, interpret=True) is None


def test_fused_bottleneck_matches_xla_chain():
    from video_captioning_tpu.ops.bottleneck_pallas import fused_bottleneck

    k = jax.random.PRNGKey(2)
    ks = jax.random.split(k, 7)
    B, H, W, C, Cm = 2, 14, 14, 256, 64
    x = jax.random.normal(ks[0], (B, H, W, C))
    w1 = jax.random.normal(ks[1], (C, Cm)) * 0.1
    b1 = jax.random.normal(ks[2], (Cm,))
    w2 = jax.random.normal(ks[3], (3, 3, Cm, Cm)) * 0.05
    b2 = jax.random.normal(ks[4], (Cm,))
    w3 = jax.random.normal(ks[5], (Cm, C)) * 0.1
    b3 = jax.random.normal(ks[6], (C,))

    y1 = jnp.maximum(jnp.einsum("bhwc,cd->bhwd", x, w1) + b1, 0)
    y2 = jax.lax.conv_general_dilated(
        y1, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y2 = jnp.maximum(y2 + b2, 0)
    ref = jnp.maximum(jnp.einsum("bhwc,cd->bhwd", y2, w3) + b3 + x, 0)

    got = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_lstm_seq_kernel_small_batch_whole_dim_block():
    """B=4 (not 8-divisible): the kernel must take the whole-dim row block
    (block 1 with 1 < B < 8 is illegal in real Mosaic lowering — hit by
    the 4-clip decode-pipeline path) and still match the scan."""
    from video_captioning_tpu.models import layers
    from video_captioning_tpu.ops.lstm_seq_pallas import lstm_seq_pallas

    B, T, H = 4, 6, 16
    fwd = layers.init_lstm_layer(jax.random.PRNGKey(3), H, H)
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(B, T, H).astype(np.float32))
    mask = np.ones((B, T), np.float32)
    mask[1, 4:] = 0
    mask = jnp.asarray(mask)
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))
    outs_ref, (h_ref, c_ref) = layers.lstm_scan(fwd, x, h0, c0, mask=mask)

    xproj = jnp.einsum("bti,io->bto", x, fwd["w_ih"]) + fwd["b_ih"] + fwd["b_hh"]
    outs, (h_last, c_last) = lstm_seq_pallas(
        jnp.transpose(xproj, (1, 0, 2))[:, None], fwd["w_hh"][None], mask,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(outs[:, 0].transpose(1, 0, 2)),
                               np.asarray(outs_ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(h_last[0]), np.asarray(h_ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(c_last[0]), np.asarray(c_ref),
                               rtol=2e-2, atol=2e-2)
