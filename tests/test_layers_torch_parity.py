"""Numerical parity of layer primitives against torch CPU oracles.

torch (CPU-only) is available in this environment purely as a test oracle —
it never appears in the framework itself. Weights are generated in JAX and
copied into torch modules, then outputs are compared.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from video_captioning_tpu.models import layers


def test_linear_matches_torch():
    key = jax.random.PRNGKey(0)
    p = layers.init_linear(key, 8, 5)
    x = np.random.RandomState(0).randn(3, 8).astype(np.float32)

    lin = torch.nn.Linear(8, 5)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    ours = np.asarray(layers.apply_linear(p, jnp.asarray(x)))
    theirs = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def _copy_lstm_layer_to_torch(torch_lstm, layer_params, layer_idx=0, suffix=""):
    with torch.no_grad():
        getattr(torch_lstm, f"weight_ih_l{layer_idx}{suffix}").copy_(
            torch.from_numpy(np.asarray(layer_params["w_ih"]).T)
        )
        getattr(torch_lstm, f"weight_hh_l{layer_idx}{suffix}").copy_(
            torch.from_numpy(np.asarray(layer_params["w_hh"]).T)
        )
        getattr(torch_lstm, f"bias_ih_l{layer_idx}{suffix}").copy_(
            torch.from_numpy(np.asarray(layer_params["b_ih"]))
        )
        getattr(torch_lstm, f"bias_hh_l{layer_idx}{suffix}").copy_(
            torch.from_numpy(np.asarray(layer_params["b_hh"]))
        )


def test_lstm_cell_matches_torch():
    key = jax.random.PRNGKey(1)
    p = layers.init_lstm_layer(key, 6, 4)
    rs = np.random.RandomState(1)
    x = rs.randn(2, 6).astype(np.float32)
    h = rs.randn(2, 4).astype(np.float32)
    c = rs.randn(2, 4).astype(np.float32)

    cell = torch.nn.LSTM(6, 4, num_layers=1, batch_first=True)
    _copy_lstm_layer_to_torch(cell, p)

    h_new, c_new = layers.lstm_cell(p, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))

    out, (ht, ct) = cell(
        torch.from_numpy(x).unsqueeze(1),
        (torch.from_numpy(h).unsqueeze(0), torch.from_numpy(c).unsqueeze(0)),
    )
    np.testing.assert_allclose(np.asarray(h_new), ht[0].detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_new), ct[0].detach().numpy(), rtol=1e-5, atol=1e-6)


def test_lstm_scan_matches_torch_sequence():
    key = jax.random.PRNGKey(2)
    p = layers.init_lstm_layer(key, 5, 7)
    x = np.random.RandomState(2).randn(3, 9, 5).astype(np.float32)

    lstm = torch.nn.LSTM(5, 7, num_layers=1, batch_first=True)
    _copy_lstm_layer_to_torch(lstm, p)

    h0 = jnp.zeros((3, 7))
    outs, (hf, cf) = layers.lstm_scan(p, jnp.asarray(x), h0, h0)

    t_out, (t_h, t_c) = lstm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(outs), t_out.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), t_h[0].detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf), t_c[0].detach().numpy(), rtol=1e-4, atol=1e-5)


def test_masked_lstm_scan_matches_torch_packed():
    """Masked carry-through must reproduce torch packed-sequence semantics
    (reference encoder.py:74-82)."""
    key = jax.random.PRNGKey(3)
    p = layers.init_lstm_layer(key, 4, 6)
    rs = np.random.RandomState(3)
    B, T = 3, 8
    lengths = np.array([8, 5, 2])
    x = rs.randn(B, T, 4).astype(np.float32)
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)

    lstm = torch.nn.LSTM(4, 6, num_layers=1, batch_first=True)
    _copy_lstm_layer_to_torch(lstm, p)

    z = jnp.zeros((B, 6))
    outs, (hf, cf) = layers.lstm_scan(p, jnp.asarray(x), z, z, mask=jnp.asarray(mask))

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lengths), batch_first=True,
        enforce_sorted=False,
    )
    t_packed_out, (t_h, t_c) = lstm(packed)
    t_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        t_packed_out, batch_first=True, total_length=T
    )
    np.testing.assert_allclose(np.asarray(outs), t_out.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), t_h[0].detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf), t_c[0].detach().numpy(), rtol=1e-4, atol=1e-5)


def test_reverse_sequence():
    x = jnp.arange(12, dtype=jnp.float32).reshape(2, 6, 1)
    lengths = jnp.array([4, 6])
    r = layers.reverse_sequence(x, lengths)
    np.testing.assert_array_equal(
        np.asarray(r[0, :, 0]), np.array([3, 2, 1, 0, 4, 5], dtype=np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(r[1, :, 0]), np.array([11, 10, 9, 8, 7, 6], dtype=np.float32)
    )


def test_orthogonal_init_is_orthogonal():
    key = jax.random.PRNGKey(4)
    for shape in [(16, 16), (32, 8), (8, 32)]:
        w = layers.orthogonal_init(key, shape)
        assert w.shape == shape
        if shape[0] >= shape[1]:
            gram = np.asarray(w.T @ w)
            np.testing.assert_allclose(gram, np.eye(shape[1]), atol=1e-5)
        else:
            gram = np.asarray(w @ w.T)
            np.testing.assert_allclose(gram, np.eye(shape[0]), atol=1e-5)


def test_dropout_scaling_and_eval_noop():
    x = jnp.ones((1000,))
    rng = jax.random.PRNGKey(0)
    out = layers.dropout(x, 0.5, rng, train=True)
    kept = np.asarray(out) > 0
    assert 0.35 < kept.mean() < 0.65
    np.testing.assert_allclose(np.asarray(out)[kept], 2.0)
    np.testing.assert_array_equal(np.asarray(layers.dropout(x, 0.5, rng, False)), 1.0)
