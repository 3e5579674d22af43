"""Mesh/sharding correctness: the same training step must produce the same
numbers regardless of how it is sharded (DP-only vs DP×TP) — XLA inserts
different collectives but the math cannot change."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video_captioning_tpu.models import captioner
from video_captioning_tpu.parallel import (
    make_mesh,
    param_shardings,
    param_specs,
    shard_batch,
)
from video_captioning_tpu.training import losses, optim
from jax.sharding import PartitionSpec as P

VOCAB = 32  # divisible by model axis


def _batch(cfg, B=8):
    rs = np.random.RandomState(0)
    return {
        "video_features": rs.randn(B, 10, cfg.model.cnn_feature_dim).astype(np.float32),
        "input_tokens": rs.randint(0, VOCAB, (B, 6)).astype(np.int32),
        "target_tokens": rs.randint(0, VOCAB, (B, 6)).astype(np.int32),
    }


def _one_step(cfg, mesh, params, batch):
    tx = optim.build_optimizer(cfg)
    shardings = param_shardings(mesh, params)
    params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    opt_state = jax.jit(tx.init)(params)

    def step(params, opt_state, batch):
        def loss_fn(p):
            out = captioner.apply_model(
                p, cfg, batch["video_features"], batch["input_tokens"]
            )
            return losses.label_smoothed_cross_entropy(
                out["logits"], batch["target_tokens"], 0, 0.1
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    device_batch = shard_batch(mesh, batch)
    new_params, loss = jax.jit(step)(params, opt_state, device_batch)
    return (
        float(loss),
        [np.asarray(x) for x in jax.tree_util.tree_leaves(new_params)],
    )


def test_tp_matches_dp(tiny_config):
    cfg = tiny_config
    cfg.data.max_vocab_size = VOCAB
    cfg.validate()
    params = captioner.init_model(jax.random.PRNGKey(0), cfg, VOCAB)
    batch = _batch(cfg)

    cfg.parallel.model_axis = 1
    cfg.parallel.data_axis = 4
    loss_dp, params_dp = _one_step(cfg, make_mesh(cfg), params, batch)

    cfg.parallel.model_axis = 2
    cfg.parallel.data_axis = 4
    loss_tp, params_tp = _one_step(cfg, make_mesh(cfg), params, batch)

    assert abs(loss_dp - loss_tp) < 1e-5, (loss_dp, loss_tp)
    for a, b in zip(params_dp, params_tp):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_single_device_matches_mesh(tiny_config):
    """1-device mesh == 8-device DP mesh numerically."""
    cfg = tiny_config
    cfg.data.max_vocab_size = VOCAB
    cfg.validate()
    params = captioner.init_model(jax.random.PRNGKey(0), cfg, VOCAB)
    batch = _batch(cfg)

    cfg.parallel.model_axis = 1
    cfg.parallel.data_axis = 1
    loss_1, params_1 = _one_step(
        cfg, make_mesh(cfg, jax.devices()[:1]), params, batch
    )
    cfg.parallel.data_axis = 8
    loss_8, params_8 = _one_step(cfg, make_mesh(cfg), params, batch)
    assert abs(loss_1 - loss_8) < 1e-5
    for a, b in zip(params_1, params_8):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_param_specs_target_vocab_matrices(tiny_config):
    params = captioner.init_model(jax.random.PRNGKey(0), tiny_config, VOCAB)
    specs = param_specs(params)
    assert specs["decoder"]["embedding"]["table"] == P("model", None)
    assert specs["decoder"]["output_projection"]["kernel"] == P(None, "model")
    assert specs["decoder"]["output_projection"]["bias"] == P("model")
    # everything else replicated
    assert specs["encoder"]["feature_projection"]["kernel"] == P()
    assert specs["decoder"]["lstm"][0]["w_ih"] == P()


def test_context_parallel_attention_matches_unsharded(tiny_config):
    """Frame-axis-sharded attention (shard_map + online-softmax combine)
    must equal the unsharded attend() exactly — the CP design SURVEY §5
    asks for, executed on an 8-way mesh."""
    from video_captioning_tpu.models import attention as attn_mod
    from video_captioning_tpu.models import init_model
    from video_captioning_tpu.parallel.context_parallel import (
        attend_context_parallel,
        shard_frames,
    )

    cfg = tiny_config
    cfg.parallel.data_axis = 1
    cfg.parallel.model_axis = 8
    mesh = make_mesh(cfg)

    params = init_model(jax.random.PRNGKey(0), cfg, 17)["decoder"]["attention"]
    B, S, E = 4, 80, cfg.model.encoder_hidden_dim  # S divisible by 8
    enc_outs = jax.random.normal(jax.random.PRNGKey(1), (B, S, E))
    dec_hidden = jax.random.normal(jax.random.PRNGKey(2), (B, E))
    mask = jnp.concatenate(
        [jnp.ones((B, 70)), jnp.zeros((B, 10))], axis=1
    )  # ragged tail masked

    cache = attn_mod.precompute(cfg, params, enc_outs)
    ctx_ref, w_ref = attn_mod.attend(cfg, params, cache, enc_outs, dec_hidden, mask)

    enc_sharded = shard_frames(mesh, enc_outs)
    mask_sharded = shard_frames(mesh, mask)
    ctx, w = attend_context_parallel(
        cfg, params, enc_sharded, dec_hidden, mask_sharded, mesh
    )

    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    """The driver's multichip gate runs ``dryrun_multichip(8)`` in a fresh
    process where jax would otherwise see the single real chip. The entry
    point must provision its own virtual CPU devices (round-1 gate failure:
    MULTICHIP_r01.json ok=false)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_VCT_DRYRUN_CHILD")
    }
    code = (
        f"import sys; sys.path.insert(0, {repo!r}); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    result = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "dryrun_multichip OK" in result.stdout
    assert "'data': 4" in result.stdout and "'model': 2" in result.stdout


@pytest.mark.parametrize("kind", ["bahdanau", "luong", "multihead"])
def test_context_parallel_generation_matches_unsharded(tiny_config, kind):
    """END-TO-END context parallelism: with config.parallel.context_axis set
    and an ambient 8-way mesh, the full greedy and beam generation paths
    (not just the standalone attention module) run frame-sharded
    cross-attention and produce tokens identical to the unsharded run."""
    from video_captioning_tpu import generation
    from video_captioning_tpu.models import init_model

    cfg = tiny_config
    cfg.model.attention_type = kind
    cfg.model.video_sequence_length = 16  # divisible by the 8-way axis
    cfg.data.frames_per_video = 16
    cfg.validate()

    params = init_model(jax.random.PRNGKey(0), cfg, 23)
    feats = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (4, 16, cfg.model.cnn_feature_dim))
    )
    mask = np.ones((4, 16), np.float32)
    mask[2, 10:] = 0  # ragged tail crosses shard boundaries

    ref_g = generation.generate(params, cfg, feats, 1, 2, video_mask=mask,
                                method="greedy")
    ref_b = generation.generate(params, cfg, feats, 1, 2, video_mask=mask,
                                method="beam", beam_size=4)

    cfg.parallel.data_axis = 1
    cfg.parallel.model_axis = 8
    cfg.parallel.context_axis = "model"
    cfg.validate()
    mesh = make_mesh(cfg)
    with jax.sharding.set_mesh(mesh):
        cp_g = jax.jit(
            lambda p, f, m: generation.generate(p, cfg, f, 1, 2, video_mask=m,
                                                method="greedy")
        )(params, feats, mask)
        cp_b = jax.jit(
            lambda p, f, m: generation.generate(p, cfg, f, 1, 2, video_mask=m,
                                                method="beam", beam_size=4)
        )(params, feats, mask)
    cfg.parallel.context_axis = None
    cfg.parallel.model_axis = 1

    np.testing.assert_array_equal(
        np.asarray(cp_g["generated_tokens"]), np.asarray(ref_g["generated_tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(cp_g["attention_weights"]),
        np.asarray(ref_g["attention_weights"]), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(cp_b["generated_tokens"]), np.asarray(ref_b["generated_tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(cp_b["all_scores"]), np.asarray(ref_b["all_scores"]),
        rtol=1e-4, atol=1e-5,
    )


def test_context_parallel_generation_matches_unsharded_transformer(tiny_config):
    """END-TO-END context parallelism for the transformer family: with
    config.parallel.context_axis set and an ambient 8-way mesh, the decode
    loop's cross-attention runs frame-sharded (models/transformer.py
    _cross_attn_step_cp: online-softmax combine across shards) and produces
    tokens identical to the unsharded run."""
    from video_captioning_tpu import generation
    from video_captioning_tpu.models import init_model

    cfg = tiny_config
    cfg.model.architecture = "transformer"
    cfg.model.embedding_dim = cfg.model.decoder_hidden_dim  # tied to d_model
    cfg.model.transformer_num_heads = 4
    cfg.model.video_sequence_length = 16  # divisible by the 8-way axis
    cfg.data.frames_per_video = 16
    cfg.validate()

    params = init_model(jax.random.PRNGKey(0), cfg, 23)
    feats = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (4, 16, cfg.model.cnn_feature_dim))
    )
    mask = np.ones((4, 16), np.float32)
    mask[2, 10:] = 0  # ragged tail crosses shard boundaries

    ref_g = generation.generate(params, cfg, feats, 1, 2, video_mask=mask,
                                method="greedy")
    ref_b = generation.generate(params, cfg, feats, 1, 2, video_mask=mask,
                                method="beam", beam_size=4)

    cfg.parallel.data_axis = 1
    cfg.parallel.model_axis = 8
    cfg.parallel.context_axis = "model"
    cfg.validate()
    mesh = make_mesh(cfg)
    try:
        with jax.sharding.set_mesh(mesh):
            cp_g = jax.jit(
                lambda p, f, m: generation.generate(p, cfg, f, 1, 2, video_mask=m,
                                                    method="greedy")
            )(params, feats, mask)
            cp_b = jax.jit(
                lambda p, f, m: generation.generate(p, cfg, f, 1, 2, video_mask=m,
                                                    method="beam", beam_size=4)
            )(params, feats, mask)
    finally:
        cfg.parallel.context_axis = None
        cfg.parallel.model_axis = 1

    np.testing.assert_array_equal(
        np.asarray(cp_g["generated_tokens"]), np.asarray(ref_g["generated_tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(cp_g["attention_weights"]),
        np.asarray(ref_g["attention_weights"]), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(cp_b["generated_tokens"]), np.asarray(ref_b["generated_tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(cp_b["all_scores"]), np.asarray(ref_b["all_scores"]),
        rtol=1e-4, atol=1e-5,
    )


# --- multi-chip SERVING (round 3: data-sharded batched captioning) --------


def _make_package(tmp_path, cfg):
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.models import init_model
    from video_captioning_tpu.utils.checkpoint import CheckpointManager

    cfg.data.vocab_threshold = 1
    vocab = Vocabulary(cfg)
    vocab.build_vocabulary(
        ["a man rides a horse", "a woman cooks food", "a dog runs fast"]
    )
    params = init_model(jax.random.PRNGKey(7), cfg, len(vocab))
    mgr = CheckpointManager(tmp_path)
    return mgr.save_model_for_inference(params, vocab, cfg)


@pytest.mark.parametrize("method", ["greedy", "beam"])
@pytest.mark.parametrize("architecture", ["lstm", "transformer"])
def test_predictor_mesh_serving_matches_single_device(
    tiny_config, tmp_path, method, architecture
):
    """8-device data-sharded predictor == single-device predictor, token
    for token, through the public predict_batch API (VERDICT r2 item 2) —
    for BOTH model families."""
    from jax.sharding import Mesh
    from video_captioning_tpu.inference import VideoCaptionPredictor

    tiny_config.model.architecture = architecture
    tiny_config.model.transformer_num_heads = 4
    if architecture == "transformer":
        tiny_config.model.embedding_dim = tiny_config.model.decoder_hidden_dim
    tiny_config.validate()
    pkg = _make_package(tmp_path, tiny_config)
    rs = np.random.RandomState(3)
    # Ragged batch (5 clips) exercises bucket-to-multiple-of-mesh padding.
    feats = [
        rs.randn(t, tiny_config.model.cnn_feature_dim).astype(np.float32)
        for t in (10, 7, 10, 4, 9)
    ]

    single = VideoCaptionPredictor(pkg)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))
    sharded = VideoCaptionPredictor(pkg, mesh=mesh)

    kwargs = dict(method=method, max_length=6)
    if method == "beam":
        kwargs["beam_size"] = 3
    res_single = single.predict_batch(feats, **kwargs)
    res_sharded = sharded.predict_batch(feats, **kwargs)
    assert len(res_single) == len(res_sharded) == 5
    for a, b in zip(res_single, res_sharded):
        assert a["tokens"] == b["tokens"]
        assert a["caption"] == b["caption"]


def test_predictor_mesh_requires_data_axis(tiny_config, tmp_path):
    from jax.sharding import Mesh
    from video_captioning_tpu.inference import VideoCaptionPredictor

    pkg = _make_package(tmp_path, tiny_config)
    bad = Mesh(np.asarray(jax.devices()).reshape(8), ("model",))
    with pytest.raises(ValueError, match="data"):
        VideoCaptionPredictor(pkg, mesh=bad)
