"""CNN backbone shape/behavior tests (weights are random — numerics are
covered by architecture-level checks; pretrained parity requires weight
files unavailable offline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_captioning_tpu.models.backbones.resnet import apply_resnet50, init_resnet50
from video_captioning_tpu.models.backbones.vgg import (
    _adaptive_avg_pool,
    apply_vgg16,
    init_vgg16,
)


def test_vgg16_output_shape_224():
    params = init_vgg16(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    out = apply_vgg16(params, x)
    assert out.shape == (2, 4096)
    assert np.isfinite(np.asarray(out)).all()


def test_vgg16_arbitrary_input_size():
    """AdaptiveAvgPool parity: torchvision VGG16 accepts any input size."""
    params = init_vgg16(jax.random.PRNGKey(0))
    for size in [64, 96, 160]:
        x = jax.random.normal(jax.random.PRNGKey(1), (1, size, size, 3))
        out = apply_vgg16(params, x)
        assert out.shape == (1, 4096), size


def test_adaptive_avg_pool_matches_torch():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    for h, w in [(7, 7), (14, 14), (2, 2), (10, 13), (224 // 32, 224 // 32)]:
        x = rs.randn(2, h, w, 5).astype(np.float32)
        ours = np.asarray(_adaptive_avg_pool(jnp.asarray(x), 7, 7))
        theirs = (
            torch.nn.AdaptiveAvgPool2d((7, 7))(
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6, err_msg=f"{h}x{w}")


def test_resnet50_output_shape():
    params = init_resnet50(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    out = apply_resnet50(params, x)
    assert out.shape == (2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet50_small_input():
    params = init_resnet50(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    assert apply_resnet50(params, x).shape == (1, 2048)


def test_feature_extractor_wrapper(tmp_path):
    from video_captioning_tpu.models.backbones import FeatureExtractor

    fx = FeatureExtractor("resnet50", None, batch_size=4)
    frames = np.random.RandomState(0).randint(0, 255, (6, 64, 64, 3), np.uint8)
    feats = fx.extract(frames)
    assert feats.shape == (6, 2048)
    assert feats.dtype == np.float32
