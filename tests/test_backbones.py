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

    fx = FeatureExtractor("resnet50", None, batch_size=4, allow_random_init=True)
    frames = np.random.RandomState(0).randint(0, 255, (6, 64, 64, 3), np.uint8)
    feats = fx.extract(frames)
    assert feats.shape == (6, 2048)
    assert feats.dtype == np.float32


def test_feature_extractor_requires_weights_by_default():
    from video_captioning_tpu.models.backbones import FeatureExtractor

    with pytest.raises(ValueError, match="pretrained weights"):
        FeatureExtractor("resnet50", None, batch_size=4)


# ---------------------------------------------------------------------------
# Full-stack torch-oracle parity (VERDICT round-1 item 5, ADVICE resnet
# padding finding). torchvision is not installed, so the oracles below
# reconstruct its exact architectures with plain torch modules and state-dict
# names; load_torch_* then imports those weights into our JAX pytrees, and
# the end-to-end outputs must agree.
# ---------------------------------------------------------------------------


def _torch_vgg16(torch):
    """torchvision.models.vgg16 architecture with matching state-dict names
    (reference usage: /root/reference/src/preprocess.py:69-71)."""
    nn = torch.nn
    layers, cin = [], 3
    from video_captioning_tpu.models.backbones.vgg import VGG16_PLAN

    for item in VGG16_PLAN:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, item, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            cin = item
    model = nn.Sequential()
    model.add_module("features", nn.Sequential(*layers))
    model.add_module("avgpool", nn.AdaptiveAvgPool2d((7, 7)))
    model.add_module(
        "classifier",
        nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 1000),
        ),
    )
    return model


def _torch_resnet50(torch):
    """torchvision.models.resnet50 architecture with matching state-dict
    names (reference usage: /root/reference/src/preprocess.py:72-74)."""
    nn = torch.nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, cin, width, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(width * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idt = x
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(y + idt)

    class ResNet50(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, padding=1)
            cin = 64
            for li, (n, width) in enumerate(zip([3, 4, 6, 3], [64, 128, 256, 512]), 1):
                blocks = []
                for b in range(n):
                    stride = 2 if (li > 1 and b == 0) else 1
                    down = None
                    if b == 0:
                        down = nn.Sequential(
                            nn.Conv2d(cin, width * 4, 1, stride, bias=False),
                            nn.BatchNorm2d(width * 4),
                        )
                    blocks.append(Bottleneck(cin, width, stride, down))
                    cin = width * 4
                setattr(self, f"layer{li}", nn.Sequential(*blocks))
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            return torch.flatten(self.avgpool(x), 1)

    return ResNet50()


@pytest.mark.slow
def test_vgg16_full_stack_matches_torch_oracle():
    """End-to-end fc7 features match a torch oracle through imported weights."""
    torch = pytest.importorskip("torch")
    from video_captioning_tpu.models.backbones.vgg import load_torch_vgg16

    torch.manual_seed(0)
    model = _torch_vgg16(torch).eval()
    params = load_torch_vgg16({k: v.numpy() for k, v in model.state_dict().items()})

    rs = np.random.RandomState(1)
    for size in (224, 96):
        x = rs.randn(2, size, size, 3).astype(np.float32)
        ours = np.asarray(apply_vgg16(params, jnp.asarray(x)))
        with torch.no_grad():
            feats = model.features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            pooled = model.avgpool(feats)
            theirs = model.classifier[:5](torch.flatten(pooled, 1)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4, err_msg=str(size))


def test_resnet50_full_stack_matches_torch_oracle():
    """End-to-end pooled features match a torch oracle through imported
    weights — covers the stride-2 bottleneck padding (ADVICE round-1:
    SAME pads (0,1) where torch pads (1,1))."""
    torch = pytest.importorskip("torch")
    from video_captioning_tpu.models.backbones.resnet import load_torch_resnet50

    torch.manual_seed(0)
    model = _torch_resnet50(torch).eval()
    # Randomize BN running stats so a mapping error can't hide behind
    # identity-like defaults.
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    params = load_torch_resnet50({k: v.numpy() for k, v in model.state_dict().items()})

    rs = np.random.RandomState(2)
    x = rs.randn(2, 64, 64, 3).astype(np.float32)
    ours = np.asarray(apply_resnet50(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_resnet50_stride2_block_matches_torch():
    """Isolated stride-2 bottleneck parity (the exact ADVICE failure mode)."""
    torch = pytest.importorskip("torch")
    from video_captioning_tpu.models.backbones.resnet import (
        _bottleneck,
        load_torch_resnet50,
    )

    torch.manual_seed(3)
    model = _torch_resnet50(torch).eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    params = load_torch_resnet50({k: v.numpy() for k, v in model.state_dict().items()})

    # First block of stage 2 (layer2.0): stride-2 3x3 conv2 + downsample.
    block = params["stages"][1][0]
    rs = np.random.RandomState(4)
    x = rs.randn(1, 16, 16, 256).astype(np.float32)
    ours = np.asarray(_bottleneck(block, jnp.asarray(x), stride=2))
    with torch.no_grad():
        theirs = (
            model.layer2[0](torch.from_numpy(x.transpose(0, 3, 1, 2)))
            .numpy()
            .transpose(0, 2, 3, 1)
        )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


# --- BN-folded / fused inference path (round 3) ---------------------------


def _randomized_resnet_params(seed=0):
    """init_resnet50 params with non-trivial BN stats so folding is real."""
    from video_captioning_tpu.models.backbones.resnet import init_resnet50

    params = init_resnet50(jax.random.PRNGKey(seed))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), len(leaves))
    out = []
    for leaf, kk in zip(leaves, ks):
        noised = leaf + jax.random.normal(kk, leaf.shape) * 0.05
        # BN vectors (1-D) must stay positive where they are variances.
        out.append(jnp.abs(noised) if noised.ndim == 1 else noised)
    return jax.tree_util.tree_unflatten(treedef, out)


def test_resnet50_folded_matches_unfolded():
    from video_captioning_tpu.models.backbones.resnet import (
        apply_resnet50,
        apply_resnet50_folded,
        fold_bn,
    )

    params = _randomized_resnet_params()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    ref = np.asarray(apply_resnet50(params, x))
    got = np.asarray(apply_resnet50_folded(fold_bn(params), x, use_pallas=False))
    # Folding reassociates the BN multiply into the conv weights, so
    # fp32 rounding differs slightly from the unfolded order (~3e-4 rel
    # worst-case over 50 layers of noised random params).
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


def test_resnet50_folded_torch_oracle_parity():
    """Folded path through the weight importer matches torchvision eval."""
    torch = pytest.importorskip("torch")
    from video_captioning_tpu.models.backbones.resnet import (
        apply_resnet50_folded,
        fold_bn,
        load_torch_resnet50,
    )

    torch.manual_seed(11)
    model = _torch_resnet50(torch).eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    params = load_torch_resnet50({k: v.numpy() for k, v in model.state_dict().items()})
    rs = np.random.RandomState(12)
    x = rs.randn(2, 224, 224, 3).astype(np.float32)
    ours = np.asarray(apply_resnet50_folded(fold_bn(params), jnp.asarray(x),
                                            use_pallas=False))
    with torch.no_grad():
        theirs = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_resnet50_fused_pallas_path_matches_unfolded():
    """Full folded+fused forward (fused-bottleneck kernel engaged for
    stride-1 identity blocks, interpret mode) == unfolded reference."""
    from video_captioning_tpu.models.backbones.resnet import (
        apply_resnet50,
        apply_resnet50_folded,
        fold_bn,
    )

    params = _randomized_resnet_params(seed=7)
    # 64x64 input -> stage-1 blocks run at (2,16,16,256): batch_tile fits
    # and M=512 is divisible, so the fused kernel genuinely engages.
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 64, 64, 3))
    ref = np.asarray(apply_resnet50(params, x))
    got = np.asarray(
        apply_resnet50_folded(fold_bn(params), x, use_pallas=True,
                              interpret=True)
    )
    # rtol 2e-3: the fused kernel reorders fp32 accumulation and the
    # randomized (unnormalized) params blow activations up to ~1e6,
    # amplifying rounding; realistic-weight parity is covered by the
    # torch-oracle folded test above.
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-5)


def test_resnet50_s2d_stem_matches_unfolded():
    """Space-to-depth stem (4x4/1 conv over 2x2-cell input) is an exact
    rewrite of the 7x7/2 pad-3 stem conv — zero taps added, same math."""
    from video_captioning_tpu.models.backbones.resnet import (
        apply_resnet50,
        apply_resnet50_folded,
        fold_bn,
    )

    params = _randomized_resnet_params(seed=3)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 3))
    ref = np.asarray(apply_resnet50(params, x))
    got = np.asarray(
        apply_resnet50_folded(fold_bn(params), x, use_pallas=False,
                              stem_s2d=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


def test_s2d_stem_conv_exact():
    """Stem-conv-only equivalence at tight tolerance (single conv, so only
    conv-algorithm accumulation order can differ)."""
    from video_captioning_tpu.models.backbones.resnet import (
        _s2d_stem_input,
        _s2d_stem_kernel,
    )

    k = jax.random.normal(jax.random.PRNGKey(5), (7, 7, 3, 64))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 224, 224, 3))
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = jax.lax.conv_general_dilated(
        _s2d_stem_input(x), _s2d_stem_kernel(k), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.shape == ref.shape == (2, 112, 112, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_feature_extractor_variants_agree():
    """The folded / fused / s2d FeatureExtractor variants return the same
    features as the default XLA path (same seed → same weights)."""
    from video_captioning_tpu.config import Config
    from video_captioning_tpu.models.backbones import FeatureExtractor

    frames = np.random.RandomState(1).randint(0, 255, (4, 64, 64, 3), np.uint8)
    base = FeatureExtractor("resnet50", None, batch_size=4,
                            allow_random_init=True, seed=9)
    ref = base.extract(frames)

    cfg = Config()
    cfg.kernels.interpret = True  # fused bottleneck kernel on CPU
    for variant in ("folded", "fused", "fused_s2d"):
        fx = FeatureExtractor("resnet50", cfg, batch_size=4,
                              allow_random_init=True, seed=9, variant=variant)
        got = fx.extract(frames)
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-4,
                                   err_msg=variant)


def test_feature_extractor_variant_from_config():
    from video_captioning_tpu.config import Config
    from video_captioning_tpu.models.backbones import FeatureExtractor

    cfg = Config()
    cfg.kernels.resnet50_variant = "folded"
    fx = FeatureExtractor("resnet50", cfg, batch_size=4,
                          allow_random_init=True)
    assert fx.variant == "folded"
    with pytest.raises(ValueError, match="no 'folded' variant"):
        FeatureExtractor("vgg16", None, allow_random_init=True,
                         variant="folded")
    with pytest.raises(ValueError, match="compute_dtype"):
        FeatureExtractor("resnet50", None, allow_random_init=True,
                         compute_dtype="float16")


def test_feature_extractor_bf16_compute():
    from video_captioning_tpu.models.backbones import FeatureExtractor

    frames = np.random.RandomState(2).randint(0, 255, (4, 64, 64, 3), np.uint8)
    f32 = FeatureExtractor("resnet50", None, batch_size=4,
                           allow_random_init=True, seed=9)
    bf = FeatureExtractor("resnet50", None, batch_size=4,
                          allow_random_init=True, seed=9,
                          compute_dtype="bfloat16")
    a, b = f32.extract(frames), bf.extract(frames)
    assert b.dtype == np.float32  # outputs always fp32
    # bf16 compute through 50 layers: loose agreement only.
    assert np.mean(np.abs(a - b)) / (np.mean(np.abs(a)) + 1e-6) < 0.15


def test_resnet50_int8_feature_error_bounded():
    """W8A8 PTQ features track the fp32 folded features (resnet_int8.py).

    int8 is an APPROXIMATE opt-in serving variant — this pins its quality
    contract: high cosine similarity / bounded relative L2 of the pooled
    2048-d features, with calibration on the same distribution."""
    from video_captioning_tpu.models.backbones.resnet import (
        apply_resnet50_folded, fold_bn)
    from video_captioning_tpu.models.backbones.resnet_int8 import (
        apply_resnet50_int8, calibrate_resnet50_int8, feature_error,
        quantize_resnet50_int8)

    folded = fold_bn(_randomized_resnet_params())
    rs = np.random.RandomState(3)
    imgs = jnp.asarray(rs.randn(8, 64, 64, 3).astype(np.float32))
    ref = apply_resnet50_folded(folded, imgs, use_pallas=False)

    scales = calibrate_resnet50_int8(folded, imgs, batch_size=4)
    qp = quantize_resnet50_int8(folded, scales)
    got = apply_resnet50_int8(qp, imgs)
    assert np.asarray(got).shape == (8, 2048)
    err = feature_error(ref, got)
    assert err["mean_cosine"] > 0.99, err
    assert err["rel_l2"] < 0.12, err


def test_resnet50_int8_pallas_1x1_matches_xla():
    """kernels.int8_conv1x1_pallas routes the 1x1 convs through the fused
    Pallas int8 matmul+requant kernels (ops/int8_matmul_pallas.py) — same
    quantized weights, same epilogue op order. Exact bit-parity with the
    XLA composite is unattainable (the epilogue's scale*acc+bias rounds
    once under XLA's FMA and twice in the kernel — a 1-ulp f32 diff that
    flips the occasional requant at a .5 boundary by +/-1 int8 step and
    cascades through 16 blocks), so the gate is the int8 variant's own
    quality contract: the Pallas features must track the fp32 folded
    reference as closely as the XLA-int8 features do, and the two int8
    paths must agree far inside the quantization-noise floor."""
    from video_captioning_tpu.models.backbones.resnet import (
        apply_resnet50_folded, fold_bn)
    from video_captioning_tpu.models.backbones.resnet_int8 import (
        apply_resnet50_int8, calibrate_resnet50_int8, feature_error,
        quantize_resnet50_int8)

    folded = fold_bn(_randomized_resnet_params())
    rs = np.random.RandomState(5)
    imgs = jnp.asarray(rs.randn(4, 64, 64, 3).astype(np.float32))
    fp32_ref = apply_resnet50_folded(folded, imgs, use_pallas=False)
    scales = calibrate_resnet50_int8(folded, imgs, batch_size=4)
    qp = quantize_resnet50_int8(folded, scales)
    ref = apply_resnet50_int8(qp, imgs)
    got = apply_resnet50_int8(qp, imgs, use_pallas_1x1=True, interpret=True)
    err_xla = feature_error(fp32_ref, ref)
    err_pal = feature_error(fp32_ref, got)
    # Same quality contract as test_resnet50_int8_feature_error_bounded,
    # and no worse than the XLA int8 path beyond quantization noise.
    assert err_pal["mean_cosine"] > 0.99, (err_pal, err_xla)
    assert err_pal["rel_l2"] < 0.12, (err_pal, err_xla)
    assert err_pal["rel_l2"] < err_xla["rel_l2"] + 0.02, (err_pal, err_xla)
    cross = feature_error(ref, got)
    assert cross["mean_cosine"] > 0.995, cross


def test_feature_extractor_int8_variant():
    """variant="int8" lazily calibrates on the first batch and returns
    features close to the folded fp32 extractor's."""
    from video_captioning_tpu.models.backbones import FeatureExtractor

    frames = np.random.RandomState(4).randint(0, 255, (8, 64, 64, 3), np.uint8)
    ref = FeatureExtractor("resnet50", None, batch_size=4,
                           allow_random_init=True, seed=9,
                           variant="folded").extract(frames)
    fx = FeatureExtractor("resnet50", None, batch_size=4,
                          allow_random_init=True, seed=9, variant="int8")
    assert not fx._int8_calibrated
    got = fx.extract(frames)
    assert fx._int8_calibrated
    assert got.shape == ref.shape and got.dtype == np.float32
    cos = np.sum(ref * got, -1) / np.maximum(
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1), 1e-8)
    assert cos.mean() > 0.99, cos
    # Recalibration is one-shot: a second extract reuses the program.
    again = fx.extract(frames)
    np.testing.assert_array_equal(got, again)


def test_vgg16_int8_feature_error_bounded():
    """W8A8 PTQ VGG16 fc7 features track the fp32 features (vgg_int8.py)."""
    from video_captioning_tpu.models.backbones.vgg import apply_vgg16, init_vgg16
    from video_captioning_tpu.models.backbones.resnet_int8 import feature_error
    from video_captioning_tpu.models.backbones.vgg_int8 import (
        apply_vgg16_int8, calibrate_vgg16_int8, quantize_vgg16_int8)

    params = init_vgg16(jax.random.PRNGKey(5))
    rs = np.random.RandomState(6)
    imgs = jnp.asarray(rs.randn(6, 64, 64, 3).astype(np.float32))
    ref = apply_vgg16(params, imgs)

    scales = calibrate_vgg16_int8(params, imgs, batch_size=3)
    qp = quantize_vgg16_int8(params, scales)
    got = apply_vgg16_int8(qp, imgs)
    assert np.asarray(got).shape == (6, 4096)
    err = feature_error(ref, got)
    assert err["mean_cosine"] > 0.99, err
    assert err["rel_l2"] < 0.12, err


def test_feature_extractor_vgg16_int8_variant():
    from video_captioning_tpu.models.backbones import FeatureExtractor

    frames = np.random.RandomState(8).randint(0, 255, (6, 64, 64, 3), np.uint8)
    ref = FeatureExtractor("vgg16", None, batch_size=3,
                           allow_random_init=True, seed=2).extract(frames)
    fx = FeatureExtractor("vgg16", None, batch_size=3,
                          allow_random_init=True, seed=2, variant="int8")
    got = fx.extract(frames)
    assert got.shape == ref.shape and got.dtype == np.float32
    cos = np.sum(ref * got, -1) / np.maximum(
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1), 1e-8)
    assert cos.mean() > 0.99, cos
