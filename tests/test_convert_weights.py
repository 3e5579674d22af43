"""convert-weights CLI: torchvision state dict -> native .npz round trip
(VERDICT r2 item 5 — pretrained-weight delivery tooling)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _synthetic_resnet_state(torch):
    """torchvision-shaped resnet50 state dict with random values."""
    from tests.test_backbones import _torch_resnet50

    torch.manual_seed(0)
    model = _torch_resnet50(torch).eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    return model.state_dict()


def test_convert_pth_roundtrip_resnet50(tmp_path):
    torch = pytest.importorskip("torch")
    from video_captioning_tpu.cli import convert_weights
    from video_captioning_tpu.models.backbones import FeatureExtractor
    from video_captioning_tpu.models.backbones.resnet import load_torch_resnet50

    state = _synthetic_resnet_state(torch)
    pth = tmp_path / "resnet50.pth"
    torch.save(state, pth)

    out = tmp_path / "resnet50.vcw.npz"
    convert_weights.main([
        "--input", str(pth), "--model-type", "resnet50",
        "--output", str(out),
    ])
    assert out.exists()

    # Native load == direct torch-format load, through the extractor API.
    fx_native = FeatureExtractor("resnet50", None, weights_path=out,
                                 batch_size=4)
    direct = load_torch_resnet50({k: v.numpy() for k, v in state.items()})
    frames = np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3), np.uint8)
    feats = fx_native.extract(frames)
    fx_native.params = direct  # reuse the jitted fn with direct params
    feats_direct = fx_native.extract(frames)
    np.testing.assert_allclose(feats, feats_direct, rtol=1e-5, atol=1e-5)


def test_convert_rejects_wrong_architecture(tmp_path):
    torch = pytest.importorskip("torch")
    from video_captioning_tpu.cli import convert_weights

    state = _synthetic_resnet_state(torch)
    pth = tmp_path / "resnet50.pth"
    torch.save(state, pth)
    with pytest.raises(SystemExit, match="vgg16"):
        convert_weights.convert(pth, "vgg16", tmp_path / "out.npz")


def test_native_checksum_validation(tmp_path):
    torch = pytest.importorskip("torch")
    from video_captioning_tpu.cli import convert_weights

    state = _synthetic_resnet_state(torch)
    pth = tmp_path / "resnet50.pth"
    torch.save(state, pth)
    out = tmp_path / "resnet50.vcw.npz"
    convert_weights.convert(pth, "resnet50", out)

    # Corrupt one leaf and re-save -> load must fail the digest check.
    data = dict(np.load(out))
    key = next(k for k in data if not k.startswith("__"))
    data[key] = data[key] + 1.0
    np.savez(out, **data)
    with pytest.raises(ValueError, match="checksum"):
        convert_weights.load_native(out)


def test_wrong_model_type_mismatch_raises(tmp_path):
    torch = pytest.importorskip("torch")
    from video_captioning_tpu.cli import convert_weights
    from video_captioning_tpu.models.backbones import FeatureExtractor

    state = _synthetic_resnet_state(torch)
    pth = tmp_path / "resnet50.pth"
    torch.save(state, pth)
    out = tmp_path / "resnet50.vcw.npz"
    convert_weights.convert(pth, "resnet50", out)
    with pytest.raises(ValueError, match="resnet50"):
        FeatureExtractor("vgg16", None, weights_path=out)


def test_unflatten_inverts_flatten():
    from video_captioning_tpu.cli.convert_weights import _flatten, _unflatten

    tree = {
        "a": np.ones((2,)),
        "stages": [
            [{"w": np.zeros((3,))}, {"w": np.ones((3,))}],
            [{"w": np.full((3,), 2.0)}],
        ],
    }
    rt = _unflatten(_flatten(tree))
    assert isinstance(rt["stages"], list)
    assert isinstance(rt["stages"][0], list)
    np.testing.assert_array_equal(rt["stages"][1][0]["w"], np.full((3,), 2.0))
    flat1 = _flatten(tree)
    flat2 = _flatten(rt)
    assert flat1.keys() == flat2.keys()


def test_int8_save_load_roundtrip(tmp_path):
    """Calibrate → save_int8 → load via weights_path gives bit-identical
    features with NO recalibration (the vcw-int8-v1 serving path)."""
    from video_captioning_tpu.models.backbones import FeatureExtractor

    frames = np.random.RandomState(5).randint(0, 255, (8, 64, 64, 3), np.uint8)
    fx = FeatureExtractor("resnet50", None, batch_size=4,
                          allow_random_init=True, seed=4, variant="int8")
    fx.calibrate_int8(frames)
    feats = fx.extract(frames)

    qfile = tmp_path / "resnet50.int8.npz"
    meta = fx.save_int8(qfile)
    assert meta["format"] == "vcw-int8-v1"
    assert meta["int8_bytes"] > 10_000_000  # ~25M int8 weights

    fx2 = FeatureExtractor("resnet50", None, batch_size=4,
                           weights_path=qfile, variant="int8")
    assert fx2._int8_calibrated  # no lazy calibration needed
    np.testing.assert_array_equal(feats, fx2.extract(frames))

    # A quantized file implies variant="int8" when none is given.
    fx3 = FeatureExtractor("resnet50", None, batch_size=4,
                           weights_path=qfile)
    assert fx3.variant == "int8"
    np.testing.assert_array_equal(feats, fx3.extract(frames))
    # Explicit non-int8 variant and wrong-model guards.
    with pytest.raises(ValueError, match="variant='int8'"):
        FeatureExtractor("resnet50", None, weights_path=qfile,
                         variant="folded")
    with pytest.raises(ValueError, match="holds resnet50"):
        FeatureExtractor("vgg16", None, weights_path=qfile, variant="int8")


def test_int8_file_checksum_validation(tmp_path):
    from video_captioning_tpu.cli import convert_weights
    from video_captioning_tpu.models.backbones import FeatureExtractor

    frames = np.random.RandomState(6).randint(0, 255, (4, 64, 64, 3), np.uint8)
    fx = FeatureExtractor("resnet50", None, batch_size=4,
                          allow_random_init=True, seed=4, variant="int8")
    fx.calibrate_int8(frames)
    qfile = tmp_path / "q.npz"
    fx.save_int8(qfile)

    data = dict(np.load(qfile))
    key = next(k for k, v in data.items()
               if not k.startswith("__") and v.dtype == np.int8)
    data[key] = data[key].copy()
    data[key].flat[0] ^= 0x7F  # tamper
    np.savez(qfile, **data)
    with pytest.raises(ValueError, match="checksum mismatch"):
        convert_weights.load_int8_weights(qfile)


def test_int8_unquantized_file_guard(tmp_path):
    """load_native on an int8 file (and vice versa) raises clearly."""
    from video_captioning_tpu.cli import convert_weights
    from video_captioning_tpu.models.backbones import FeatureExtractor

    frames = np.random.RandomState(7).randint(0, 255, (4, 64, 64, 3), np.uint8)
    fx = FeatureExtractor("resnet50", None, batch_size=4,
                          allow_random_init=True, seed=4, variant="int8")
    fx.calibrate_int8(frames)
    qfile = tmp_path / "q.npz"
    fx.save_int8(qfile)
    with pytest.raises(ValueError, match="QUANTIZED"):
        convert_weights.load_native(qfile)
    # save_int8 before calibration is an error
    fx3 = FeatureExtractor("resnet50", None, batch_size=4,
                           allow_random_init=True, seed=4, variant="int8")
    with pytest.raises(ValueError, match="not calibrated"):
        fx3.save_int8(tmp_path / "nope.npz")


def test_int8_save_load_roundtrip_vgg16(tmp_path):
    from video_captioning_tpu.models.backbones import FeatureExtractor

    frames = np.random.RandomState(9).randint(0, 255, (4, 64, 64, 3), np.uint8)
    fx = FeatureExtractor("vgg16", None, batch_size=4,
                          allow_random_init=True, seed=2, variant="int8")
    fx.calibrate_int8(frames)
    feats = fx.extract(frames)
    qfile = tmp_path / "vgg16.int8.npz"
    fx.save_int8(qfile)
    fx2 = FeatureExtractor("vgg16", None, batch_size=4, weights_path=qfile)
    assert fx2.variant == "int8" and fx2._int8_calibrated
    np.testing.assert_array_equal(feats, fx2.extract(frames))


def test_int8_file_missing_leaf_detected(tmp_path):
    """Deleting leaves (not just mutating them) fails the manifest check."""
    from video_captioning_tpu.cli import convert_weights
    from video_captioning_tpu.models.backbones import FeatureExtractor

    frames = np.random.RandomState(10).randint(0, 255, (4, 64, 64, 3), np.uint8)
    fx = FeatureExtractor("resnet50", None, batch_size=4,
                          allow_random_init=True, seed=4, variant="int8")
    fx.calibrate_int8(frames)
    qfile = tmp_path / "q.npz"
    fx.save_int8(qfile)

    data = dict(np.load(qfile))
    victim = next(k for k in data if k.startswith("stages/3/2/"))
    removed = {k: v for k, v in data.items()
               if not k.startswith("stages/3/2/")}
    np.savez(qfile, **removed)
    with pytest.raises(ValueError, match="leaf set"):
        convert_weights.load_int8_weights(qfile)
    assert victim  # sanity: something was actually removed


def test_int8_guard_errors(tmp_path):
    from video_captioning_tpu.cli import convert_weights
    from video_captioning_tpu.models.backbones import FeatureExtractor

    frames = np.random.RandomState(11).randint(0, 255, (4, 64, 64, 3), np.uint8)
    fx = FeatureExtractor("resnet50", None, batch_size=4,
                          allow_random_init=True, seed=4, variant="int8")
    fx.calibrate_int8(frames)
    # np.savez would silently append .npz; we refuse the misleading path.
    with pytest.raises(ValueError, match="must end in .npz"):
        fx.save_int8(tmp_path / "weights.int8")
    qfile = tmp_path / "q.npz"
    fx.save_int8(qfile)

    # Recalibrating an extractor loaded from a quantized file is a clear
    # error (no fp32 weights to calibrate from), not an AttributeError.
    fx2 = FeatureExtractor("resnet50", None, batch_size=4, weights_path=qfile)
    with pytest.raises(ValueError, match="quantized weights file"):
        fx2.calibrate_int8(frames)

    # --calib-random must be >= 1.
    with pytest.raises(SystemExit, match="at least 1"):
        convert_weights.main([
            "--input", "x.npz", "--model-type", "resnet50",
            "--output", str(tmp_path / "o.npz"),
            "--emit-int8", str(tmp_path / "o8.npz"),
            "--calib-random", "0",
        ])


# ---------------------------------------------------------------------------
# Real-torchvision key-layout contract (VERDICT r4 item 8)
#
# The lists below enumerate the EXACT state-dict key layout of current
# torchvision's vgg16 / resnet50 (the artifacts docs/WEIGHTS.md pins:
# vgg16-397923af.pth, resnet50-0676ba61.pth), written out independently of
# any locally-built torch module so a drift in our oracles can't mask a
# drift from the real .pth layout. Built torch-free (pickle input path).
# ---------------------------------------------------------------------------

# torchvision vgg16: conv indices inside the 'features' Sequential
# (ReLU between convs, MaxPool at 4/9/16/23/30) and their (out, in) chans.
_TV_VGG16_CONVS = [
    (0, 64, 3), (2, 64, 64),
    (5, 128, 64), (7, 128, 128),
    (10, 256, 128), (12, 256, 256), (14, 256, 256),
    (17, 512, 256), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
# classifier Sequential: Linear at 0 / 3 / 6 (ReLU+Dropout between).
_TV_VGG16_FCS = [(0, 4096, 25088), (3, 4096, 4096), (6, 1000, 4096)]

_TV_RESNET50_STAGES = [  # (layer name, n blocks, bottleneck width, in chans)
    ("layer1", 3, 64, 64),
    ("layer2", 4, 128, 256),
    ("layer3", 6, 256, 512),
    ("layer4", 3, 512, 1024),
]


def _real_torchvision_vgg16_state():
    rs = np.random.RandomState(0)
    state = {}
    for idx, cout, cin in _TV_VGG16_CONVS:
        state[f"features.{idx}.weight"] = rs.randn(
            cout, cin, 3, 3).astype(np.float32) * 0.05
        state[f"features.{idx}.bias"] = rs.randn(cout).astype(np.float32) * 0.05
    for idx, cout, cin in _TV_VGG16_FCS:
        state[f"classifier.{idx}.weight"] = rs.randn(
            cout, cin).astype(np.float32) * 0.01
        state[f"classifier.{idx}.bias"] = rs.randn(cout).astype(np.float32) * 0.01
    return state


def _real_torchvision_resnet50_state():
    rs = np.random.RandomState(0)
    state = {}

    def conv(name, cout, cin, k):
        state[f"{name}.weight"] = rs.randn(
            cout, cin, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        state[f"{name}.weight"] = rs.uniform(0.5, 1.5, c).astype(np.float32)
        state[f"{name}.bias"] = rs.randn(c).astype(np.float32) * 0.05
        state[f"{name}.running_mean"] = rs.randn(c).astype(np.float32) * 0.05
        state[f"{name}.running_var"] = rs.uniform(0.5, 1.5, c).astype(np.float32)
        # Present in every real torchvision state dict; loaders must
        # tolerate it.
        state[f"{name}.num_batches_tracked"] = np.asarray(100, np.int64)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    for layer, n_blocks, width, cin in _TV_RESNET50_STAGES:
        for b in range(n_blocks):
            block_cin = cin if b == 0 else width * 4
            conv(f"{layer}.{b}.conv1", width, block_cin, 1)
            bn(f"{layer}.{b}.bn1", width)
            conv(f"{layer}.{b}.conv2", width, width, 3)
            bn(f"{layer}.{b}.bn2", width)
            conv(f"{layer}.{b}.conv3", width * 4, width, 1)
            bn(f"{layer}.{b}.bn3", width * 4)
            if b == 0:
                conv(f"{layer}.{b}.downsample.0", width * 4, block_cin, 1)
                bn(f"{layer}.{b}.downsample.1", width * 4)
    state["fc.weight"] = rs.randn(1000, 2048).astype(np.float32) * 0.01
    state["fc.bias"] = rs.randn(1000).astype(np.float32) * 0.01
    return state


def _pickle_state(tmp_path, state, name):
    import pickle

    p = tmp_path / name
    with open(p, "wb") as f:
        pickle.dump(state, f)
    return p


def test_real_torchvision_vgg16_key_layout(tmp_path):
    """A state dict with the real torchvision vgg16 key layout converts and
    serves first try (shapes checked end-to-end by the jitted forward)."""
    from video_captioning_tpu.cli import convert_weights
    from video_captioning_tpu.models.backbones import FeatureExtractor

    state = _real_torchvision_vgg16_state()
    src = _pickle_state(tmp_path, state, "vgg16-397923af.pkl")
    out = tmp_path / "vgg16.vcw.npz"
    meta = convert_weights.convert(src, "vgg16", out)
    # 13 convs + fc6 + fc7, kernel+bias each (classifier.6 dropped — the
    # reference serves fc7 features, src/models/encoder.py:116-120).
    assert len(meta["sha256"]) == 2 * (13 + 2)
    fx = FeatureExtractor("vgg16", None, weights_path=out, batch_size=4)
    frames = np.random.RandomState(1).randint(0, 255, (2, 224, 224, 3),
                                              np.uint8)
    feats = fx.extract(frames)
    assert feats.shape == (2, 4096)
    assert np.all(np.isfinite(feats))


def test_real_torchvision_resnet50_key_layout(tmp_path):
    """Same contract for the real torchvision resnet50 layout, including
    the num_batches_tracked buffers every real .pth carries."""
    from video_captioning_tpu.cli import convert_weights
    from video_captioning_tpu.models.backbones import FeatureExtractor

    state = _real_torchvision_resnet50_state()
    src = _pickle_state(tmp_path, state, "resnet50-0676ba61.pkl")
    out = tmp_path / "resnet50.vcw.npz"
    meta = convert_weights.convert(src, "resnet50", out)
    fx = FeatureExtractor("resnet50", None, weights_path=out, batch_size=4)
    frames = np.random.RandomState(1).randint(0, 255, (2, 96, 96, 3),
                                              np.uint8)
    feats = fx.extract(frames)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(feats))


def test_torchvision_oracle_state_dict_matches_pinned_layout():
    """The locally-built torch oracles expose EXACTLY the pinned real
    torchvision key set — if either drifts, this localizes which."""
    torch = pytest.importorskip("torch")
    from tests.test_backbones import _torch_resnet50, _torch_vgg16

    vgg_keys = set(_torch_vgg16(torch).state_dict().keys())
    assert vgg_keys == set(_real_torchvision_vgg16_state().keys())

    resnet_keys = set(_torch_resnet50(torch).state_dict().keys())
    pinned = set(_real_torchvision_resnet50_state().keys())
    # The local oracle may omit the (unused) fc head / num_batches_tracked
    # buffers; every key the loader consumes must exist in the oracle, and
    # the oracle must not invent keys outside the real layout.
    consumed = {k for k in pinned
                if "num_batches_tracked" not in k
                and not k.startswith("fc.")}
    assert consumed <= resnet_keys
    assert resnet_keys <= pinned
