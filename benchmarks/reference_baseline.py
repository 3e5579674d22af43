"""Measure the reference implementation's throughput on this machine.

The reference (angadbawa/Video-Captioning) publishes no numbers
(BASELINE.md), so the baseline is measured by *running the reference code*
(mounted read-only at /root/reference) on the same workload bench.py uses:
batch captioning from pre-extracted features, beam=5 and greedy, at
reference-default model scale. No GPU exists in this environment, so the
reference runs on torch-CPU — recorded as such in the output JSON.

The reference package's own ``src/config/__init__.py`` imports nonexistent
modules (SURVEY §2), so we import its real modules directly by path with
stub parent packages — executing the reference's code unmodified without
executing its broken ``__init__``.

Usage: python benchmarks/reference_baseline.py [--clips N] [--out FILE]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
import types
from pathlib import Path

REF_ROOT = Path("/root/reference/src")


class _ShimModelConfig:
    """Reference ModelConfig defaults (config.py:9-31) as a plain object.
    The reference's own config.py cannot execute under Python 3.12 (mutable
    dataclass defaults raise ValueError), so the *model* code runs
    unmodified against this attribute-compatible shim."""

    cnn_feature_dim = 4096
    encoder_hidden_dim = 512
    encoder_num_layers = 2
    encoder_dropout = 0.3
    decoder_hidden_dim = 512
    decoder_num_layers = 2
    decoder_dropout = 0.3
    vocab_size = 10000
    embedding_dim = 512
    attention_dim = 512
    use_attention = True
    max_sequence_length = 20
    video_sequence_length = 80


class _ShimConfig:
    def __init__(self):
        self.model = _ShimModelConfig()


def load_reference_modules():
    """Import reference model modules by file path, bypassing the package's
    broken __init__ (imports nonexistent modules) and stubbing torchvision
    (not installed here; only used by the CNN wrappers we don't run)."""
    pkgs = {
        "refsrc": REF_ROOT,
        "refsrc.config": REF_ROOT / "config",
        "refsrc.models": REF_ROOT / "models",
        "refsrc.data": REF_ROOT / "data",
    }
    for name, path in pkgs.items():
        mod = types.ModuleType(name)
        mod.__path__ = [str(path)]
        sys.modules[name] = mod

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")

        def _unavailable(*a, **k):
            raise RuntimeError("torchvision not available in this environment")

        tv_models.vgg16 = _unavailable
        tv_models.resnet50 = _unavailable
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models

    # The reference's config module crashes at import under Python 3.12;
    # provide an attribute-compatible stand-in for the relative import.
    cfg_mod = types.ModuleType("refsrc.config.config")
    cfg_mod.Config = _ShimConfig
    sys.modules["refsrc.config.config"] = cfg_mod

    def load(name, relpath):
        spec = importlib.util.spec_from_file_location(name, REF_ROOT / relpath)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("refsrc.models.attention", "models/attention.py")
    load("refsrc.models.encoder", "models/encoder.py")
    load("refsrc.models.decoder", "models/decoder.py")
    model_mod = load(
        "refsrc.models.video_captioning_model", "models/video_captioning_model.py"
    )
    return cfg_mod, model_mod


def measure(clips: int, beam_size: int, runs: int = 3) -> dict:
    import torch

    torch.manual_seed(0)
    cfg_mod, model_mod = load_reference_modules()
    config = cfg_mod.Config()
    vocab_size = 10000

    model = model_mod.VideoCaptioningModel(config, vocab_size)
    model.eval()
    # Match bench.py: suppress the END token so decoding always runs the
    # full max_length (random weights would otherwise END immediately and
    # measure an empty loop).
    with torch.no_grad():
        model.decoder.output_projection.bias[2] = -1e9

    feats = torch.randn(clips, 80, config.model.cnn_feature_dim)

    results = {}
    with torch.no_grad():
        for method, kwargs in [
            ("greedy", {}),
            ("beam", {"beam_size": beam_size, "length_penalty": 1.0}),
        ]:
            # warmup
            model.generate(
                feats[:2], start_token_id=1, end_token_id=2, max_length=20,
                method=method, **kwargs,
            )
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                model.generate(
                    feats, start_token_id=1, end_token_id=2, max_length=20,
                    method=method, **kwargs,
                )
                times.append(time.perf_counter() - t0)
            best = min(times)
            results[method] = {
                "clips": clips,
                "seconds": best,
                "clips_per_sec": clips / best,
            }
    return results


def measure_training(batch: int, steps: int = 10) -> dict:
    """Reference training hot loop (trainer.py:198-237): forward, CE loss
    w/ label smoothing, backward, clip 5.0, Adam step — on torch CPU."""
    import torch

    torch.manual_seed(0)
    cfg_mod, model_mod = load_reference_modules()
    config = cfg_mod.Config()
    vocab_size = 10000
    model = model_mod.VideoCaptioningModel(config, vocab_size)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=1e-5)
    crit = torch.nn.CrossEntropyLoss(ignore_index=0, label_smoothing=0.1)

    feats = torch.randn(batch, 80, config.model.cnn_feature_dim)
    tokens = torch.randint(0, vocab_size, (batch, 20))

    def step():
        out = model(video_features=feats, input_tokens=tokens, target_tokens=tokens)
        loss = crit(out["logits"].reshape(-1, vocab_size), tokens.reshape(-1))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    elapsed = time.perf_counter() - t0
    return {
        "batch": batch,
        "steps_per_sec": steps / elapsed,
        "clips_per_sec": steps * batch / elapsed,
    }


def _torch_vgg16_shaped():
    """torchvision.models.vgg16 architecture rebuilt with plain torch
    modules (torchvision is not installed here). Weights are random — the
    pretrained files are unreachable offline — but the architecture, and
    therefore the CPU wall time being measured, is identical."""
    import torch

    nn = torch.nn
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for item in plan:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, item, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            cin = item
    model = nn.Sequential()
    model.add_module("features", nn.Sequential(*layers))
    model.add_module("avgpool", nn.AdaptiveAvgPool2d((7, 7)))
    model.add_module("classifier", nn.Sequential(
        nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
        nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
        nn.Linear(4096, 1000),
    ))

    class _VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = model.features
            self.avgpool = model.avgpool
            self.classifier = model.classifier

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    return _VGG()


def _install_transforms_stub():
    """Minimal torchvision.transforms equivalents (Compose/Resize/ToTensor/
    Normalize) doing the same CPU work torchvision's do — needed to execute
    the reference's preprocess.py unmodified."""
    import numpy as np
    import torch
    from PIL import Image

    tv = sys.modules["torchvision"]
    t = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for f in self.ts:
                x = f(x)
            return x

    class Resize:
        def __init__(self, size):
            self.size = size if isinstance(size, tuple) else (size, size)

        def __call__(self, img):
            return img.resize((self.size[1], self.size[0]), Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            a = np.asarray(img, dtype=np.uint8)
            return torch.from_numpy(a.copy()).permute(2, 0, 1).float().div_(255.0)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(3, 1, 1)
            self.std = torch.tensor(std).view(3, 1, 1)

        def __call__(self, x):
            return (x - self.mean) / self.std

    t.Compose, t.Resize, t.ToTensor, t.Normalize = Compose, Resize, ToTensor, Normalize
    tv.transforms = t
    sys.modules["torchvision.transforms"] = t


def load_reference_preprocess():
    """Import the reference's preprocess.py unmodified (its VideoFeature-
    Extractor, preprocess.py:25-226), with torchvision.models.vgg16 and
    torchvision.transforms provided by the stubs above and the broken
    ``src.*`` imports shimmed."""
    import torch

    load_reference_modules()  # installs refsrc + torchvision stub
    _install_transforms_stub()
    tv_models = sys.modules["torchvision.models"]
    tv_models.vgg16 = lambda pretrained=True, **k: _torch_vgg16_shaped()

    # preprocess.py imports `src.config.config` / `src.models.encoder` /
    # `src.utils.logging` at top level.
    src_pkg = types.ModuleType("src")
    src_pkg.__path__ = [str(REF_ROOT)]
    sys.modules.setdefault("src", src_pkg)
    sys.modules["src.config"] = sys.modules["refsrc.config"]
    sys.modules["src.config.config"] = sys.modules["refsrc.config.config"]
    sys.modules["src.models"] = sys.modules["refsrc.models"]
    sys.modules["src.models.encoder"] = sys.modules["refsrc.models.encoder"]
    ulog = types.ModuleType("src.utils.logging")
    ulog.setup_logging = lambda *a, **k: None
    sys.modules.setdefault("src.utils", types.ModuleType("src.utils"))
    sys.modules["src.utils.logging"] = ulog

    spec = importlib.util.spec_from_file_location(
        "ref_preprocess", REF_ROOT / "preprocess.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_preprocess"] = mod
    spec.loader.exec_module(mod)
    return mod


def measure_full_pipeline(clips: int, runs: int = 2) -> dict:
    """The BASELINE north-star slice on the reference's own code: frames →
    VGG16 fc7 (preprocess.py:125-154, unmodified, mini-batched CNN) →
    BiLSTM encoder → beam-5 captions (video_captioning_model.py). Video
    decode is excluded on BOTH sides (ours measures resident frames; no
    videos exist in this environment)."""
    import numpy as np
    import torch

    torch.manual_seed(0)
    pre = load_reference_preprocess()
    cfg_mod, model_mod = load_reference_modules()
    config = cfg_mod.Config()

    extractor = pre.VideoFeatureExtractor(
        model_type="vgg16", device=torch.device("cpu"),
        batch_size=32, frames_per_video=80,
    )
    model = model_mod.VideoCaptioningModel(config, 10000)
    model.eval()
    with torch.no_grad():
        model.decoder.output_projection.bias[2] = -1e9

    rs = np.random.RandomState(0)
    frames = [
        rs.randint(0, 255, (224, 224, 3), np.uint8) for _ in range(80)
    ]

    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        feats = []
        for _clip in range(clips):
            feats.append(extractor.extract_features_from_frames(frames))
        feats = torch.from_numpy(np.stack(feats)).float()
        with torch.no_grad():
            model.generate(
                feats, start_token_id=1, end_token_id=2, max_length=20,
                method="beam", beam_size=5, length_penalty=1.0,
            )
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {
        "clips": clips,
        "seconds": best,
        "clips_per_sec": clips / best,
        "note": "frames->VGG16 fc7 (reference preprocess.py, random weights, "
                "identical architecture)->BiLSTM->beam-5; video decode "
                "excluded on both sides",
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clips", type=int, default=16)
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--train", action="store_true",
                        help="also measure the training step")
    parser.add_argument("--full-pipeline", action="store_true",
                        help="also measure frames->VGG16->beam-5 (CNN-inclusive)")
    parser.add_argument("--full-clips", type=int, default=4)
    parser.add_argument(
        "--out", type=str, default=str(Path(__file__).parent / "reference_cpu.json")
    )
    args = parser.parse_args()

    results = measure(args.clips, args.beam_size, args.runs)
    if args.train:
        results["train_step"] = measure_training(32)
    if args.full_pipeline:
        results["full_pipeline_vgg16_beam5"] = measure_full_pipeline(args.full_clips)
    payload = {
        "hardware": "cpu (no GPU available; reference GPU path unmeasurable here)",
        "model_scale": "reference defaults: 4096-d feats, 512 hidden, 2+2 layers, vocab 10000",
        "workload": "batch captioning from features, max_length=20",
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
