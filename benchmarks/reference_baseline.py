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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clips", type=int, default=16)
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--train", action="store_true",
                        help="also measure the training step")
    parser.add_argument(
        "--out", type=str, default=str(Path(__file__).parent / "reference_cpu.json")
    )
    args = parser.parse_args()

    results = measure(args.clips, args.beam_size, args.runs)
    if args.train:
        results["train_step"] = measure_training(32)
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
