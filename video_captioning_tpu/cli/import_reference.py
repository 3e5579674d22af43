"""import-reference CLI: migrate a reference-trained checkpoint here.

A user of the reference (angadbawa/Video-Captioning) holds torch-saved
artifacts: the self-contained inference package written by
``src/utils/checkpoint.py:164-220`` (``model_for_inference.pth``), a
training checkpoint (``checkpoint.py:49-82``), or a raw
``VideoCaptioningModel.state_dict()``. This CLI converts any of them into
THIS framework's inference package (plus a standalone ``vocabulary.json``)
so the trained model serves here unchanged — the port math is the same
``models/torch_port.import_reference_state_dict`` mapping the parity gate
(tests/test_reference_parity.py) holds to token-identical greedy output.

    python -m video_captioning_tpu.cli.import_reference \
        --input checkpoints/model_for_inference.pth \
        --output-dir converted/

Raw state dicts and training checkpoints carry no vocabulary, so pass
``--vocabulary vocabulary.json`` (the file the reference's train.py writes
at src/train.py:103-114) alongside them. Architecture fields are read from
the embedded reference config when present; override non-defaults the same
way the reference's own CLIs do (``--attention-type`` has no reference flag
because the reference hardcodes bahdanau at src/models/decoder.py:38 —
that is also this flag's default).

Unpickling note: reference packages embed the reference's ``Config``
*object*, whose class lives in modules this repo does not ship
(``src.config.config``). The loader installs permissive stub modules so
those objects deserialize as plain attribute bags — we read their fields,
never execute their code.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import types
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

from ..config import Config
from ..utils.logging import setup_logging

logger = logging.getLogger(__name__)

# Module names a reference-trained pickle may reference for its config
# classes, depending on how the user launched training (repo root with the
# scripts' sys.path.append hack, installed package, or direct module run).
_STUB_MODULE_NAMES = (
    "src",
    "src.config",
    "src.config.config",
    "config",
    "config.config",
)


class _StubObject:
    """Attribute bag standing in for any reference class during unpickle.

    Plain-object pickling (the default for the reference's dataclasses)
    reconstructs via ``cls.__new__(cls)`` + ``__dict__`` update — both of
    which this class supports — so the embedded Config tree deserializes
    into readable attribute bags without importing reference code.
    """

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"_StubObject({self.__dict__!r})"


def _install_unpickle_stubs() -> list:
    """Register stub modules whose every (non-dunder) attribute is a fresh
    stub class. Returns the module names actually installed so the caller
    can uninstall them after the load — stray permissive modules in
    ``sys.modules`` confuse introspection tooling otherwise. Never
    replaces a real importable module already loaded."""
    installed = []
    for name in _STUB_MODULE_NAMES:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package so submodule lookups succeed

        def _getattr(attr: str, _mod_name=name):
            if attr.startswith("__") and attr.endswith("__"):
                # Dunder lookups (inspect's __file__, copy's __deepcopy__,
                # …) must fail normally — only CLASS names get stubs.
                raise AttributeError(attr)
            # One stub class per (module, attr) so pickle memoization and
            # isinstance checks inside a single load stay coherent.
            cls = type(attr, (_StubObject,), {"__module__": _mod_name})
            setattr(sys.modules[_mod_name], attr, cls)
            return cls

        mod.__getattr__ = _getattr  # PEP 562
        sys.modules[name] = mod
        installed.append(name)
    return installed


def load_reference_file(path: Path) -> Any:
    """torch.load a reference artifact with the unpickle stubs installed."""
    try:
        import torch  # host-side migration tool only; never on compute path
    except ImportError as e:  # pragma: no cover - torch is in CI image
        raise SystemExit(
            f"{path} is a torch checkpoint but torch is not installed; "
            "run this migration on a host with torch available"
        ) from e
    installed = _install_unpickle_stubs()
    try:
        # weights_only=False: reference packages embed config/vocabulary
        # objects, not just tensors. The stubs keep deserialization inert.
        return torch.load(path, map_location="cpu", weights_only=False)
    finally:
        for name in installed:
            sys.modules.pop(name, None)


def _looks_like_state_dict(obj: Any) -> bool:
    return (
        isinstance(obj, Mapping)
        and bool(obj)
        and all(isinstance(k, str) for k in obj)
        and any(k.startswith(("encoder.", "decoder.")) for k in obj)
    )


def extract_state_and_metadata(obj: Any) -> Dict[str, Any]:
    """Split a loaded reference artifact into its migration ingredients.

    Returns ``{"state_dict", "ref_config" (or None), "vocabulary" (raw
    reference vocab dict or None), "source_kind"}``. Accepts the inference
    package (src/utils/checkpoint.py:183-204), a training checkpoint
    (:49-82), or a bare ``model.state_dict()``.
    """
    if _looks_like_state_dict(obj):
        return {
            "state_dict": obj,
            "ref_config": None,
            "vocabulary": None,
            "source_kind": "state_dict",
        }
    if isinstance(obj, Mapping) and "model_state_dict" in obj:
        kind = "inference_package" if "vocabulary" in obj else "training_checkpoint"
        return {
            "state_dict": obj["model_state_dict"],
            "ref_config": obj.get("model_config") or obj.get("config"),
            "vocabulary": obj.get("vocabulary"),
            "source_kind": kind,
        }
    raise SystemExit(
        "input does not look like a reference artifact: expected an "
        "inference package / training checkpoint (dict with "
        "'model_state_dict') or a raw VideoCaptioningModel.state_dict()"
    )


def config_from_reference(ref_config: Any, base: Optional[Config] = None) -> Config:
    """Copy matching fields from a deserialized reference Config tree.

    Field names are identical by design (config.py mirrors reference
    config.py:9-155), so this is a name-matched attribute copy per section;
    reference-only fields (device, pin_memory, …) are skipped, ours keep
    their defaults when absent there.
    """
    import dataclasses

    config = base if base is not None else Config()
    if ref_config is None:
        return config
    for section in ("model", "data", "training", "inference", "experiment"):
        ref_section = getattr(ref_config, section, None)
        if ref_section is None:
            continue
        ours = getattr(config, section, None)
        if ours is None:
            continue
        ref_attrs = getattr(ref_section, "__dict__", {})
        for f in dataclasses.fields(ours):
            if f.name in ref_attrs:
                value = ref_attrs[f.name]
                if isinstance(value, _StubObject):
                    continue  # nested object we don't model; keep default
                try:
                    setattr(ours, f.name, type(getattr(ours, f.name))(value)
                            if getattr(ours, f.name) is not None else value)
                except (TypeError, ValueError):
                    setattr(ours, f.name, value)
    return config


def vocabulary_from_package(vocab_data: Mapping, config: Config):
    """Rebuild a Vocabulary from the package's embedded dict
    (reference checkpoint.py:186-199 schema)."""
    from ..data.vocabulary import Vocabulary

    vocab = Vocabulary(config)
    vocab.word2idx = dict(vocab_data["word2idx"])
    vocab.idx2word = {int(k): v for k, v in vocab_data["idx2word"].items()}
    special = vocab_data.get("special_tokens", {})
    for attr in ("pad_idx", "start_idx", "end_idx", "unk_idx"):
        if attr in special:
            setattr(vocab, attr, int(special[attr]))
    for attr in ("pad_token", "start_token", "end_token", "unk_token"):
        if attr in special:
            setattr(vocab, attr, str(special[attr]))
    return vocab


def migrate(
    input_path: Path,
    output_dir: Path,
    vocabulary_path: Optional[Path] = None,
    attention_type: str = "bahdanau",
    model_name: str = "model_for_inference.pth",
    base_config: Optional[Config] = None,
) -> Dict[str, Any]:
    """Reference artifact → our inference package. Returns a summary.

    ``base_config`` seeds the architecture fields for artifacts that embed
    no config (raw state dicts); an embedded reference config overrides it
    field by field.
    """
    from ..data.vocabulary import Vocabulary
    from ..models.torch_port import import_reference_state_dict
    from ..utils.checkpoint import CheckpointManager

    loaded = load_reference_file(Path(input_path))
    parts = extract_state_and_metadata(loaded)

    config = config_from_reference(parts["ref_config"], base=base_config)
    # The reference hardcodes bahdanau (src/models/decoder.py:38); its
    # config has no attention_type field, so the flag decides.
    config.model.attention_type = attention_type
    config.model.architecture = "lstm"  # the reference's only family

    if parts["vocabulary"] is not None:
        vocab = vocabulary_from_package(parts["vocabulary"], config)
    elif vocabulary_path is not None:
        vocab = Vocabulary.load(Path(vocabulary_path), config)
    else:
        raise SystemExit(
            f"{parts['source_kind']} carries no vocabulary; pass "
            "--vocabulary vocabulary.json (written by the reference's "
            "train.py next to its checkpoints)"
        )

    # Keep the vocab-size sync the reference maintains (config.py:150).
    config.data.max_vocab_size = len(vocab)
    config.validate()

    params = import_reference_state_dict(parts["state_dict"], config)

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    manager = CheckpointManager(output_dir)
    package_path = manager.save_model_for_inference(
        params, vocab, config, model_name=model_name
    )
    vocab_path = output_dir / "vocabulary.json"
    vocab.save(vocab_path)

    import jax
    import numpy as np

    summary = {
        "source": str(input_path),
        "source_kind": parts["source_kind"],
        "output": str(package_path),
        "vocabulary": str(vocab_path),
        "vocab_size": len(vocab),
        "attention_type": attention_type,
        "parameters": int(
            sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))
        ),
    }
    logger.info(
        "migrated %(source_kind)s %(source)s -> %(output)s "
        "(%(parameters)d params, vocab %(vocab_size)d)", summary,
    )
    return summary


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Migrate a reference-trained torch checkpoint into this "
                    "framework's inference package")
    parser.add_argument("--input", type=str, required=True,
                        help="Reference artifact: model_for_inference.pth, "
                             "checkpoint_epoch_*.pth / best_model.pth, or a "
                             "raw state_dict .pth")
    parser.add_argument("--output-dir", type=str, required=True,
                        help="Directory for the converted inference package "
                             "and vocabulary.json")
    parser.add_argument("--vocabulary", type=str, default=None,
                        help="vocabulary.json for artifacts that do not "
                             "embed one (training checkpoints / raw state "
                             "dicts)")
    parser.add_argument("--attention-type", type=str, default="bahdanau",
                        choices=["bahdanau", "luong", "multihead"],
                        help="The reference hardcodes bahdanau; only change "
                             "this for checkpoints from a modified reference")
    parser.add_argument("--config", type=str, default=None,
                        help="YAML/JSON config seeding architecture dims for "
                             "artifacts that embed no config (raw state "
                             "dicts); embedded reference configs override it")
    parser.add_argument("--model-name", type=str,
                        default="model_for_inference.pth")
    parser.add_argument("--log-level", type=str, default="INFO")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    setup_logging(args.log_level)
    summary = migrate(
        Path(args.input),
        Path(args.output_dir),
        vocabulary_path=Path(args.vocabulary) if args.vocabulary else None,
        attention_type=args.attention_type,
        model_name=args.model_name,
        base_config=Config.from_file(Path(args.config))
        if args.config else None,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
