"""AOT-compiled serving artifacts via ``jax.export`` (StableHLO).

No reference analog: the reference serves by rebuilding the Python model
and loading a state dict at process start (src/inference/predictor.py:50-76).
On TPU the natural deployment unit is the *compiled program*: ``jax.export``
serializes the traced StableHLO of the exact jitted generation function the
predictor runs — weights baked in as constants — so a serving host needs no
model code, no weight file, and no trace step: deserialize and call.

Artifact (``.vcx``, a zip):

* ``manifest.json`` — format version, generation settings, batch buckets,
  export platforms, the vocabulary, the model config, and a sha256 per
  program blob (verified at load; tampering is a hard error).
* ``program_b{B}.bin`` — one serialized ``jax.export.Exported`` per batch
  bucket. Ragged batches pad up to the nearest bucket (the same bucketing
  discipline as ``VideoCaptionPredictor._bucket_size``) and oversized
  batches chunk over the largest bucket.

Tokens are bit-identical to the live predictor's: the exported function is
the same ``captioner.encode`` → ``beam_search_generate``/``greedy_generate``
program, traced once at export time (gated in tests/test_export.py).

Notes:

* Pallas kernels are trace-time gated on ``jax.default_backend()``; an
  artifact exported from a CPU host is pure XLA (runs anywhere in
  ``platforms``), one exported on a TPU host may embed Mosaic custom calls
  (TPU-only). The manifest records the export platforms either way.
* ``deserialize`` needs only jax — ``ExportedPredictor`` is importable on
  hosts without this package's model code (it reads vocab from the
  manifest, not from ``data.vocabulary``).
"""

from __future__ import annotations

import hashlib
import json
import logging
import zipfile
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

ARTIFACT_FORMAT = "vcx-v1"

logger = logging.getLogger(__name__)


def _sha256(blob: bytes) -> str:
    return hashlib.sha256(blob).hexdigest()


def export_serving_artifact(
    model_path: Union[str, Path],
    output_path: Union[str, Path],
    batch_sizes: Sequence[int] = (1, 8, 64),
    method: str = "beam",
    max_length: int = 20,
    beam_size: int = 5,
    length_penalty: float = 1.0,
    compute_dtype: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
    include_cnn: bool = False,
    cnn_weights_path: Optional[Union[str, Path]] = None,
    cnn_model_type: Optional[str] = None,
    cnn_variant: Optional[str] = None,
    allow_random_cnn_init: bool = False,
    frame_batch_sizes: Optional[Sequence[int]] = None,
    cnn_chunk: int = 320,
) -> Path:
    """Trace + serialize the serving program for each batch bucket.

    ``model_path``: a trained inference package (the ``.pth`` written by
    ``CheckpointManager.save_model_for_inference``). ``platforms``: lowering
    targets (e.g. ``["tpu"]`` or ``["cpu", "tpu"]``); None = the exporting
    host's backend.

    ``include_cnn`` additionally exports FULL-PIPELINE programs — uint8
    frames → fused normalize → CNN backbone → encoder → beam/greedy — so
    the BASELINE north-star workload ships as one sha256-gated artifact
    (the reference never fuses its two halves: preprocess.py:125-154
    extracts offline, predictor.py:78-145 decodes from features). The
    features-only buckets are kept alongside. ``cnn_weights_path`` accepts
    native ``.vcw.npz``, quantized ``vcw-int8-v1`` (implies the int8
    variant — the measured-fastest serving pipeline), or a torchvision
    state file. Inside the program the flattened ``B·T`` frames run the
    CNN in ``lax.map`` chunks of ``cnn_chunk`` frames, bounding activation
    memory the way the live chunked pipeline does.
    """
    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..generation.beam import beam_search_generate
    from ..generation.greedy import greedy_generate
    from ..models import captioner
    from ..utils.checkpoint import CheckpointManager, restore_params

    if method not in ("beam", "greedy"):
        raise ValueError(
            f"export supports deterministic methods beam/greedy, got {method!r}"
        )
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")

    model_path = Path(model_path)
    package = CheckpointManager(model_path.parent).load_model_for_inference(
        model_path
    )
    config = Config.from_dict(package["model_config"])
    params = restore_params(package["model_state_dict"])
    if compute_dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )
    elif compute_dtype not in (None, "float32"):
        raise ValueError(f"unsupported compute_dtype {compute_dtype!r}")

    vocab = package["vocabulary"]
    start = vocab["special_tokens"]["start_idx"]
    end = vocab["special_tokens"]["end_idx"]
    feat_dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def serving_fn(features):
        enc_outs, final, mask = captioner.encode(params, config, features)
        if method == "beam":
            out = beam_search_generate(
                params, config, enc_outs, final, start, end, max_length,
                mask, beam_size=beam_size, length_penalty=length_penalty,
            )
            return {
                "generated_tokens": out["generated_tokens"],
                "all_tokens": out["all_tokens"],
                "all_scores": out["all_scores"],
            }
        out = greedy_generate(
            params, config, enc_outs, final, start, end, max_length, mask
        )
        return {"generated_tokens": out["generated_tokens"]}

    T = config.model.video_sequence_length
    F = config.model.cnn_feature_dim
    export_kwargs = {}
    if platforms is not None:
        export_kwargs["platforms"] = list(platforms)

    programs: Dict[int, bytes] = {}
    for B in batch_sizes:
        spec = jax.ShapeDtypeStruct((B, T, F), feat_dtype)
        exported = jax.export.export(jax.jit(serving_fn), **export_kwargs)(spec)
        programs[B] = exported.serialize()
        logger.info(
            "exported batch-%d program: %.1f MiB", B, len(programs[B]) / 2**20
        )

    frame_programs: Dict[int, bytes] = {}
    cnn_meta: Optional[Dict[str, object]] = None
    if include_cnn:
        from ..models.backbones import FEATURE_DIMS, FeatureExtractor

        model_type = cnn_model_type or (
            "vgg16" if F == FEATURE_DIMS["vgg16"] else "resnet50"
        )
        if FEATURE_DIMS.get(model_type) != F:
            raise ValueError(
                f"model expects {F}-d features but backbone {model_type} "
                f"produces {FEATURE_DIMS.get(model_type)}-d"
            )
        extractor = FeatureExtractor(
            model_type, config,
            weights_path=Path(cnn_weights_path) if cnn_weights_path else None,
            variant=cnn_variant,
            allow_random_init=allow_random_cnn_init,
            compute_dtype=compute_dtype
            if compute_dtype in (None, "float32", "bfloat16") else None,
        )
        cnn_fn = extractor.traceable_fn()
        H, W = (int(s) for s in config.data.img_size)

        def serving_fn_frames(frames_u8):
            B_, T_, H_, W_, C_ = frames_u8.shape
            flat = frames_u8.reshape(B_ * T_, H_, W_, C_)
            n = flat.shape[0]
            chunk = min(int(cnn_chunk), n)
            groups = -(-n // chunk)
            pad = groups * chunk - n
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((pad, H_, W_, C_), flat.dtype)]
                )
            # Chunked CNN inside ONE program: lax.map bounds activation
            # memory to `chunk` frames (the live pipeline's discipline)
            # while the whole frames→caption path stays a single dispatch.
            feats = jax.lax.map(
                cnn_fn, flat.reshape(groups, chunk, H_, W_, C_)
            ).reshape(groups * chunk, F)[:n]
            return serving_fn(feats.reshape(B_, T_, F).astype(feat_dtype))

        frame_buckets = sorted(set(
            int(b) for b in (frame_batch_sizes
                             if frame_batch_sizes is not None
                             else batch_sizes)
        ))
        if not frame_buckets or frame_buckets[0] < 1:
            raise ValueError(
                f"frame_batch_sizes must be positive, got {frame_buckets}"
            )
        for B in frame_buckets:
            spec = jax.ShapeDtypeStruct((B, T, H, W, 3), jnp.uint8)
            exported = jax.export.export(
                jax.jit(serving_fn_frames), **export_kwargs
            )(spec)
            frame_programs[B] = exported.serialize()
            logger.info(
                "exported frames batch-%d program: %.1f MiB",
                B, len(frame_programs[B]) / 2**20,
            )
        cnn_meta = {
            "model_type": model_type,
            "variant": extractor.variant,
            "frame_shape": [T, H, W, 3],
            "frame_batch_sizes": frame_buckets,
            "cnn_chunk": int(cnn_chunk),
            "weights_source": str(cnn_weights_path) if cnn_weights_path
            else ("random_init" if allow_random_cnn_init else None),
        }

    manifest = {
        "format": ARTIFACT_FORMAT,
        "source_model": model_path.name,
        "method": method,
        "max_length": max_length,
        "beam_size": beam_size,
        "length_penalty": length_penalty,
        "compute_dtype": compute_dtype or "float32",
        "feature_shape": [T, F],
        "batch_sizes": batch_sizes,
        "platforms": list(platforms) if platforms is not None
        else [jax.default_backend()],
        "jax_version": jax.__version__,
        "programs": {
            str(B): {"file": f"program_b{B}.bin", "sha256": _sha256(blob)}
            for B, blob in programs.items()
        },
        "cnn": cnn_meta,
        "frame_programs": {
            str(B): {"file": f"program_frames_b{B}.bin",
                     "sha256": _sha256(blob)}
            for B, blob in frame_programs.items()
        },
        "vocabulary": {
            "idx2word": {str(k): v for k, v in vocab["idx2word"].items()},
            "special_tokens": vocab["special_tokens"],
        },
        "model_config": package["model_config"],
    }

    output_path = Path(output_path)
    tmp = output_path.with_suffix(output_path.suffix + ".tmp")
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("manifest.json", json.dumps(manifest, indent=2))
        for B, blob in programs.items():
            # The blobs are already-compressed flatbuffers; store raw.
            zf.writestr(
                zipfile.ZipInfo(f"program_b{B}.bin"), blob,
                compress_type=zipfile.ZIP_STORED,
            )
        for B, blob in frame_programs.items():
            zf.writestr(
                zipfile.ZipInfo(f"program_frames_b{B}.bin"), blob,
                compress_type=zipfile.ZIP_STORED,
            )
    tmp.replace(output_path)
    logger.info("wrote serving artifact %s", output_path)
    return output_path


class ExportedPredictor:
    """Serve captions from a ``.vcx`` artifact — no model code needed.

    Mirrors the live predictor's decode surface (tokens → caption text via
    the embedded vocabulary) but the device program is the deserialized
    AOT export: zero trace/compile on the serving host beyond XLA's final
    lowering of the shipped StableHLO.
    """

    def __init__(self, artifact_path: Union[str, Path]):
        self.path = Path(artifact_path)
        with zipfile.ZipFile(self.path) as zf:
            manifest = json.loads(zf.read("manifest.json"))
        if manifest.get("format") != ARTIFACT_FORMAT:
            raise ValueError(
                f"{self.path} is not a {ARTIFACT_FORMAT} artifact "
                f"(format={manifest.get('format')!r})"
            )
        self.manifest = manifest
        self.method = manifest["method"]
        self.batch_sizes: List[int] = sorted(manifest["batch_sizes"])
        self._idx2word = {
            int(k): v for k, v in manifest["vocabulary"]["idx2word"].items()
        }
        sp = manifest["vocabulary"]["special_tokens"]
        # PAD/START/END are stripped; UNK is kept — and END does NOT stop
        # the decode (the reference strips specials *before* its END break,
        # vocabulary.py:182-192; Vocabulary.decode_caption replicates it,
        # so this must too for identical caption text).
        self._special = {sp["pad_idx"], sp["start_idx"], sp["end_idx"]}
        self._fns: Dict[int, object] = {}

    # ----------------------------------------------------- server surface

    @property
    def feature_dim(self) -> int:
        """Per-frame feature width — lets ``CaptionServer`` validate request
        shapes without a ``config`` object on the serving host."""
        return int(self.manifest["feature_shape"][1])

    @property
    def generation_defaults(self) -> Dict[str, object]:
        """The baked generation options. ``CaptionServer`` merges these as
        the request defaults so an option-less request always matches the
        compiled program (the live predictor retraces for new options; an
        AOT artifact cannot)."""
        m = self.manifest
        return {
            "method": m["method"],
            "max_length": m["max_length"],
            "beam_size": m["beam_size"],
            "length_penalty": m["length_penalty"],
            "temperature": 1.0,
        }

    def validate_options(self, options: Dict[str, object]) -> None:
        """Reject options the baked program cannot honor (ValueError — the
        server maps it to HTTP 400 at parse time, before batching)."""
        baked = self.generation_defaults
        method = options.get("method", baked["method"])
        if method != baked["method"]:
            raise ValueError(
                f"artifact was exported with method={baked['method']!r}; "
                f"cannot serve method={method!r} (re-export to change it)"
            )
        def as_float(key, value):
            # Malformed values (null, lists, strings) are client errors:
            # raise ValueError so the server maps them to 400, not the
            # TypeError→500 path.
            try:
                return float(value)
            except (TypeError, ValueError):
                raise ValueError(
                    f"option {key}={value!r} is not a number"
                ) from None

        relevant = ["max_length"]
        if method == "beam":
            relevant += ["beam_size", "length_penalty"]
        for key in relevant:
            if key in options and as_float(key, options[key]) != float(baked[key]):
                raise ValueError(
                    f"artifact was exported with {key}={baked[key]}; cannot "
                    f"serve {key}={options[key]} (re-export to change it)"
                )
        if ("temperature" in options
                and as_float("temperature", options["temperature"]) != 1.0):
            raise ValueError(
                "exported programs are deterministic (beam/greedy); "
                "temperature is not supported"
            )

    # ------------------------------------------------------------ loading

    def _load_program(self, table: str, bucket: int):
        key = (table, bucket)
        if key not in self._fns:
            import jax

            entry = self.manifest[table][str(bucket)]
            with zipfile.ZipFile(self.path) as zf:
                blob = zf.read(entry["file"])
            digest = _sha256(blob)
            if digest != entry["sha256"]:
                raise ValueError(
                    f"{self.path}:{entry['file']} checksum mismatch "
                    f"(manifest {entry['sha256'][:12]}…, file {digest[:12]}…) "
                    "— artifact corrupted or tampered"
                )
            self._fns[key] = jax.export.deserialize(blob).call
        return self._fns[key]

    def _fn(self, bucket: int):
        return self._load_program("programs", bucket)

    @staticmethod
    def _bucket_in(buckets: List[int], n: int) -> int:
        for b in buckets:
            if b >= n:
                return b
        return buckets[-1]

    def _bucket_for(self, n: int) -> int:
        return self._bucket_in(self.batch_sizes, n)

    # --------------------------------------------------------- generation

    def decode_caption(self, tokens: Sequence[int]) -> str:
        """Special-token-stripped decode, identical to
        ``Vocabulary.decode_caption(remove_special_tokens=True)`` including
        the reference's skip-specials-before-END-break quirk
        (vocabulary.py:182-192): post-END tokens are kept, UNK is kept,
        out-of-vocab ids are dropped."""
        words = []
        for t in tokens:
            t = int(t)
            if t not in self._idx2word:
                continue
            if t in self._special:
                continue
            words.append(self._idx2word[t])
        return " ".join(words)

    def predict_batch(
        self, features, **options
    ) -> List[Dict[str, object]]:
        """features: (B, T, F) resampled clip features, or a list of
        per-clip (frames_i, F) arrays (the live predictor's / server's
        shape — each clip is uniform-sampled / zero-padded to T exactly as
        ``VideoCaptionPredictor._prepare_features`` does). Keyword options
        are accepted for live-predictor call compatibility but must match
        the baked program (``validate_options``). Returns one record per
        clip: caption text, token ids, and (beam) the top-K scores."""
        import numpy as _np

        if options:
            self.validate_options(options)
        T, F = self.manifest["feature_shape"]
        if isinstance(features, (list, tuple)):
            from .utils import resize_feature_sequence

            prepared = []
            for i, clip in enumerate(features):
                clip = _np.asarray(clip, _np.float32)
                if clip.ndim != 2 or clip.shape[1] != F:
                    raise ValueError(
                        f"clip {i}: expected (frames, {F}) features, got "
                        f"shape {clip.shape}"
                    )
                prepared.append(resize_feature_sequence(clip, T))
            features = _np.stack(prepared) if prepared else \
                _np.zeros((0, T, F), _np.float32)

        dtype = self.manifest["compute_dtype"]
        feats = _np.asarray(features, _np.float32)
        if feats.ndim != 3:
            raise ValueError(f"expected (B, T, F) features, got {feats.shape}")
        if list(feats.shape[1:]) != [T, F]:
            raise ValueError(
                f"expected features shaped (B, {T}, {F}), got {feats.shape}"
            )

        results: List[Dict[str, object]] = []
        n = feats.shape[0]
        pos = 0
        while pos < n:
            chunk = feats[pos: pos + self._bucket_for(n - pos)]
            bucket = self._bucket_for(chunk.shape[0])
            real = chunk.shape[0]
            if real < bucket:
                pad = _np.zeros(
                    (bucket - real,) + tuple(chunk.shape[1:]), _np.float32
                )
                chunk = _np.concatenate([chunk, pad], axis=0)
            if dtype == "bfloat16":
                import jax.numpy as jnp

                chunk = jnp.asarray(chunk).astype(jnp.bfloat16)
            out = self._fn(bucket)(chunk)
            results.extend(self._records(out, real))
            pos += real
        return results

    def predict_from_features(self, video_features: np.ndarray) -> Dict[str, object]:
        return self.predict_batch(np.asarray(video_features)[None])[0]

    # --------------------------------------------------- full pipeline

    @property
    def includes_cnn(self) -> bool:
        """True when the artifact carries frames→caption programs
        (exported with ``include_cnn``)."""
        return bool(self.manifest.get("frame_programs"))

    @property
    def frame_shape(self) -> List[int]:
        """(T, H, W, 3) per-clip uint8 frame shape of the baked pipeline."""
        if not self.includes_cnn:
            raise ValueError(
                f"{self.path} has no CNN-inclusive programs (re-export with "
                "include_cnn=True / --include-cnn)"
            )
        return list(self.manifest["cnn"]["frame_shape"])

    def predict_from_frames(self, frames, **options) -> List[Dict[str, object]]:
        """Full-pipeline decode: raw uint8 RGB frames → caption, through
        the baked frames→CNN→encoder→beam program (ONE device dispatch per
        bucket — the BASELINE north-star workload as a serving artifact).

        ``frames``: (B, T, H, W, 3) uint8, or a list of per-clip
        (T, H, W, 3) arrays, already uniform-sampled to the baked T (the
        host decode step — ``data.video.extract_frames`` — produces exactly
        this shape). Returns the same records as :meth:`predict_batch`.
        """
        import numpy as _np

        if options:
            self.validate_options(options)
        T, H, W, C = self.frame_shape
        if isinstance(frames, (list, tuple)):
            stacked = []
            for i, clip in enumerate(frames):
                clip = _np.asarray(clip)
                if list(clip.shape) != [T, H, W, C]:
                    raise ValueError(
                        f"clip {i}: expected ({T}, {H}, {W}, {C}) frames, "
                        f"got {clip.shape} (resample/resize on the host "
                        "first — data.video.extract_frames does both)"
                    )
                stacked.append(clip)
            frames = _np.stack(stacked) if stacked else \
                _np.zeros((0, T, H, W, C), _np.uint8)
        frames = _np.asarray(frames)
        if frames.dtype != _np.uint8:
            raise ValueError(
                f"frames must be uint8 RGB (normalization is baked into "
                f"the program), got {frames.dtype}"
            )
        if frames.ndim != 5 or list(frames.shape[1:]) != [T, H, W, C]:
            raise ValueError(
                f"expected (B, {T}, {H}, {W}, {C}) frames, got {frames.shape}"
            )

        buckets = sorted(self.manifest["cnn"]["frame_batch_sizes"])
        results: List[Dict[str, object]] = []
        n = frames.shape[0]
        pos = 0
        while pos < n:
            chunk = frames[pos: pos + self._bucket_in(buckets, n - pos)]
            bucket = self._bucket_in(buckets, chunk.shape[0])
            real = chunk.shape[0]
            if real < bucket:
                pad = _np.zeros(
                    (bucket - real,) + tuple(chunk.shape[1:]), _np.uint8
                )
                chunk = _np.concatenate([chunk, pad], axis=0)
            out = self._load_program("frame_programs", bucket)(chunk)
            results.extend(self._records(out, real))
            pos += real
        return results

    def _records(self, out, real: int) -> List[Dict[str, object]]:
        import numpy as _np

        tokens = _np.asarray(out["generated_tokens"])[:real]
        scores = (
            _np.asarray(out["all_scores"])[:real]
            if "all_scores" in out else None
        )
        records: List[Dict[str, object]] = []
        for i in range(real):
            rec: Dict[str, object] = {
                "caption": self.decode_caption(tokens[i].tolist()),
                "tokens": tokens[i].tolist(),
                "method": self.method,
            }
            if scores is not None:
                rec["score"] = float(scores[i][0])
            records.append(rec)
        return records
