"""Inference API.

Capability parity with reference src/inference/predictor.py:17-483 —
``VideoCaptionPredictor`` (features / video / batch / multiple-captions /
attention explanation) and ``BatchPredictor`` — with the TPU-native fixes
the reference lacks:

* ``predict_batch`` is *actually batched*: one device call over a stacked
  ``(B, T, F)`` tensor (the reference loops per video, predictor.py:192-228),
* ``generate_multiple_captions(method="beam")`` returns the true top-N beam
  hypotheses from the on-device completed register (the reference returns a
  single hypothesis, predictor.py:345-358),
* generation functions are jit-compiled once per (shape, method, search
  params) and cached,
* on-the-fly video features default to the reference's pixel-flatten stub
  for output compatibility (predictor.py:230-252), with
  ``feature_mode="cnn"`` running the real VGG16/ResNet50 JAX backbone.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.video import extract_frames, pixel_stub_features
from ..data.vocabulary import Vocabulary
from ..generation.beam import beam_search_generate
from ..generation.greedy import greedy_generate
from ..models import captioner
from ..utils.checkpoint import CheckpointManager, restore_params


class VideoCaptionPredictor:
    """Generate captions from a trained inference package."""

    def __init__(
        self,
        model_path: Path,
        config: Optional[Config] = None,
        feature_mode: str = "pixel_stub",
        compute_dtype: Optional[str] = None,
        compilation_cache_dir: Optional[Union[str, Path]] = None,
        cnn_weights_path: Optional[Path] = None,
        allow_random_cnn_init: bool = False,
        mesh=None,
        decode_int8: str = "off",
    ):
        """decode_int8: opt-in W8A8 quantization of the decode matrices
        (models/quantize.py): "vocab" quantizes the (D, V) vocabulary
        projection, "full" additionally every transformer block linear.
        int8×int8→int32 MXU matmuls with dynamic per-row activation scales
        — approximate by construction, so the fp32 token-parity contract
        does not apply; measured token-agreement rates vs fp32 live in
        benchmarks/int8_decode_gate_{lstm,transformer}.json and
        docs/PERFORMANCE.md §"W8A8 decode quantization: verdict".
        Round-5 verdict: decode int8 buys NO throughput on this chip
        (every beam arm ≤ fp32 base; the decode matmuls already run bf16
        operands under DEFAULT precision and the dynamic activation quant
        adds serial VPU work) — use it only when the 4x-smaller vocab
        matrix matters for serving memory. The int8 CNN *feature* path
        (FeatureExtractor vcw-int8-v1) is the one that pays (+49-57%).
        Composes with compute_dtype="bfloat16" (remaining matrices bf16).

        compute_dtype: "bfloat16" casts params once for ~2x lower HBM
        traffic in the decode loops (+~7% beam-5 throughput). Token parity
        is only guaranteed in the default float32: the measured worst-case
        divergence (random-init weights, 10k full-length decodes,
        benchmarks/bf16_parity_gate.py) is 6.8% of clips for greedy and
        43.2% for beam-5; trained models diverge far less, but any bf16
        parameter rounding can flip near-ties, so keep fp32 wherever
        bit-parity matters.

        compilation_cache_dir: deployment-level persistent-XLA-cache path.
        The value embedded in the trained model package is deliberately
        IGNORED — it names a path on the *training* host, and creating it
        on whatever machine loads the package is wrong. Pass it here or set
        ``VC_TPU_COMPILATION_CACHE_DIR`` in the serving environment.

        mesh: a ``jax.sharding.Mesh`` with a ``data`` axis for multi-chip
        serving. Params are replicated across the mesh once at load; every
        batched generation call shards the clip batch over ``data`` (one
        jitted program, XLA keeps all collectives on ICI — the clips are
        independent so the only cross-chip traffic is the final token
        gather). Surpasses the reference's sequential BatchPredictor
        (predictor.py:422-483), which loops clips one at a time on one
        device."""
        self.logger = logging.getLogger(__name__)
        self.feature_mode = feature_mode
        self._gen_cache: Dict[tuple, object] = {}
        self._backbone = None
        self._cnn_weights_path = cnn_weights_path
        self._allow_random_cnn_init = allow_random_cnn_init
        import os

        cache_dir = compilation_cache_dir or os.environ.get(
            "VC_TPU_COMPILATION_CACHE_DIR"
        )
        if cache_dir:
            from ..utils.compile_cache import enable_compilation_cache

            enable_compilation_cache(cache_dir)
        self.mesh = mesh
        self._load_model(Path(model_path), config)
        if compute_dtype == "bfloat16":
            import jax.numpy as _jnp

            self.params = jax.tree_util.tree_map(
                lambda x: x.astype(_jnp.bfloat16)
                if x.dtype == _jnp.float32
                else x,
                self.params,
            )
        if decode_int8 != "off":
            from ..models.quantize import quantize_decode_params

            self.params = quantize_decode_params(
                self.params, self.config, decode_int8
            )
            self.logger.info(
                f"decode path quantized to W8A8 (level={decode_int8}); "
                "tokens are approximate vs fp32 — see "
                "benchmarks/int8_decode_gate.py for measured agreement"
            )
        if mesh is not None:
            if "data" not in mesh.axis_names:
                raise ValueError(
                    f"serving mesh needs a 'data' axis, got {mesh.axis_names}"
                )
            from ..parallel.sharding import replicated

            self.params = jax.device_put(self.params, replicated(mesh))

    # ----------------------------------------------------------- loading

    def _load_model(self, model_path: Path, config_override: Optional[Config]):
        manager = CheckpointManager(model_path.parent)
        package = manager.load_model_for_inference(model_path)

        if config_override is not None:
            self.config = config_override
        else:
            self.config = Config.from_dict(package["model_config"])

        vocab_data = package["vocabulary"]
        self.vocabulary = Vocabulary(self.config)
        self.vocabulary.word2idx = dict(vocab_data["word2idx"])
        self.vocabulary.idx2word = {
            int(k): v for k, v in vocab_data["idx2word"].items()
        }
        special = vocab_data["special_tokens"]
        self.vocabulary.pad_idx = special["pad_idx"]
        self.vocabulary.start_idx = special["start_idx"]
        self.vocabulary.end_idx = special["end_idx"]
        self.vocabulary.unk_idx = special["unk_idx"]

        self.params = restore_params(package["model_state_dict"])
        self.logger.info(f"Loaded model with {len(self.vocabulary)} vocabulary size")

    # -------------------------------------------------------- generation

    def _gen_fn(self, method: str, max_length: int, beam_size: int, length_penalty: float):
        key = (method, max_length, beam_size, length_penalty)
        if key not in self._gen_cache:
            config = self.config
            start, end = self.vocabulary.start_idx, self.vocabulary.end_idx

            if method == "greedy":

                def greedy_fn(params, features, temperature):
                    enc_outs, final, mask = captioner.encode(params, config, features)
                    return greedy_generate(
                        params, config, enc_outs, final, start, end,
                        max_length, mask, temperature=temperature,
                    )

                self._gen_cache[key] = jax.jit(greedy_fn, static_argnums=(2,))
            elif method == "beam":

                def beam_fn(params, features):
                    enc_outs, final, mask = captioner.encode(params, config, features)
                    return beam_search_generate(
                        params, config, enc_outs, final, start, end,
                        max_length, mask, beam_size=beam_size,
                        length_penalty=length_penalty,
                    )

                self._gen_cache[key] = jax.jit(beam_fn)
            elif method == "sample":
                from ..generation.sampling import sample_generate

                def sample_fn(params, features, rng, temperature, top_k):
                    enc_outs, final, mask = captioner.encode(params, config, features)
                    return sample_generate(
                        params, config, enc_outs, final, start, end,
                        max_length, mask, temperature=temperature,
                        top_k=top_k, rng=rng,
                    )

                self._gen_cache[key] = jax.jit(sample_fn, static_argnums=(3, 4))
            else:
                raise ValueError(f"Unsupported generation method: {method}")
        return self._gen_cache[key]

    @staticmethod
    def _bucket_size(n: int) -> int:
        """Next power of two ≥ n: serving batches are padded up to a bucket
        so ragged batch sizes (e.g. an evaluation split's last chunk) reuse
        one compiled program per bucket instead of silently re-tracing the
        whole decode loop for every new shape."""
        b = 1
        while b < n:
            b *= 2
        return b

    def _run_generation(
        self,
        features_batch: np.ndarray,
        method: str,
        max_length: int,
        beam_size: int,
        length_penalty: float,
        temperature: float,
    ) -> Dict[str, jax.Array]:
        feats = jnp.asarray(features_batch, jnp.float32)
        B = feats.shape[0]
        if self.mesh is not None:
            # Bucket to a multiple of the data-axis size so the batch
            # shards evenly; each chip decodes its bucket/nd clips.
            nd = self.mesh.shape["data"]
            bucket = nd * self._bucket_size(-(-B // nd))
        else:
            bucket = self._bucket_size(B)
        if bucket != B:
            pad = jnp.zeros((bucket - B,) + feats.shape[1:], feats.dtype)
            feats = jnp.concatenate([feats, pad], axis=0)
        if self.mesh is not None:
            from ..parallel.sharding import batch_sharding

            feats = jax.device_put(feats, batch_sharding(self.mesh))
        fn = self._gen_fn(method, max_length, beam_size, length_penalty)
        if method == "greedy":
            outputs = fn(self.params, feats, float(temperature))
        elif method == "sample":
            self._sample_key = jax.random.split(
                getattr(self, "_sample_key", jax.random.PRNGKey(0))
            )[0]
            outputs = fn(self.params, feats, self._sample_key, float(temperature),
                         int(getattr(self, "sample_top_k", 0)))
        else:
            outputs = fn(self.params, feats)
        if bucket != B:
            outputs = {
                k: v[:B]
                if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == bucket
                else v
                for k, v in outputs.items()
            }
        return outputs

    # --------------------------------------------------------- features

    def _prepare_features(self, video_features: np.ndarray) -> np.ndarray:
        """Resize (T, F) to the model's video_sequence_length (uniform
        sample / zero-pad, reference predictor.py:292-315)."""
        from .utils import resize_feature_sequence

        return resize_feature_sequence(
            np.asarray(video_features, np.float32),
            self.config.model.video_sequence_length,
        )

    def predict_from_features(
        self,
        video_features: np.ndarray,
        method: str = "greedy",
        max_length: int = 20,
        beam_size: int = 5,
        length_penalty: float = 1.0,
        temperature: float = 1.0,
    ) -> Dict[str, Union[str, List[int]]]:
        features = self._prepare_features(video_features)[None]  # (1, T, F)
        outputs = self._run_generation(
            features, method, max_length, beam_size, length_penalty, temperature
        )
        tokens = np.asarray(outputs["generated_tokens"][0]).tolist()
        caption = self.vocabulary.decode_caption(tokens, remove_special_tokens=True)
        result = {"caption": caption, "tokens": tokens, "method": method}
        if "logprobs" in outputs:
            result["logprob"] = float(np.asarray(outputs["logprobs"][0]))
        if "attention_weights" in outputs:
            result["attention_weights"] = np.asarray(outputs["attention_weights"][0])
        return result

    def predict_from_video(
        self,
        video_path: Path,
        method: str = "greedy",
        max_length: int = 20,
        beam_size: int = 5,
        length_penalty: float = 1.0,
        temperature: float = 1.0,
        extract_features: bool = True,
    ) -> Dict[str, Union[str, List[int]]]:
        video_path = Path(video_path)
        if extract_features:
            features = self._extract_video_features(video_path)
        else:
            feature_path = video_path.with_suffix(".npy")
            if not feature_path.exists():
                raise FileNotFoundError(f"Feature file not found: {feature_path}")
            features = np.load(feature_path)

        result = self.predict_from_features(
            features, method=method, max_length=max_length,
            beam_size=beam_size, length_penalty=length_penalty,
            temperature=temperature,
        )
        result["video_path"] = str(video_path)
        return result

    def predict_batch(
        self,
        video_features_list: List[np.ndarray],
        method: str = "greedy",
        max_length: int = 20,
        beam_size: int = 5,
        length_penalty: float = 1.0,
        temperature: float = 1.0,
    ) -> List[Dict[str, Union[str, List[int]]]]:
        """Device-batched prediction: ONE generation call for all videos."""
        if not video_features_list:
            return []
        batch = np.stack(
            [self._prepare_features(f) for f in video_features_list]
        )  # (B, T, F)
        outputs = self._run_generation(
            batch, method, max_length, beam_size, length_penalty, temperature
        )
        tokens_batch = np.asarray(outputs["generated_tokens"])
        results = []
        for i in range(len(video_features_list)):
            tokens = tokens_batch[i].tolist()
            results.append(
                {
                    "caption": self.vocabulary.decode_caption(tokens),
                    "tokens": tokens,
                    "method": method,
                }
            )
        return results

    # ---------------------------------------------- on-the-fly features

    def _extract_video_features(self, video_path: Path) -> np.ndarray:
        num_frames = self.config.model.video_sequence_length
        if self.feature_mode == "cnn":
            return self._cnn_features(video_path, num_frames)
        # Reference-compatible stub (predictor.py:230-252): 224x224 frames,
        # zero-padded, flattened pixels.
        frames = extract_frames(
            video_path, num_frames, resize=(224, 224), pad_mode="zero"
        )
        return pixel_stub_features(frames, self.config.model.cnn_feature_dim)

    def _cnn_features(self, video_path: Path, num_frames: int) -> np.ndarray:
        from ..models.backbones import FeatureExtractor

        if self._backbone is None:
            model_type = (
                "vgg16" if self.config.model.cnn_feature_dim == 4096 else "resnet50"
            )
            self._backbone = FeatureExtractor(
                model_type, self.config,
                weights_path=self._cnn_weights_path,
                allow_random_init=self._allow_random_cnn_init,
            )
        frames = extract_frames(
            video_path, num_frames, resize=tuple(self.config.data.img_size),
            pad_mode="zero",
        )
        return self._backbone.extract(frames)

    # ------------------------------------------------- multiple captions

    def generate_multiple_captions(
        self,
        video_features: np.ndarray,
        num_captions: int = 5,
        method: str = "beam",
        max_length: int = 20,
        beam_size: int = 10,
        temperature: float = 1.0,
    ) -> List[Dict[str, Union[str, float]]]:
        if method == "beam" and beam_size < num_captions:
            beam_size = num_captions

        captions: List[Dict[str, Union[str, float]]] = []
        if method == "beam":
            features = self._prepare_features(video_features)[None]
            outputs = self._run_generation(
                features, "beam", max_length, beam_size, 1.0, temperature
            )
            # True top-N hypotheses (fixes reference predictor.py:345-358).
            all_tokens = np.asarray(outputs["all_tokens"][0])
            all_scores = np.asarray(outputs["all_scores"][0])
            order = np.argsort(-all_scores)[:num_captions]
            for rank in order:
                tokens = all_tokens[rank].tolist()
                captions.append(
                    {
                        "caption": self.vocabulary.decode_caption(tokens),
                        "score": float(all_scores[rank]),
                        "tokens": tokens,
                    }
                )
        elif method == "sample":
            # True stochastic diversity (the reference's greedy temperature
            # sweep is temperature-invariant, predictor.py:361-376).
            for _ in range(num_captions):
                result = self.predict_from_features(
                    video_features, method="sample", max_length=max_length,
                    temperature=temperature,
                )
                captions.append(
                    {
                        "caption": result["caption"],
                        "score": result.get("logprob", 0.0),
                        "tokens": result["tokens"],
                    }
                )
            captions.sort(key=lambda c: -c["score"])
        else:
            for temp in np.linspace(0.7, 1.3, num_captions):
                result = self.predict_from_features(
                    video_features, method="greedy", max_length=max_length,
                    temperature=float(temp),
                )
                captions.append(
                    {
                        "caption": result["caption"],
                        "score": 1.0 / float(temp),
                        "tokens": result["tokens"],
                        "temperature": float(temp),
                    }
                )
        return captions

    # ------------------------------------------------------ explanation

    def explain_prediction(
        self, video_features: np.ndarray, caption_tokens: List[int]
    ) -> Dict[str, np.ndarray]:
        """Attention visualization for a given caption (reference
        predictor.py:380-419)."""
        features = jnp.asarray(self._prepare_features(video_features)[None])
        input_tokens = jnp.asarray(caption_tokens[:-1], jnp.int32)[None]
        outputs = captioner.apply_model(
            self.params, self.config, features, input_tokens, train=False
        )
        return {
            "attention_weights": np.asarray(outputs["attention_weights"])
            if outputs.get("attention_weights") is not None
            else None,
            "encoder_outputs": np.asarray(outputs["encoder_outputs"]),
            "video_length": int(features.shape[1]),
            "caption_length": len(caption_tokens),
        }


class BatchPredictor:
    """Multi-video driver with per-item error isolation (reference
    predictor.py:422-483) — but each chunk runs as one device batch.

    The default ``batch_size=8`` mirrors the reference's chunking (sized
    for host-side video decode memory). For pre-extracted-feature
    workloads raise it to the measured device optimum — beam-5 on one
    v5e peaks at chunk 128 (20.3k clips/s vs 16.0k at 256;
    benchmarks/beam_batch_scaling.json)."""

    def __init__(self, predictor: VideoCaptionPredictor, batch_size: int = 8):
        self.predictor = predictor
        self.batch_size = batch_size
        self.logger = logging.getLogger(__name__)

    def predict_videos(
        self,
        video_paths: List[Path],
        method: str = "greedy",
        max_length: int = 20,
        **kwargs,
    ) -> List[Dict[str, Union[str, List[int]]]]:
        results: List[Dict[str, Union[str, List[int]]]] = []
        num_chunks = (len(video_paths) + self.batch_size - 1) // self.batch_size

        for chunk_idx in range(num_chunks):
            chunk = video_paths[
                chunk_idx * self.batch_size : (chunk_idx + 1) * self.batch_size
            ]
            self.logger.info(f"Processing batch {chunk_idx + 1}/{num_chunks}")

            features, ok_paths, errors = [], [], {}
            for path in chunk:
                try:
                    features.append(self.predictor._extract_video_features(Path(path)))
                    ok_paths.append(path)
                except Exception as e:
                    self.logger.error(f"Error processing {path}: {e}")
                    errors[str(path)] = str(e)

            batch_results = (
                self.predictor.predict_batch(
                    features, method=method, max_length=max_length, **kwargs
                )
                if features
                else []
            )
            by_path = {
                str(p): r for p, r in zip(ok_paths, batch_results)
            }
            for path in chunk:
                if str(path) in by_path:
                    r = by_path[str(path)]
                    r["video_path"] = str(path)
                    results.append(r)
                else:
                    results.append(
                        {
                            "video_path": str(path),
                            "caption": "",
                            "error": errors.get(str(path), "unknown error"),
                        }
                    )
        return results
