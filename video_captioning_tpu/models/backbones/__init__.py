"""CNN frame-feature backbones (JAX, NHWC, TPU-native).

``FeatureExtractor`` is the user-facing wrapper replacing the reference's
``create_feature_extractor`` / ``VideoFeatureExtractor`` torchvision stack
(encoder.py:205-226, preprocess.py:25-78): frames go to the device as
uint8, and normalization (/255, ImageNet mean/std) is FUSED into the jitted
CNN call — one host→device transfer of uint8 instead of float32 (4x less
PCIe/DMA traffic), everything else on-chip.
"""

from __future__ import annotations

import logging
import pickle
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config
from .resnet import apply_resnet50, init_resnet50, load_torch_resnet50
from .vgg import apply_vgg16, init_vgg16, load_torch_vgg16

logger = logging.getLogger(__name__)

FEATURE_DIMS = {"vgg16": 4096, "resnet50": 2048}

_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def _load_state_file(path: Path) -> Dict[str, np.ndarray]:
    path = Path(path)
    if path.suffix == ".npz":
        return dict(np.load(path))
    with open(path, "rb") as f:
        state = pickle.load(f)
    return {k: np.asarray(v) for k, v in state.items()}


class FeatureExtractor:
    """Batched on-device frame → feature extraction."""

    def __init__(
        self,
        model_type: str = "vgg16",
        config: Optional[Config] = None,
        *,
        weights_path: Optional[Path] = None,
        batch_size: int = 32,
        seed: int = 0,
        allow_random_init: bool = False,
        variant: Optional[str] = None,
        compute_dtype: Optional[str] = None,
    ):
        model_type = model_type.lower()
        if model_type not in FEATURE_DIMS:
            raise ValueError(f"Unsupported model type: {model_type}")
        self.model_type = model_type
        self.feature_dim = FEATURE_DIMS[model_type]
        self.batch_size = batch_size
        self.config = config

        # ResNet50 forward variant (xla | folded | fused | fused_s2d |
        # int8 — see KernelConfig.resnet50_variant); VGG16 has no BN to
        # fold so only "xla" applies. A quantized (vcw-int8-v1) weights
        # file implies variant="int8" — the file IS the variant.
        if variant is None and weights_path is not None:
            from ...cli.convert_weights import is_int8_native

            if is_int8_native(weights_path):
                variant = "int8"
        if variant is None:
            if model_type == "resnet50":
                from ...config import KernelConfig

                variant = (
                    config.kernels.resnet50_variant
                    if config is not None
                    else KernelConfig().resnet50_variant
                )
            else:
                variant = "xla"
        if model_type == "vgg16" and variant not in ("xla", "int8"):
            raise ValueError(f"VGG16 has no {variant!r} variant (no BN to fold)")
        if variant not in ("xla", "folded", "fused", "fused_s2d", "int8"):
            raise ValueError(f"Unknown resnet50 variant: {variant}")
        self.variant = variant
        if compute_dtype is None:
            compute_dtype = "float32"
        if compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"Unknown compute_dtype: {compute_dtype}")
        self.compute_dtype = jnp.dtype(compute_dtype)

        if weights_path is not None:
            from ...cli.convert_weights import (
                is_int8_native, is_native, load_native)

            if is_int8_native(weights_path):
                # Pre-calibrated W8A8 file (vcw-int8-v1, written by
                # save_int8 / the convert-weights --emit-int8 CLI): load
                # the quantized tree directly — no fp32 weights and no
                # per-process calibration.
                from ...cli.convert_weights import load_int8_weights

                if variant != "int8":
                    raise ValueError(
                        f"{weights_path} holds int8-quantized weights; "
                        "construct with variant='int8' to use them"
                    )
                loaded_type, qp = load_int8_weights(weights_path)
                if loaded_type != model_type:
                    raise ValueError(
                        f"{weights_path} holds {loaded_type} weights but "
                        f"{model_type} was requested"
                    )
                self.params = None  # quantized-only; no fp32 tree
                self._int8_calibrated = False
                self._finalize_int8(qp)
                logger.info(
                    f"Loaded quantized {model_type} weights from "
                    f"{weights_path}")
                return
            if is_native(weights_path):
                # Converted .vcw.npz (cli/convert_weights.py): checksummed
                # native pytree, no torch-format parsing at load time.
                loaded_type, self.params = load_native(weights_path)
                if loaded_type != model_type:
                    raise ValueError(
                        f"{weights_path} holds {loaded_type} weights but "
                        f"{model_type} was requested"
                    )
            else:
                state = _load_state_file(weights_path)
                self.params = (
                    load_torch_vgg16(state)
                    if model_type == "vgg16"
                    else load_torch_resnet50(state)
                )
            logger.info(f"Loaded {model_type} weights from {weights_path}")
        elif allow_random_init:
            key = jax.random.PRNGKey(seed)
            self.params = (
                init_vgg16(key) if model_type == "vgg16" else init_resnet50(key)
            )
            logger.warning(
                f"No pretrained weights supplied for {model_type}; using random "
                "init (fine for pipeline tests, not for caption quality)"
            )
        else:
            raise ValueError(
                f"No pretrained weights supplied for {model_type}. Convert a "
                "torchvision checkpoint with "
                "`python -m video_captioning_tpu.cli.convert_weights` and pass "
                "weights_path, or opt into random init explicitly with "
                "allow_random_init=True (features will be meaningless for "
                "caption quality)."
            )

        dtype = self.compute_dtype
        self._int8_calibrated = False
        if variant == "int8":
            # W8A8 PTQ serving variant (resnet_int8.py / vgg_int8.py):
            # weights quantized at calibration time; activation scales
            # calibrated lazily on the first extract() batch (or
            # explicitly via calibrate_int8).
            if model_type == "resnet50":
                from .resnet import fold_bn

                self._folded = fold_bn(self.params)
            self._run_params = None  # set by calibrate_int8
            self._extract = None
            return
        if model_type == "vgg16" or variant == "xla":
            apply = apply_vgg16 if model_type == "vgg16" else apply_resnet50
            run_params = self.params
        else:
            from .resnet import apply_resnet50_folded, fold_bn

            use_pallas = variant in ("fused", "fused_s2d")
            stem_s2d = variant == "fused_s2d"
            interpret = bool(config and config.kernels.interpret)

            def apply(params, x):
                return apply_resnet50_folded(
                    params, x, use_pallas=use_pallas, stem_s2d=stem_s2d,
                    interpret=interpret,
                )

            run_params = fold_bn(self.params)
        if dtype != jnp.float32:
            run_params = jax.tree_util.tree_map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                run_params,
            )
        self._run_params = run_params

        def extract_batch(params, frames_u8):
            # Fused normalize: uint8 → float, /255, ImageNet mean/std.
            x = frames_u8.astype(dtype) / 255.0
            x = (x - _IMAGENET_MEAN.astype(dtype)) / _IMAGENET_STD.astype(dtype)
            return apply(params, x).astype(jnp.float32)

        self._extract_fn = extract_batch  # unjitted, for traceable_fn
        self._extract = jax.jit(extract_batch)

    def calibrate_int8(self, frames: np.ndarray) -> None:
        """Calibrate the int8 variant's activation scales on uint8 frames
        (representative serving data; a few hundred frames suffice)."""
        if self.params is None:
            raise ValueError(
                "this extractor was loaded from a quantized weights file "
                "and holds no fp32 weights; recalibration needs the "
                "original fp32 weights_path (re-run convert_weights "
                "--emit-int8 with new calibration frames instead)"
            )
        norm = (frames.astype(np.float32) / 255.0
                - np.asarray(_IMAGENET_MEAN)) / np.asarray(_IMAGENET_STD)
        if self.model_type == "resnet50":
            from .resnet_int8 import (
                calibrate_resnet50_int8, quantize_resnet50_int8)

            scales = calibrate_resnet50_int8(
                self._folded, jnp.asarray(norm), batch_size=self.batch_size)
            qp = quantize_resnet50_int8(self._folded, scales)
        else:
            from .vgg_int8 import calibrate_vgg16_int8, quantize_vgg16_int8

            scales = calibrate_vgg16_int8(
                self.params, jnp.asarray(norm), batch_size=self.batch_size)
            qp = quantize_vgg16_int8(self.params, scales)
        self._finalize_int8(qp)

    def _finalize_int8(self, qp) -> None:
        """Build the jitted int8 extract program from a quantized tree."""
        if self.model_type == "resnet50":
            import functools

            from .resnet_int8 import apply_resnet50_int8

            k = self.config.kernels if self.config is not None else None
            apply_int8 = functools.partial(
                apply_resnet50_int8,
                use_pallas_1x1=bool(k and k.int8_conv1x1_pallas),
                interpret=bool(k and k.interpret),
            )
        else:
            from .vgg_int8 import apply_vgg16_int8 as apply_int8
        # Device-resident leaves: file loads hand us host numpy arrays,
        # and numpy jit arguments re-upload per call (~25-135 MB/batch
        # over a slow link); jnp.asarray is a no-op for the in-process
        # calibration path whose leaves already live on device.
        self._run_params = jax.tree_util.tree_map(jnp.asarray, qp)
        dtype = self.compute_dtype

        def extract_batch(params, frames_u8):
            x = frames_u8.astype(dtype) / 255.0
            x = (x - _IMAGENET_MEAN.astype(dtype)) / _IMAGENET_STD.astype(dtype)
            return apply_int8(params, x).astype(jnp.float32)

        self._extract_fn = extract_batch  # unjitted, for traceable_fn
        self._extract = jax.jit(extract_batch)
        self._int8_calibrated = True

    def save_int8(self, path) -> dict:
        """Persist the calibrated W8A8 tree (see convert_weights
        --emit-int8); load it back by constructing with
        ``variant="int8", weights_path=path``."""
        if not self._int8_calibrated:
            raise ValueError(
                "int8 extractor is not calibrated yet — extract a batch or "
                "call calibrate_int8(frames) first")
        from ...cli.convert_weights import save_int8_weights

        return save_int8_weights(path, self.model_type, self._run_params)

    def traceable_fn(self):
        """Params-baked pure function ``(N, H, W, 3) uint8 → (N, F)
        float32``, traceable under ``jax.jit`` / ``jax.export`` — the CNN
        stage of the full-pipeline AOT export (inference/export.py
        ``include_cnn``). The int8 variant must already be calibrated
        (load a ``vcw-int8-v1`` weights file, or call ``calibrate_int8``)."""
        if self.variant == "int8" and not self._int8_calibrated:
            raise ValueError(
                "int8 extractor is not calibrated; load a vcw-int8-v1 "
                "weights file or call calibrate_int8(frames) before tracing"
            )
        params, fn = self._run_params, self._extract_fn
        return lambda frames_u8: fn(params, frames_u8)

    def extract(self, frames: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) uint8 RGB frames → (N, feature_dim) float32."""
        if self.variant == "int8" and not self._int8_calibrated:
            self.calibrate_int8(frames[: max(self.batch_size, 1) * 4])
        outs = []
        n = frames.shape[0]
        bs = self.batch_size
        # Pad the tail chunk to the full batch so jit compiles once.
        for i in range(0, n, bs):
            chunk = frames[i : i + bs]
            k = chunk.shape[0]
            if k < bs:
                chunk = np.concatenate(
                    [chunk, np.zeros((bs - k,) + chunk.shape[1:], chunk.dtype)]
                )
            feats = np.asarray(self._extract(self._run_params, jnp.asarray(chunk)))
            outs.append(feats[:k])
        return np.concatenate(outs, axis=0)

    def extract_video(self, frames: np.ndarray) -> np.ndarray:
        """Alias used by preprocess: (T, H, W, 3) → (T, feature_dim)."""
        return self.extract(frames)


def create_feature_extractor(
    config: Config,
    model_type: str = "vgg16",
    weights_path: Optional[Path] = None,
    *,
    allow_random_init: bool = False,
    variant: Optional[str] = None,
    compute_dtype: Optional[str] = None,
) -> FeatureExtractor:
    """Factory (parity: reference encoder.py:205-226)."""
    return FeatureExtractor(model_type, config, weights_path=weights_path,
                            allow_random_init=allow_random_init,
                            variant=variant, compute_dtype=compute_dtype)
