"""W8A8 static post-training quantization for the ResNet50 extractor.

Why: the BN-folded bf16 forward sits at the HBM roofline of its op-by-op
schedule (docs/PERFORMANCE.md: ~13.4 ms of a 27 ms B=320 dispatch is
standalone bandwidth-bound epilogue fusions, and the fused-Pallas attempt
to remove that traffic lost on MXU-tile shape). int8 is the remaining
lever the hardware actually offers: activations and weights stored int8
halve every HBM stream vs bf16, and the MXU runs int8 x int8 -> int32
natively at 2x the bf16 rate. This is a strictly OPT-IN serving variant
(`KernelConfig.resnet50_variant = "int8"`): it is NOT numerically
token-parity-safe (the fp32/bf16 gates stay the default story); its
quality contract is the measured feature-space error vs the fp32 oracle
in tests/test_backbones.py plus the throughput A/B in
benchmarks/cnn_suite.py.

Scheme (standard TPU-serving PTQ, no reference-code counterpart — the
reference runs torchvision fp32 only, /root/reference/src/preprocess.py:67-78):

* weights: per-output-channel symmetric int8 from the BN-FOLDED kernels
  (folding first keeps the fold exact; quantizing pre-fold would skew the
  per-channel ranges).
* activations: per-site per-tensor symmetric scales, calibrated offline
  by running the fp32 folded forward over caller-supplied batches and
  taking a high quantile of |x| (quantile, not max: conv epilogues have
  heavy-tailed outliers; clipping them costs less than the resolution
  lost to scaling for them).
* conv: int8 x int8 with int32 accumulation (``preferred_element_type``),
  dequantized by the fused scalar s_x * s_w[cout] in the epilogue, plus
  bias / residual-add / ReLU, then requantized to the next site's scale.
  The residual join happens in fp32 before the final requant.
* maxpool commutes with the (monotone, nonneg-scale) quantization, so it
  runs directly on int8.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from .resnet import BN_EPS  # noqa: F401  (re-export site parity)

Array = jax.Array

_QMAX = 127.0


# ---------------------------------------------------------------------------
# Calibration: run the fp32 folded forward, recording per-site amax.
# Sites are the INPUTS of every quantized conv plus the block outputs
# (which are the next conv's input); keyed by a stable path string.


def _quantile_amax(x: Array, q: float) -> Array:
    return jnp.quantile(jnp.abs(x).reshape(-1), q)


def _conv(kernel: Array, x: Array, stride: int) -> Array:
    k = kernel.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _collect_forward(folded: Dict, images: Array, q: float) -> Dict[str, Array]:
    """fp32 folded forward returning {site: amax-quantile} (traceable)."""
    amax: Dict[str, Array] = {}

    def rec(site: str, x: Array) -> Array:
        amax[site] = _quantile_amax(x, q)
        return x

    x = rec("stem_in", images)
    x = _conv(folded["conv1"]["kernel"], x, 2) + folded["conv1"]["b"]
    x = jnp.maximum(x, 0.0)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for si, blocks in enumerate(folded["stages"]):
        for bi, block in enumerate(blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            p = f"s{si}b{bi}"
            x = rec(f"{p}_in", x)
            cin, cm = block["conv1"]["w"].shape
            y = _conv(block["conv1"]["w"].reshape(1, 1, cin, cm), x, 1)
            y = jnp.maximum(y + block["conv1"]["b"], 0.0)
            y = rec(f"{p}_y1", y)
            y = _conv(block["conv2"]["kernel"], y, stride)
            y = jnp.maximum(y + block["conv2"]["b"], 0.0)
            y = rec(f"{p}_y2", y)
            cm2, cout = block["conv3"]["w"].shape
            y = _conv(block["conv3"]["w"].reshape(1, 1, cm2, cout), y, 1)
            y = y + block["conv3"]["b"]
            if "downsample" in block:
                ci, co = block["downsample"]["w"].shape
                identity = _conv(
                    block["downsample"]["w"].reshape(1, 1, ci, co), x, stride
                ) + block["downsample"]["b"]
            else:
                identity = x
            x = jnp.maximum(y + identity, 0.0)
    rec("out", x)
    return amax


def calibrate_resnet50_int8(
    folded: Dict,
    calib_images: Array,
    *,
    batch_size: int = 32,
    quantile: float = 0.9995,
) -> Dict[str, float]:
    """Per-site activation scales from fp32 folded forwards.

    calib_images: (N, 224, 224, 3) ImageNet-normalized fp32 frames.
    Returns {site: scale} with scale = quantile(|x|) / 127.
    """
    # Params must be a jit ARGUMENT: closing over them bakes the full
    # weight tree into the serialized program as constants (breaks the
    # tunneled compile request's size limit for big models).
    collect = jax.jit(lambda p, imgs: _collect_forward(p, imgs, quantile))
    agg: Dict[str, float] = {}
    n = calib_images.shape[0]
    for i in range(0, n, batch_size):
        amax = jax.device_get(collect(folded, calib_images[i : i + batch_size]))
        for site, v in amax.items():
            agg[site] = max(agg.get(site, 0.0), float(v))
    return {site: max(v, 1e-8) / _QMAX for site, v in agg.items()}


# ---------------------------------------------------------------------------
# Weight quantization (per-output-channel symmetric, from folded kernels).


def _quant_w(kernel: Array) -> Dict[str, Array]:
    """HWIO (or (Cin, Cout) matrix) kernel -> int8 + per-cout fp32 scale."""
    if kernel.ndim == 2:
        kernel = kernel.reshape(1, 1, *kernel.shape)
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / _QMAX
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def quantize_resnet50_int8(
    folded: Dict, act_scales: Dict[str, float]
) -> Dict:
    """Folded fp32 params + calibrated activation scales -> int8 tree."""

    def site(s: str) -> Array:
        return jnp.float32(act_scales[s])

    qp: Dict = {
        "conv1": {**_quant_w(folded["conv1"]["kernel"]),
                  "b": folded["conv1"]["b"]},
        "s_stem_in": site("stem_in"),
        "stages": [],
        "act_scales": {k: jnp.float32(v) for k, v in act_scales.items()},
    }
    for si, blocks in enumerate(folded["stages"]):
        qblocks: List[dict] = []
        for bi, block in enumerate(blocks):
            p = f"s{si}b{bi}"
            qb = {
                "conv1": {**_quant_w(block["conv1"]["w"]),
                          "b": block["conv1"]["b"]},
                "conv2": {**_quant_w(block["conv2"]["kernel"]),
                          "b": block["conv2"]["b"]},
                "conv3": {**_quant_w(block["conv3"]["w"]),
                          "b": block["conv3"]["b"]},
                "s_in": site(f"{p}_in"),
                "s_y1": site(f"{p}_y1"),
                "s_y2": site(f"{p}_y2"),
            }
            if "downsample" in block:
                qb["downsample"] = {**_quant_w(block["downsample"]["w"]),
                                    "b": block["downsample"]["b"]}
            qblocks.append(qb)
        qp["stages"].append(qblocks)
    return qp


# ---------------------------------------------------------------------------
# int8 forward.


def _q(x: Array, scale: Array) -> Array:
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _conv_i8(xq: Array, wq: Array, stride: int = 1) -> Array:
    """int8 x int8 conv with int32 accumulation (MXU-native)."""
    k = wq.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _deq(acc: Array, s_x: Array, w: Dict) -> Array:
    """int32 conv accumulator -> fp32 with bias applied."""
    return acc.astype(jnp.float32) * (s_x * w["scale"]) + w["b"]


def _mm1x1(xq: Array, w: Dict, s_x: Array, s_out, relu: bool,
           interpret: bool) -> Array:
    """1x1 conv as the fused Pallas int8 matmul+requant kernel
    (ops/int8_matmul_pallas.py): (B, H, W, Cin) int8 -> (B, H, W, Cout)
    int8 (or f32 when s_out is None), the s32 accumulator never in HBM."""
    from ...ops.int8_matmul_pallas import int8_matmul_requant

    B, H, W, _ = xq.shape
    wq = w["q"].reshape(w["q"].shape[-2], w["q"].shape[-1])  # (Cin, Cout)
    out = int8_matmul_requant(
        xq.reshape(B * H * W, -1), wq, s_x * w["scale"], w["b"],
        s_out=s_out, relu=relu, interpret=interpret,
    )
    return out.reshape(B, H, W, -1)


def _mm1x1_res(xq: Array, w: Dict, s_x: Array, idq: Array, s_id: Array,
               s_out, interpret: bool) -> Array:
    """conv3 + dequant + int8 identity join + ReLU + requant in one pass
    (the identity path of non-downsample bottlenecks is already int8 at
    the block-input scale)."""
    from ...ops.int8_matmul_pallas import int8_matmul_residual_requant

    B, H, W, _ = xq.shape
    wq = w["q"].reshape(w["q"].shape[-2], w["q"].shape[-1])
    out = int8_matmul_residual_requant(
        xq.reshape(B * H * W, -1), wq, s_x * w["scale"], w["b"],
        idq.reshape(B * H * W, -1), s_id, s_out=s_out, interpret=interpret,
    )
    return out.reshape(B, H, W, -1)


def apply_resnet50_int8(
    qp: Dict, images: Array, *, use_pallas_1x1: bool = False,
    interpret: bool = False,
) -> Array:
    """(B, 224, 224, 3) normalized fp32/bf16 -> (B, 2048) fp32 features.

    All inter-op activations are int8; dequant/requant ride the conv
    epilogue fusions (which are the bandwidth-bound ops this variant
    exists to shrink). ``use_pallas_1x1``
    (kernels.int8_conv1x1_pallas) routes the stride-1 1x1 convs through
    the fused Pallas int8 matmul+requant kernels — same math, same
    epilogue op order, no s32 accumulator in HBM (VERDICT r3 item 7
    experiment; A/B in benchmarks/cnn_results.json)."""
    xq = _q(images.astype(jnp.float32), qp["s_stem_in"])
    acc = _conv_i8(xq, qp["conv1"]["q"], 2)
    x = jnp.maximum(_deq(acc, qp["s_stem_in"], qp["conv1"]), 0.0)
    # Requant to the stage-1 input scale BEFORE the maxpool: max commutes
    # with the monotone quantization, so the pool runs on int8 bytes.
    s_in0 = qp["stages"][0][0]["s_in"]
    xq = _q(x, s_in0)
    xq = jax.lax.reduce_window(
        xq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    s_x = s_in0
    for si, blocks in enumerate(qp["stages"]):
        for bi, block in enumerate(blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            last = (bi + 1 == len(blocks)
                    and si + 1 == len(qp["stages"]))
            if bi + 1 < len(blocks):
                s_next = blocks[bi + 1]["s_in"]
            elif not last:
                s_next = qp["stages"][si + 1][0]["s_in"]
            else:
                s_next = None  # final block feeds the fp32 pool directly

            if use_pallas_1x1:
                yq = _mm1x1(xq, block["conv1"], s_x, block["s_y1"],
                            relu=True, interpret=interpret)
            else:
                y = _deq(_conv_i8(xq, block["conv1"]["q"]), s_x,
                         block["conv1"])
                yq = _q(jnp.maximum(y, 0.0), block["s_y1"])
            y = _deq(_conv_i8(yq, block["conv2"]["q"], stride),
                     block["s_y1"], block["conv2"])
            yq = _q(jnp.maximum(y, 0.0), block["s_y2"])
            if use_pallas_1x1 and "downsample" not in block:
                # Fused conv3 + int8 identity join + ReLU + requant: the
                # identity is the block input, already int8 at scale s_x.
                out_q_or_f32 = _mm1x1_res(
                    yq, block["conv3"], block["s_y2"], xq, s_x, s_next,
                    interpret=interpret,
                )
                if last:
                    return jnp.mean(out_q_or_f32, axis=(1, 2))
                s_x = s_next
                xq = out_q_or_f32
                continue
            if use_pallas_1x1:
                # Downsample block: conv3 still fused (f32 out, no
                # accumulator in HBM); the join stays XLA because the
                # downsampled identity is f32.
                y = _mm1x1(yq, block["conv3"], block["s_y2"], None,
                           relu=False, interpret=interpret)
            else:
                y = _deq(_conv_i8(yq, block["conv3"]["q"]),
                         block["s_y2"], block["conv3"])
            if "downsample" in block:
                identity = _deq(
                    _conv_i8(xq, block["downsample"]["q"], stride),
                    s_x, block["downsample"],
                )
            else:
                identity = xq.astype(jnp.float32) * s_x
            out = jnp.maximum(y + identity, 0.0)
            # Requant to the next conv's input scale; the final block's
            # output goes straight to the fp32 pool (no requant loss).
            if last:
                return jnp.mean(out, axis=(1, 2))
            s_x = s_next
            xq = _q(out, s_x)
    raise AssertionError("unreachable: empty stage list")


def feature_error(ref: Array, test: Array) -> Dict[str, float]:
    """Relative L2 + mean cosine similarity of pooled feature batches."""
    ref = jnp.asarray(ref, jnp.float32)
    test = jnp.asarray(test, jnp.float32)
    rel = jnp.linalg.norm(test - ref) / jnp.maximum(jnp.linalg.norm(ref), 1e-8)
    cos = jnp.sum(ref * test, -1) / jnp.maximum(
        jnp.linalg.norm(ref, axis=-1) * jnp.linalg.norm(test, axis=-1), 1e-8
    )
    return {"rel_l2": float(rel), "mean_cosine": float(jnp.mean(cos))}
