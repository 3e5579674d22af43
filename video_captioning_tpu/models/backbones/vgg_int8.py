"""W8A8 static post-training quantization for the VGG16 extractor.

Same scheme and rationale as :mod:`resnet_int8` (shared helpers imported
from there), applied to the reference's DEFAULT backbone (VGG16 fc7
features, /root/reference/src/preprocess.py:69-71). The motivation
differs though: VGG16's bf16 conv stack is MXU-COMPUTE-bound (~77% of
v5e bf16 peak, docs/PERFORMANCE.md) where ResNet50 is HBM-bound — int8
targets the MXU's 2x int8 rate here, plus halved weight traffic on the
102M-parameter fc6. Opt-in only (`variant="int8"`); quality contract =
feature-space error gates in tests/test_backbones.py.

Site map: one activation scale per conv input (13), plus the fc6 and fc7
inputs. 2x2 maxpools run in the int8 domain (max commutes with the
monotone quantization); the adaptive average pool — identity at the
canonical 224x224 — runs in fp32 between the conv stack and fc6.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from .resnet_int8 import _QMAX, _q, _quant_w, _quantile_amax
from .vgg import VGG16_PLAN, _adaptive_avg_pool, _maxpool2

Array = jax.Array


def _conv_i8(xq: Array, wq: Array) -> Array:
    return jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _quant_fc(kernel: Array) -> Dict[str, Array]:
    """(Cin, Cout) fc kernel -> int8 + per-cout fp32 scale."""
    amax = jnp.max(jnp.abs(kernel), axis=0)
    scale = jnp.maximum(amax, 1e-8) / _QMAX
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def _collect_forward(params: Dict, images: Array, q: float) -> Dict[str, Array]:
    """fp32 forward returning {site: amax-quantile} (traceable)."""
    amax: Dict[str, Array] = {}
    x = images
    ci = 0
    for item in VGG16_PLAN:
        if item == "M":
            x = _maxpool2(x)
        else:
            amax[f"c{ci}_in"] = _quantile_amax(x, q)
            p = params["convs"][ci]
            y = jax.lax.conv_general_dilated(
                x, p["kernel"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["bias"]
            x = jax.nn.relu(y)
            ci += 1
    x = _adaptive_avg_pool(x, 7, 7)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    amax["fc6_in"] = _quantile_amax(x, q)
    x = jax.nn.relu(x @ params["fc6"]["kernel"] + params["fc6"]["bias"])
    amax["fc7_in"] = _quantile_amax(x, q)
    return amax


def calibrate_vgg16_int8(
    params: Dict,
    calib_images: Array,
    *,
    batch_size: int = 32,
    quantile: float = 0.9995,
) -> Dict[str, float]:
    """Per-site activation scales from fp32 forwards (see resnet_int8)."""
    # Params must be a jit ARGUMENT, not a closure constant: VGG16's
    # 528 MB weight tree baked into the program breaks the tunneled
    # compile request's size limit (HTTP 413; see resnet_int8).
    collect = jax.jit(lambda p, imgs: _collect_forward(p, imgs, quantile))
    agg: Dict[str, float] = {}
    n = calib_images.shape[0]
    for i in range(0, n, batch_size):
        amax = jax.device_get(collect(params, calib_images[i : i + batch_size]))
        for site, v in amax.items():
            agg[site] = max(agg.get(site, 0.0), float(v))
    return {site: max(v, 1e-8) / _QMAX for site, v in agg.items()}


def quantize_vgg16_int8(params: Dict, act_scales: Dict[str, float]) -> Dict:
    convs: List[dict] = [
        {**_quant_w(p["kernel"]), "b": p["bias"],
         "s_in": jnp.float32(act_scales[f"c{i}_in"])}
        for i, p in enumerate(params["convs"])
    ]
    return {
        "convs": convs,
        "fc6": {**_quant_fc(params["fc6"]["kernel"]), "b": params["fc6"]["bias"],
                "s_in": jnp.float32(act_scales["fc6_in"])},
        "fc7": {**_quant_fc(params["fc7"]["kernel"]), "b": params["fc7"]["bias"],
                "s_in": jnp.float32(act_scales["fc7_in"])},
    }


def apply_vgg16_int8(qp: Dict, images: Array) -> Array:
    """(B, H, W, 3) normalized float -> (B, 4096) ReLU(fc7), W8A8."""
    ci = 0
    xq = _q(images.astype(jnp.float32), qp["convs"][0]["s_in"])
    x_last = None  # fp32 ReLU output of the final conv (set at ci==12)
    for item in VGG16_PLAN:
        if item == "M":
            if x_last is not None:
                # The plan's final pool follows the last conv; the stack
                # has already left the int8 domain there.
                x_last = _maxpool2(x_last)
            else:
                xq = jax.lax.reduce_window(
                    xq, jnp.int8(-128), jax.lax.max,
                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
                )
        else:
            c = qp["convs"][ci]
            acc = _conv_i8(xq, c["q"])
            y = acc.astype(jnp.float32) * (c["s_in"] * c["scale"]) + c["b"]
            y = jnp.maximum(y, 0.0)
            ci += 1
            if ci < len(qp["convs"]):
                # Requant straight to the NEXT conv's input scale: any pool
                # in between commutes with the monotone quantization (the
                # scale was calibrated post-pool; max selects the same
                # element either side of the requant).
                xq = _q(y, qp["convs"][ci]["s_in"])
            else:
                x_last = y
    x = _adaptive_avg_pool(x_last, 7, 7)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

    def fc_i8(xf, fc, relu=True):
        xq = _q(xf, fc["s_in"])
        acc = jax.lax.dot_general(
            xq, fc["q"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (fc["s_in"] * fc["scale"]) + fc["b"]
        return jnp.maximum(y, 0.0) if relu else y

    x = fc_i8(x, qp["fc6"])
    return fc_i8(x, qp["fc7"])
