"""ResNet50 feature extractor (2048-d pooled) in JAX.

Replaces the reference's torchvision ResNet50 wrapper (encoder.py:157-202,
preprocess.py:72-74): NHWC layout, bottleneck blocks [3, 4, 6, 3], global
average pool — the reference's ``children()[:-1]`` slice (everything but
the final fc).

BatchNorm runs in inference mode (frozen running statistics), matching the
reference's frozen, eval()-mode usage of the backbone (encoder.py:179-181,
preprocess.py:54). Weights import from a torchvision state dict via
:func:`load_torch_resnet50`; random init (He-style) is available for
pipeline tests.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

BLOCKS_PER_STAGE = [3, 4, 6, 3]
STAGE_WIDTH = [64, 128, 256, 512]
EXPANSION = 4
BN_EPS = 1e-5


def _conv_init(key, kh, kw, cin, cout):
    fan_out = kh * kw * cout  # torchvision resnet: kaiming_normal fan_out
    std = math.sqrt(2.0 / fan_out)
    return {"kernel": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std}


def _bn_init(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_resnet50(key: Array) -> Dict:
    key, k0 = jax.random.split(key)
    params: Dict = {
        "conv1": _conv_init(k0, 7, 7, 3, 64),
        "bn1": _bn_init(64),
        "stages": [],
    }
    cin = 64
    for stage_idx, (n_blocks, width) in enumerate(zip(BLOCKS_PER_STAGE, STAGE_WIDTH)):
        blocks: List[dict] = []
        for b in range(n_blocks):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            cout = width * EXPANSION
            stride = 2 if (stage_idx > 0 and b == 0) else 1
            block = {
                "conv1": _conv_init(k1, 1, 1, cin, width),
                "bn1": _bn_init(width),
                "conv2": _conv_init(k2, 3, 3, width, width),
                "bn2": _bn_init(width),
                "conv3": _conv_init(k3, 1, 1, width, cout),
                "bn3": _bn_init(cout),
            }
            if b == 0:
                block["downsample_conv"] = _conv_init(k4, 1, 1, cin, cout)
                block["downsample_bn"] = _bn_init(cout)
            blocks.append(block)
            cin = cout
        params["stages"].append(blocks)
    return params


def _conv(p: dict, x: Array, stride: int = 1) -> Array:
    # Explicit symmetric padding matching torch Conv2d(padding=k//2):
    # "SAME" is only equivalent at stride 1 — at stride 2 it pads (0, 1)
    # where torch pads (1, 1), which desyncs every stride-2 3x3 conv.
    k = p["kernel"].shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p: dict, x: Array) -> Array:
    inv = jax.lax.rsqrt(p["var"] + BN_EPS)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _bottleneck(block: dict, x: Array, stride: int) -> Array:
    identity = x
    y = jax.nn.relu(_bn(block["bn1"], _conv(block["conv1"], x)))
    y = jax.nn.relu(_bn(block["bn2"], _conv(block["conv2"], y, stride=stride)))
    y = _bn(block["bn3"], _conv(block["conv3"], y))
    if "downsample_conv" in block:
        identity = _bn(
            block["downsample_bn"], _conv(block["downsample_conv"], x, stride=stride)
        )
    return jax.nn.relu(y + identity)


def apply_resnet50(params: Dict, images: Array) -> Array:
    """images: (B, 224, 224, 3) normalized float → (B, 2048)."""
    # Stem: 7x7/2 conv (torch pads 3), BN, ReLU, 3x3/2 maxpool (pad 1).
    x = jax.lax.conv_general_dilated(
        images, params["conv1"]["kernel"], window_strides=(2, 2),
        padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = jax.nn.relu(_bn(params["bn1"], x))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for stage_idx, blocks in enumerate(params["stages"]):
        for b, block in enumerate(blocks):
            stride = 2 if (stage_idx > 0 and b == 0) else 1
            x = _bottleneck(block, x, stride)
    return jnp.mean(x, axis=(1, 2))  # global average pool → (B, 2048)


def load_torch_resnet50(state: Dict[str, np.ndarray]) -> Dict:
    """Convert a torchvision resnet50 state dict to our pytree."""

    def conv(name):
        return {"kernel": jnp.asarray(np.asarray(state[f"{name}.weight"]).transpose(2, 3, 1, 0))}

    def bn(name):
        return {
            "scale": jnp.asarray(np.asarray(state[f"{name}.weight"])),
            "bias": jnp.asarray(np.asarray(state[f"{name}.bias"])),
            "mean": jnp.asarray(np.asarray(state[f"{name}.running_mean"])),
            "var": jnp.asarray(np.asarray(state[f"{name}.running_var"])),
        }

    params: Dict = {"conv1": conv("conv1"), "bn1": bn("bn1"), "stages": []}
    for stage_idx, n_blocks in enumerate(BLOCKS_PER_STAGE, start=1):
        blocks = []
        for b in range(n_blocks):
            prefix = f"layer{stage_idx}.{b}"
            block = {
                "conv1": conv(f"{prefix}.conv1"), "bn1": bn(f"{prefix}.bn1"),
                "conv2": conv(f"{prefix}.conv2"), "bn2": bn(f"{prefix}.bn2"),
                "conv3": conv(f"{prefix}.conv3"), "bn3": bn(f"{prefix}.bn3"),
            }
            if f"{prefix}.downsample.0.weight" in state:
                block["downsample_conv"] = conv(f"{prefix}.downsample.0")
                block["downsample_bn"] = bn(f"{prefix}.downsample.1")
            blocks.append(block)
        params["stages"].append(blocks)
    return params
