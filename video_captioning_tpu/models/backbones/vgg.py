"""VGG16 feature extractor (fc7, 4096-d) in JAX.

Replaces the reference's torchvision VGG16 wrapper (encoder.py:101-154,
preprocess.py:69-71): the conv stack runs NHWC (TPU-native layout — XLA
tiles NHWC convs directly onto the MXU), and the classifier is truncated
after the second fully-connected layer's ReLU exactly like the reference's
``classifier[:-1]`` slice, producing ReLU(fc7) features.

Pretrained torchvision weights can be imported from a ``.npz``/state-dict
file via :func:`load_torch_vgg16` (torchvision itself is not a dependency);
without weights the extractor still runs with torch-default random init —
useful for pipeline tests, not for caption quality.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Conv plan "D": (out_channels per conv, 'M' = 2x2 maxpool)
VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


def _conv_init(key, kh, kw, cin, cout):
    # torch Conv2d default: kaiming_uniform(a=√5) ⇒ U(±1/√(fan_in))
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    k_w, k_b = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k_w, (kh, kw, cin, cout), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k_b, (cout,), jnp.float32, -bound, bound),
    }


def _fc_init(key, cin, cout):
    bound = 1.0 / math.sqrt(cin)
    k_w, k_b = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k_w, (cin, cout), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k_b, (cout,), jnp.float32, -bound, bound),
    }


def init_vgg16(key: Array) -> Dict:
    convs: List[dict] = []
    cin = 3
    for item in VGG16_PLAN:
        if item == "M":
            continue
        key, sub = jax.random.split(key)
        convs.append(_conv_init(sub, 3, 3, cin, item))
        cin = item
    key, k1, k2 = jax.random.split(key, 3)
    return {
        "convs": convs,
        "fc6": _fc_init(k1, 512 * 7 * 7, 4096),
        "fc7": _fc_init(k2, 4096, 4096),
    }


def _conv2d(p: dict, x: Array) -> Array:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"]


def _maxpool2(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _adaptive_avg_pool(x: Array, out_h: int, out_w: int) -> Array:
    """torch AdaptiveAvgPool2d semantics for NHWC: output bin (i, j)
    averages rows [floor(i·H/out), ceil((i+1)·H/out)) — variable windows,
    exact for any input size (identity when H == out_h)."""
    B, H, W, C = x.shape
    if H == out_h and W == out_w:
        return x
    rows = []
    for i in range(out_h):
        h0 = (i * H) // out_h
        h1 = -((-(i + 1) * H) // out_h)  # ceil
        cols = []
        for j in range(out_w):
            w0 = (j * W) // out_w
            w1 = -((-(j + 1) * W) // out_w)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))  # (B, out_w, C)
    return jnp.stack(rows, axis=1)  # (B, out_h, out_w, C)


def apply_vgg16(params: Dict, images: Array) -> Array:
    """images: (B, H, W, 3) normalized float → (B, 4096) ReLU(fc7).

    Any input size works: like torchvision's AdaptiveAvgPool2d((7,7))
    between the conv stack and the classifier, the feature map is
    adaptively pooled to 7×7 (identity at the canonical 224×224)."""
    x = images
    ci = 0
    for item in VGG16_PLAN:
        if item == "M":
            x = _maxpool2(x)
        else:
            x = jax.nn.relu(_conv2d(params["convs"][ci], x))
            ci += 1
    x = _adaptive_avg_pool(x, 7, 7)
    B = x.shape[0]
    # torch flattens NCHW (C, H, W); transpose so imported fc6 weights match.
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, -1)
    x = jax.nn.relu(x @ params["fc6"]["kernel"] + params["fc6"]["bias"])
    x = jax.nn.relu(x @ params["fc7"]["kernel"] + params["fc7"]["bias"])
    return x


def load_torch_vgg16(state: Dict[str, np.ndarray]) -> Dict:
    """Convert a torchvision vgg16 state dict (name → ndarray) to our pytree.

    Accepts either torch tensors or numpy arrays (e.g. from np.load of an
    exported .npz). Conv kernels (O,I,H,W) → (H,W,I,O); fc (O,I) → (I,O).
    """
    def arr(v):
        return np.asarray(v)

    conv_ids = [i for i, it in enumerate(VGG16_PLAN) if it != "M"]
    # torchvision indexes convs inside 'features' sequential incl. pools.
    feat_idx = []
    li = 0
    for it in VGG16_PLAN:
        if it == "M":
            li += 1
        else:
            feat_idx.append(li)
            li += 2  # conv + relu

    convs = []
    for idx in feat_idx:
        w = arr(state[f"features.{idx}.weight"]).transpose(2, 3, 1, 0)
        b = arr(state[f"features.{idx}.bias"])
        convs.append({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})

    def fc(prefix):
        return {
            "kernel": jnp.asarray(arr(state[f"{prefix}.weight"]).T),
            "bias": jnp.asarray(arr(state[f"{prefix}.bias"])),
        }

    assert len(convs) == len(conv_ids)
    return {"convs": convs, "fc6": fc("classifier.0"), "fc7": fc("classifier.3")}
