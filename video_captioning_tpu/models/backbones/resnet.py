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


# ---------------------------------------------------------------------------
# Folded / fused inference path.
#
# The backbone only ever runs frozen in eval mode (reference
# encoder.py:179-181, preprocess.py:54), so every BatchNorm is an affine
# with constant coefficients and can be folded into the preceding conv:
#   g = scale * rsqrt(var + eps);  kernel' = kernel * g;  bias' = bias - mean*g
# The per-op TPU profile (benchmarks/profile_cnn.py) showed ~13.4 ms of a
# 27.2 ms B=320 bf16 forward in standalone HBM-bound add/maximum fusions —
# the BN affines, biases, residual adds and ReLUs that XLA does NOT fuse
# into its conv custom-calls. Folding kills the BN ops, and the Pallas
# fused 1x1-conv kernel (ops/conv1x1_pallas.py) applies bias + residual +
# ReLU to the VMEM-resident matmul accumulator, so bottleneck tails never
# round-trip through HBM.


def fold_bn(params: Dict) -> Dict:
    """Fold frozen BN stats into conv kernels → {kernel|w, bias} tree.

    1x1 convs are stored as 2-D ``w: (Cin, Cout)`` matrices ready for the
    Pallas matmul kernel; the stem 7x7 and bottleneck 3x3 convs keep HWIO
    kernels for XLA's conv path.
    """

    def fold(conv: dict, bn: dict, *, as_matrix: bool) -> dict:
        g = bn["scale"] * jax.lax.rsqrt(bn["var"] + BN_EPS)
        kernel = conv["kernel"] * g  # broadcast over trailing (cout) axis
        bias = bn["bias"] - bn["mean"] * g
        if as_matrix:
            kh, kw, cin, cout = kernel.shape
            assert kh == kw == 1
            return {"w": kernel.reshape(cin, cout), "b": bias}
        return {"kernel": kernel, "b": bias}

    folded: Dict = {
        "conv1": fold(params["conv1"], params["bn1"], as_matrix=False),
        "stages": [],
    }
    # Space-to-depth stem (MLPerf ResNet TPU recipe): the 7x7/2 conv on 3
    # channels maps poorly onto the 128-lane MXU (contraction dim 147,
    # tiny channel axis). Rewriting it as a 4x4/1 conv over a 2x2
    # space-to-depth transform of the input (12 channels) is numerically
    # EXACT — the extra kernel taps are zeros:
    #   y[i,j] = sum_{dy,dx<7} K[dy,dx] X[2i+dy-3, 2j+dx-3]
    # Pad K to 8x8 with a zero top row/left col, pad X by (4, 2); then
    # dy' = 2cy+py gives a 4x4 cell conv over Z[u,v,(py,px,c)].
    folded["conv1_s2d"] = {
        "kernel": _s2d_stem_kernel(folded["conv1"]["kernel"]),
        "b": folded["conv1"]["b"],
    }
    for blocks in params["stages"]:
        fblocks = []
        for block in blocks:
            fb = {
                "conv1": fold(block["conv1"], block["bn1"], as_matrix=True),
                "conv2": fold(block["conv2"], block["bn2"], as_matrix=False),
                "conv3": fold(block["conv3"], block["bn3"], as_matrix=True),
            }
            if "downsample_conv" in block:
                fb["downsample"] = fold(
                    block["downsample_conv"], block["downsample_bn"],
                    as_matrix=True,
                )
            fblocks.append(fb)
        folded["stages"].append(fblocks)
    return folded


def _s2d_stem_kernel(kernel: Array) -> Array:
    """(7, 7, cin, cout) stride-2 stem kernel → (4, 4, 4*cin, cout) for a
    stride-1 conv over the 2x2 space-to-depth input (see fold_bn note)."""
    kh, kw, cin, cout = kernel.shape
    assert kh == 7 and kw == 7, (kh, kw)
    kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # 8x8
    return (
        kp.reshape(4, 2, 4, 2, cin, cout)      # (cy, py, cx, px, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)           # (cy, cx, py, px, cin, cout)
        .reshape(4, 4, 4 * cin, cout)
    )


def _s2d_stem_input(images: Array) -> Array:
    """(B, H, W, C) → (B, (H+6)/2, (W+6)/2, 4C) padded space-to-depth view
    whose 4x4 VALID conv with :func:`_s2d_stem_kernel` equals the 7x7/2
    pad-3 stem conv exactly."""
    xq = jnp.pad(images, ((0, 0), (4, 2), (4, 2), (0, 0)))
    B, H, W, C = xq.shape
    return (
        xq.reshape(B, H // 2, 2, W // 2, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H // 2, W // 2, 4 * C)
    )


def _c1x1(
    x: Array, p: dict, *, stride: int = 1, relu: bool = True,
    residual: Array = None, use_pallas: bool = True,
) -> Array:
    """Folded 1x1 conv + bias [+ residual] [+ ReLU]; Pallas when legal."""
    if use_pallas:
        from ...ops.conv1x1_pallas import conv1x1

        out = conv1x1(x, p["w"], p["b"], residual,
                      stride=stride, relu=relu)
        if out is not None:
            return out
    cin, cout = p["w"].shape
    y = jax.lax.conv_general_dilated(
        x, p["w"].reshape(1, 1, cin, cout), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    if residual is not None:
        y = y + residual
    return jnp.maximum(y, 0.0) if relu else y


def _bottleneck_folded(
    block: dict, x: Array, stride: int, use_pallas: bool,
    interpret: bool = False,
) -> Array:
    if use_pallas and stride == 1 and "downsample" not in block:
        # Stride-1 identity-residual block (13 of 16): the whole
        # 1x1 -> 3x3 -> 1x1 + residual + relu chain runs as ONE Pallas
        # kernel with intermediates VMEM-resident (~3x less HBM traffic
        # for a stage-1 block; ops/bottleneck_pallas.py).
        from ...ops.bottleneck_pallas import batch_tile, fused_bottleneck

        B, H, W, C = x.shape
        Cm = block["conv1"]["w"].shape[1]
        if batch_tile(B, H, W, C, Cm, x.dtype.itemsize) is not None:
            w2 = block["conv2"]["kernel"]  # (3, 3, Cm, Cm) HWIO
            return fused_bottleneck(
                x,
                block["conv1"]["w"], block["conv1"]["b"],
                w2, block["conv2"]["b"],
                block["conv3"]["w"], block["conv3"]["b"],
                interpret=interpret,
            )
    # Non-qualifying blocks take the XLA path: the per-conv Pallas 1x1
    # kernel measured SLOWER than XLA's conv custom-call at model scale
    # (layout round-trips; docs/PERFORMANCE.md negative results), so
    # use_pallas only selects the fused whole-block kernel above.
    y = _c1x1(x, block["conv1"], use_pallas=False)
    y = _conv({"kernel": block["conv2"]["kernel"]}, y, stride=stride)
    y = jnp.maximum(y + block["conv2"]["b"], 0.0)
    if "downsample" in block:
        identity = _c1x1(x, block["downsample"], stride=stride, relu=False,
                         use_pallas=False)
    else:
        identity = x
    return _c1x1(y, block["conv3"], residual=identity, use_pallas=False)


def apply_resnet50_folded(
    folded: Dict, images: Array, *, use_pallas: bool = True,
    stem_s2d: bool = False, interpret: bool = False,
    fuse_stages: tuple = (0, 1, 2, 3),
) -> Array:
    """BN-folded inference forward; numerics match :func:`apply_resnet50`
    to fp32 rounding (gated in tests/test_backbones.py). images:
    (B, 224, 224, 3) normalized float → (B, 2048).

    ``fuse_stages`` limits the fused-bottleneck Pallas kernel (when
    ``use_pallas``) to a subset of the 4 stages: the kernel's trade-off —
    ~3x less HBM traffic vs smaller batch tiles / Cm-lane MXU
    underutilization — lands differently per stage (stage 1 has Cm=64 at
    56x56; stage 4 has Cm=512 at 7x7), so the A/B is per-stage
    (benchmarks/cnn_suite.py)."""
    if stem_s2d and "conv1_s2d" in folded:
        x = jax.lax.conv_general_dilated(
            _s2d_stem_input(images), folded["conv1_s2d"]["kernel"],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        x = jax.lax.conv_general_dilated(
            images, folded["conv1"]["kernel"], window_strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    x = jnp.maximum(x + folded["conv1"]["b"], 0.0)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for stage_idx, blocks in enumerate(folded["stages"]):
        for b, block in enumerate(blocks):
            stride = 2 if (stage_idx > 0 and b == 0) else 1
            fuse = use_pallas and stage_idx in fuse_stages
            x = _bottleneck_folded(block, x, stride, fuse, interpret)
    return jnp.mean(x, axis=(1, 2))


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
