"""Opt-in W8A8 quantization of the DECODE path (models/quantize.py).

Round-3 closure (docs/PERFORMANCE.md): the decode loop's per-op rooflines
were closed twice with the same conclusion — "the remaining decode win is
precision, not fusion" — and bf16 was measured not token-safe. This module
extends the int8 machinery already proven on the CNN backbones
(models/backbones/*_int8.py: +49-57% there) to the captioner's decode
matrices:

* ``level="vocab"`` — the (D, V) vocabulary projection only: the single
  biggest decode matmul (~71 µs/step fp32 at reference scale, pure MXU)
  and the most error-tolerant (logit ORDER is what matters, and beams
  re-rank every step).
* ``level="full"`` — additionally every transformer block linear
  (wq/wk/wv/wo of self/cross attention, MLP fc1/fc2). The LSTM family's
  recurrent gate matrices stay fp32/bf16 at this level: their
  sigmoid/tanh nonlinearities compound per-step rounding through the
  carried state (measured pattern from the bf16 gate: beam state
  compounds), and they are already a small slice of the LSTM step.

Activation quantization is DYNAMIC (per-row abs-max computed on device
each call — layers.int8_linear), so no calibration data is needed; weight
scales are static per-output-channel (layers.quantize_linear_int8).

STRICTLY OPT-IN, decode/serving only: int8 logits are approximate, so the
fp32 token-parity contract does not apply. Token-agreement rates vs fp32
are measured at 10k-decode scale by ``benchmarks/int8_decode_gate.py``
(the same protocol as the bf16 gate) and quoted in docs/PERFORMANCE.md;
the transform is applied by ``VideoCaptionPredictor(decode_int8=...)`` /
``--decode-int8`` at model-load time, never in training.
"""

from __future__ import annotations

from typing import Dict

from ..config import Config
from .layers import quantize_linear_int8

LEVELS = ("off", "vocab", "full")


def quantize_decode_params(params: Dict, config: Config, level: str) -> Dict:
    """Return a copy of the captioner param tree with the selected decode
    matrices in W8A8 form (consumed transparently by ``apply_linear``)."""
    if level not in LEVELS:
        raise ValueError(f"decode_int8 must be one of {LEVELS}, got {level!r}")
    if level == "off":
        return params

    dec = dict(params["decoder"])
    dec["output_projection"] = quantize_linear_int8(dec["output_projection"])

    if level == "full" and config.model.architecture == "transformer":
        blocks = []
        for blk in dec["blocks"]:
            blk = dict(blk)
            for attn_name in ("self_attn", "cross_attn"):
                attn = {
                    k: quantize_linear_int8(v)
                    for k, v in blk[attn_name].items()
                }
                blk[attn_name] = attn
            blk["mlp"] = {
                k: quantize_linear_int8(v) for k, v in blk["mlp"].items()
            }
            blocks.append(blk)
        dec["blocks"] = blocks

    return dict(params, decoder=dec)
