"""Context-parallel (sequence-sharded) cross-attention.

SURVEY §5: the reference downsamples every video to 80 frames, so context
parallelism is not needed for parity — but the attention must be designed
so a CP axis can be introduced without redesign if frame counts grow. This
module IS that design, implemented and tested rather than just promised:

Bahdanau cross-attention where the frame axis ``S`` is sharded over a mesh
axis. Each shard computes local scores and a local max, the global softmax
statistics are combined with ``lax.pmax``/``lax.psum`` (the blockwise /
online-softmax decomposition used by flash- and ring-attention), and the
context vector is the psum of shard-local weighted sums. One query per
step means the communication is O(B·A) scalars — negligible against ICI
bandwidth at any realistic batch.

The decoder recurrence itself is sequential over *tokens* (20 max) and
never needs sharding; only the frame axis scales.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.layers import apply_linear

Array = jax.Array

_MASK_FILL = -1e9


def attend_context_parallel(
    config: Config,
    params: dict,
    encoder_outputs: Array,  # (B, S, E), S sharded over `axis` on the mesh
    decoder_hidden: Array,   # (B, D), replicated
    encoder_mask: Optional[Array],  # (B, S), S sharded like encoder_outputs
    mesh: Mesh,
    axis: str = "model",
) -> Tuple[Array, Array]:
    """Bahdanau attention with the frame axis sharded over ``axis``.

    Returns (context (B, E) replicated, weights (B, S) S-sharded) —
    numerically identical to the unsharded ``attention.attend``.
    """
    attn = params

    def local_attend(enc_local, dec_hidden, mask_local):
        # enc_local: (B, S_local, E) — this shard's frames.
        enc_proj = apply_linear(attn["encoder_projection"], enc_local)
        dec_proj = apply_linear(attn["decoder_projection"], dec_hidden)
        combined = jnp.tanh(enc_proj + dec_proj[:, None, :])
        scores = apply_linear(attn["attention_linear"], combined)[..., 0]
        if mask_local is not None:
            scores = jnp.where(mask_local > 0, scores, _MASK_FILL)

        # Online-softmax combine across shards: global max, then global sum.
        m_local = jnp.max(scores, axis=-1)                       # (B,)
        m_global = jax.lax.pmax(m_local, axis)
        exp = jnp.exp(scores - m_global[:, None])                 # (B, S_l)
        denom = jax.lax.psum(jnp.sum(exp, axis=-1), axis)        # (B,)
        weights_local = exp / denom[:, None]                     # (B, S_l)

        ctx_local = jnp.einsum("bs,bse->be", weights_local, enc_local)
        context = jax.lax.psum(ctx_local, axis)                  # (B, E)
        return context, weights_local

    sharded = jax.shard_map(
        local_attend,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(None, axis)),
        out_specs=(P(), P(None, axis)),
    )
    if encoder_mask is None:
        encoder_mask = jnp.ones(encoder_outputs.shape[:2], encoder_outputs.dtype)
    return sharded(encoder_outputs, decoder_hidden, encoder_mask)


def shard_frames(mesh: Mesh, x: Array, axis: str = "model") -> Array:
    """Place a (B, S, ...) array with S sharded over `axis`."""
    spec = P(None, axis) if x.ndim == 2 else P(None, axis, *([None] * (x.ndim - 2)))
    return jax.device_put(x, NamedSharding(mesh, spec))
