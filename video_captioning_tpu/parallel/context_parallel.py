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

    Thin wrapper over :func:`attend_cp` (the generic all-kinds CP attend
    that models/attention.py routes through): builds the precomputed
    enc-projection cache and delegates, so the online-softmax combine
    exists in exactly one place.
    """
    if config.model.attention_type != "bahdanau":
        raise ValueError(
            "attend_context_parallel is the bahdanau-only legacy entry; "
            "use attend_cp for other attention types"
        )
    cache = {"enc_proj": apply_linear(params["encoder_projection"],
                                      encoder_outputs)}
    return attend_cp(
        config, params, cache, encoder_outputs, decoder_hidden,
        encoder_mask, axis, mesh=mesh,
    )


def shard_frames(mesh: Mesh, x: Array, axis: str = "model") -> Array:
    """Place a (B, S, ...) array with S sharded over `axis`."""
    spec = P(None, axis) if x.ndim == 2 else P(None, axis, *([None] * (x.ndim - 2)))
    return jax.device_put(x, NamedSharding(mesh, spec))


# ==========================================================================
# Generic CP attend: all attention kinds, single-query (B, D) and beam
# (B, K, D) — this is what models/attention.py routes through when
# ``config.parallel.context_axis`` is set.
# ==========================================================================


def _frame_spec(x: Array, axis: str) -> P:
    """(B, S, ...) → P(None, axis, None...): frame axis sharded."""
    return P(None, axis, *([None] * (x.ndim - 2)))


def _online_softmax(scores: Array, axis: str) -> Array:
    """Softmax over the (sharded) last axis via global-max/global-sum
    combine — the blockwise decomposition used by flash/ring attention."""
    m_local = jnp.max(scores, axis=-1)
    m_global = jax.lax.pmax(m_local, axis)
    exp = jnp.exp(scores - m_global[..., None])
    denom = jax.lax.psum(jnp.sum(exp, axis=-1), axis)
    return exp / denom[..., None]


def attend_cp(
    config: Config,
    params: dict,
    cache: dict,
    encoder_outputs: Array,   # (B, S, E), frame axis sharded over ``axis``
    decoder_hidden: Array,    # (B, D) or (B, K, D), replicated
    encoder_mask: Optional[Array],  # (B, S) or None
    axis: str,
    mesh: Optional[Mesh] = None,
) -> Tuple[Array, Array]:
    """Frame-sharded cross-attention for one decode step.

    Numerically identical to :func:`models.attention.attend` /
    ``attend_beam`` (eval mode). Communication per step: one pmax + two
    psums of O(B[,K][,H]) scalars plus the (B[,K],E) context psum —
    negligible against ICI bandwidth. ``mesh=None`` uses the ambient mesh
    (``jax.sharding.set_mesh``), which is how the jitted generation loops
    reach it.
    """
    kind = config.model.attention_type
    beam = decoder_hidden.ndim == 3

    def _expand_mask(scores, mask_l):
        # mask (B, S_l) → broadcast over the query/head dims between B and S.
        idx = (slice(None),) + (None,) * (scores.ndim - 2) + (slice(None),)
        return jnp.where(mask_l[idx] > 0, scores, _MASK_FILL)

    def local_attend(cache_l, enc_l, dec_h, mask_l):
        if kind == "bahdanau":
            dec_proj = apply_linear(params["decoder_projection"], dec_h)
            enc_proj = cache_l["enc_proj"]
            if beam:
                combined = jnp.tanh(enc_proj[:, None] + dec_proj[:, :, None, :])
            else:
                combined = jnp.tanh(enc_proj + dec_proj[:, None, :])
            scores = apply_linear(params["attention_linear"], combined)[..., 0]
        elif kind == "luong":
            score = config.model.luong_score
            if score == "dot":
                scores = jnp.einsum("b...d,bsd->b...s", dec_h, enc_l)
            elif score == "general":
                proj = apply_linear(params["linear_in"], dec_h)
                scores = jnp.einsum("b...e,bse->b...s", proj, enc_l)
            else:  # concat
                dec_proj = apply_linear(params["linear_query"], dec_h)
                enc_proj = cache_l["enc_proj"]
                if beam:
                    combined = jnp.tanh(dec_proj[:, :, None, :] + enc_proj[:, None])
                else:
                    combined = jnp.tanh(dec_proj[:, None, :] + enc_proj)
                scores = apply_linear(params["linear_v"], combined)[..., 0]
        else:  # multihead
            k, v = cache_l["k"], cache_l["v"]  # (B, S_l, H, hd)
            H, hd = k.shape[2], k.shape[3]
            q = apply_linear(params["query_linear"], dec_h)
            q = q.reshape(q.shape[:-1] + (H, hd))
            # fp32 scale WITHOUT a cast back: the non-CP path
            # (models/attention.py _multihead) promotes scores to fp32
            # here, and token parity at bf16 requires matching that.
            scores = jnp.einsum("b...hd,bshd->b...hs", q, k) / jnp.sqrt(
                jnp.float32(hd)
            )
            scores = _expand_mask(scores, mask_l)
            w = _online_softmax(scores, axis)  # (B, [K,] H, S_l)
            ctx = jnp.einsum("b...hs,bshd->b...hd", w, v)
            ctx = jax.lax.psum(ctx.reshape(ctx.shape[:-2] + (H * hd,)), axis)
            return ctx, w.mean(axis=-2)  # head-avg weights, S-sharded

        scores = _expand_mask(scores, mask_l)
        w = _online_softmax(scores, axis)  # (B, [K,] S_l)
        ctx = jax.lax.psum(jnp.einsum("b...s,bse->b...e", w, enc_l), axis)
        return ctx, w

    if encoder_mask is None:
        encoder_mask = jnp.ones(encoder_outputs.shape[:2], encoder_outputs.dtype)

    cache_specs = {k: _frame_spec(v, axis) for k, v in cache.items()}
    weights_spec = P(None, None, axis) if beam else P(None, axis)
    kwargs = {"mesh": mesh} if mesh is not None else {}
    sharded = jax.shard_map(
        local_attend,
        in_specs=(
            cache_specs,
            _frame_spec(encoder_outputs, axis),
            P(),
            P(None, axis),
        ),
        out_specs=(P(), weights_spec),
        **kwargs,
    )
    context, weights = sharded(cache, encoder_outputs, decoder_hidden, encoder_mask)
    if kind == "multihead":
        context = apply_linear(params["output_linear"], context)
    return context, weights
