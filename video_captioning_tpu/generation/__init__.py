from typing import Dict, Optional

import jax

from ..config import Config
from ..models import captioner
from .beam import beam_search_generate  # noqa: F401
from .greedy import greedy_generate  # noqa: F401
from .sampling import sample_generate  # noqa: F401

Array = jax.Array


def generate(
    params: dict,
    config: Config,
    video_features: Array,
    start_token_id: int,
    end_token_id: int,
    max_length: int = 20,
    video_mask: Optional[Array] = None,
    method: str = "greedy",
    **kwargs,
) -> Dict[str, Array]:
    """End-to-end generation: encode then decode (parity: reference
    video_captioning_model.py:79-125)."""
    enc_outs, final, mask = captioner.encode(params, config, video_features, video_mask)
    if method == "greedy":
        return greedy_generate(
            params, config, enc_outs, final, start_token_id, end_token_id,
            max_length, mask, **kwargs,
        )
    if method == "beam":
        return beam_search_generate(
            params, config, enc_outs, final, start_token_id, end_token_id,
            max_length, mask, **kwargs,
        )
    if method == "sample":
        return sample_generate(
            params, config, enc_outs, final, start_token_id, end_token_id,
            max_length, mask, **kwargs,
        )
    raise ValueError(f"Unsupported generation method: {method}")
