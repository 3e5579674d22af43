from . import attention, captioner, decoder, encoder, layers  # noqa: F401
from .captioner import apply_model, count_params, encode, init_model  # noqa: F401
