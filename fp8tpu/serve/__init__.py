"""FP8 serving: fp8-weight decoder, fp8 KV cache, continuous batching."""

from .engine import Request, ServingEngine  # noqa: F401
from .kv_cache import KVCache, PagedKVCache, quantize_kv  # noqa: F401
from .model import (  # noqa: F401
    ServeConfig,
    convert_decoder_params,
    decode_step,
    fp8_linear,
    prefill,
)
