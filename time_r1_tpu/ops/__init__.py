from .attention import NEG_INF, mha_cached, mha_cached_q8, mha_reference
from .flash_attention import flash_attention
from .paged_attention import combine_with_new_token, paged_prefix_attention
from .quant import quantize_kv_cache, quantize_params, quantize_params_jit

__all__ = [
    "NEG_INF",
    "mha_reference",
    "mha_cached",
    "mha_cached_q8",
    "flash_attention",
    "paged_prefix_attention",
    "combine_with_new_token",
    "quantize_params",
    "quantize_params_jit",
    "quantize_kv_cache",
]
