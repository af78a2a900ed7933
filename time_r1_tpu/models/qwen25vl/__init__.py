from .config import Qwen25VLConfig, TextConfig, VisionConfig
from .language import (
    KVCache,
    decoder_forward,
    lm_logits,
    mrope_cos_sin,
    shared_decode_forward,
    suffix_cache_zeros,
)
from .model import (
    VisionInputs,
    forward,
    forward_shared_decode,
    init_params,
    merge_vision_embeddings,
)
from .rope import get_rope_index
from .vision import VisionPrep, prepare_vision_inputs, vision_forward

__all__ = [
    "Qwen25VLConfig",
    "TextConfig",
    "VisionConfig",
    "KVCache",
    "decoder_forward",
    "lm_logits",
    "mrope_cos_sin",
    "VisionInputs",
    "forward",
    "forward_shared_decode",
    "shared_decode_forward",
    "suffix_cache_zeros",
    "init_params",
    "merge_vision_embeddings",
    "get_rope_index",
    "VisionPrep",
    "prepare_vision_inputs",
    "vision_forward",
]
