from .config import Qwen25VLConfig, TextConfig, VisionConfig
from .language import KVCache, decoder_forward, lm_logits, mrope_cos_sin
from .model import VisionInputs, forward, init_params, merge_vision_embeddings
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
    "init_params",
    "merge_vision_embeddings",
    "get_rope_index",
    "VisionPrep",
    "prepare_vision_inputs",
    "vision_forward",
]
