from .engine import Engine, Request, decode_loop, prefill_chunk, sample_tokens
from .params import SamplingParams
from .text_engine import TextEngine

__all__ = [
    "Engine",
    "Request",
    "SamplingParams",
    "TextEngine",
    "decode_loop",
    "prefill_chunk",
    "sample_tokens",
]
