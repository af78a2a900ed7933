from .engine import Engine, Request, prefill_and_decode, sample_tokens
from .params import SamplingParams

__all__ = ["Engine", "Request", "SamplingParams", "prefill_and_decode", "sample_tokens"]
