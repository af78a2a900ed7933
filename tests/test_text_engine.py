"""TextEngine two-pass MCQ answer forcing (vllm_infer.py:130-169 parity),
tested against a stubbed token engine so the flow is deterministic."""

import numpy as np

from test_model_parity import CFG
from tiny_tokenizer import TinyTokenizer
from time_r1_tpu.models.processor import Qwen25VLProcessor
from time_r1_tpu.sampler.engine import Request
from time_r1_tpu.sampler.text_engine import TextEngine


class StubEngine:
    """Returns canned completions; records the prompts of the second pass."""

    def __init__(self, cfg, outputs):
        self.cfg = cfg
        self.outputs = list(outputs)
        self.calls = []

    def generate(self, requests, sp):
        self.calls.append([list(r.input_ids) for r in requests])
        out = self.outputs[: len(requests)]
        self.outputs = self.outputs[len(requests) :]
        return out


def _tok(processor, s):
    return processor.tokenizer.encode(s, add_special_tokens=False)


def test_two_pass_answer_forcing():
    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
    )
    first = _tok(processor, "thinking... <answer>maybe (B)")  # has <answer>
    second_none = _tok(processor, "no answer tag here")  # no <answer> → skipped
    continuation = _tok(processor, "A)")

    eng = StubEngine(CFG, [first, second_none, continuation])
    te = TextEngine(eng, processor)
    reqs = [Request(input_ids=_tok(processor, "q1")), Request(input_ids=_tok(processor, "q2"))]
    preds = te.generate(reqs, max_new_tokens=8, answer_prompt="Best Option: (")

    # row 0: truncated at last <answer>, forced prompt appended, continuation merged
    assert preds[0] == "thinking... <answer>\nBest Option: (A)"
    # row 1: untouched (no <answer> in the first pass)
    assert preds[1] == "no answer tag here"
    # the second pass prompt = original ids + re-encoded truncation + forcing text
    assert len(eng.calls) == 2
    second_prompt = eng.calls[1][0]
    expected = _tok(processor, "q1") + _tok(processor, "thinking... " + "<answer>\nBest Option: (")
    assert second_prompt == expected


def test_extract_timestamps_last_two_numbers():
    assert TextEngine.extract_timestamps("from 3.5 to 7 and then 9.25") == (7.0, 9.25)
    assert TextEngine.extract_timestamps("only 4.2") == (None, None)
