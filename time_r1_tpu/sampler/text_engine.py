"""Text-level generation wrapper (vllmWrapper parity, C10).

Adds on top of the token-level Engine:
- decode to text with include-stop semantics (skip_special_tokens=False,
  vllm_infer.py:114-116);
- the two-pass MCQ answer-forcing flow: truncate each completion at its LAST
  "<answer>", append "<answer>\\n{answer_prompt}", regenerate 16 tokens
  (vllm_infer.py:130-169);
- `extract_timestamps` helper (last two numbers, vllm_infer.py:67-74).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence

from ..models.processor import Qwen25VLProcessor
from ..models.qwen25vl import Qwen25VLConfig
from .engine import Engine, Request
from .params import SamplingParams


class TextEngine:
    def __init__(self, engine: Engine, processor: Qwen25VLProcessor):
        self.engine = engine
        self.processor = processor
        self.cfg: Qwen25VLConfig = engine.cfg

    @staticmethod
    def find_answer_token_last_occurrence(text: str) -> int:
        return text.rfind("<answer>")

    @staticmethod
    def extract_timestamps(response: str):
        matches = re.findall(r"\d+(?:\.\d+)?", response)
        out = [float(n) for n in matches[-2:]]
        if len(out) == 2:
            return out[0], out[1]
        return None, None

    def generate(
        self,
        requests: Sequence[Request],
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = -1,
        repetition_penalty: float = 1.0,
        seed: Optional[int] = None,
        answer_prompt: Optional[str] = None,
    ) -> List[str]:
        sp = SamplingParams(
            temperature=temperature,
            top_p=top_p or 1.0,
            top_k=top_k or -1,
            max_new_tokens=max_new_tokens,
            stop_token_ids=self.cfg.stop_token_ids,
            include_stop_token=True,
            repetition_penalty=repetition_penalty or 1.0,
            seed=seed,
        )
        token_out = self.engine.generate(list(requests), sp)
        preds = [self.processor.decode(t, skip_special_tokens=False) for t in token_out]

        if answer_prompt is not None:
            indices = [self.find_answer_token_last_occurrence(t) for t in preds]
            cont_requests, cont_rows = [], []
            for i, req in enumerate(requests):
                if indices[i] == -1:
                    continue
                new_ids = self.processor.tokenizer.encode(
                    preds[i][: indices[i]] + "<answer>\n" + answer_prompt,
                    add_special_tokens=False,
                )
                cont_requests.append(
                    Request(
                        input_ids=list(req.input_ids) + list(new_ids),
                        patches=req.patches,
                        grid_thw=req.grid_thw,
                        second_per_grid_t=req.second_per_grid_t,
                    )
                )
                cont_rows.append(i)
            if cont_requests:
                sp2 = SamplingParams(
                    temperature=temperature,
                    top_p=top_p or 1.0,
                    top_k=top_k or -1,
                    max_new_tokens=16,
                    stop_token_ids=self.cfg.stop_token_ids,
                    include_stop_token=True,
                    seed=seed,
                )
                cont_out = self.engine.generate(cont_requests, sp2)
                for row, toks in zip(cont_rows, cont_out):
                    tail = self.processor.decode(toks, skip_special_tokens=False)
                    preds[row] = preds[row][: indices[row]] + "<answer>\n" + answer_prompt + tail
        return preds
