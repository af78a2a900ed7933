"""Golden tests for eval scoring + answer extraction, cross-checked against
the reference eval_all.compute_IoU (importable: numpy/requests only)."""

import math
import sys

import numpy as np
import pytest

from time_r1_tpu.utils import metrics as M
from time_r1_tpu.utils import parsing as P


@pytest.fixture(scope="module")
def ref_iou():
    # calc_difficulty.py carries the same compute_IoU as eval_all.py but with a
    # lighter import footprint; stub its `data.data_loader` dependency.
    import types

    if "data" not in sys.modules:
        pkg = types.ModuleType("data")
        dl = types.ModuleType("data.data_loader")
        dl.load_tvgbench_filter = lambda *a, **k: []
        pkg.data_loader = dl
        sys.modules["data"] = pkg
        sys.modules["data.data_loader"] = dl
    from conftest import load_reference_module

    return load_reference_module("src/vllm_inference/calc_difficulty.py").compute_IoU


IOU_CASES = [
    ([1.0, 3.0], [2.0, 4.0]),
    ([0.0, 1.0], [5.0, 6.0]),
    ([2.0, 4.0], [2.0, 4.0]),
    ([[1.0, 3.0], [0.0, 10.0]], [2.0, 4.0]),
    ([1.0, 3.0], [[2.0, 4.0], [0.0, 1.5]]),
    ([[1.0, 3.0]], [[2.0, 4.0], [0.5, 2.5]]),
    ([3.0, 1.0], [2.0, 4.0]),  # inverted pred
]


@pytest.mark.parametrize("pred,gt", IOU_CASES)
def test_compute_iou_matches_reference(ref_iou, pred, gt):
    got = M.compute_IoU([list(p) if isinstance(p, list) else p for p in pred], gt)
    want = ref_iou(pred, gt)
    assert np.allclose(np.asarray(got, dtype=float), np.asarray(want, dtype=float))


def test_hull_union_not_standard_union():
    # pred [0,1], gt [2,3]: standard union would be 2; hull union = 3-0 = 3
    assert math.isclose(float(M.compute_IoU([0.0, 1.0], [2.0, 3.0])), 0.0)
    # pred [0,2], gt [1,3]: hull union 3, inter 1
    assert math.isclose(float(M.compute_IoU([0.0, 2.0], [1.0, 3.0])), 1.0 / 3.0)


def test_calc_score_strict_threshold():
    scores = M.calc_score({"a": 0.3, "b": 0.5, "c": 0.71, "d": 0.0}, "charades")
    # R1@τ uses strict > (eval_all.py:126): 0.3 does NOT count at τ=0.3
    assert scores[0.3] == 50.0  # only 0.5 and 0.71
    assert scores[0.5] == 25.0  # only 0.71
    assert scores[0.7] == 25.0
    assert math.isclose(scores["mIoU"], (0.3 + 0.5 + 0.71 + 0.0) / 4 * 100)


def test_calc_score_mcq():
    s = M.calc_score({"a": 1, "b": 0, "c": 1}, "mvbench")
    assert s == {"correct": 2, "total": 3, "avg": round(2 / 3 * 100, 2)}


def test_extract_answer_tg_prefers_anywhere_match():
    # last "X to Y" anywhere wins, even outside <answer> (evaluate.py:126-141)
    assert P.extract_answer("think 1.0 to 2.0 <answer>3.0 to 4.0</answer>", "tg") == [3.0, 4.0]
    assert P.extract_answer("only in text 5.5 and 9.25", "tg") == [5.5, 9.25]
    assert P.extract_answer("no numbers", "tg") == [None, None]


def test_extract_answer_tg_answer_block_fallback():
    # the anywhere-regex has no IGNORECASE; "TO" only parses via... nothing →
    # falls to the <answer> search which is also case-sensitive → None
    assert P.extract_answer("<answer>1.0 TO 2.0</answer>", "tg") == [None, None]


def test_extract_answer_mcq():
    assert P.extract_answer("The answer is (C).", "mcq") == 2
    assert P.extract_answer("(A) no wait (D)", "mcq") == 3
    assert P.extract_answer("no letter", "mcq") is None


def test_extract_answer_force():
    assert P.extract_answer_force("I think 3.5 then 7 and more 9") == [3.5, 7.0]
    assert P.extract_answer_force("only 4.2 here") == [None, None]
    assert P.extract_answer_force("") == [None, None]


def test_mcq_is_correct():
    assert P.mcq_is_correct("blah (B)", 1) == 1
    assert P.mcq_is_correct("blah (A) then (B)", 1) == 1  # last match
    assert P.mcq_is_correct("B is right", 1) == 1  # first-char fallback
    assert P.mcq_is_correct("A", 1) == 0


def test_calc_difficulty():
    assert M.calc_difficulty([None, None], [1.0, 2.0]) == 0.0
    assert math.isclose(M.calc_difficulty([0.0, 2.0], [1.0, 3.0]), 100.0 / 3.0)


def test_score_records():
    tg = M.score_tg_records(
        [
            {"qid": "q1", "pred": [0.0, 2.0], "target": [1.0, 3.0]},
            {"qid": "q2", "pred": [None, None], "target": [1.0, 3.0]},
        ]
    )
    assert math.isclose(tg["q1"], 1.0 / 3.0) and tg["q2"] == 0.0
    mcq = M.score_mcq_records(
        [
            {"qid": "q1", "pred": 2, "target": 2},
            {"qid": "q2", "pred": None, "target": 0, "output_text": "(A)"},
        ]
    )
    assert mcq == {"q1": 1.0, "q2": 1.0}
