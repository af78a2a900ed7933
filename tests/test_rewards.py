"""Golden tests for reward/metric functions (reference semantics from
main.py:122-428; the reference module itself imports deepspeed/trl which are
not installed, so these are hand-derived golden cases)."""

import math

from time_r1_tpu.utils import rewards as R


def test_parse_timestamp_output_last_answer_last_match():
    s = "<answer>1.0 to 2.0</answer> text <answer>ignore 3.5 to 7.25 then 8.0 and 9.5</answer>"
    # last <answer> block, last match inside it
    assert R.parse_timestamp_output(s) == (8.0, 9.5)


def test_parse_timestamp_output_none_cases():
    assert R.parse_timestamp_output("no tags 1.0 to 2.0") is None  # numbers outside <answer>
    assert R.parse_timestamp_output("<answer>no numbers here</answer>") is None
    assert R.parse_timestamp_output("<answer>1.0 until 2.0</answer>") is None  # wrong connector


def test_parse_timestamp_requires_single_space():
    # the regex demands exactly "X to Y" with single spaces (main.py:134-136)
    assert R.parse_timestamp_output("<answer>1.0  to  2.0</answer>") is None
    assert R.parse_timestamp_output("<answer>1.0 TO 2.0</answer>") == (1.0, 2.0)  # IGNORECASE


def test_iou_reward_hull_union():
    # pred [0,2], gt [1,3]: inter=1, hull union=3 → 1/3
    r = R.iou_timestamp_reward(["<answer>0 to 2</answer>"], [(1.0, 3.0)])
    assert math.isclose(r[0], 1.0 / 3.0)
    # disjoint windows: inter 0 → 0; hull union positive
    r = R.iou_timestamp_reward(["<answer>0 to 1</answer>"], [(5.0, 6.0)])
    assert r[0] == 0.0
    # unparsable → 0.0
    assert R.iou_timestamp_reward(["garbage"], [(1.0, 2.0)]) == [0.0]


def test_iou_v2_boundary_normalized():
    # perfect match → iou 1, deltas 0 → reward 1
    r = R.iou_timestamp_reward_v2(
        ["<think>x</think><answer>2.0 to 4.0</answer>"], [(2.0, 4.0)], durations=[10.0]
    )
    assert math.isclose(r[0], 1.0)
    # pred [1,4] gt [2,4] dur 10: inter=2, union=3, iou=2/3; |Δs|=0.1, |Δe|=0
    r = R.iou_timestamp_reward_v2(["<answer>1 to 4</answer>"], [(2.0, 4.0)], durations=[10.0])
    assert math.isclose(r[0], (2.0 / 3.0) * 0.9 * 1.0)


def test_format_reward_fullmatch():
    ok = "<think>reasoning</think>\n<answer>1.0 to 2.0</answer>"
    assert R.format_reward([ok]) == [1.0]
    assert R.format_reward([" " + ok + "  "]) == [1.0]  # stripped before fullmatch
    assert R.format_reward(["prefix " + ok]) == [0.0]
    assert R.format_reward([ok + " suffix"]) == [0.0]
    assert R.format_reward(["<answer>1 to 2</answer>"]) == [0.0]  # no think


def test_metric_funcs():
    c = "<think>I analyze step by step.\nI observe the scene.\n<timestep>1.0 to 2.0</timestep></think><answer>1.0 to 2.0</answer>"
    assert R.reward_timestep_pair([c]) == [0.2]  # 1 pair capped at 1 × 0.2
    assert R.reward_keyword_usage([c]) == [0.2]  # analyze+step+observe → capped 2 × 0.1
    assert R.reward_paragraph_structure([c]) == [0.1]  # 3 lines capped at 2 × 0.05
    think_len = len(R.extract_think_content(c))
    assert R.reward_think_length([c]) == [0.001 * min(think_len, 500)]
    # no think block → all zero
    assert R.reward_timestep_pair(["<answer>1 to 2</answer>"]) == [0.0]


def test_rouge_l_and_diversity():
    # identical completions → dissimilarity 0
    group = ["the cat sat"] * 4
    div = R.diversity_reward_func(group, num_generations=4)
    assert all(math.isclose(d, 0.0, abs_tol=1e-9) for d in div)
    # completely different → dissimilarity 1
    group = ["aaa bbb", "ccc ddd", "eee fff", "ggg hhh"]
    div = R.diversity_reward_func(group, num_generations=4)
    assert all(math.isclose(d, 1.0, abs_tol=1e-9) for d in div)
    # sanity: rouge-l f-measure of equal strings is 1
    assert math.isclose(R.rouge_l_fmeasure("a b c", "a b c"), 1.0)
    # LCS-based: "a b c" vs "a x c" → lcs 2, p=r=2/3 → f=2/3
    assert math.isclose(R.rouge_l_fmeasure("a b c", "a x c"), 2.0 / 3.0)


def test_mqa_answer_reward():
    out = R.mqa_answer_reward(
        ["<answer>(B)</answer>", "<answer>(A)</answer>", "whatever"],
        ["B", "B", "B"],
        task_type=["mqa", "mqa", "tg"],
    )
    assert out == [1.0, 0.0, None]
