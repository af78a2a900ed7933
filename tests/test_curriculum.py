"""Tests for TimeRFT curriculum filtering, cross-checked against the reference
process_data module (importable: numpy/torch only) and the in-repo golden
annotation file train_2k5.json which already carries difficulty fields."""

import json
import sys

import numpy as np
import pytest

from conftest import load_reference_module
from time_r1_tpu.utils import curriculum as C

TRAIN_2K5 = "/root/reference/dataset/timer1/annotations/train_2k5.json"


@pytest.fixture(scope="module")
def ref_pd():
    return load_reference_module("src/utils/process_data.py")


def test_get_difficulty_safe(ref_pd):
    cases = [
        {"difficulty": 42.0},
        {"difficulty": "13.5"},
        {"difficulty": None},
        {},
        {"difficulty": float("nan")},
        {"difficulty": float("inf")},
        {"difficulty": "abc"},
    ]
    for c in cases:
        assert C.get_difficulty_safe(c) == ref_pd.get_difficulty_safe(c)


def _wrap(difficulties):
    return [
        {"difficulty_float": d, "p_value": d / 100.0, "data": {"difficulty": d, "qid": i}}
        for i, d in enumerate(difficulties)
    ]


def test_difficulty_sorted_sample_matches_reference_indices():
    # reference picks round(linspace(0, n-1, k)) on the desc-sorted list then
    # torch.unique (ascending) — verify our index math against torch directly.
    import torch

    for n, k in [(100, 10), (7, 3), (5, 10), (2500, 2500), (977, 250)]:
        diffs = [float((i * 37) % 101) for i in range(n)]
        items = _wrap(diffs)
        got = C.difficulty_sorted_sample(items, k)
        sorted_list = sorted(items, key=lambda x: x["difficulty_float"], reverse=True)
        actual_k = min(n, k)
        if actual_k >= n:
            want = sorted_list
        else:
            idx = torch.linspace(0, n - 1, steps=actual_k).round().long()
            idx = torch.clamp(idx, 0, n - 1)
            want = [sorted_list[i] for i in torch.unique(idx)]
        assert [g["data"]["qid"] for g in got] == [w["data"]["qid"] for w in want]


def test_filter_0070_all_on_golden_annotations():
    with open(TRAIN_2K5) as f:
        data = json.load(f)
    out = C.filter_and_sample(data, "0070_all", k=500)
    assert 0 < len(out) <= 500
    for item in out:
        d = float(item["difficulty"])
        assert 0 < d / 100.0 <= 0.7


def test_gaussian_sample_prefers_center():
    diffs = list(np.linspace(1.0, 99.0, 1000))
    items = _wrap(diffs)
    rng = np.random.default_rng(0)
    out = C.gaussian_sample(items, 200, rng=rng)
    picked = np.array([o["difficulty_float"] for o in out]) / 100.0
    # mass should concentrate near 0.3
    assert abs(float(np.mean(picked)) - 0.3) < 0.1
    assert len(out) == 200
    assert len({id(o) for o in out}) == 200  # without replacement


def test_filter_gaussian_03_excludes_zero():
    items = [{"difficulty": 0.0, "qid": 0}] * 50 + [{"difficulty": 30.0, "qid": 1}] * 50
    out = C.filter_and_sample(items, "gaussian_03", k=10)
    assert all(float(o["difficulty"]) > 0 for o in out)


def test_random_sample_deterministic_with_seed():
    items = _wrap([float(i) for i in range(100)])
    a = C.random_sample(items, 10, seed=42)
    b = C.random_sample(items, 10, seed=42)
    assert [x["data"]["qid"] for x in a] == [x["data"]["qid"] for x in b]
