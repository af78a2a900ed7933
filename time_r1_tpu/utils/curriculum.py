"""TimeRFT difficulty-driven data filtering / re-sampling (curriculum).

Semantics-parity notes:
  reference /root/reference/src/utils/process_data.py
    - get_difficulty_safe       :11-24
    - random_sample             :45-58
    - difficulty_sorted_sample  :61-80 (sort desc, linspace-round-unique pick)
    - gaussian_sample           :83-107 (probs ∝ exp(-(d-0.3)²/(2·0.2²)))
    - task dispatch             :110-149 ("0070_all" keeps 0<p≤0.7; "gaussian_03")
"""

from __future__ import annotations

import json
import math
import os
import random
from typing import List, Optional

import numpy as np


def get_difficulty_safe(item: dict) -> Optional[float]:
    """Float difficulty or None (missing / NaN / inf / non-numeric)."""
    difficulty = item.get("difficulty")
    if difficulty is None:
        return None
    try:
        d = float(difficulty)
        return d if not (math.isnan(d) or math.isinf(d)) else None
    except (ValueError, TypeError):
        return None


def _unwrap(items: List[dict]) -> List[dict]:
    return [it["data"] if isinstance(it, dict) and "data" in it else it for it in items]


def difficulty_sorted_sample(items: List[dict], k: int) -> List[dict]:
    """Sort by difficulty_float descending; pick k stratified indices via
    round(linspace(0, n-1, k)) with de-dup (process_data.py:61-80).

    Note the reference uses torch.unique, which SORTS ascending — preserved
    here via np.unique."""
    if not items or k <= 0:
        return []
    n = len(items)
    actual_k = min(n, k)
    sorted_list = sorted(items, key=lambda x: x["difficulty_float"], reverse=True)
    if actual_k >= n:
        return sorted_list
    indices = np.rint(np.linspace(0, n - 1, actual_k, dtype=np.float32)).astype(np.int64)
    indices = np.clip(indices, 0, n - 1)
    unique_indices = np.unique(indices)
    return [sorted_list[int(i)] for i in unique_indices]


def gaussian_sample(
    items: List[dict], k: int, center: float = 0.3, std_dev: float = 0.2,
    rng: np.random.Generator | None = None,
) -> List[dict]:
    """Sample k items without replacement with probability ∝ a Gaussian of the
    difficulty (in [0,1]) around `center` (process_data.py:83-107)."""
    if not items or k <= 0:
        return []
    n = len(items)
    difficulties = np.array([it["difficulty_float"] / 100.0 for it in items])
    probs = np.exp(-((difficulties - center) ** 2) / (2 * std_dev**2))
    probs /= probs.sum()
    if rng is None:
        chosen = np.random.choice(n, min(n, k), False, p=probs)
    else:
        chosen = rng.choice(n, min(n, k), False, p=probs)
    return [items[int(i)] for i in chosen]


def random_sample(items: List[dict], k: int, seed: int | None = None) -> List[dict]:
    """Uniform random k-subset (process_data.py:45-58)."""
    n = len(items)
    k = min(n, k)
    if k >= n:
        return list(items)
    r = random.Random(seed) if seed is not None else random
    return r.sample(items, k)


def filter_and_sample(data: List[dict], task: str, k: int = 2500) -> List[dict]:
    """Full task dispatch of process_data.process_ddata (:110-149).

    - "0070_all":   keep 0 < p ≤ 0.7, difficulty-sorted stratified sample of k
    - "gaussian_03": keep p > 0, gaussian sample centered at 0.3 (std 0.2)
    - "random_sample": uniform k-subset of valid items
    Returns the raw annotation dicts (unwrapped).
    """
    valid = []
    for item in data:
        d = get_difficulty_safe(item)
        if isinstance(item, dict) and d is not None:
            valid.append({"difficulty_float": d, "p_value": d / 100.0, "data": item})
    if not valid:
        return []

    if task == "0070_all":
        subset = [it for it in valid if 0 < it["p_value"] <= 0.7]
        return _unwrap(difficulty_sorted_sample(subset, k))
    if task == "gaussian_03":
        subset = [it for it in valid if it["p_value"] > 0]
        return _unwrap(gaussian_sample(subset, k, center=0.3, std_dev=0.2))
    if task == "random_sample":
        return _unwrap(random_sample(valid, k))
    raise ValueError(f"unknown curriculum task {task!r}")


def process_data_file(input_json: str, output_prefix: str, task: str, k: int = 2500) -> str:
    """File-level CLI behavior of process_data.py: read annotations, filter,
    write `{prefix}_{suffix}.json`, return the output path."""
    with open(input_json, "r", encoding="utf-8") as f:
        data = json.load(f)
    sampled = filter_and_sample(data, task, k)
    suffix = {"0070_all": "_0070_all", "gaussian_03": "_gaussian_03", "random_sample": "_random"}[task]
    out_path = f"{output_prefix}{suffix}.json"
    out_dir = os.path.dirname(out_path)
    if out_dir and not os.path.exists(out_dir):
        os.makedirs(out_dir)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(sampled, f, indent=4, ensure_ascii=False)
    return out_path
