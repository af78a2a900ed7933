"""Eval input-path throughput: serial vs parallel decode workers vs LRU cache.

Measures the host side of `cli/evaluate.py` — annotation row → decoded/resized
frames → tokenized engine Request — on the in-repo real video, in a
Charades-style layout (several consecutive sentences per video, the reason the
reference keeps a cross-worker video cache, data/__init__.py:99-139).

Configs:
  before : num_workers=0, cache off  (the round-3 input path)
  cache  : num_workers=0, cache on   (LRU only)
  after  : num_workers=8, cache on   (round-4 default: threaded decode +
           in-flight dedup + LRU)

Usage: python scripts/profile_eval_input.py [--rows 24] [--videos 8]
       [--sentences_per_video 3] [--total_pixels N]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF_VIDEO = "/root/reference/assets/OHOFG.mp4"


def build_fixture(tmp, n_videos, n_rows, sentences_per_video):
    """n_rows annotation rows over n_videos distinct files (copies of the
    reference video so each has its own decode), grouped Charades-style:
    consecutive rows share a video."""
    vids = []
    for i in range(n_videos):
        dst = os.path.join(tmp, f"vid{i}.mp4")
        shutil.copy(REF_VIDEO, dst)
        vids.append(dst)
    ann = []
    vi = 0
    for r in range(n_rows):
        ann.append(
            {
                "video": vids[vi],
                "duration": 35.04,
                "timestamp": [1.0, 7.5],
                "sentence": f"person sitting down in a chair variant {r}.",
                "qid": f"q{r}",
            }
        )
        if (r + 1) % sentences_per_video == 0:
            vi = (vi + 1) % n_videos
    split = os.path.join(tmp, "ann.json")
    with open(split, "w") as f:
        json.dump(ann, f)
    return split


def run_config(processor, split, total_pixels, num_workers, cache_size):
    from time_r1_tpu.data import EvalDataset

    ds = EvalDataset(
        processor,
        datatype="tg",
        dataset_names=["tvgbench_filter"],
        split=split,
        min_pixels=16 * 28 * 28,
        total_pixels=total_pixels,
        use_r1_thinking_prompt=True,
        num_workers=num_workers,
        cache_size=cache_size,
    )
    t0 = time.perf_counter()
    n = 0
    for item in ds:
        assert "request" in item, item
        n += 1
    dt = time.perf_counter() - t0
    return n, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=24)
    ap.add_argument("--videos", type=int, default=8)
    ap.add_argument("--sentences_per_video", type=int, default=3)
    ap.add_argument("--total_pixels", type=int, default=3584 * 28 * 28)
    ap.add_argument("--num_workers", type=int, default=8)
    args = ap.parse_args()

    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from tiny_tokenizer import TinyTokenizer

    processor = Qwen25VLProcessor(TinyTokenizer())

    tmp = tempfile.mkdtemp(prefix="eval_input_")
    try:
        split = build_fixture(tmp, args.videos, args.rows, args.sentences_per_video)
        configs = [
            ("before (serial, cache off)", 0, 0),
            ("cache only (serial, LRU 8)", 0, 8),
            (f"after ({args.num_workers} workers, LRU 8)", args.num_workers, 8),
        ]
        results = []
        for label, workers, cache in configs:
            n, dt = run_config(processor, split, args.total_pixels, workers, cache)
            ips = n / dt
            results.append((label, n, dt, ips))
            print(f"[eval-input] {label}: {n} items in {dt:.2f} s = {ips:.2f} items/s")
        base = results[0][3]
        for label, _, _, ips in results[1:]:
            print(f"[eval-input] {label} speedup vs before: {ips / base:.2f}x")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
