"""Offline video preprocessor (C8 parity: src/utils/preprocess_dataset.py).

Decodes + budget-resizes each video once and stores reusable arrays
(`video.npz` with frames TCHW float32 + fps) per video id, idempotently
(skip-if-exists, preprocess_dataset.py:75). Parallel over videos with a
process pool (mp.Pool parity; this host decode is the reference's known
bottleneck — SURVEY §7 hard-part 6).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os

import numpy as np


def preprocess_single_video(task_args):
    video_path, total_pixels, min_pixels, out_dir = task_args
    try:
        if os.path.exists(out_dir):
            return {"preprocessed_path": out_dir, "status": "success"}
        from ..video.pipeline import fetch_video

        frames, fps = fetch_video(
            {"video": video_path, "total_pixels": total_pixels, "min_pixels": min_pixels}
        )
        os.makedirs(out_dir, exist_ok=True)
        np.savez_compressed(os.path.join(out_dir, "video.npz"), video=frames.astype(np.float32), fps=fps)
        with open(os.path.join(out_dir, "video_kwargs.json"), "w") as f:
            json.dump({"fps": [fps]}, f)
        return {"preprocessed_path": out_dir, "status": "success"}
    except Exception as e:  # failure-tolerant (preprocess_dataset.py:94-98)
        print(f"Warning: Preprocessing failed for video {video_path}: {e}")
        return {"video_path": video_path, "status": "failed", "error": str(e)}


def process_split(file_path, video_folder, output_dir, total_pixels, min_pixels, num_workers=8):
    with open(file_path) as f:
        data = json.load(f)
    tasks = []
    items = data.items() if isinstance(data, dict) else ((d["video"], d) for d in data)
    for video_id, _ in items:
        video_path = None
        if os.path.isfile(str(video_id)):
            video_path = str(video_id)
            video_id = os.path.splitext(os.path.basename(video_path))[0]
        else:
            for ext in ("mp4", "mkv", "webm"):
                cand = os.path.join(video_folder, f"{video_id}.{ext}")
                if os.path.isfile(cand):
                    video_path = cand
                    break
        if video_path is None:
            print(f"Warning: Video file not found for ID: {video_id}")
            continue
        tasks.append((video_path, total_pixels, min_pixels, os.path.join(output_dir, video_id)))

    ok, failed = [], 0
    if num_workers <= 1:
        results = map(preprocess_single_video, tasks)
    else:
        pool = mp.Pool(processes=num_workers)
        results = pool.imap_unordered(preprocess_single_video, tasks)
    for r in results:
        if r["status"] == "success":
            ok.append(r)
        else:
            failed += 1
    if num_workers > 1:
        pool.close()
        pool.join()
    print(f"Preprocessing finished. Failed: {failed}, Successful: {len(ok)}")
    return ok


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="charades")
    p.add_argument("--train_data_path", type=str, required=True)
    p.add_argument("--video_folder", type=str, required=True)
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--max_pix_size", type=int, default=3584)
    p.add_argument("--min_pix_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=16)
    args = p.parse_args(argv)
    out = args.output_dir or f"./{args.dataset}_preprocessed_data_maxpix_{args.max_pix_size}"
    os.makedirs(out, exist_ok=True)
    process_split(
        args.train_data_path,
        args.video_folder,
        out,
        args.max_pix_size * 28 * 28,
        args.min_pix_size * 28 * 28,
        args.num_workers,
    )
    print("Preprocessing complete. Datasets saved to:", out)


if __name__ == "__main__":
    main()
