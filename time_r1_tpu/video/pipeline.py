"""Video ingestion pipeline: timestamped decode → budgeted resize → TCHW float.

Capability parity with the reference's fetch_video_v3 / monkey-patched decord
reader (vision_process.py:426-492 + src/vllm_inference/utils.py:13-57, the
variant both vLLM eval and demo use — SURVEY §7 Phase 1):

  1. plan_frame_window: timestamp→frame clamping + smart_nframes + linspace
     sampling (pure math, golden-tested in utils/vision_math.py);
  2. native FFmpeg batch decode (video/decoder.py, N5);
  3. per-frame pixel budget (total_pixels/nframes·FRAME_FACTOR) + smart_resize;
  4. bicubic antialiased resize → float32 TCHW (torchvision-equivalent; PIL
     kernel, which torchvision's antialias=True was built to match).

Returns (frames (T, C, H, W) float32 in 0..255, sample_fps) — exactly the
shape/scale the processor's patchify expects.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..utils.vision_math import (
    IMAGE_FACTOR,
    VIDEO_MIN_PIXELS,
    plan_frame_window,
    plan_video_shapes,
)
from .decoder import VideoReader


def resize_frames_bicubic(frames_hwc: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(T, H, W, C) uint8 → (T, out_h, out_w, C) uint8, bicubic+antialias.

    DEFAULT backend computes the separable antialiased bicubic in float32
    with ONE final rounding — exactly torchvision's antialias=True semantics,
    the resize the reference runs (vision_process.py:398-403) — as two host
    matmuls with the precomputed tap-weight matrices (video/resize.py).
    Alternatives:
      TIMER1_DEVICE_RESIZE=1     same math on the accelerator (MXU matmuls;
                                 fastest when video shapes repeat)
      TIMER1_RESIZE_BACKEND=pil  PIL (rounds to uint8 BETWEEN the separable
                                 passes — up to 16/255 deviation on steep
                                 edges vs the reference numerics; kept for
                                 comparison only)."""
    import os

    if frames_hwc.shape[1] == out_h and frames_hwc.shape[2] == out_w:
        return frames_hwc
    if os.environ.get("TIMER1_DEVICE_RESIZE") == "1":
        from .resize import resize_frames_device

        return resize_frames_device(frames_hwc, out_h, out_w)
    if os.environ.get("TIMER1_RESIZE_BACKEND") == "pil":
        from PIL import Image

        out = np.empty(
            (frames_hwc.shape[0], out_h, out_w, frames_hwc.shape[3]), np.uint8
        )
        for i, f in enumerate(frames_hwc):
            out[i] = np.asarray(Image.fromarray(f).resize((out_w, out_h), Image.BICUBIC))
        return out
    from .resize import resize_frames_host

    return resize_frames_host(frames_hwc, out_h, out_w)


def fetch_video(ele: dict) -> Tuple[np.ndarray, float]:
    """Decode + budget-resize one video element.

    `ele` keys (fetch_video_v3 parity): video (path), video_start, video_end,
    nframes | fps (+min/max_frames), total_pixels, min_pixels, max_pixels,
    resized_height/width.
    """
    vr = VideoReader(ele["video"])
    try:
        plan = plan_frame_window(ele, total_frames=len(vr), video_fps=vr.get_avg_fps())
        try:
            frames = vr.get_batch(list(plan.indices))  # (T, H, W, C) uint8
        except IOError as e:
            # per-video backend fallback (vision_process.py:362-368 parity):
            # re-open and decode in the tolerant mode that skips corrupt
            # frames and backfills, instead of dropping the item
            print(f"video decode failed ({e}), retrying with tolerant backend: {ele['video']}")
            vr.close()
            vr = VideoReader(ele["video"])
            frames = vr.get_batch(list(plan.indices), tolerant=True)
    finally:
        vr.close()

    nframes, height, width = frames.shape[0], frames.shape[1], frames.shape[2]
    if "resized_height" in ele and "resized_width" in ele:
        from ..utils.vision_math import smart_resize

        out_h, out_w = smart_resize(ele["resized_height"], ele["resized_width"], factor=IMAGE_FACTOR)
    else:
        out_h, out_w = plan_video_shapes(
            height,
            width,
            nframes=nframes,
            total_pixels=ele.get("total_pixels"),
            min_pixels=ele.get("min_pixels", VIDEO_MIN_PIXELS),
            max_pixels=ele.get("max_pixels"),
        )
    frames = resize_frames_bicubic(frames, out_h, out_w)
    # TCHW float32 (0..255) like torchvision resize(...).float()
    return frames.transpose(0, 3, 1, 2).astype(np.float32), plan.sample_fps


def video_loader(ele: dict) -> Tuple[np.ndarray, float]:
    """Trainer/eval-facing entry (GRPOTrainer video_loader signature)."""
    return fetch_video(ele)
