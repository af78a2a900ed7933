"""Golden tests for the pure vision budgeting math, cross-checked against the
reference implementation imported directly from /root/reference (read-only)."""

import math
import sys

import pytest

from conftest import load_reference_module
from time_r1_tpu.utils import vision_math as vm


@pytest.fixture(scope="module")
def ref_vp():
    return load_reference_module("src/utils/vision_process.py")


FACTOR_CASES = [(0, 28), (1, 28), (14, 28), (27, 28), (28, 28), (41, 28), (42, 28), (43, 28), (55, 28), (56, 28), (700, 28), (3.5, 2), (5, 2)]


@pytest.mark.parametrize("number,factor", FACTOR_CASES)
def test_factor_helpers_match_reference(ref_vp, number, factor):
    assert vm.round_by_factor(number, factor) == ref_vp.round_by_factor(number, factor)
    assert vm.ceil_by_factor(number, factor) == ref_vp.ceil_by_factor(number, factor)
    assert vm.floor_by_factor(number, factor) == ref_vp.floor_by_factor(number, factor)


RESIZE_CASES = [
    (480, 640),
    (720, 1280),
    (1080, 1920),
    (360, 480),
    (100, 100),
    (28, 28),
    (3, 5),
    (2160, 3840),
    (239, 421),
    (359, 639),
]


@pytest.mark.parametrize("h,w", RESIZE_CASES)
def test_smart_resize_matches_reference(ref_vp, h, w):
    for min_p, max_p in [
        (vm.MIN_PIXELS, vm.MAX_PIXELS),
        (vm.VIDEO_MIN_PIXELS, vm.VIDEO_MAX_PIXELS),
        (16 * 28 * 28, 3584 * 28 * 28),
        (128 * 28 * 28, int(150000.5)),
    ]:
        assert vm.smart_resize(h, w, 28, min_p, max_p) == ref_vp.smart_resize(h, w, 28, min_p, max_p)


def test_smart_resize_rejects_extreme_ratio(ref_vp):
    with pytest.raises(ValueError):
        vm.smart_resize(1, 300)
    with pytest.raises(ValueError):
        ref_vp.smart_resize(1, 300)


NFRAME_CASES = [
    ({}, 100, 30.0),
    ({}, 100, 29.97),
    ({}, 7, 30.0),
    ({}, 5000, 30.0),
    ({}, 5000, 23.976),
    ({"fps": 1.0}, 847, 29.97),
    ({"nframes": 17}, 100, 30.0),
    ({"fps": 2.0, "max_frames": 32}, 1000, 25.0),
    ({"fps": 2.0, "min_frames": 8}, 100, 30.0),
    ({}, 4, 30.0),
    ({}, 2, 30.0),
]


@pytest.mark.parametrize("ele,total,fps", NFRAME_CASES)
def test_smart_nframes_matches_reference(ref_vp, ele, total, fps):
    assert vm.smart_nframes(dict(ele), total, fps) == ref_vp.smart_nframes(dict(ele), total, fps)


def test_smart_nframes_raises_below_factor(ref_vp):
    with pytest.raises(ValueError):
        vm.smart_nframes({}, 1, 30.0)


def test_per_frame_max_pixels_budget_math():
    # fetch_video budget (vision_process.py:374-377): more frames → lower
    # per-frame budget, floored at 1.05×min.
    total = 3584 * 28 * 28
    few = vm.per_frame_max_pixels(4, total, 16 * 28 * 28)
    many = vm.per_frame_max_pixels(512, total, 16 * 28 * 28)
    assert few == vm.VIDEO_MAX_PIXELS  # capped by per-frame max
    assert many == max(total / 512 * 2, int(16 * 28 * 28 * 1.05))
    assert many < few


def test_plan_frame_window_matches_reference_reader():
    """plan_frame_window must reproduce the frame indices + sample_fps of the
    reference timestamp reader (src/vllm_inference/utils.py:13-57) — verified
    by re-deriving its arithmetic with torch, without decoding any video."""
    import torch

    ref_smart_nframes = load_reference_module("src/utils/vision_process.py").smart_nframes

    cases = [
        (dict(video_start=1.0, video_end=7.5), 1051, 30.0),
        (dict(), 240, 24.0),
        (dict(video_start=0.0, video_end=35.04), 1051, 30.0),
        (dict(video_start=34.9, video_end=35.0), 1051, 30.0),
        (dict(video_start=None, video_end=None), 300, 29.97),
    ]
    for ele, total_frames, video_fps in cases:
        got = vm.plan_frame_window(dict(ele), total_frames, video_fps)

        # reference arithmetic (utils.py:33-56)
        video_start = ele.get("video_start") or 0.0
        video_end = ele.get("video_end")
        if video_end is None:
            video_end = total_frames / video_fps
        start_frame = max(0, int(video_start * video_fps))
        end_frame = min(total_frames, int(video_end * video_fps))
        if end_frame <= start_frame:
            end_frame = start_frame + 1
            if end_frame > total_frames:
                end_frame = total_frames
                start_frame = max(0, end_frame - 1)
        effective = end_frame - start_frame
        nframes = ref_smart_nframes(dict(ele), total_frames=effective, video_fps=video_fps)
        if effective == 0:
            idx = [start_frame]
        else:
            idx = torch.linspace(start_frame, end_frame - 1, nframes).round().long().tolist()
        sample_fps = nframes / max(effective, 1e-6) * video_fps

        assert list(got.indices) == idx, (ele, got.indices[:5], idx[:5])
        assert got.nframes == nframes
        assert math.isclose(got.sample_fps, sample_fps, rel_tol=1e-9)


def test_plan_frame_window_raise_parity():
    # Degenerate windows collapse to a single frame; smart_nframes then raises
    # in the reference (nframes=0 < FRAME_FACTOR) — preserve that behavior.
    for ele in [dict(video_start=5.0, video_end=5.0), dict(video_start=40.0, video_end=50.0)]:
        with pytest.raises(ValueError):
            vm.plan_frame_window(ele, 1051, 30.0)


def test_plan_video_shapes_end_to_end():
    h, w = vm.plan_video_shapes(240, 320, nframes=70, total_pixels=3584 * 28 * 28, min_pixels=16 * 28 * 28)
    assert h % 28 == 0 and w % 28 == 0
    assert h * w <= vm.per_frame_max_pixels(70, 3584 * 28 * 28, 16 * 28 * 28)
