"""Native video decoder + pipeline tests on the real reference asset
(OHOFG.mp4, the demo's parity video)."""

import numpy as np
import pytest

VIDEO = "/root/reference/assets/OHOFG.mp4"


def test_video_reader_basics():
    from time_r1_tpu.video import VideoReader

    vr = VideoReader(VIDEO)
    assert len(vr) > 300
    assert 9.0 < vr.get_avg_fps() < 10.0
    assert (vr.height, vr.width) == (360, 640)
    batch = vr.get_batch([0, 5, 5, 10])
    assert batch.shape == (4, 360, 640, 3) and batch.dtype == np.uint8
    np.testing.assert_array_equal(batch[1], batch[2])  # duplicate index
    assert not np.array_equal(batch[0], batch[3])  # video actually moves
    # backwards re-read triggers internal seek-to-start
    again = vr.get_batch([0])
    np.testing.assert_array_equal(again[0], batch[0])
    vr.close()


def test_fetch_video_budget_and_shapes():
    from time_r1_tpu.utils.vision_math import plan_frame_window
    from time_r1_tpu.video import fetch_video, VideoReader

    ele = {
        "video": VIDEO,
        "total_pixels": 3584 * 28 * 28,
        "min_pixels": 16 * 28 * 28,
    }
    frames, sample_fps = fetch_video(dict(ele))
    T, C, H, W = frames.shape
    assert C == 3 and frames.dtype == np.float32
    assert H % 28 == 0 and W % 28 == 0
    assert T % 2 == 0  # FRAME_FACTOR
    # frame plan must match the pure-math plan exactly
    vr = VideoReader(VIDEO)
    plan = plan_frame_window(dict(ele), len(vr), vr.get_avg_fps())
    vr.close()
    assert T == plan.nframes
    assert abs(sample_fps - plan.sample_fps) < 1e-9
    assert 0 <= frames.min() and frames.max() <= 255


def test_fetch_video_timestamped_window():
    from time_r1_tpu.video import fetch_video

    full, _ = fetch_video({"video": VIDEO, "nframes": 4})
    clip, _ = fetch_video({"video": VIDEO, "video_start": 1.0, "video_end": 7.5, "nframes": 4})
    assert full.shape[0] == clip.shape[0] == 4
    # clipped window samples different frames than the full video
    assert not np.array_equal(full, clip)


def test_tolerant_decode_matches_strict_on_good_file():
    """The fallback backend must be a no-op on healthy videos."""
    from time_r1_tpu.video.decoder import VideoReader

    vr = VideoReader(VIDEO)
    a = vr.get_batch([0, 5, 10, 10, 3])
    vr.close()
    vr = VideoReader(VIDEO)
    b = vr.get_batch([0, 5, 10, 10, 3], tolerant=True)
    vr.close()
    np.testing.assert_array_equal(a, b)


def test_fetch_video_falls_back_to_tolerant_decode(monkeypatch):
    """Decode-failure fallback (vision_process.py:362-368 parity): when the
    strict backend raises, fetch_video must retry the SAME plan with the
    tolerant backend instead of dropping the item."""
    from time_r1_tpu.video import decoder as dec
    from time_r1_tpu.video import pipeline

    calls = []
    orig = dec.VideoReader.get_batch

    def flaky(self, indices, tolerant=False):
        calls.append(tolerant)
        if not tolerant:
            raise IOError("decode failed (code -5)")
        return orig(self, indices, tolerant=False)  # healthy file: same frames

    monkeypatch.setattr(dec.VideoReader, "get_batch", flaky)
    frames, fps = pipeline.fetch_video(
        {"video": VIDEO, "total_pixels": 8 * 28 * 28, "min_pixels": 4 * 28 * 28,
         "video_start": 0.0, "video_end": 2.0}
    )
    assert calls == [False, True]
    assert frames.ndim == 4 and frames.shape[1] == 3
    assert fps > 0
