"""Device bicubic resize parity.

The production path computes the separable antialiased bicubic in FLOAT with
one final rounding — exactly torchvision's antialias=True semantics
(vision_process.py:398-403; torchvision unavailable offline). PIL shares the
same filter but rounds to uint8 BETWEEN the horizontal and vertical passes,
so the exactness oracle here emulates PIL's two-pass rounding with our weight
matrices (must agree to ≤1 gray level), and the float path is additionally
checked to stay within ±2 of PIL (inter-pass rounding bound)."""

import numpy as np
import pytest

import jax

from time_r1_tpu.video.resize import resize_frames_device, resize_weights

jax.config.update("jax_platforms", "cpu")


def _pil_resize(frames, out_h, out_w):
    from PIL import Image

    out = np.empty((frames.shape[0], out_h, out_w, frames.shape[3]), np.uint8)
    for i, f in enumerate(frames):
        out[i] = np.asarray(Image.fromarray(f).resize((out_w, out_h), Image.BICUBIC))
    return out


def _two_pass_like_pil(frames, out_h, out_w):
    """Our weights, PIL's pass order (horizontal first) + inter-pass rounding."""
    wh = resize_weights(frames.shape[1], out_h).astype(np.float64)
    ww = resize_weights(frames.shape[2], out_w).astype(np.float64)
    x = frames.astype(np.float64)
    x = np.einsum("pw,thwc->thpc", ww, x)
    x = np.clip(np.round(x), 0, 255)
    x = np.einsum("oh,thpc->topc", wh, x)
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def test_weights_partition_of_unity():
    for pair in [(360, 252), (640, 448), (100, 224), (57, 228)]:
        w = resize_weights(*pair)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)


@pytest.mark.parametrize("shape,out", [((360, 640), (252, 448)), ((56, 84), (112, 168))])
def test_weights_match_pil_exactly_with_pass_rounding(shape, out):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(2, *shape, 3), dtype=np.uint8)
    got = _two_pass_like_pil(frames, *out)
    want = _pil_resize(frames, *out)
    diff = np.abs(got.astype(int) - want.astype(int))
    # residual ≤2 at ~1e-5 of pixels: PIL quantizes coefficients to 8-bit
    # fixed point; our float weights are the torchvision-exact ones
    assert diff.max() <= 2, diff.max()
    assert (diff > 1).mean() < 1e-4
    assert (diff > 0).mean() < 0.01


def test_float_path_close_to_pil():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(2, 360, 640, 3), dtype=np.uint8)
    got = resize_frames_device(frames, 252, 448)
    want = _pil_resize(frames, 252, 448)
    diff = np.abs(got.astype(int) - want.astype(int))
    # float single-rounding vs PIL's two-pass rounding: tiny disagreement band
    assert (diff > 1).mean() < 0.01
    assert diff.max() <= 16  # worst-case double-rounding on a steep edge


def test_real_video_frame():
    from time_r1_tpu.video import VideoReader

    vr = VideoReader("/root/reference/assets/OHOFG.mp4")
    frames = vr.get_batch([0, 100])
    vr.close()
    got = resize_frames_device(frames, 252, 448)
    want = _pil_resize(frames, 252, 448)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff > 1).mean() < 0.01


def _torch_resize(frames, out_h, out_w):
    """THE reference semantics: torch bicubic antialias=True (what
    torchvision's Resize calls into — vision_process.py:398-403), float
    throughout, one final round-half-even + clip."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(frames).permute(0, 3, 1, 2).float()
    x = F.interpolate(x, size=(out_h, out_w), mode="bicubic", antialias=True)
    return torch.clamp(x.round(), 0, 255).to(torch.uint8).permute(0, 2, 3, 1).numpy()


def test_default_host_path_matches_torch_reference():
    """The DEFAULT resize backend (pipeline.resize_frames_bicubic, no env
    vars — the native banded float kernel) must match torch's antialiased
    bicubic to ≤1 gray level on a vanishing fraction of pixels (f32
    accumulation-order ulps at round-half ties only; PIL's inter-pass
    rounding deviates up to 16 gray levels — see test above). Parity-safe
    default per SURVEY §7 hard part 2."""
    import os

    from time_r1_tpu.video.pipeline import resize_frames_bicubic

    assert os.environ.get("TIMER1_DEVICE_RESIZE") != "1"
    assert os.environ.get("TIMER1_RESIZE_BACKEND") != "pil"
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(8, 360, 640, 3), dtype=np.uint8)
    got = resize_frames_bicubic(frames, 196, 364)
    want = _torch_resize(frames, 196, 364)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 1e-3, (diff > 0).mean()


def test_device_path_matches_torch_reference():
    """resize_frames_device rides the MXU at precision=HIGHEST — it must hold
    the same ≤1-gray bound vs torch (at default MXU precision it drifts ±2 on
    ~22% of pixels — measured on v5e; that's why HIGHEST is forced)."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(4, 360, 640, 3), dtype=np.uint8)
    got = resize_frames_device(frames, 196, 364)
    want = _torch_resize(frames, 196, 364)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 1e-3, (diff > 0).mean()
