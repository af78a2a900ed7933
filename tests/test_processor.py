"""Processor parity: patchify vs HF Qwen2VLImageProcessor, template rendering,
video-token expansion math."""

import numpy as np
import pytest

from time_r1_tpu.models.processor import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    Qwen25VLProcessor,
    patchify_video,
    render_chat_template,
)


def test_patchify_matches_hf_image_processor():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import Qwen2VLImageProcessor

    rng = np.random.default_rng(0)
    T, C, H, W = 5, 3, 56, 84  # odd T exercises last-frame repeat
    frames = rng.uniform(0, 255, size=(T, C, H, W)).astype(np.float32)

    proc = Qwen2VLImageProcessor(
        do_resize=False,
        do_rescale=True,
        do_normalize=True,
        image_mean=OPENAI_CLIP_MEAN.tolist(),
        image_std=OPENAI_CLIP_STD.tolist(),
    )
    # HF expects a list of HWC or CHW frames; use CHW with explicit format
    from transformers.image_utils import ChannelDimension

    hf_flat, hf_grid = proc._preprocess(
        [frames[i] for i in range(T)],
        do_resize=False,
        do_rescale=True,
        rescale_factor=1 / 255,
        do_normalize=True,
        image_mean=OPENAI_CLIP_MEAN.tolist(),
        image_std=OPENAI_CLIP_STD.tolist(),
        patch_size=14,
        temporal_patch_size=2,
        merge_size=2,
        do_convert_rgb=False,
        input_data_format=ChannelDimension.FIRST,
    )

    flat, grid = patchify_video(frames)
    assert grid == tuple(hf_grid)
    np.testing.assert_allclose(flat, hf_flat, atol=1e-5, rtol=1e-5)


def test_render_chat_template_shapes():
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": "Find the event."},
                {"type": "video", "video": "x.mp4"},
            ],
        }
    ]
    got = render_chat_template(messages, add_generation_prompt=True)
    assert got == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nFind the event.<|vision_start|><|video_pad|><|vision_end|><|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    # explicit system turn suppresses the default
    messages = [{"role": "system", "content": "You are a video analysis expert."}] + messages
    got = render_chat_template(messages, add_generation_prompt=False)
    assert got.startswith("<|im_start|>system\nYou are a video analysis expert.<|im_end|>\n")
    assert "helpful assistant" not in got


class FakeTokenizer:
    """Whitespace-free char-level stub with Qwen special tokens."""

    chat_template = None
    SPECIALS = ["<|video_pad|>", "<|vision_start|>", "<|vision_end|>", "<|im_start|>", "<|im_end|>"]

    def encode(self, s, add_special_tokens=False):
        out = []
        i = 0
        while i < len(s):
            for j, sp in enumerate(self.SPECIALS):
                if s.startswith(sp, i):
                    out.append(1000 + j)
                    i += len(sp)
                    break
            else:
                out.append(ord(s[i]) % 1000)
                i += 1
        return out

    def decode(self, ids, skip_special_tokens=False):
        return "".join(chr(i) if i < 1000 else "" for i in ids)


def test_processor_expansion_and_padding():
    proc = Qwen25VLProcessor(FakeTokenizer(), pad_token_id=0)
    rng = np.random.default_rng(1)
    video = rng.uniform(0, 255, size=(4, 3, 28, 56)).astype(np.float32)
    text = render_chat_template(
        [{"role": "user", "content": [{"type": "text", "text": "hi"}, {"type": "video", "video": "v"}]}]
    )
    out = proc(text=[text], videos=[video], fps=[2.0])
    # grid = (2, 2, 4) → 16 patches → 4 merged video tokens
    assert tuple(out.video_grid_thw[0]) == (2, 2, 4)
    assert out.pixel_values_videos.shape == (16, 1176)
    n_video_tokens = int((out.input_ids == 1000).sum())
    assert n_video_tokens == 4
    assert out.second_per_grid_ts == [1.0]
    # left padding
    out2 = proc(text=["ab", "a"], videos=None)
    assert out2.input_ids.shape == (2, 2)
    assert out2.attention_mask[1, 0] == 0 and out2.attention_mask[1, 1] == 1
