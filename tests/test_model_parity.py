"""Layer-exact parity tests: JAX Qwen2.5-VL vs the HF torch implementation on
a tiny random-weight model (fp32, CPU). Validates the vision tower (window
permutation, segment attention, merger), get_rope_index, M-RoPE, decoder, and
the vision-token embedding merge end to end (SURVEY §7 hard-part 2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from time_r1_tpu.models.qwen25vl import (
    KVCache,
    Qwen25VLConfig,
    VisionInputs,
    forward,
    get_rope_index,
    prepare_vision_inputs,
)
from time_r1_tpu.models.qwen25vl.convert import convert_state_dict

VOCAB = 256
CFG = Qwen25VLConfig.tiny_test(VOCAB)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=VOCAB,
            hidden_size=CFG.text.hidden_size,
            intermediate_size=CFG.text.intermediate_size,
            num_hidden_layers=CFG.text.num_hidden_layers,
            num_attention_heads=CFG.text.num_attention_heads,
            num_key_value_heads=CFG.text.num_key_value_heads,
            rms_norm_eps=CFG.text.rms_norm_eps,
            rope_theta=CFG.text.rope_theta,
            rope_scaling={"type": "mrope", "mrope_section": list(CFG.text.mrope_section)},
            tie_word_embeddings=False,
            max_position_embeddings=1024,
            vision_start_token_id=CFG.vision_start_token_id,
            vision_end_token_id=CFG.vision_end_token_id,
            image_token_id=CFG.image_token_id,
            video_token_id=CFG.video_token_id,
        ),
        vision_config=dict(
            depth=CFG.vision.depth,
            hidden_size=CFG.vision.hidden_size,
            intermediate_size=CFG.vision.intermediate_size,
            num_heads=CFG.vision.num_heads,
            in_channels=CFG.vision.in_channels,
            patch_size=CFG.vision.patch_size,
            spatial_merge_size=CFG.vision.spatial_merge_size,
            temporal_patch_size=CFG.vision.temporal_patch_size,
            tokens_per_second=CFG.vision.tokens_per_second,
            window_size=CFG.vision.window_size,
            fullatt_block_indexes=list(CFG.vision.fullatt_block_indexes),
            out_hidden_size=CFG.vision.out_hidden_size,
        ),
        image_token_id=CFG.image_token_id,
        video_token_id=CFG.video_token_id,
        vision_start_token_id=CFG.vision_start_token_id,
        vision_end_token_id=CFG.vision_end_token_id,
        bos_token_id=CFG.bos_token_id,
        eos_token_id=CFG.eos_token_id,
        attn_implementation="eager",
    )
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def jx_params(hf_model):
    return convert_state_dict(dict(hf_model.state_dict()), CFG, dtype=jnp.float32)


def _make_video_prompt(grid, n_text_before=5, n_text_after=7, seed=0):
    t, h, w = grid
    n_vis = t * (h // 2) * (w // 2)
    rng = np.random.default_rng(seed)
    ids = (
        list(rng.integers(2, 200, n_text_before))
        + [CFG.vision_start_token_id]
        + [CFG.video_token_id] * n_vis
        + [CFG.vision_end_token_id]
        + list(rng.integers(2, 200, n_text_after))
    )
    return np.array([ids], dtype=np.int64)


# NOTE: integer second_per_grid_ts only — HF truncates fractional spg to int64
# before the temporal multiply; we follow vLLM's float semantics (rope.py note),
# so the oracle only agrees on integer values.
@pytest.mark.parametrize("grid,spg", [((2, 4, 4), 1.0), ((4, 6, 8), 2.0)])
def test_full_forward_parity_video(hf_model, jx_params, grid, spg):
    import torch

    t, h, w = grid
    n_patches = t * h * w
    rng = np.random.default_rng(42)
    patches = rng.normal(size=(n_patches, CFG.vision.patch_input_dim)).astype(np.float32)
    input_ids = _make_video_prompt(grid)
    grid_thw = np.array([grid], dtype=np.int64)

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(input_ids),
            pixel_values_videos=torch.tensor(patches),
            video_grid_thw=torch.tensor(grid_thw),
            second_per_grid_ts=torch.tensor([spg]),
        )
    hf_logits = out.logits.numpy()

    prep = prepare_vision_inputs([grid], CFG.vision)
    pos_ids, _ = get_rope_index(CFG, input_ids, video_grid_thw=grid_thw, second_per_grid_ts=[spg])
    vis = VisionInputs.build(prep, jnp.asarray(patches))
    logits, _ = forward(jx_params, CFG, jnp.asarray(input_ids), jnp.asarray(pos_ids), vision=vis)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-4, rtol=2e-3)


def test_full_forward_parity_padded_text(hf_model, jx_params):
    import torch

    rng = np.random.default_rng(1)
    ids = rng.integers(2, 200, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    ids[1, :3] = 0
    mask[1, :3] = 0  # left padding

    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    hf_logits = out.logits.numpy()

    pos_ids, _ = get_rope_index(CFG, ids, attention_mask=mask)
    logits, _ = forward(
        jx_params, CFG, jnp.asarray(ids), jnp.asarray(pos_ids), attention_mask=jnp.asarray(mask)
    )
    got, want = np.asarray(logits), hf_logits
    # compare only non-pad positions (pad rows see different garbage)
    np.testing.assert_allclose(got[mask == 1], want[mask == 1], atol=2e-4, rtol=2e-3)


def test_vision_padding_invariance(jx_params):
    """Padding the patch buffer must not change valid outputs (static-shape
    bucketing correctness)."""
    grid = (2, 4, 4)
    n_patches = 2 * 4 * 4
    rng = np.random.default_rng(3)
    patches = rng.normal(size=(n_patches, CFG.vision.patch_input_dim)).astype(np.float32)
    input_ids = _make_video_prompt(grid)
    grid_thw = np.array([grid], dtype=np.int64)
    pos_ids, _ = get_rope_index(CFG, input_ids, video_grid_thw=grid_thw, second_per_grid_ts=[1.0])

    def run(pad_to):
        prep = prepare_vision_inputs([grid], CFG.vision, pad_patches_to=pad_to)
        vis = VisionInputs.build(prep, jnp.asarray(patches))
        logits, _ = forward(jx_params, CFG, jnp.asarray(input_ids), jnp.asarray(pos_ids), vision=vis)
        return np.asarray(logits)

    np.testing.assert_allclose(run(None), run(64), atol=1e-5, rtol=1e-5)


def test_kv_cache_decode_matches_full_forward(jx_params):
    """Prefill+decode with the static KV cache must reproduce the full
    forward logits (sampler building block)."""
    rng = np.random.default_rng(7)
    ids = rng.integers(2, 200, size=(2, 12)).astype(np.int64)
    pos_ids, _ = get_rope_index(CFG, ids)

    full_logits, _ = forward(jx_params, CFG, jnp.asarray(ids), jnp.asarray(pos_ids))
    full_logits = np.asarray(full_logits)

    # prefill 8, then decode 4 one at a time
    cache = KVCache.zeros(CFG.text, batch=2, max_len=16, dtype=jnp.float32)
    mask = np.zeros((2, 16), np.int64)
    mask[:, :8] = 1
    lg, cache = forward(
        jx_params,
        CFG,
        jnp.asarray(ids[:, :8]),
        jnp.asarray(pos_ids[:, :, :8]),
        attention_mask=jnp.asarray(mask),
        cache=cache,
    )
    np.testing.assert_allclose(np.asarray(lg), full_logits[:, :8], atol=1e-4, rtol=1e-3)
    for step in range(8, 12):
        mask[:, step] = 1
        lg, cache = forward(
            jx_params,
            CFG,
            jnp.asarray(ids[:, step : step + 1]),
            jnp.asarray(pos_ids[:, :, step : step + 1]),
            attention_mask=jnp.asarray(mask),
            cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(lg)[:, 0], full_logits[:, step], atol=1e-4, rtol=1e-3
        )
