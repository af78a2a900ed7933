"""Chunked prefill equivalence: splitting the prompt into prefill chunks must
reproduce single-shot greedy generation exactly (vllm max_num_batched_tokens
budget parity, vllm_infer.py:53)."""

import numpy as np

import jax.numpy as jnp

from test_model_parity import CFG, hf_model, jx_params  # fixtures  # noqa: F401
from time_r1_tpu.sampler import Engine, Request, SamplingParams


def test_chunked_equals_single_shot(jx_params):  # noqa: F811
    rng = np.random.default_rng(2)
    grid = (2, 4, 4)
    n_vis = 2 * 2 * 2
    # two requests, one with video (vision features must land in the right
    # chunk rows at the right offsets)
    reqs = [
        Request(input_ids=list(rng.integers(2, 200, 150))),
        Request(
            input_ids=(
                list(rng.integers(2, 200, 100))
                + [CFG.vision_start_token_id]
                + [CFG.video_token_id] * n_vis
                + [CFG.vision_end_token_id]
                + list(rng.integers(2, 200, 40))
            ),
            patches=rng.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(np.float32),
            grid_thw=grid,
            second_per_grid_t=1.0,
        ),
    ]
    sp = SamplingParams(temperature=0.0, max_new_tokens=5, stop_token_ids=CFG.stop_token_ids)

    single = Engine(jx_params, CFG, dtype=jnp.float32, prefill_chunk_tokens=8192)
    chunked = Engine(jx_params, CFG, dtype=jnp.float32, prefill_chunk_tokens=64)
    out_single = single.generate(reqs, sp)
    out_chunked = chunked.generate(reqs, sp)
    assert out_single == out_chunked


def test_last_token_logits_chunked(jx_params):  # noqa: F811
    rng = np.random.default_rng(3)
    reqs = [Request(input_ids=list(rng.integers(2, 200, n))) for n in (150, 90)]
    a = Engine(jx_params, CFG, dtype=jnp.float32, prefill_chunk_tokens=8192).last_token_logits(reqs)
    b = Engine(jx_params, CFG, dtype=jnp.float32, prefill_chunk_tokens=64).last_token_logits(reqs)
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
