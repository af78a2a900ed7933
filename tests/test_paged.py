"""Paged-pool engine: greedy outputs must match the bucket engine exactly;
page allocator recycles pages across more requests than slots."""

import numpy as np

import jax.numpy as jnp

from test_model_parity import CFG, hf_model, jx_params  # fixtures  # noqa: F401
from time_r1_tpu.sampler import Engine, Request, SamplingParams
from time_r1_tpu.sampler.paged import PagedEngine, PageAllocator


def test_allocator_reserves_scratch_page():
    a = PageAllocator(4)
    got = a.alloc(3)
    assert 0 not in got and sorted(got) == [1, 2, 3]
    a.release([2])
    assert a.alloc(1) == [2]


def test_paged_matches_bucket_greedy(jx_params):  # noqa: F811
    rng = np.random.default_rng(0)
    reqs = [
        Request(input_ids=list(rng.integers(2, 200, int(n))))
        for n in (9, 33, 17, 25, 12)  # heterogeneous lengths, > slots
    ]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids)

    bucket = Engine(jx_params, CFG, dtype=jnp.float32)
    paged = PagedEngine(
        jx_params, CFG, max_slots=2, max_len=128, page_size=16, dtype=jnp.float32
    )
    want = bucket.generate(reqs, sp)
    got = paged.generate(reqs, sp)
    assert got == want


def test_paged_with_video(jx_params):  # noqa: F811
    rng = np.random.default_rng(1)
    grid = (2, 4, 4)
    n_vis = 2 * 2 * 2
    req = Request(
        input_ids=(
            list(rng.integers(2, 200, 6))
            + [CFG.vision_start_token_id]
            + [CFG.video_token_id] * n_vis
            + [CFG.vision_end_token_id]
            + list(rng.integers(2, 200, 4))
        ),
        patches=rng.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(np.float32),
        grid_thw=grid,
        second_per_grid_t=1.0,
    )
    sp = SamplingParams(temperature=0.0, max_new_tokens=5, stop_token_ids=CFG.stop_token_ids)
    bucket = Engine(jx_params, CFG, dtype=jnp.float32)
    paged = PagedEngine(jx_params, CFG, max_slots=2, max_len=128, page_size=16, dtype=jnp.float32)
    assert paged.generate([req], sp) == bucket.generate([req], sp)


def test_paged_int8_kv_matches_bucket_int8_kv_greedy(jx_params):  # noqa: F811
    """int8 KV pages compose with the paged pool: greedy outputs match the
    bucket engine running its own int8 KV cache (same per-(token, head)
    quantization, scales folded on the score/prob axes)."""
    rng = np.random.default_rng(2)
    reqs = [
        Request(input_ids=list(rng.integers(2, 200, int(n))))
        for n in (9, 33, 17, 25)
    ]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids)

    bucket = Engine(jx_params, CFG, dtype=jnp.float32, kv_cache_quant=True)
    paged = PagedEngine(
        jx_params, CFG, max_slots=2, max_len=128, page_size=16, dtype=jnp.float32,
        kv_cache_quant=True,
    )
    want = bucket.generate(reqs, sp)
    got = paged.generate(reqs, sp)
    assert got == want
    # and int8 KV stays close to the bf16 paged path (same argmax on tiny
    # random models whose logit gaps dominate the quantization noise)
    bf16 = PagedEngine(
        jx_params, CFG, max_slots=2, max_len=128, page_size=16, dtype=jnp.float32
    ).generate(reqs, sp)
    agree = sum(a == b for a, b in zip(got, bf16))
    assert agree >= len(reqs) - 1, (got, bf16)
