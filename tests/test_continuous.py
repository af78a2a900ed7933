"""Continuous-batching engine: greedy outputs must match the bucket-batch
engine exactly; slot recycling handles more requests than slots."""

import numpy as np

import jax.numpy as jnp

from test_model_parity import CFG, hf_model, jx_params  # fixtures  # noqa: F401
from time_r1_tpu.sampler import Engine, Request, SamplingParams
from time_r1_tpu.sampler.continuous import ContinuousEngine


def _requests(n, rng):
    out = []
    for i in range(n):
        out.append(Request(input_ids=list(rng.integers(2, 200, int(rng.integers(5, 40))))))
    return out


def test_continuous_matches_bucket_greedy(jx_params):  # noqa: F811
    rng = np.random.default_rng(0)
    reqs = _requests(5, rng)  # more requests than slots → recycling
    sp = SamplingParams(temperature=0.0, max_new_tokens=7, stop_token_ids=CFG.stop_token_ids)

    bucket = Engine(jx_params, CFG, dtype=jnp.float32)
    cont = ContinuousEngine(jx_params, CFG, max_slots=2, max_len=256, segment=3, dtype=jnp.float32)
    want = bucket.generate(reqs, sp)
    got = cont.generate(reqs, sp)
    assert got == want


def test_continuous_with_video(jx_params):  # noqa: F811
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
    cont = ContinuousEngine(jx_params, CFG, max_slots=2, max_len=256, segment=4, dtype=jnp.float32)
    assert cont.generate([req], sp) == bucket.generate([req], sp)
