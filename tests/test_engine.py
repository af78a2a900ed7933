"""Generation-engine equivalence tests: greedy decode must match HF
`generate(do_sample=False)` on the tiny parity model (sampler vs naive decode
equivalence, SURVEY §7 test strategy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from test_model_parity import CFG, hf_model, jx_params  # fixtures  # noqa: F401
from time_r1_tpu.sampler import Engine, Request, SamplingParams


@pytest.fixture(scope="module")
def engine(jx_params):  # noqa: F811
    return Engine(jx_params, CFG, dtype=jnp.float32)


def test_greedy_matches_hf_generate(hf_model, engine):  # noqa: F811
    import torch

    rng = np.random.default_rng(11)
    prompts = [list(rng.integers(2, 200, n)) for n in (9, 14, 5)]
    max_new = 8

    hf_out = []
    for p in prompts:
        ids = torch.tensor([p])
        with torch.no_grad():
            full = hf_model.generate(
                input_ids=ids,
                max_new_tokens=max_new,
                do_sample=False,
                eos_token_id=list(CFG.stop_token_ids),
                pad_token_id=CFG.pad_token_id,
                use_cache=True,
            )
        hf_out.append(full[0, len(p) :].tolist())

    sp = SamplingParams(temperature=0.0, max_new_tokens=max_new, stop_token_ids=CFG.stop_token_ids)
    got = engine.generate([Request(input_ids=p) for p in prompts], sp)
    for g, h in zip(got, hf_out):
        # HF keeps the eos token in the returned ids, as do we (include_stop)
        assert g == h[: len(g)], (g, h)
        # if we stopped early it must be because of a stop token
        if len(g) < max_new:
            assert g[-1] in CFG.stop_token_ids


def test_group_rollouts_shapes_and_determinism(engine):
    rng = np.random.default_rng(3)
    p = list(rng.integers(2, 200, 10))
    sp = SamplingParams(
        temperature=1.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids,
        num_return_sequences=4, seed=123,
    )
    a = engine.generate([Request(input_ids=p)], sp)
    b = engine.generate([Request(input_ids=p)], sp)
    assert len(a) == 4
    assert a == b  # seeded determinism
    assert len({tuple(x) for x in a}) > 1  # G rollouts differ (same prompt)


def test_video_request_generates(engine):
    grid = (2, 4, 4)
    n_vis = 2 * 2 * 2
    rng = np.random.default_rng(5)
    ids = (
        list(rng.integers(2, 200, 4))
        + [CFG.vision_start_token_id]
        + [CFG.video_token_id] * n_vis
        + [CFG.vision_end_token_id]
        + list(rng.integers(2, 200, 3))
    )
    patches = rng.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(np.float32)
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, stop_token_ids=CFG.stop_token_ids)
    out = engine.generate(
        [Request(input_ids=ids, patches=patches, grid_thw=grid, second_per_grid_t=1.0)], sp
    )
    assert len(out) == 1 and 1 <= len(out[0]) <= 4
