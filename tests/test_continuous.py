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


def test_continuous_exact_accounting_budget_exhaustion(jx_params):  # noqa: F811
    """A slot that exhausts max_new_tokens without emitting a stop id must
    return exactly max_new_tokens tokens and NO phantom pads — even when
    pad_token_id is itself a stop id (the real Qwen vocab case: pad 151643
    IS in stop_token_ids)."""
    rng = np.random.default_rng(2)
    reqs = _requests(3, rng)
    # stop on a token greedy decode will never produce AND on pad itself;
    # budget 5 with segment 4 forces a mid-segment budget exhaustion
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=5, stop_token_ids=(CFG.pad_token_id, 255)
    )
    bucket = Engine(jx_params, CFG, dtype=jnp.float32)
    cont = ContinuousEngine(jx_params, CFG, max_slots=2, max_len=256, segment=4, dtype=jnp.float32)
    want = bucket.generate(reqs, sp)
    got = cont.generate(reqs, sp)
    assert got == want
    for row, w in zip(got, want):
        assert len(row) <= sp.max_new_tokens


def test_continuous_quantized_runs(jx_params):  # noqa: F811
    """int8 weight-only path through the slot engine produces well-formed
    outputs (stop/budget respected)."""
    rng = np.random.default_rng(3)
    reqs = _requests(3, rng)
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids)
    cont = ContinuousEngine(
        jx_params, CFG, max_slots=2, max_len=256, segment=3, dtype=jnp.float32,
        quantization="int8",
    )
    out = cont.generate(reqs, sp)
    assert len(out) == 3
    for row in out:
        assert len(row) <= sp.max_new_tokens
        assert all(isinstance(t, int) for t in row)


def test_bench_serving_harness_runs_both_engines(jx_params):  # noqa: F811
    """scripts/bench_serving.py's measurement harness works on both engines
    (tiny config, CPU): fixed-length generation, all tokens emitted."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_serving",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "bench_serving.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    reqs = mod.build_requests(3, vocab=200)
    # tiny lengths for CPU: override the mix-driven lengths
    reqs = [type(r)(input_ids=r.input_ids[:12]) for r in reqs]
    sp = SamplingParams(temperature=1.0, max_new_tokens=4, stop_token_ids=(), seed=0)
    for kind in ("paged", "slot"):
        tps, gen, wall = mod.run(
            CFG, jx_params, reqs, sp, kind, max_slots=2, max_len=64,
            page_size=16, quantization=None, kv_cache_quant=False,
            dtype=jnp.float32, warmup=False,
        )
        assert gen == 3 * 4 and tps > 0 and wall > 0
