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


def test_chunked_prefill_interleaves_decode(jx_params, monkeypatch):  # noqa: F811
    """vLLM chunked-prefill interleave: while a LONG admission streams in,
    resident slots keep decoding between its prefill chunks — and the final
    outputs are identical to the non-interleaved engine and the bucket
    engine (pure scheduling change, same math)."""
    import time_r1_tpu.sampler.paged as paged_mod

    rng = np.random.default_rng(3)
    short = [Request(input_ids=list(rng.integers(2, 200, 12))) for _ in range(2)]
    long_req = Request(input_ids=list(rng.integers(2, 200, 600)))  # >1 chunk at 256
    reqs = short + [long_req]

    # stagger slot retirement so a slot is RESIDENT when the long prompt is
    # admitted: pick a stop token that appears early in short2's greedy
    # continuation but not early in the others' (uniform budgets would retire
    # lockstep-admitted slots simultaneously and never exercise the interleave)
    bucket = Engine(jx_params, CFG, dtype=jnp.float32)
    probe_sp = SamplingParams(temperature=0.0, max_new_tokens=24, stop_token_ids=(10_000,))
    raw = bucket.generate(reqs, probe_sp)
    stop_tok = next(
        t for t in raw[1][3:10]
        if t not in raw[0][:20] and t not in raw[2][:20]
    )
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=24, stop_token_ids=(stop_tok,), seed=0
    )
    want = bucket.generate(reqs, sp)
    assert len(want[1]) < 12 <= len(want[0])  # short2 retires early

    def make(interleave):
        return PagedEngine(
            jx_params, CFG, max_slots=2, max_len=1024, page_size=16, dtype=jnp.float32,
            prefill_chunk_tokens=256, segment=4, interleave_decode=interleave,
        )

    got_plain = make(False).generate(reqs, sp)
    assert got_plain == want

    # count decode segments fired DURING admissions (the interleave signal)
    orig_admit = PagedEngine._admit_many
    orig_seg = paged_mod.paged_decode_segment
    state = {"in_admit": False, "interleaved": 0}

    def counting_admit(self, *a, **k):
        state["in_admit"] = True
        try:
            return orig_admit(self, *a, **k)
        finally:
            state["in_admit"] = False

    def counting_segment(*a, **k):
        if state["in_admit"]:
            state["interleaved"] += 1
        return orig_seg(*a, **k)

    monkeypatch.setattr(PagedEngine, "_admit_many", counting_admit)
    monkeypatch.setattr(paged_mod, "paged_decode_segment", counting_segment)
    got_inter = make(True).generate(reqs, sp)
    assert got_inter == want
    # slots were resident while the 600-token prompt prefilled in 256-token
    # chunks → at least one decode segment ran inside an admission
    assert state["interleaved"] >= 1, state


def test_paged_side_path_lora_matches_merged(jx_params):  # noqa: F811
    """Side-path LoRA on the PAGED engine (vLLM --enable-lora capability on
    the continuous-batching path): greedy tokens over base + unmerged
    adapters must equal the slot engine on functionally MERGED weights —
    prefill (admission) and the paged decode segments both apply the
    deltas."""
    import jax

    from time_r1_tpu.rl.lora import LoRAConfig, init_lora, lora_layers_tree, merge_lora

    lcfg = LoRAConfig(rank=4, alpha=8.0)
    lora = init_lora(jx_params, lcfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    lora = {k: v for k, v in lora.items() if not k.startswith("visual")}
    lora = jax.tree.map(lambda a: a + 0.03, lora)  # B starts at 0 — make it real
    tree, rest = lora_layers_tree(lora)
    assert not rest

    rng = np.random.default_rng(3)
    reqs = [
        Request(input_ids=list(rng.integers(2, 200, int(n))))
        for n in (9, 21, 14)  # heterogeneous, > slots → allocator recycling
    ]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids)

    paged = PagedEngine(
        jx_params, CFG, max_slots=2, max_len=128, page_size=16, dtype=jnp.float32
    )
    paged.set_lora_side(tree, lcfg.scaling)
    got = paged.generate(reqs, sp)

    oracle = Engine(merge_lora(jx_params, lora, lcfg), CFG, dtype=jnp.float32)
    want = oracle.generate(reqs, sp)
    assert got == want

    # clearing restores the base policy
    paged.set_lora_side(None)
    assert paged.generate(reqs, sp) == Engine(jx_params, CFG, dtype=jnp.float32).generate(
        reqs, sp
    )
