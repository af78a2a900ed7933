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


def test_decode_positions_match_full_forward(jx_params, engine):  # noqa: F811
    """Pin the decode rope-position convention against the MODEL, not another
    decode loop: feeding generated token t (0-based) at position start_pos+t
    through the cached forward must reproduce the no-cache full forward's
    logits at the same row. (Greedy-argmax equivalence tests tolerate a ±1
    position shift on the tiny model; this one does not.)"""
    import jax

    from time_r1_tpu.models.qwen25vl import forward, get_rope_index

    rng = np.random.default_rng(21)
    prompt = list(rng.integers(2, 200, 9))
    cont = [11, 23, 35]

    ids_full = np.asarray([prompt + cont], np.int64)
    pos_full, _ = get_rope_index(CFG, ids_full, attention_mask=np.ones_like(ids_full))
    logits_full, _ = forward(jx_params, CFG, jnp.asarray(ids_full), jnp.asarray(pos_full))

    ids1, mask1, pos1, start1, vis, S, max_len = engine._pack(
        [Request(input_ids=prompt)], extra_len=len(cont)
    )
    fl, cache = engine._prefill(ids1, mask1, pos1, vis, S, max_len)
    np.testing.assert_allclose(
        np.asarray(fl[0]), np.asarray(logits_full[0, len(prompt) - 1]),
        rtol=2e-5, atol=2e-5,
    )
    for t, tok in enumerate(cont):
        pos3 = jnp.broadcast_to(
            jnp.asarray(start1 + t)[None, :, None], (3, 1, 1)
        ).astype(jnp.int32)
        lg, cache = forward(
            jx_params, CFG, jnp.asarray([[tok]]), pos3,
            attention_mask=jnp.asarray(mask1), cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(lg[0, -1]), np.asarray(logits_full[0, len(prompt) + t]),
            rtol=3e-5, atol=3e-5, err_msg=f"decode step {t}",
        )

    # and the real loops stay argmax-consistent with the full forward (weak
    # pin: random tiny weights keep logits embedding-dominated, so a small
    # position shift rarely flips argmax — the decisive pin is the 3e-5
    # logit asserts above, which a +-1 shift breaks at ~1e-3)
    from dataclasses import replace

    from time_r1_tpu.models.qwen25vl import init_params

    cfg_rope = replace(CFG, text=replace(CFG.text, rope_theta=4.0))
    params_rope = init_params(cfg_rope, jax.random.PRNGKey(2), dtype=jnp.float32)
    for G in (1, 2):  # decode_loop and decode_loop_shared
        eng2 = Engine(params_rope, cfg_rope, dtype=jnp.float32)
        sp = SamplingParams(
            temperature=0.0, max_new_tokens=8, stop_token_ids=(),
            num_return_sequences=G,
        )
        out = eng2.generate([Request(input_ids=prompt)], sp)[0]
        ids2 = np.asarray([prompt + out], np.int64)
        pos2, _ = get_rope_index(cfg_rope, ids2, attention_mask=np.ones_like(ids2))
        lg2, _ = forward(params_rope, cfg_rope, jnp.asarray(ids2), jnp.asarray(pos2))
        want = np.argmax(np.asarray(lg2[0, len(prompt) - 1 : -1]), axis=-1).tolist()
        assert out == want, f"G={G}"


def test_sample_tokens_distribution():
    """sample_tokens draws from exactly softmax(logits/T) (the Gumbel/
    jax.random.categorical path — the inverse-CDF variant was measured slower
    and reverted, see sampler/engine.py): frequency check on a small vocab,
    zero-probability tokens never drawn, greedy/top_k paths still respected."""
    import jax

    from time_r1_tpu.sampler.engine import sample_tokens

    p = jnp.asarray([[0.5, 0.25, 0.125, 0.125, 0.0]], jnp.float32)
    logits = jnp.where(p > 0, jnp.log(p.clip(1e-30)), -jnp.inf)  # true zero: -inf
    sp = SamplingParams(temperature=1.0, max_new_tokens=1)
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    draws = jax.vmap(lambda k: sample_tokens(logits, k, sp))(keys)
    counts = np.bincount(np.asarray(draws).ravel(), minlength=5)
    assert counts[4] == 0  # zero-probability token is never selected
    freq = counts / n
    np.testing.assert_allclose(freq[:4], [0.5, 0.25, 0.125, 0.125], atol=0.03)

    # greedy unchanged
    sp0 = SamplingParams(temperature=0.0, max_new_tokens=1)
    assert int(sample_tokens(logits, keys[0], sp0)[0]) == 0

    # top_k=1 degenerates to greedy regardless of the draw
    spk = SamplingParams(temperature=1.0, top_k=1, max_new_tokens=1)
    draws_k = jax.vmap(lambda k: sample_tokens(logits, k, spk))(keys[:64])
    assert np.all(np.asarray(draws_k) == 0)

    # temperature reshapes the distribution (T→large ⇒ uniform over support)
    spt = SamplingParams(temperature=100.0, max_new_tokens=1)
    draws_t = jax.vmap(lambda k: sample_tokens(logits, k, spt))(keys)
    freq_t = np.bincount(np.asarray(draws_t).ravel(), minlength=5) / n
    np.testing.assert_allclose(freq_t[:4], [0.25] * 4, atol=0.03)
    assert freq_t[4] == 0.0
