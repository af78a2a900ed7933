"""Shared-prefix group decode: the G-way rollout path stores the prompt KV
once per prompt (engine.decode_loop_shared / language.shared_decode_forward).

Oracles:
- op level: mha_shared_prefix (bf16 and int8-scale forms) vs mha_reference
  over the concatenated [prefix | suffix | chunk] KV;
- engine level: G-way generate must equal the replicate-the-cache decode it
  replaced (decode_loop over a jnp.repeat'ed cache) token-for-token, and the
  greedy group must still match single-request greedy decode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG, hf_model, jx_params  # fixtures  # noqa: F401
from time_r1_tpu.models.qwen25vl import KVCache
from time_r1_tpu.ops.attention import NEG_INF, mha_reference, mha_shared_prefix
from time_r1_tpu.ops.quant import quantize_kv
from time_r1_tpu.sampler import Engine, Request, SamplingParams
from time_r1_tpu.sampler.engine import decode_loop, decode_loop_shared  # noqa: F401


def _oracle(q, kp, vp, ko, vo, kn, vn, bias_pref, bias_own, bias_new, R):
    """Concatenate [prefix | own | new] per row and run mha_reference."""
    P = kp.shape[0]
    B = q.shape[0]
    kp_rows = jnp.repeat(kp, R, axis=0)
    vp_rows = jnp.repeat(vp, R, axis=0)
    k_all = jnp.concatenate([kp_rows, ko, kn], axis=1)
    v_all = jnp.concatenate([vp_rows, vo, vn], axis=1)
    bp_rows = jnp.repeat(bias_pref, R, axis=0)
    bias = jnp.concatenate(
        [
            jnp.broadcast_to(bp_rows, (B, 1, q.shape[1], kp.shape[1])),
            jnp.broadcast_to(bias_own, (B, 1, q.shape[1], ko.shape[1])),
            jnp.broadcast_to(bias_new, (B, 1, q.shape[1], kn.shape[1])),
        ],
        axis=-1,
    )
    return mha_reference(q, k_all, v_all, bias=bias)


@pytest.mark.parametrize("quant", [False, True])
def test_mha_shared_prefix_matches_concat_oracle(quant):
    rng = np.random.default_rng(0)
    P, R, S, H, Hkv, D = 2, 3, 1, 4, 2, 16
    B = P * R
    Lp, Lo = 24, 8

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape), jnp.float32)

    q = arr(B, S, H, D)
    kp, vp = arr(P, Lp, Hkv, D), arr(P, Lp, Hkv, D)
    ko, vo = arr(B, Lo, Hkv, D), arr(B, Lo, Hkv, D)
    kn, vn = arr(B, S, Hkv, D), arr(B, S, Hkv, D)

    # prompt left-padding: first few prefix slots invalid for prompt 0;
    # own suffix: only the first 5 generated slots valid; chunk: causal
    bias_pref = jnp.where(
        (jnp.arange(Lp)[None, :] >= jnp.array([[3], [0]])), 0.0, NEG_INF
    ).astype(jnp.float32)[:, None, None, :]
    bias_own = jnp.where(jnp.arange(Lo) < 5, 0.0, NEG_INF).astype(jnp.float32)[
        None, None, None, :
    ]
    bias_new = jnp.zeros((1, 1, S, S), jnp.float32)

    if quant:
        kp8, kps = quantize_kv(kp)
        vp8, vps = quantize_kv(vp)
        ko8, kos = quantize_kv(ko)
        vo8, vos = quantize_kv(vo)
        got = mha_shared_prefix(
            q, kp8, vp8, kps, vps, ko8, vo8, kos, vos, kn, vn,
            bias_pref, bias_own, bias_new,
        )
        # the oracle sees the dequantized values the op actually attends to
        kp_d = kp8.astype(jnp.float32) * kps[..., None]
        vp_d = vp8.astype(jnp.float32) * vps[..., None]
        ko_d = ko8.astype(jnp.float32) * kos[..., None]
        vo_d = vo8.astype(jnp.float32) * vos[..., None]
        want = _oracle(q, kp_d, vp_d, ko_d, vo_d, kn, vn, bias_pref, bias_own, bias_new, R)
        tol = 2e-2  # int8 quantization noise
    else:
        got = mha_shared_prefix(
            q, kp, vp, None, None, ko, vo, None, None, kn, vn,
            bias_pref, bias_own, bias_new,
        )
        want = _oracle(q, kp, vp, ko, vo, kn, vn, bias_pref, bias_own, bias_new, R)
        tol = 1e-5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=tol, rtol=tol)


@pytest.mark.parametrize("quant_kv", [False, True])
def test_group_generate_matches_replicated_cache_decode(jx_params, quant_kv):  # noqa: F811
    """engine.generate(G=4) must produce exactly the tokens the old
    replicate-the-prefix decode produced (same seed, same sampling)."""
    eng = Engine(jx_params, CFG, dtype=jnp.float32, kv_cache_quant=quant_kv)
    rng = np.random.default_rng(7)
    reqs = [Request(input_ids=list(rng.integers(2, 200, n))) for n in (11, 7)]
    G, max_new = 4, 6
    sp = SamplingParams(
        temperature=1.0, max_new_tokens=max_new, stop_token_ids=CFG.stop_token_ids,
        num_return_sequences=G, seed=5,
    )
    got = eng.generate(reqs, sp)

    # old path: prefill with decode room, repeat the cache G× per row
    ids1, mask1, pos1, start1, vis, S, max_len = eng._pack(reqs, extra_len=max_new)
    fl1, cache1 = eng._prefill(ids1, mask1, pos1, vis, S, max_len)
    first_logits = jnp.repeat(fl1, G, axis=0)
    cache = KVCache(
        k=jnp.repeat(cache1.k, G, axis=1),
        v=jnp.repeat(cache1.v, G, axis=1),
        length=cache1.length,
    )
    cache = eng._maybe_quant_cache(cache)
    tokens = decode_loop(
        eng.params, CFG, cache, first_logits,
        jnp.asarray(np.repeat(start1, G, axis=0)),
        jnp.asarray(np.repeat(mask1, G, axis=0)),
        sp, jax.random.PRNGKey(5),
    )
    want = eng._postprocess(np.asarray(tokens), len(reqs) * G, sp)
    assert got == want


def test_group_greedy_matches_single_request(jx_params):  # noqa: F811
    """Greedy G-way group rows must each equal the single-request greedy
    completion (all rows identical, shared prefix changes nothing)."""
    eng = Engine(jx_params, CFG, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    p = list(rng.integers(2, 200, 13))
    sp1 = SamplingParams(temperature=0.0, max_new_tokens=8, stop_token_ids=CFG.stop_token_ids)
    single = eng.generate([Request(input_ids=p)], sp1)[0]
    spg = SamplingParams(
        temperature=0.0, max_new_tokens=8, stop_token_ids=CFG.stop_token_ids,
        num_return_sequences=3,
    )
    group = eng.generate([Request(input_ids=p)], spg)
    for row in group:
        assert row == single


def test_shared_decode_flash_chunk_matches_einsum():
    """The suffix=None (GRPO loss) chunk attention has a flash path: q_offset
    = Lp over a per-layer [broadcast prefix | chunk] concat. Interpret-mode
    kernel must match the einsum path — outputs AND parameter grads (the
    prefix gradient sums over each prompt's R rows through the concat VJP)."""
    from time_r1_tpu.models.qwen25vl.config import TextConfig
    from time_r1_tpu.models.qwen25vl.language import (
        NEG_INF as NI,
        init_text_params,
        shared_decode_forward,
    )

    cfg = TextConfig(
        vocab_size=256, hidden_size=128, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        mrope_section=(8, 12, 12),
    )
    assert cfg.head_dim == 64
    params = init_text_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    P, R, Lp, S = 2, 2, 128, 128
    B = P * R
    prefix = KVCache(
        k=jnp.asarray(rng.normal(size=(2, P, Lp, 1, 64)), jnp.float32),
        v=jnp.asarray(rng.normal(size=(2, P, Lp, 1, 64)), jnp.float32),
        length=jnp.asarray(Lp, jnp.int32),
    )
    # prompt 0 left-padded by 17 slots
    prefix_bias = jnp.where(
        jnp.arange(Lp)[None, :] >= jnp.array([[17], [0]]), 0.0, NI
    ).astype(jnp.float32)
    hidden = jnp.asarray(rng.normal(size=(B, S, 128)) * 0.1, jnp.float32)
    pos = jnp.broadcast_to(Lp + jnp.arange(S)[None, None, :], (3, B, S))

    def run(use_flash):
        def f(p, h):
            out, _ = shared_decode_forward(
                p, cfg, h, pos, prefix, None, prefix_bias, use_flash=use_flash
            )
            return jnp.sum(out * out), out

        (loss, out), grads = jax.value_and_grad(f, has_aux=True)(params, hidden)
        return loss, out, grads

    l_e, o_e, g_e = run(False)
    l_f, o_f, g_f = run(True)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_e), atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(float(l_f), float(l_e), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_e)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)
