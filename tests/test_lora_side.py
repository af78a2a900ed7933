"""Side-path LoRA (ops/quant.lora_delta): adapters applied as unmerged
scaling·(h@A)@B products at each projection.

This is the zero-copy GRPO weight sync for quantized-base training: rollout
decode samples from the SAME tree the trainer differentiates through —
h @ (W + s·A@B) = h@W + s·(h@A)@B, so the side path is the merged math up to
float reassociation. The reference gets the analogous effect from vLLM's
LoRA serving; here it also eliminates the per-step merge+quantize program.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from time_r1_tpu.models.qwen25vl import forward, get_rope_index, init_params
from time_r1_tpu.rl.lora import LoRAConfig, init_lora, lora_layers_tree, merge_lora
from time_r1_tpu.sampler import Engine, Request
from time_r1_tpu.sampler.params import SamplingParams

LCFG = LoRAConfig(rank=4, alpha=8.0)


def _params_and_lora(dtype=jnp.float32):
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=dtype)
    lora = init_lora(params, LCFG, jax.random.PRNGKey(7), dtype=dtype)
    lora = {k: v for k, v in lora.items() if not k.startswith("visual")}
    # lora_b inits to zero (identity adapter) — make the delta nontrivial
    lora = jax.tree.map(lambda a: a + 0.03, lora)
    return params, lora


def _prompt_logits(params, lora_side=None):
    rng = np.random.default_rng(3)
    ids = rng.integers(2, 200, (2, 7))
    pos, _ = get_rope_index(CFG, ids, attention_mask=np.ones_like(ids))
    logits, _ = forward(
        params, CFG, jnp.asarray(ids), jnp.asarray(pos), lora_side=lora_side
    )
    return np.asarray(logits)


def test_side_path_matches_merged_forward():
    """forward(base, lora_side=…) == forward(merge_lora(base, …)) — same
    math, different association (fp32: tight tolerance)."""
    params, lora = _params_and_lora()
    tree, rest = lora_layers_tree(lora)
    assert not rest
    got = _prompt_logits(params, lora_side=(tree, LCFG.scaling))
    want = _prompt_logits(merge_lora(params, lora, LCFG))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # and the adapters actually changed the function
    base = _prompt_logits(params)
    assert np.abs(want - base).max() > 1e-3


def test_engine_side_path_matches_merged_generate():
    """Greedy G-way grouped rollouts (the GRPO decode path, shared-prefix
    suffix cache) with side-path adapters == generate on merged weights."""
    params, lora = _params_and_lora()
    tree, _ = lora_layers_tree(lora)

    rng = np.random.default_rng(0)
    req = Request(input_ids=rng.integers(2, 200, 9).tolist())
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids,
        num_return_sequences=3, seed=0,
    )

    eng = Engine(params, CFG, dtype=jnp.float32)
    eng.set_lora_side(tree, LCFG.scaling)
    got = eng.generate([req], sp)

    eng_merged = Engine(merge_lora(params, lora, LCFG), CFG, dtype=jnp.float32)
    want = eng_merged.generate([req], sp)
    assert got == want

    # clearing the adapters restores the base policy
    eng.set_lora_side(None)
    base = eng.generate([req], sp)
    assert base == Engine(params, CFG, dtype=jnp.float32).generate([req], sp)


def test_engine_side_path_single_row_path():
    """The G=1 (full-cache decode_loop) path threads adapters too."""
    params, lora = _params_and_lora()
    tree, _ = lora_layers_tree(lora)
    rng = np.random.default_rng(1)
    req = Request(input_ids=rng.integers(2, 200, 5).tolist())
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, stop_token_ids=CFG.stop_token_ids)

    eng = Engine(params, CFG, dtype=jnp.float32)
    eng.set_lora_side(tree, LCFG.scaling)
    got = eng.generate([req], sp)
    want = Engine(merge_lora(params, lora, LCFG), CFG, dtype=jnp.float32).generate([req], sp)
    assert got == want


@pytest.mark.parametrize("fuse", [True, False], ids=["fused", "unfused"])
def test_engine_side_path_over_quantized_base(fuse):
    """The production shape: int8 base (the trainer's tree) + int8 KV +
    side-path adapters. Greedy tokens must match the
    dequantize→merge→requantize oracle — the engine path the side-path sync
    replaces (same sampled bits, none of the per-step merge work or the
    duplicate tree). Both base layouts: decode-FUSED qkv/gu (the round-5
    single-chip default — serving-shape weight streams during rollouts) and
    unfused per-projection."""
    from time_r1_tpu.ops.quant import dequantize_weight, is_quantized, quantize_params

    params, lora = _params_and_lora()
    q_base = quantize_params(params, bits=8, fuse=fuse)
    tree, _ = lora_layers_tree(lora)

    rng = np.random.default_rng(2)
    req = Request(input_ids=rng.integers(2, 200, 8).tolist())
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=5, stop_token_ids=CFG.stop_token_ids,
        num_return_sequences=2, seed=0,
    )

    eng = Engine(q_base, CFG, dtype=jnp.float32, kv_cache_quant=True)
    eng.set_lora_side(tree, LCFG.scaling)
    got = eng.generate([req], sp)

    def deq_leaf(x):
        return dequantize_weight(x, dtype=jnp.float32) if is_quantized(x) else x

    deq = jax.tree.map(deq_leaf, q_base, is_leaf=is_quantized)
    merged = merge_lora(deq, lora, LCFG)
    oracle = Engine(
        merged, CFG, dtype=jnp.float32, quantization="int8", kv_cache_quant=True
    )
    want = oracle.generate([req], sp)
    assert [len(g) for g in got] == [len(w) for w in want]
    # int8 rounding of the merged tree vs int8 base + exact side deltas can
    # legitimately flip a late low-margin token; demand agreement on the
    # first tokens (greedy, highest margin)
    for g, w in zip(got, want):
        assert g[:2] == w[:2], (g, w)


def test_grouped_side_adapters_match_per_projection():
    """group_side_adapters (the engine's set_lora_side rewrite: q/k/v and
    gate/up side products collapse to ONE A_cat @ B_blockdiag pair per
    group) is the same math as the per-projection path — block-diagonal
    structure makes (h@A_cat)@B_bd == concat of the component deltas."""
    from time_r1_tpu.ops.quant import group_side_adapters

    params, lora = _params_and_lora()
    tree, _ = lora_layers_tree(lora)
    grouped = group_side_adapters(tree)
    # layout: the groups collapsed, the own-input projections survive
    assert "qkv_side" in grouped["self_attn"] and "q_w" not in grouped["self_attn"]
    assert "gu_side" in grouped["mlp"] and "gate_w" not in grouped["mlp"]
    assert "o_w" in grouped["self_attn"] and "down_w" in grouped["mlp"]

    got = _prompt_logits(params, lora_side=(grouped, LCFG.scaling))
    want = _prompt_logits(params, lora_side=(tree, LCFG.scaling))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
