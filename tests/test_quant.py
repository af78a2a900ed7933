"""Weight-only quantization (ops/quant.py): numerics + model-path dispatch.

Grid-exact tests: weights snapped onto their own int8/int4 grid quantize
losslessly, so the quantized forward must reproduce the bf16 forward's
greedy argmax exactly — this pins the dispatch plumbing (qmatmul /
embed_lookup / tied_head_logits) independent of quantization error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, forward, init_params
from time_r1_tpu.ops.quant import (
    _unpack_q4,
    dequantize_weight,
    embed_lookup,
    quantize_embedding,
    quantize_params,
    quantize_weight,
    tied_head_logits,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 64, 48)).astype(np.float32))
    q = quantize_weight(w, bits=8)
    deq = dequantize_weight(q, dtype=jnp.float32)
    # symmetric per-channel: |err| <= scale/2 elementwise
    assert np.all(np.abs(np.asarray(deq - w)) <= np.asarray(q["s"]) / 2 + 1e-7)


def test_int4_pack_unpack_exact():
    # offset-8 unsigned nibble layout (ops/quant.py: u = q + 8, lo = even row)
    rng = np.random.default_rng(1)
    q = rng.integers(-7, 8, size=(2, 16, 12)).astype(np.int8)
    u = (q + 8).astype(np.uint8)
    packed = u[:, 0::2, :] | (u[:, 1::2, :] << 4)
    un = np.asarray(_unpack_q4(jnp.asarray(packed.astype(np.uint8))))
    np.testing.assert_array_equal(un, q)


def test_int4_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    q = quantize_weight(w, bits=4)
    deq = dequantize_weight(q, dtype=jnp.float32)
    assert np.all(np.abs(np.asarray(deq - w)) <= np.asarray(q["s"]) / 2 + 1e-6)


def test_embed_lookup_and_tied_head():
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    qe = quantize_embedding(emb, bits=8)
    ids = jnp.asarray([[1, 5, 31], [0, 2, 2]])
    got = np.asarray(embed_lookup(qe, ids, dtype=jnp.float32))
    want = np.asarray(jnp.take(emb, ids, axis=0))
    assert np.max(np.abs(got - want)) <= float(np.max(np.asarray(qe["s"]))) / 2 + 1e-6

    hidden = jnp.asarray(rng.normal(size=(1, 2, 16)).astype(np.float32))
    lg = np.asarray(tied_head_logits(hidden, qe))
    lw = np.asarray(jnp.einsum("bsh,vh->bsv", hidden, emb))
    assert np.allclose(lg, lw, atol=0.2)
    assert lg.dtype == np.float32


def _snap_to_grid(params):
    """Snap every quantizable weight onto its own int8 grid (lossless quant)."""

    def snap(w, contract_axis=-2):
        amax = jnp.max(jnp.abs(w), axis=contract_axis, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        return (jnp.round(w / s) * s).astype(w.dtype)

    p = jax.tree.map(lambda x: x, params)  # copy structure
    t = p["text"]
    for k in ("q_w", "k_w", "v_w", "o_w"):
        t["layers"]["self_attn"][k] = snap(t["layers"]["self_attn"][k])
    for k in ("gate_w", "up_w", "down_w"):
        t["layers"]["mlp"][k] = snap(t["layers"]["mlp"][k])
    t["embed_tokens"]["embedding"] = snap(t["embed_tokens"]["embedding"], contract_axis=-1)
    if "lm_head" in t:
        t["lm_head"]["kernel"] = snap(t["lm_head"]["kernel"])
    return p


@pytest.mark.parametrize("tie", [True, False])
def test_quantized_forward_matches_on_grid_weights(tie):
    cfg = Qwen25VLConfig.tiny_test()
    if tie:
        from dataclasses import replace

        cfg = replace(cfg, text=replace(cfg.text, tie_word_embeddings=True))
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = _snap_to_grid(params)
    qparams = quantize_params(params, bits=8)

    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(2, 200, size=(2, 9)))
    pos = jnp.broadcast_to(jnp.arange(9)[None, None, :], (3, 2, 9))
    full, _ = forward(params, cfg, ids, pos)
    quant, _ = forward(qparams, cfg, ids, pos)
    # lossless grid: logits match to float tolerance, argmax exactly
    np.testing.assert_array_equal(
        np.argmax(np.asarray(full), -1), np.argmax(np.asarray(quant), -1)
    )
    assert np.max(np.abs(np.asarray(full) - np.asarray(quant))) < 2e-2


def test_quantized_forward_close_on_random_weights():
    cfg = Qwen25VLConfig.tiny_test()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    qparams = quantize_params(params, bits=8)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(2, 200, size=(1, 12)))
    pos = jnp.broadcast_to(jnp.arange(12)[None, None, :], (3, 1, 12))
    full, _ = forward(params, cfg, ids, pos)
    quant, _ = forward(qparams, cfg, ids, pos)
    f, q = np.asarray(full).ravel(), np.asarray(quant).ravel()
    corr = np.corrcoef(f, q)[0, 1]
    assert corr > 0.999, corr


def test_engine_quantized_greedy_equivalence_on_grid_weights():
    from time_r1_tpu.sampler import Engine, Request, SamplingParams

    cfg = Qwen25VLConfig.tiny_test()
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    params = _snap_to_grid(params)
    sp = SamplingParams(temperature=0.0, max_new_tokens=8)
    req = Request(input_ids=list(range(2, 12)))
    base = Engine(params, cfg, dtype=jnp.float32).generate([req], sp)
    quant = Engine(params, cfg, dtype=jnp.float32, quantization="int8").generate([req], sp)
    assert base == quant


def test_quantize_kv_roundtrip_error_bound():
    from time_r1_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(3, 7, 2, 16)).astype(np.float32))
    q8, s = quantize_kv(x)
    deq = q8.astype(jnp.float32) * s[..., None]
    assert np.all(np.abs(np.asarray(deq - x)) <= np.asarray(s)[..., None] / 2 + 1e-7)


def test_decode_with_int8_kv_cache_close_to_bf16():
    """One cached decode step with the int8 KV cache must track the full-
    precision path closely (and exactly where the cache is short)."""
    from time_r1_tpu.models.qwen25vl import KVCache, forward
    from time_r1_tpu.ops.quant import quantize_kv_cache

    cfg = Qwen25VLConfig.tiny_test()
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.default_rng(7)
    B, S, max_len = 2, 6, 16
    ids = jnp.asarray(rng.integers(2, 200, size=(B, S)))
    pos = jnp.broadcast_to(jnp.arange(S)[None, None, :], (3, B, S))
    mask = jnp.ones((B, max_len), jnp.int32)

    cache = KVCache.zeros(cfg.text, B, max_len, dtype=jnp.float32)
    _, cache = forward(params, cfg, ids, pos, attention_mask=mask, cache=cache)

    nxt = jnp.asarray(rng.integers(2, 200, size=(B, 1)))
    pos1 = jnp.full((3, B, 1), S)
    full, _ = forward(params, cfg, nxt, pos1, attention_mask=mask, cache=cache)
    qcache = quantize_kv_cache(cache)
    assert qcache.k.dtype == jnp.int8 and qcache.k_scale is not None
    quant, qcache2 = forward(params, cfg, nxt, pos1, attention_mask=mask, cache=qcache)
    # new token written quantized, length advanced
    assert qcache2.k.dtype == jnp.int8
    assert int(qcache2.length) == S + 1
    f, q = np.asarray(full).ravel(), np.asarray(quant).ravel()
    corr = np.corrcoef(f, q)[0, 1]
    assert corr > 0.999, corr
    np.testing.assert_array_equal(np.argmax(np.asarray(full), -1), np.argmax(np.asarray(quant), -1))


def test_engine_kv_cache_quant_runs():
    from time_r1_tpu.sampler import Engine, Request, SamplingParams

    cfg = Qwen25VLConfig.tiny_test()
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop_token_ids=cfg.stop_token_ids)
    rng = np.random.default_rng(8)
    reqs = [Request(input_ids=list(rng.integers(2, 200, 9))),
            Request(input_ids=list(rng.integers(2, 200, 14)))]
    out = Engine(params, cfg, dtype=jnp.float32, kv_cache_quant=True).generate(reqs, sp)
    assert len(out) == 2
    for row in out:
        assert 0 < len(row) <= sp.max_new_tokens


def test_fused_mlp_kernel_matches_qmatmul_path():
    """Pallas fused int8 MLP (interpret mode) vs the unfused qmatmul math."""
    from time_r1_tpu.ops.fused_mlp import fused_mlp_int8
    from time_r1_tpu.ops.quant import qmatmul

    rng = np.random.default_rng(9)
    B, hid, inter = 8, 256, 512
    x = jnp.asarray(rng.normal(size=(B, hid)).astype(np.float32), jnp.float32)
    gu_q8 = jnp.asarray(rng.integers(-127, 128, size=(hid, 2 * inter), dtype=np.int8))
    gu_s = jnp.asarray(rng.uniform(0.001, 0.01, size=(1, 2 * inter)).astype(np.float32))
    dn_q8 = jnp.asarray(rng.integers(-127, 128, size=(inter, hid), dtype=np.int8))
    dn_s = jnp.asarray(rng.uniform(0.001, 0.01, size=(1, hid)).astype(np.float32))

    got = np.asarray(
        fused_mlp_int8(x.astype(jnp.bfloat16), gu_q8, gu_s, dn_q8, dn_s, interpret=True)
    ).astype(np.float32)

    # f32 oracle of the same math (both the kernel and the qmatmul path are
    # bf16 approximations of this)
    xf = np.asarray(x, np.float32)
    yf = xf @ np.asarray(gu_q8, np.float32) * np.asarray(gu_s)
    gate_f, up_f = np.split(yf, 2, axis=-1)
    silu = gate_f / (1.0 + np.exp(-gate_f))
    want = (silu * up_f) @ np.asarray(dn_q8, np.float32) * np.asarray(dn_s)

    scale = np.sqrt(np.mean(want**2))
    rms = np.sqrt(np.mean((got - want) ** 2)) / scale
    assert rms < 0.01, rms  # bf16-accumulation tolerance
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.9999, corr

    # and the unfused bf16 path lands within the same tolerance of the kernel
    gu = {"q8": gu_q8, "s": gu_s}
    dn = {"q8": dn_q8, "s": dn_s}
    y = qmatmul(x.astype(jnp.bfloat16), gu)
    gate, up = jnp.split(y, 2, axis=-1)
    unfused = np.asarray(qmatmul(jax.nn.silu(gate) * up, dn)).astype(np.float32)
    rms2 = np.sqrt(np.mean((got - unfused) ** 2)) / scale
    assert rms2 < 0.02, rms2


def test_quantized_base_lora_training_path():
    """7B-on-one-chip training configuration (VERDICT r4 #1): the GRPO LoRA
    loss runs over an int8 UNFUSED base (quantize_params(fuse=False) — names
    keep q_w/k_w/... so adapters line up) with per-layer dequant-merge inside
    the scan (rl/lora.apply_layer_lora), int8 row-quantized embedding lookup
    and int8 head logits (grpo.per_token_logps_entropy).

    Two claims, two tolerances:
    1. pipeline correctness — int8-base loss == loss over the DEQUANTIZED
       bf16 tree merged conventionally (isolates wiring from quant error);
    2. numerics documentation — int8-base logps vs the fp32-base oracle
       drift by quantization error only (weights round to ±0.4% of their
       per-channel amax; logp drift stays well under one nat).
    """
    import jax
    import jax.numpy as jnp

    from test_grpo import _mk_groups
    from test_model_parity import CFG  # the tiny config _mk_groups builds for
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.ops.quant import dequantize_weight, is_quantized, quantize_params
    from time_r1_tpu.rl import GRPOHyperParams, grpo_loss
    from time_r1_tpu.rl.lora import LoRAConfig, init_lora, lora_layers_tree, merge_lora
    from time_r1_tpu.rl.rollout import build_grpo_split_batch

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    hp = GRPOHyperParams(
        num_generations=3, beta=0.0, use_grpo=False, fix_vit=True,
        gradient_checkpointing=True,
    )
    batch = build_grpo_split_batch(CFG, _mk_groups(True, G=3, P=2), dtype=jnp.float32)

    lcfg = LoRAConfig(rank=4, alpha=8.0)
    lora = init_lora(params, lcfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    lora = {k: v for k, v in lora.items() if not k.startswith("visual")}
    lora = jax.tree.map(lambda a: a + 0.01, lora)  # nontrivial merge

    q_base = quantize_params(params, bits=8, fuse=False)
    tree, rest = lora_layers_tree(lora)
    assert not rest

    def lora_loss(base):
        return grpo_loss(base, CFG, hp, batch, lora=(tree, lcfg.scaling))

    l_q, m_q = lora_loss(q_base)

    # (1) wiring oracle: dequantize every quantized leaf to bf16 and merge
    # conventionally — must match the in-scan dequant-merge path closely
    # (differences are bf16 reassociation only)
    def deq_leaf(x):
        return dequantize_weight(x, dtype=jnp.bfloat16) if is_quantized(x) else x

    deq = jax.tree.map(deq_leaf, q_base, is_leaf=is_quantized)
    l_d, m_d = grpo_loss(merge_lora(deq, lora, lcfg), CFG, hp, batch)
    np.testing.assert_allclose(float(l_q), float(l_d), rtol=2e-2, atol=2e-3)

    # (2) numerics vs the fp32 base: quantization-error-sized drift only
    l_f, m_f = grpo_loss(merge_lora(params, lora, lcfg), CFG, hp, batch)
    assert abs(float(m_q["generation_entropy"]) - float(m_f["generation_entropy"])) < 0.25, (
        float(m_q["generation_entropy"]), float(m_f["generation_entropy"]),
    )

    # gradients flow to the adapters through the quantized base
    g = jax.grad(lambda ad: grpo_loss(
        q_base, CFG, hp, batch, lora=(lora_layers_tree(ad)[0], lcfg.scaling)
    )[0])(lora)
    assert all(float(jnp.abs(x).max()) > 0 for x in jax.tree.leaves(g))


def test_fused_base_lora_training_matches_unfused():
    """The round-5 single-chip 7B training layout: the int8 base keeps the
    decode-FUSED qkv/gu tensors (rollouts over the shared tree stream the
    same fewer-but-wider dots as pure serving) and the in-scan merge adds the
    per-projection LoRA deltas as ONE concatenated column-block delta
    (rl/lora.apply_layer_lora).

    Per-output-channel scales make quantize(concat) == concat(quantize)
    BIT-exactly, and a matmul against column-concatenated weights is blockwise
    the same reduction — so loss AND adapter grads over the fused base must
    match the unfused base to float tolerance."""
    import jax
    import jax.numpy as jnp

    from test_grpo import _mk_groups
    from test_model_parity import CFG
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.ops.quant import quantize_params
    from time_r1_tpu.rl import GRPOHyperParams, grpo_loss
    from time_r1_tpu.rl.lora import (
        LoRAConfig,
        fused_splits_for,
        init_lora,
        lora_layers_tree,
    )
    from time_r1_tpu.rl.rollout import build_grpo_split_batch

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    q_unfused = quantize_params(params, bits=8, fuse=False)
    q_fused = quantize_params(params, bits=8, fuse=True)

    # fused quantization is BIT-identical to unfused (per-output-channel scales)
    attn_u = q_unfused["text"]["layers"]["self_attn"]
    attn_f = q_fused["text"]["layers"]["self_attn"]
    np.testing.assert_array_equal(
        np.asarray(attn_f["qkv"]["q8"]),
        np.concatenate(
            [np.asarray(attn_u[k]["q8"]) for k in ("q_w", "k_w", "v_w")], axis=-1
        ),
    )
    np.testing.assert_array_equal(
        np.asarray(attn_f["qkv"]["s"]),
        np.concatenate(
            [np.asarray(attn_u[k]["s"]) for k in ("q_w", "k_w", "v_w")], axis=-1
        ),
    )

    lcfg = LoRAConfig(rank=4, alpha=8.0)
    # adapters over the fused base carry the same names/shapes as unfused
    lora_f = init_lora(
        q_fused, lcfg, jax.random.PRNGKey(7), dtype=jnp.float32,
        fused_splits=fused_splits_for(CFG.text),
    )
    lora_u = init_lora(q_unfused, lcfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    assert set(lora_f) == set(lora_u)
    for k in lora_u:
        assert lora_f[k]["lora_a"].shape == lora_u[k]["lora_a"].shape, k
        assert lora_f[k]["lora_b"].shape == lora_u[k]["lora_b"].shape, k

    lora = {k: v for k, v in lora_u.items() if not k.startswith("visual")}
    lora = jax.tree.map(lambda a: a + 0.01, lora)  # nontrivial merge
    tree, rest = lora_layers_tree(lora)
    assert not rest

    hp = GRPOHyperParams(
        num_generations=3, beta=0.04, use_grpo=False, fix_vit=True,
        gradient_checkpointing=True,
    )
    batch = build_grpo_split_batch(CFG, _mk_groups(True, G=3, P=2), dtype=jnp.float32)

    def loss_of(base, ad):
        return grpo_loss(
            base, CFG, hp, batch, lora=(lora_layers_tree(ad)[0], lcfg.scaling)
        )[0]

    (l_f, g_f) = jax.value_and_grad(lambda ad: loss_of(q_fused, ad))(lora)
    (l_u, g_u) = jax.value_and_grad(lambda ad: loss_of(q_unfused, ad))(lora)
    np.testing.assert_allclose(float(l_f), float(l_u), rtol=1e-5, atol=1e-6)
    for k in g_u:
        for n in ("lora_a", "lora_b"):
            # scale-normalized: XLA blocks the wider fused dot differently →
            # f32 reassociation noise, amplified through softmax/loss
            # (measured ≤1.6% of the leaf's grad scale). A wiring bug
            # (swapped k/v column blocks, wrong widths) would be ~100%.
            gf, gu = np.asarray(g_f[k][n]), np.asarray(g_u[k][n])
            scale = np.abs(gu).max() + 1e-8
            diff = np.abs(gf - gu).max() / scale
            assert diff < 2e-2, (f"{k}/{n}", diff, scale)


def test_quantized_checkpoint_roundtrip_preserves_layout(tmp_path):
    """A quantized-base run saves int8 {q8, s} trees (cli/train
    --train_base_quantization → save_checkpoint); load_checkpoint must give
    them back BIT-exactly — q8 stays int8 (not cast to the bf16 model
    dtype) and the f32 scales keep full precision. The SF loop's round
    handoff reloads checkpoints through exactly this path."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from test_model_parity import CFG
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.models.qwen25vl.convert import (
        config_to_plain_dict,
        load_checkpoint,
    )
    from time_r1_tpu.ops.quant import quantize_params
    from time_r1_tpu.utils.checkpoint import save_params

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_params(params, bits=8, fuse=True)
    save_params(str(tmp_path), q)
    (tmp_path / "timer1_config.json").write_text(_json.dumps(config_to_plain_dict(CFG)))

    loaded, cfg2 = load_checkpoint(str(tmp_path))
    attn = loaded["text"]["layers"]["self_attn"]
    assert attn["qkv"]["q8"].dtype == jnp.int8
    assert attn["qkv"]["s"].dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(attn["qkv"]["q8"]),
        np.asarray(q["text"]["layers"]["self_attn"]["qkv"]["q8"]),
    )
    np.testing.assert_array_equal(
        np.asarray(attn["qkv"]["s"]),
        np.asarray(q["text"]["layers"]["self_attn"]["qkv"]["s"]),
    )
    # non-quantized leaves still land in the model dtype
    assert loaded["text"]["norm"]["scale"].dtype == jnp.bfloat16
