"""Round-trip tests: params → HF state dict → params; LoRA merge semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from time_r1_tpu.models.qwen25vl import init_params
from time_r1_tpu.models.qwen25vl.convert import convert_state_dict, export_state_dict
from time_r1_tpu.rl.lora import LoRAConfig, init_lora, merge_lora


def test_export_import_roundtrip():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    sd = export_state_dict(params, CFG)
    back = convert_state_dict(sd, CFG, dtype=jnp.float32)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6, err_msg=str(pa))


def test_lora_identity_at_init_and_nonidentity_after():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    lcfg = LoRAConfig(rank=4, targets=("q_w", "o_w"))
    lora = init_lora(params["text"], lcfg, jax.random.PRNGKey(1))
    assert set(lora.keys()) == {"layers/self_attn/q_w", "layers/self_attn/o_w"}

    merged = {**params, "text": merge_lora(params["text"], lora, lcfg)}
    # B=0 at init → merged == base
    np.testing.assert_array_equal(
        np.asarray(merged["text"]["layers"]["self_attn"]["q_w"]),
        np.asarray(params["text"]["layers"]["self_attn"]["q_w"]),
    )
    # non-adapted weights are the same objects (no copies)
    assert merged["text"]["layers"]["mlp"]["gate_w"] is params["text"]["layers"]["mlp"]["gate_w"]

    # after perturbing B, merged differs by scaling·A@B
    lora2 = jax.tree.map(lambda x: x, lora)
    lora2["layers/self_attn/q_w"]["lora_b"] = (
        jnp.ones_like(lora["layers/self_attn/q_w"]["lora_b"]) * 0.1
    )
    merged2 = merge_lora(params["text"], lora2, lcfg)
    delta = (
        jnp.einsum(
            "lir,lro->lio",
            lora2["layers/self_attn/q_w"]["lora_a"],
            lora2["layers/self_attn/q_w"]["lora_b"],
        )
        * lcfg.scaling
    )
    np.testing.assert_allclose(
        np.asarray(merged2["layers"]["self_attn"]["q_w"]),
        np.asarray(params["text"]["layers"]["self_attn"]["q_w"] + delta),
        rtol=1e-5,
    )


def test_lora_gradients_flow_through_merge():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    lcfg = LoRAConfig(rank=2, targets=("q_w",))
    lora = init_lora(params["text"], lcfg, jax.random.PRNGKey(1))

    def loss(lora):
        merged = merge_lora(params["text"], lora, lcfg)
        return jnp.sum(merged["layers"]["self_attn"]["q_w"] ** 2)

    g = jax.grad(loss)(lora)
    # at init B=0 → dL/dA = 0 but dL/dB ∝ A^T·(2W) ≠ 0
    assert float(jnp.abs(g["layers/self_attn/q_w"]["lora_b"]).max()) > 0
