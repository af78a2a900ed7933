"""Sequence-parallel decoder (parallel/ring_attention.sequence_parallel_decoder):
the ring-attention sharded forward must match the plain single-device
decoder_forward, including padding, and param/embedding grads must survive the
shard_map transpose (psum of replicated-param cotangents)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from time_r1_tpu.models.qwen25vl import init_params
from time_r1_tpu.models.qwen25vl.language import decoder_forward
from time_r1_tpu.parallel.ring_attention import sequence_parallel_decoder

B, S = 2, 512  # 4 shards x 128 local tokens


def _setup(seed=0):
    cfg = CFG.text
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)["text"]
    rng = np.random.default_rng(seed)
    embeds = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(S)[None, None, :], (3, B, S)).astype(jnp.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, S - 64 :] = 0  # right padding on one row
    return cfg, params, embeds, pos, jnp.asarray(mask)


def _mesh(n):
    return jax.sharding.Mesh(np.array(jax.devices()[:n]).reshape(n), ("data",))


@pytest.mark.parametrize("n", [2, 4])
def test_sp_decoder_matches_plain(n):
    cfg, params, embeds, pos, mask = _setup()
    want, _ = decoder_forward(params, cfg, embeds, pos, attention_mask=mask)
    got = sequence_parallel_decoder(params, cfg, embeds, pos, mask, _mesh(n))
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], rtol=3e-5, atol=3e-5
    )


def test_sp_decoder_param_grads_match():
    cfg, params, embeds, pos, mask = _setup(seed=3)
    mesh = _mesh(4)
    rng = np.random.default_rng(7)
    ct = jnp.asarray(
        (rng.standard_normal((B, S, cfg.hidden_size)) * np.asarray(mask)[..., None]).astype(
            np.float32
        )
    )

    def loss_plain(params, embeds):
        out, _ = decoder_forward(params, cfg, embeds, pos, attention_mask=mask)
        return jnp.sum(out * ct)

    def loss_sp(params, embeds):
        out = sequence_parallel_decoder(params, cfg, embeds, pos, mask, mesh)
        return jnp.sum(out * ct)

    g_ref = jax.grad(loss_plain, argnums=(0, 1))(params, embeds)
    g_sp = jax.grad(loss_sp, argnums=(0, 1))(params, embeds)
    flat_ref = jax.tree.leaves_with_path(g_ref)
    flat_sp = jax.tree.leaves(g_sp)
    for (path, a), b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(
            np.asarray(b),
            np.asarray(a),
            rtol=2e-4,
            atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("n", [2])
def test_sp_decoder_zigzag_matches_plain(n):
    """Balanced zig-zag layout: permute in, ring over paired chunks, permute
    out — must match the plain decoder exactly like the contiguous layout."""
    cfg, params, embeds, pos, mask = _setup(seed=5)
    want, _ = decoder_forward(params, cfg, embeds, pos, attention_mask=mask)
    got = sequence_parallel_decoder(
        params, cfg, embeds, pos, mask, _mesh(n), layout="zigzag"
    )
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], rtol=3e-5, atol=3e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 virtual devices")
@pytest.mark.parametrize("layout", ["zigzag", "contiguous"])
def test_grpo_loss_cp_matches_plain(layout):
    """The context-parallel GRPO loss forward (grpo_loss(cp=...), wired to
    --context_parallel_size) must match the plain full-row loss AND its
    parameter gradients — the reachable-API check for SURVEY §5.7's
    long-context stretch goal."""
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.rl import GRPOHyperParams, build_grpo_batch_groups
    from time_r1_tpu.rl.grpo import grpo_loss

    n = 2
    mesh = _mesh(n)
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(31)
    G = 2
    groups = [
        {
            "prompt_ids": list(rng.integers(2, 200, 9)),
            "completions": [
                list(rng.integers(2, 200, 4)) + [CFG.eos_token_id] for _ in range(G)
            ],
            "advantages": rng.normal(size=G).astype(np.float32),
        }
    ]
    mult = (2 if layout == "zigzag" else 1) * n * 128
    batch = build_grpo_batch_groups(CFG, groups, dtype=jnp.float32, pad_multiple=mult)
    assert batch.input_ids.shape[1] % mult == 0
    hp = GRPOHyperParams(num_generations=G, beta=0.0, use_grpo=False, fix_vit=True)

    (l_p, m_p), g_p = jax.value_and_grad(
        lambda p: grpo_loss(p, CFG, hp, batch), has_aux=True
    )(params)
    (l_c, m_c), g_c = jax.value_and_grad(
        lambda p: grpo_loss(p, CFG, hp, batch, cp=(mesh, "data", layout)), has_aux=True
    )(params)
    np.testing.assert_allclose(float(l_c), float(l_p), rtol=3e-5, atol=3e-6)
    for k in m_p:
        np.testing.assert_allclose(float(m_c[k]), float(m_p[k]), rtol=3e-4, atol=3e-5)
    for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=8e-4, atol=8e-5)
