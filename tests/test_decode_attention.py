"""Fused decode-attention kernel vs the SDPA reference."""

import numpy as np

import jax.numpy as jnp

from time_r1_tpu.ops.attention import NEG_INF, mha_reference
from time_r1_tpu.ops.decode_attention import decode_attention


def test_decode_attention_matches_reference():
    rng = np.random.default_rng(0)
    B, S, H, Hkv, D = 4, 256, 16, 2, 128
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    # per-row valid prefix (decode semantics: kv_pos <= length)
    lengths = np.array([100, 17, 255, 256])
    bias = np.zeros((B, S), np.float32)
    for b, L in enumerate(lengths):
        bias[b, L:] = NEG_INF
    biasj = jnp.asarray(bias)

    got = decode_attention(q, k, v, biasj)
    want = mha_reference(q[:, None], k, v, bias=biasj[:, None, None, :])[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
