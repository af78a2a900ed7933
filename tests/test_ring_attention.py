"""Ring attention (context parallelism) vs single-device flash attention.

Forward and gradients must match the non-ring Pallas flash kernel bitwise-ish
(f32 accumulate both sides; merge order differs → small tolerance) on the
8-device virtual CPU mesh, including GQA and kv-side padding bias.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from time_r1_tpu.ops.flash_attention import NEG_INF, flash_attention
from time_r1_tpu.parallel.ring_attention import ring_attention_sharded

B, S, H, HKV, D = 2, 1024, 4, 2, 64


def _mesh(n):
    return jax.sharding.Mesh(np.array(jax.devices()[:n]).reshape(n), ("data",))


def _inputs(seed=0, pad=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, HKV, D)), jnp.float32)
    bias = np.zeros((B, S), np.float32)
    if pad:
        bias[:, S - pad :] = NEG_INF
    return q, k, v, jnp.asarray(bias)


@pytest.mark.parametrize("n,causal,pad", [(4, True, 0), (8, True, 192), (4, False, 64)])
def test_ring_matches_flash_forward(n, causal, pad):
    q, k, v, bias = _inputs(pad=pad)
    ref = flash_attention(q, k, v, bias, causal)
    out = ring_attention_sharded(q, k, v, bias, _mesh(n), causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_matches_flash_grads():
    n, causal, pad = 4, True, 128
    q, k, v, bias = _inputs(seed=3, pad=pad)
    mesh = _mesh(n)
    rng = np.random.default_rng(7)
    ct = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, causal) * ct)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention_sharded(q, k, v, bias, mesh, causal=causal) * ct)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5, err_msg=f"d{name}"
        )


def test_ring_padded_rows_zero():
    # fully-padded tail rows produce zero attention output (no nan from the
    # empty-merge path on shards whose kv is entirely masked)
    q, k, v, bias = _inputs(seed=5, pad=S // 2)
    out = ring_attention_sharded(q, k, v, bias, _mesh(8), causal=False)
    assert np.isfinite(np.asarray(out)).all()
