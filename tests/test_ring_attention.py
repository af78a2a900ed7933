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


@pytest.mark.parametrize("n,pad", [(2, 0), (4, 192), (4, 64)])
def test_zigzag_matches_flash_forward(n, pad):
    """Balanced zig-zag layout (shard r holds chunks r and 2n-1-r): causal
    ring output must match the single-device flash kernel in ORIGINAL
    order (the wrapper permutes in/out)."""
    from time_r1_tpu.parallel.ring_attention import ring_attention_zigzag_sharded

    q, k, v, bias = _inputs(seed=11, pad=pad)
    ref = flash_attention(q, k, v, bias, True)
    out = ring_attention_zigzag_sharded(q, k, v, bias, _mesh(n))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_zigzag_matches_flash_grads():
    from time_r1_tpu.parallel.ring_attention import ring_attention_zigzag_sharded

    n, pad = 4, 128
    q, k, v, bias = _inputs(seed=13, pad=pad)
    mesh = _mesh(n)
    rng = np.random.default_rng(17)
    ct = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, True) * ct)

    def loss_zz(q, k, v):
        return jnp.sum(ring_attention_zigzag_sharded(q, k, v, bias, mesh) * ct)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_zz = jax.grad(loss_zz, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_zz, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5, err_msg=f"d{name}"
        )


def test_zigzag_indices_roundtrip():
    from time_r1_tpu.parallel.ring_attention import zigzag_indices, zigzag_inverse

    idx = zigzag_indices(16, 2)
    # shard 0: chunks 0 and 3; shard 1: chunks 1 and 2 (chunk size 4)
    np.testing.assert_array_equal(
        idx, [0, 1, 2, 3, 12, 13, 14, 15, 4, 5, 6, 7, 8, 9, 10, 11]
    )
    inv = zigzag_inverse(16, 2)
    np.testing.assert_array_equal(np.arange(16), idx[inv])
    np.testing.assert_array_equal(np.arange(16), inv[idx])
