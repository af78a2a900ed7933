"""Pallas flash attention vs reference SDPA: forward and gradients (fwd+bwd
kernel parity, interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from time_r1_tpu.ops.attention import mha_reference
from time_r1_tpu.ops.flash_attention import (
    NEG_INF,
    flash_attention,
    flash_attention_shared_prefix,
)


def _ref_with_kv_bias(q, k, v, kv_bias, causal, q_offset=0):
    B, Sq = q.shape[0], q.shape[1]
    Skv = k.shape[1]
    bias = kv_bias[:, None, None, :]
    if causal:
        q_pos = q_offset + jnp.arange(Sq)[:, None]
        kv_pos = jnp.arange(Skv)[None, :]
        causal_bias = jnp.where(kv_pos <= q_pos, 0.0, NEG_INF)[None, None]
        bias = bias + causal_bias
    return mha_reference(q, k, v, bias=bias)


CASES = [
    # (B, Sq, Skv, H, Hkv, D, causal, q_offset, n_pad)
    (2, 128, 128, 4, 2, 64, True, 0, 0),
    (1, 256, 256, 4, 4, 64, True, 0, 32),
    (2, 128, 256, 4, 2, 64, True, 128, 0),  # cached prefix (decode-chunk)
    (1, 128, 128, 2, 1, 64, False, 0, 16),
]


@pytest.mark.parametrize("B,Sq,Skv,H,Hkv,D,causal,q_offset,n_pad", CASES)
def test_flash_forward_matches_reference(B, Sq, Skv, H, Hkv, D, causal, q_offset, n_pad):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Sq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Skv, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Skv, Hkv, D)), jnp.float32)
    kv_bias = jnp.zeros((B, Skv), jnp.float32)
    if n_pad:
        kv_bias = kv_bias.at[:, :n_pad].set(NEG_INF)  # left padding

    out = flash_attention(q, k, v, kv_bias, causal, None, q_offset)
    want = _ref_with_kv_bias(q, k, v, kv_bias, causal, q_offset)
    # rows whose keys are ALL masked are garbage in both impls (flash → 0,
    # ref → uniform mean); they are pad queries masked downstream — skip them
    valid_q = np.ones((Sq,), bool)
    if causal and n_pad:
        valid_q[: max(0, n_pad - q_offset)] = False
    np.testing.assert_allclose(
        np.asarray(out)[:, valid_q], np.asarray(want)[:, valid_q], atol=2e-5, rtol=2e-5
    )


def test_flash_gradients_match_reference():
    B, Sq, H, Hkv, D = 1, 128, 4, 2, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, Sq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Sq, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Sq, Hkv, D)), jnp.float32)
    kv_bias = jnp.zeros((B, Sq), jnp.float32).at[:, :16].set(NEG_INF)
    g = jnp.asarray(rng.normal(size=(B, Sq, H, D)), jnp.float32)
    g = g.at[:, :16].set(0.0)  # no cotangent on pad (all-masked) query rows

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_bias, True, None, 0) * g)

    def f_ref(q, k, v):
        return jnp.sum(_ref_with_kv_bias(q, k, v, kv_bias, True) * g)

    gq, gk, gv = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=5e-4, rtol=5e-4)


# ---------------------------------------------------------------------------
# Shared-prefix kernel: B = P·R rows attend [their prompt's prefix | own
# causal chunk]; backward must sum each prompt's prefix grads over its R rows
# ---------------------------------------------------------------------------


def _ref_shared_prefix(q, kp, vp, ko, vo, prefix_bias):
    B, Sc = q.shape[0], q.shape[1]
    P, Lp = kp.shape[0], kp.shape[1]
    R = B // P
    k_all = jnp.concatenate([jnp.repeat(kp, R, axis=0), ko], axis=1)
    v_all = jnp.concatenate([jnp.repeat(vp, R, axis=0), vo], axis=1)
    kv_bias = jnp.concatenate(
        [jnp.repeat(prefix_bias, R, axis=0), jnp.zeros((B, Sc), jnp.float32)], axis=1
    )
    return _ref_with_kv_bias(q, k_all, v_all, kv_bias, True, q_offset=Lp)


def _sp_inputs(P=2, R=3, Lp=256, Sc=128, H=4, Hkv=2, D=64, n_pad=32, seed=2):
    rng = np.random.default_rng(seed)
    B = P * R
    q = jnp.asarray(rng.normal(size=(B, Sc, H, D)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.float32)
    ko = jnp.asarray(rng.normal(size=(B, Sc, Hkv, D)), jnp.float32)
    vo = jnp.asarray(rng.normal(size=(B, Sc, Hkv, D)), jnp.float32)
    prefix_bias = jnp.zeros((P, Lp), jnp.float32)
    if n_pad:
        prefix_bias = prefix_bias.at[0, :n_pad].set(NEG_INF)  # ragged prompts
    return q, kp, vp, ko, vo, prefix_bias


@pytest.mark.parametrize("R", [1, 3])
def test_shared_prefix_forward_matches_reference(R):
    q, kp, vp, ko, vo, prefix_bias = _sp_inputs(R=R)
    out = flash_attention_shared_prefix(q, kp, vp, ko, vo, prefix_bias)
    want = _ref_shared_prefix(q, kp, vp, ko, vo, prefix_bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_shared_prefix_gradients_match_reference():
    q, kp, vp, ko, vo, prefix_bias = _sp_inputs(Lp=128, Sc=128, R=2)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    def f_sp(q, kp, vp, ko, vo):
        return jnp.sum(flash_attention_shared_prefix(q, kp, vp, ko, vo, prefix_bias) * g)

    def f_ref(q, kp, vp, ko, vo):
        return jnp.sum(_ref_shared_prefix(q, kp, vp, ko, vo, prefix_bias) * g)

    got = jax.grad(f_sp, argnums=(0, 1, 2, 3, 4))(q, kp, vp, ko, vo)
    want = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(q, kp, vp, ko, vo)
    for name, a, b in zip("q kp vp ko vo".split(), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_shared_prefix_nondividing_chunk_block():
    """Regression: block_k is picked from Lp alone, so Lp=384 selects
    block_k=384 while Sc=512 is not a multiple of it — the own-chunk loop
    previously sliced past the chunk (clamped/garbage keys; wrong output in
    interpret mode, latent OOB on TPU). The own-chunk block must be re-picked
    as a divisor of Sc."""
    q, kp, vp, ko, vo, prefix_bias = _sp_inputs(Lp=384, Sc=512, R=2)
    out = flash_attention_shared_prefix(q, kp, vp, ko, vo, prefix_bias)
    want = _ref_shared_prefix(q, kp, vp, ko, vo, prefix_bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=2e-5)

    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    def f_sp(q, ko):
        return jnp.sum(flash_attention_shared_prefix(q, kp, vp, ko, vo, prefix_bias) * g)

    def f_ref(q, ko):
        return jnp.sum(_ref_shared_prefix(q, kp, vp, ko, vo, prefix_bias) * g)

    got = jax.grad(f_sp, argnums=(0, 1))(q, ko)
    want_g = jax.grad(f_ref, argnums=(0, 1))(q, ko)
    for name, a, b in zip("q ko".split(), got, want_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_shared_prefix_rejects_nonblock_shapes():
    """(Lp=320, Sc=128) and (Lp=256, Sc=192): one of Lp/Sc divides no block
    candidate; the op must reject (ValueError — survives python -O) instead of
    silently truncating the prefix loop / leaving q rows unwritten."""
    q, kp, vp, ko, vo, prefix_bias = _sp_inputs(Lp=320, Sc=128, R=1)
    with pytest.raises(ValueError):
        flash_attention_shared_prefix(q, kp, vp, ko, vo, prefix_bias)
    q, kp, vp, ko, vo, prefix_bias = _sp_inputs(Lp=256, Sc=192, R=1)
    with pytest.raises(ValueError):
        flash_attention_shared_prefix(q, kp, vp, ko, vo, prefix_bias)
