"""shared_prefix_decode_attention kernel vs the mha_shared_prefix oracle:
the kernel's prefix pass + merge_shared_tail must reproduce the combined
softmax over [shared prefix | own suffix | new token] (decode S=1 shape),
for bf16 and int8-scaled prefixes, with left-pad bias masking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from time_r1_tpu.ops.attention import mha_shared_prefix
from time_r1_tpu.ops.decode_attention import (
    merge_shared_tail,
    shared_prefix_decode_attention,
)

NEG_INF = -1e30


def _quant(x, axis):
    """Per-(token, head) symmetric int8 quantization like ops/quant.quantize_kv."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("P,R", [(1, 8), (2, 4)])
def test_kernel_matches_shared_prefix_oracle(quant, P, R):
    H, Hkv, D = 16, 2, 128
    G = H // Hkv
    B = P * R
    Lp, Lo, pad = 256, 128, 40
    own_len = 17
    rng = np.random.default_rng(0)

    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.float32)
    ko = jnp.asarray(rng.normal(size=(B, Lo, Hkv, D)), jnp.float32)
    vo = jnp.asarray(rng.normal(size=(B, Lo, Hkv, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)

    # left-pad masking as engine._pack produces it
    bias_pref = jnp.where(jnp.arange(Lp)[None, :] < pad, NEG_INF, 0.0).astype(
        jnp.float32
    ).repeat(P, axis=0).reshape(P, Lp)
    own_valid = jnp.arange(Lo)[None, :] < own_len
    bias_own = jnp.where(own_valid, 0.0, NEG_INF).astype(jnp.float32)[None, None]
    bias_new = jnp.zeros((1, 1, 1, 1), jnp.float32)

    if quant:
        kp_q, kps = _quant(kp, axis=-1)
        vp_q, vps = _quant(vp, axis=-1)
        ko_q, kos = _quant(ko, axis=-1)
        vo_q, vos = _quant(vo, axis=-1)
    else:
        kp_q, vp_q, kps, vps = kp, vp, None, None
        ko_q, vo_q, kos, vos = ko, vo, None, None

    want = mha_shared_prefix(
        q, kp_q, vp_q, kps, vps, ko_q, vo_q, kos, vos, kn, vn,
        bias_pref[:, None, None, :], bias_own, bias_new,
    )

    # kernel path: head-major prefix, grouped q rows
    q_kern = (
        q.reshape(P, R, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(P, Hkv, R * G, D)
    )
    kp_hm = kp_q.transpose(0, 2, 1, 3)
    vp_hm = vp_q.transpose(0, 2, 1, 3)
    ks_hm = kps.transpose(0, 2, 1) if quant else None
    vs_hm = vps.transpose(0, 2, 1) if quant else None
    acc, m, l = shared_prefix_decode_attention(
        q_kern, kp_hm, vp_hm, ks_hm, vs_hm, bias_pref, interpret=True
    )
    got = merge_shared_tail(
        acc, m, l, q, ko_q, vo_q, kos, vos, kn, vn, bias_own
    )

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("P,R", [(1, 8), (2, 4)])
def test_full_kernel_matches_shared_prefix_oracle(quant, P, R):
    """shared_prefix_decode_full: the ONE-launch variant (prefix + own suffix
    + new token all in-kernel) against the same oracle."""
    H, Hkv, D = 16, 2, 128
    G = H // Hkv
    B = P * R
    Lp, Lo, pad = 256, 128, 40
    own_len = 17
    rng = np.random.default_rng(0)

    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.float32)
    ko = jnp.asarray(rng.normal(size=(B, Lo, Hkv, D)), jnp.float32)
    vo = jnp.asarray(rng.normal(size=(B, Lo, Hkv, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)

    bias_pref = jnp.where(jnp.arange(Lp)[None, :] < pad, NEG_INF, 0.0).astype(
        jnp.float32
    ).repeat(P, axis=0).reshape(P, Lp)
    own_valid_1d = jnp.arange(Lo) < own_len
    bias_own_1d = jnp.where(own_valid_1d, 0.0, NEG_INF).astype(jnp.float32)
    bias_own = bias_own_1d[None, None, None, :]
    bias_new = jnp.zeros((1, 1, 1, 1), jnp.float32)

    if quant:
        kp_q, kps = _quant(kp, axis=-1)
        vp_q, vps = _quant(vp, axis=-1)
        ko_q, kos = _quant(ko, axis=-1)
        vo_q, vos = _quant(vo, axis=-1)
    else:
        kp_q, vp_q, kps, vps = kp, vp, None, None
        ko_q, vo_q, kos, vos = ko, vo, None, None

    want = mha_shared_prefix(
        q, kp_q, vp_q, kps, vps, ko_q, vo_q, kos, vos, kn, vn,
        bias_pref[:, None, None, :], bias_own, bias_new,
    )

    from time_r1_tpu.ops.decode_attention import shared_prefix_decode_full

    q_kern = (
        q.reshape(P, R, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(P, Hkv, R * G, D)
    )
    ctx = shared_prefix_decode_full(
        q_kern,
        kp_q.transpose(0, 2, 1, 3), vp_q.transpose(0, 2, 1, 3),
        kps.transpose(0, 2, 1) if quant else None,
        vps.transpose(0, 2, 1) if quant else None,
        bias_pref,
        ko_q.transpose(0, 2, 1, 3), vo_q.transpose(0, 2, 1, 3),
        kos.transpose(0, 2, 1) if quant else None,
        vos.transpose(0, 2, 1) if quant else None,
        bias_own_1d,
        kn[:, 0], vn[:, 0],
        interpret=True,
    )
    got = (
        ctx.reshape(P, Hkv, R, G, D).transpose(0, 2, 1, 3, 4).reshape(B, 1, H, D)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_full_kernel_empty_suffix():
    """First decode step: own suffix fully masked → softmax over
    [prefix | new token] only."""
    P, R, H, Hkv, D, Lp, Lo = 1, 4, 8, 2, 128, 128, 64
    G = H // Hkv
    B = P * R
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.float32)
    ko = jnp.asarray(rng.normal(size=(B, Lo, Hkv, D)), jnp.float32)
    vo = jnp.asarray(rng.normal(size=(B, Lo, Hkv, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    bias = jnp.zeros((P, Lp), jnp.float32)
    bias_own_1d = jnp.full((Lo,), NEG_INF, jnp.float32)  # length 0

    want = mha_shared_prefix(
        q, kp, vp, None, None, ko, vo, None, None, kn, vn,
        bias[:, None, None, :],
        bias_own_1d[None, None, None, :],
        jnp.zeros((1, 1, 1, 1), jnp.float32),
    )

    from time_r1_tpu.ops.decode_attention import shared_prefix_decode_full

    q_kern = q.reshape(P, R, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(P, Hkv, R * G, D)
    ctx = shared_prefix_decode_full(
        q_kern, kp.transpose(0, 2, 1, 3), vp.transpose(0, 2, 1, 3), None, None, bias,
        ko.transpose(0, 2, 1, 3), vo.transpose(0, 2, 1, 3), None, None,
        bias_own_1d, kn[:, 0], vn[:, 0], interpret=True,
    )
    got = ctx.reshape(P, Hkv, R, G, D).transpose(0, 2, 1, 3, 4).reshape(B, 1, H, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_kernel_no_own_suffix():
    """suffix-free shape (first decode step): merge folds only the new token."""
    P, R, H, Hkv, D, Lp = 1, 4, 8, 2, 128, 128
    G = H // Hkv
    B = P * R
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    bias = jnp.zeros((P, Lp), jnp.float32)

    # oracle: dense softmax over [prefix | new]
    want = mha_shared_prefix(
        q, kp, vp, None, None,
        kn, vn, None, None, kn, vn,
        bias[:, None, None, :],
        jnp.zeros((1, 1, 1, 1), jnp.float32),
        jnp.full((1, 1, 1, 1), NEG_INF, jnp.float32),  # mask the duplicate
    )

    q_kern = q.reshape(P, R, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(P, Hkv, R * G, D)
    acc, m, l = shared_prefix_decode_attention(
        q_kern, kp.transpose(0, 2, 1, 3), vp.transpose(0, 2, 1, 3), None, None,
        bias, interpret=True,
    )
    got = merge_shared_tail(acc, m, l, q, None, None, None, None, kn, vn, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_forward_shared_decode_head_major_matches_standard():
    """Integration: the kernel-path decode step (prefix_head_major=True,
    interpret mode on CPU) produces the same logits and suffix append as the
    jnp path on the tiny model, int8 prefix + int8 suffix."""
    import jax

    from time_r1_tpu.models.qwen25vl import (
        Qwen25VLConfig,
        forward_shared_decode,
        init_params,
    )
    from time_r1_tpu.models.qwen25vl.language import KVCache, suffix_cache_zeros
    from time_r1_tpu.ops.quant import quantize_kv_cache

    cfg = Qwen25VLConfig.tiny_test()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    P, R, Lp, max_new = 2, 3, 128, 8
    B = P * R
    rng = np.random.default_rng(3)

    prefix_bf = KVCache(
        k=jnp.asarray(rng.normal(size=(2, P, Lp, 2, 16)), jnp.float32),
        v=jnp.asarray(rng.normal(size=(2, P, Lp, 2, 16)), jnp.float32),
        length=jnp.asarray(Lp, jnp.int32),
    )
    prefix = quantize_kv_cache(prefix_bf)
    suffix = suffix_cache_zeros(cfg.text, B, max_new, quant=True)
    bias = jnp.where(jnp.arange(Lp)[None, :] < 16, NEG_INF, 0.0).astype(jnp.float32)
    bias = jnp.broadcast_to(bias, (P, Lp))
    ids = jnp.asarray(rng.integers(2, 200, (B, 1)), jnp.int32)
    pos = jnp.broadcast_to(jnp.full((B, 1), Lp, jnp.int32)[None], (3, B, 1))

    def _hm(cache):
        return cache._replace(
            k=cache.k.transpose(0, 1, 3, 2, 4),
            v=cache.v.transpose(0, 1, 3, 2, 4),
            k_scale=None if cache.k_scale is None else cache.k_scale.transpose(0, 1, 3, 2),
            v_scale=None if cache.v_scale is None else cache.v_scale.transpose(0, 1, 3, 2),
        )

    outs = {}
    for hm in (False, True):
        pfx, suf_in = (prefix, suffix) if not hm else (_hm(prefix), _hm(suffix))
        lg, suf = forward_shared_decode(
            params, cfg, ids, pos, pfx, suf_in, bias, prefix_head_major=hm
        )
        if hm:
            suf = _hm(suf)  # back to token-major for comparison
        outs[hm] = (np.asarray(lg), np.asarray(suf.k), np.asarray(suf.k_scale))

    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=3e-5, rtol=3e-5)
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    np.testing.assert_allclose(outs[True][2], outs[False][2], rtol=1e-6)

    # second step with a non-empty suffix exercises the own-suffix fold
    lg0, suf_a = forward_shared_decode(
        params, cfg, ids, pos, prefix, suffix, bias, prefix_head_major=False
    )
    pos2 = pos + 1
    lg_std, _ = forward_shared_decode(
        params, cfg, ids + 1, pos2, prefix, suf_a, bias, prefix_head_major=False
    )
    lg_hm, _ = forward_shared_decode(
        params, cfg, ids + 1, pos2, _hm(prefix), _hm(suf_a), bias,
        prefix_head_major=True,
    )
    np.testing.assert_allclose(np.asarray(lg_hm), np.asarray(lg_std), atol=3e-5, rtol=3e-5)
