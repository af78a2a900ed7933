"""Pallas paged-attention decode kernel (ops/paged_attention.py) vs the
gather-view jnp oracle: same (acc, m, l) online-softmax state, and the
new-token combine equals a plain concat-softmax attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from time_r1_tpu.ops.paged_attention import (
    combine_with_new_token,
    paged_prefix_attention,
    paged_prefix_attention_reference,
)

NKV, G, HD, P = 2, 4, 128, 128
SLOTS, MAX_PAGES, N_PAGES = 3, 3, 8


def _setup(seed=0, lengths=(0, 100, 300)):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(SLOTS, NKV, G, HD)).astype(np.float32)
    k_pages = rng.normal(size=(NKV, N_PAGES, P, HD)).astype(np.float32)
    v_pages = rng.normal(size=(NKV, N_PAGES, P, HD)).astype(np.float32)
    # non-trivial page table (page 0 reserved as scratch)
    pt = np.zeros((SLOTS, MAX_PAGES), np.int32)
    free = list(range(1, N_PAGES))
    for s, ln in enumerate(lengths):
        for j in range(-(-ln // P)):
            pt[s, j] = free.pop()
    return (
        jnp.asarray(q),
        jnp.asarray(k_pages),
        jnp.asarray(v_pages),
        jnp.asarray(pt),
        jnp.asarray(np.array(lengths, np.int32)),
    )


def test_kernel_matches_reference_oracle():
    q, kp, vp, pt, ln = _setup()
    acc_k, m_k, l_k = paged_prefix_attention(q, kp, vp, pt, ln, P, interpret=True)
    acc_r, m_r, l_r = paged_prefix_attention_reference(q, kp, vp, pt, ln, P)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc_k), np.asarray(acc_r), rtol=1e-4, atol=1e-3)


def test_kernel_empty_prefix_state():
    q, kp, vp, pt, ln = _setup(lengths=(0, 0, 0))
    acc, m, l = paged_prefix_attention(q, kp, vp, pt, ln, P, interpret=True)
    assert np.all(np.asarray(l) == 0.0)
    assert np.all(np.asarray(m) <= -1e29)
    assert np.all(np.asarray(acc) == 0.0)


@pytest.mark.parametrize("lengths", [(0, 100, 300), (128, 256, 37)])
def test_combine_with_new_token_equals_concat_softmax(lengths):
    q, kp, vp, pt, ln = _setup(seed=1, lengths=lengths)
    rng = np.random.default_rng(2)
    k_new = jnp.asarray(rng.normal(size=(SLOTS, NKV, HD)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(SLOTS, NKV, HD)).astype(np.float32))

    acc, m, l = paged_prefix_attention_reference(q, kp, vp, pt, ln, P)
    got = np.asarray(combine_with_new_token(acc, m, l, q, k_new, v_new))

    # oracle: concat [prefix view, new token] and softmax normally
    view_len = MAX_PAGES * P
    k_view = np.asarray(jnp.take(kp, pt, axis=1)).reshape(NKV, SLOTS, view_len, HD)
    v_view = np.asarray(jnp.take(vp, pt, axis=1)).reshape(NKV, SLOTS, view_len, HD)
    scale = HD**-0.5
    for s in range(SLOTS):
        L = int(np.asarray(ln)[s])
        for h in range(NKV):
            keys = np.concatenate([k_view[h, s, :L], np.asarray(k_new)[s, h][None]], axis=0)
            vals = np.concatenate([v_view[h, s, :L], np.asarray(v_new)[s, h][None]], axis=0)
            for g in range(G):
                sc = keys @ np.asarray(q)[s, h, g] * scale
                p = np.exp(sc - sc.max())
                p /= p.sum()
                want = p @ vals
                np.testing.assert_allclose(got[s, h, g], want, rtol=1e-4, atol=1e-4)


def _quantize_pages(pages):
    """Per-(token, head) int8 quantization of (NKV, N_PAGES, P, HD) pages."""
    from time_r1_tpu.ops.quant import quantize_kv

    q8, s = quantize_kv(jnp.asarray(pages))
    return q8, s


def test_q8_kernel_matches_q8_oracle():
    from time_r1_tpu.ops.paged_attention import (
        paged_prefix_attention_q8,
        paged_prefix_attention_q8_reference,
    )

    q, kp, vp, pt, ln = _setup(seed=3)
    k8, ks = _quantize_pages(kp)
    v8, vs = _quantize_pages(vp)
    acc_k, m_k, l_k = paged_prefix_attention_q8(q, k8, v8, ks, vs, pt, ln, P, interpret=True)
    acc_r, m_r, l_r = paged_prefix_attention_q8_reference(q, k8, v8, ks, vs, pt, ln, P)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc_k), np.asarray(acc_r), rtol=1e-4, atol=1e-3)


def test_q8_tracks_bf16_within_quant_error():
    """int8 pages + folded scales ≈ full-precision paged attention (the
    normalized outputs, not the raw online-softmax state, are comparable)."""
    from time_r1_tpu.ops.paged_attention import (
        paged_prefix_attention_q8,
        paged_prefix_attention_reference,
    )

    q, kp, vp, pt, ln = _setup(seed=4, lengths=(128, 256, 300))
    k8, ks = _quantize_pages(kp)
    v8, vs = _quantize_pages(vp)
    acc_q, m_q, l_q = paged_prefix_attention_q8(q, k8, v8, ks, vs, pt, ln, P, interpret=True)
    acc_f, m_f, l_f = paged_prefix_attention_reference(q, kp, vp, pt, ln, P)
    out_q = np.asarray(acc_q) / np.asarray(l_q)[..., None]
    out_f = np.asarray(acc_f) / np.asarray(l_f)[..., None]
    corr = np.corrcoef(out_q.ravel(), out_f.ravel())[0, 1]
    assert corr > 0.995, corr
