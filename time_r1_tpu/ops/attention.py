"""Reference attention for the TPU build.

The hot paths use the Pallas flash kernel (ops/flash_attention.py, N1 in
SURVEY §2.2 — the FlashAttention-2 capability the reference gets from CUDA).
This module provides the numerically-transparent fallback used for
cached-decode steps, sliding-window masks, CPU tests, and as the oracle the
kernel is verified against.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-finite; avoids NaN from fully-masked rows


def mha_reference(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Skv, Hkv, D)
    v: jnp.ndarray,  # (B, Skv, Hkv, D)
    bias: Optional[jnp.ndarray] = None,  # additive, broadcastable to (B, 1|H, Sq, Skv)
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Numerically-stable SDPA with fp32 softmax; returns (B, Sq, H, D).

    GQA is computed with grouped einsums — the repeated KV heads are never
    materialized (repeat_kv at 36 layers × decode step costs GBs of HBM
    traffic; the grouped contraction reads each KV head once)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, Sq, H, D = q.shape
    Hkv = k.shape[2]
    G = H // Hkv
    qg = q.reshape(B, Sq, Hkv, G, D)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        b = bias.astype(jnp.float32)
        if b.ndim == 4 and b.shape[1] == 1:
            b = b[:, :, None]  # (B, 1, 1, Sq, Skv) broadcasts over (Hkv, G)
        else:
            b = jnp.broadcast_to(b, (b.shape[0], H) + b.shape[2:]).reshape(
                b.shape[0], Hkv, G, *b.shape[2:]
            )
        logits = logits + b
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v)
    return out.reshape(B, Sq, H, D)


def _bias_grouped(bias: jnp.ndarray, H: int, Hkv: int) -> jnp.ndarray:
    """Broadcast an additive (B, 1|H, Sq, Skv) bias to the grouped
    (B, Hkv, G, Sq, Skv) layout."""
    b = bias.astype(jnp.float32)
    if b.shape[1] == 1:
        return b[:, :, None]  # broadcasts over (Hkv, G)
    return jnp.broadcast_to(b, (b.shape[0], H) + b.shape[2:]).reshape(
        b.shape[0], Hkv, H // Hkv, *b.shape[2:]
    )


def mha_cached(
    q: jnp.ndarray,  # (B, S, H, D) — current chunk queries (post-rope)
    k_old: jnp.ndarray,  # (B, Lkv, Hkv, D) — cache buffer (prefix valid, masked by bias_old)
    v_old: jnp.ndarray,
    k_new: jnp.ndarray,  # (B, S, Hkv, D) — current chunk keys (post-rope)
    v_new: jnp.ndarray,
    bias_old: jnp.ndarray,  # additive, broadcastable to (B, 1|H, S, Lkv)
    bias_new: jnp.ndarray,  # additive, broadcastable to (B, 1|H, S, S)
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Cached-decode SDPA with the softmax COMBINED across the cache prefix
    and the in-register chunk — mathematically identical to attention over
    their concatenation, but the chunk never has to be written into (or the
    cache copied through) the attention input. This is what lets the decode
    loop update the KV cache with one in-place dynamic_update_slice per step
    instead of streaming 2×full-cache copies per layer (the round-1 decode
    bottleneck: ~3.4 ms/step of pure HBM copy at 2k context)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, S, H, D = q.shape
    Hkv = k_old.shape[2]
    G = H // Hkv
    qg = q.reshape(B, S, Hkv, G, D)
    lo = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k_old, preferred_element_type=jnp.float32) * scale
    ln = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k_new, preferred_element_type=jnp.float32) * scale
    lo = lo + _bias_grouped(bias_old, H, Hkv)
    ln = ln + _bias_grouped(bias_new, H, Hkv)
    m = jnp.maximum(jnp.max(lo, axis=-1), jnp.max(ln, axis=-1))  # (B, Hkv, G, S)
    po = jnp.exp(lo - m[..., None])
    pn = jnp.exp(ln - m[..., None])
    denom = jnp.sum(po, axis=-1) + jnp.sum(pn, axis=-1)
    po = (po / denom[..., None]).astype(v_old.dtype)
    pn = (pn / denom[..., None]).astype(v_new.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", po, v_old) + jnp.einsum("bhgqk,bkhd->bqhgd", pn, v_new)
    return out.reshape(B, S, H, D)


def mha_shared_prefix(
    q: jnp.ndarray,  # (B, S, H, D) — current chunk queries (post-rope), B = P·R
    k_pref: jnp.ndarray,  # (P, Lp, Hkv, D) — prompt-prefix cache, ONE copy per prompt
    v_pref: jnp.ndarray,
    ks_pref: Optional[jnp.ndarray],  # (P, Lp, Hkv) f32 scales when the prefix is int8
    vs_pref: Optional[jnp.ndarray],
    k_own: Optional[jnp.ndarray],  # (B, Lo, Hkv, D) per-row suffix cache; None → no suffix
    v_own: Optional[jnp.ndarray],
    ks_own: Optional[jnp.ndarray],  # (B, Lo, Hkv) f32 scales when the suffix is int8
    vs_own: Optional[jnp.ndarray],
    k_new: jnp.ndarray,  # (B, S, Hkv, D) — UNQUANTIZED current chunk
    v_new: jnp.ndarray,
    bias_pref: jnp.ndarray,  # (P, 1, S, Lp) additive (prompt padding)
    bias_own: jnp.ndarray,  # (B|1, 1, S, Lo) additive (suffix validity)
    bias_new: jnp.ndarray,  # (B|1, 1, S, S) additive (causal within chunk)
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-rollout decode attention with the prompt KV stored ONCE per
    prompt. Rows [i·R, (i+1)·R) attend to prefix i plus their own generated
    suffix plus the in-register chunk, with the softmax combined across all
    three sources — mathematically identical to attention over their
    concatenation. For GRPO's G-way rollouts this drops the decode-step KV
    stream (and the cache HBM footprint) by ~G× over replicating the prefix
    per row (vLLM gets the same effect from shared prefix pages;
    vllm_infer.py:48-57 capability class). int8 prefix/suffix scales fold on
    the score/prob axes exactly as in mha_cached_q8.

    k_own=None drops the suffix source entirely — the GRPO loss-forward shape,
    where the whole completion is one causal chunk over the shared prompt
    prefix. Fully differentiable (plain jnp): the backward accumulates each
    prefix's gradient across its R rows."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, S, H, D = q.shape
    P, Lp, Hkv, _ = k_pref.shape
    R = B // P
    G = H // Hkv

    # prefix logits: contract per prompt — (R·S·G) q rows hit each prefix once
    qp = q.reshape(P, R, S, Hkv, G, D)
    lp = jnp.einsum(
        "prshgd,pkhd->prhgsk", qp, k_pref.astype(q.dtype), preferred_element_type=jnp.float32
    ) * scale
    if ks_pref is not None:
        lp = lp * jnp.moveaxis(ks_pref, 1, -1)[:, None, :, None, None, :]
    lp = lp.reshape(B, Hkv, G, S, Lp)
    bp = jnp.broadcast_to(bias_pref[:, None], (P, R) + bias_pref.shape[1:]).reshape(
        B, *bias_pref.shape[1:]
    )
    lp = lp + _bias_grouped(bp, H, Hkv)

    qg = q.reshape(B, S, Hkv, G, D)
    if k_own is not None:
        lo = jnp.einsum(
            "bshgd,bkhd->bhgsk", qg, k_own.astype(q.dtype), preferred_element_type=jnp.float32
        ) * scale
        if ks_own is not None:
            lo = lo * jnp.moveaxis(ks_own, 1, -1)[:, :, None, None, :]
        lo = lo + _bias_grouped(bias_own, H, Hkv)
    ln = jnp.einsum(
        "bshgd,bkhd->bhgsk", qg, k_new, preferred_element_type=jnp.float32
    ) * scale
    ln = ln + _bias_grouped(bias_new, H, Hkv)

    m = jnp.maximum(jnp.max(lp, axis=-1), jnp.max(ln, axis=-1))  # (B, Hkv, G, S)
    if k_own is not None:
        m = jnp.maximum(m, jnp.max(lo, axis=-1))
    pp = jnp.exp(lp - m[..., None])
    pn = jnp.exp(ln - m[..., None])
    denom = jnp.sum(pp, axis=-1) + jnp.sum(pn, axis=-1)
    if k_own is not None:
        po = jnp.exp(lo - m[..., None])
        denom = denom + jnp.sum(po, axis=-1)
        po = po / denom[..., None]
    pp = pp / denom[..., None]
    pn = pn / denom[..., None]
    if vs_pref is not None:
        ppr = pp.reshape(P, R, Hkv, G, S, Lp) * jnp.moveaxis(vs_pref, 1, -1)[
            :, None, :, None, None, :
        ]
    else:
        ppr = pp.reshape(P, R, Hkv, G, S, Lp)
    out = jnp.einsum(
        "prhgsk,pkhd->prshgd", ppr.astype(q.dtype), v_pref.astype(q.dtype)
    ).reshape(B, S, H, D)
    if k_own is not None:
        if vs_own is not None:
            po = po * jnp.moveaxis(vs_own, 1, -1)[:, :, None, None, :]
        out = out + jnp.einsum(
            "bhgsk,bkhd->bshgd", po.astype(q.dtype), v_own.astype(q.dtype)
        ).reshape(B, S, H, D)
    out = out + jnp.einsum(
        "bhgsk,bkhd->bshgd", pn.astype(v_new.dtype), v_new
    ).reshape(B, S, H, D)
    return out


def mha_cached_q8(
    q: jnp.ndarray,  # (B, S, H, D) — current chunk queries (post-rope)
    k8_old: jnp.ndarray,  # (B, Lkv, Hkv, D) int8 quantized cache
    v8_old: jnp.ndarray,
    ks_old: jnp.ndarray,  # (B, Lkv, Hkv) f32 per-(token, head) scales
    vs_old: jnp.ndarray,
    k_new: jnp.ndarray,  # (B, S, Hkv, D) — UNQUANTIZED current chunk
    v_new: jnp.ndarray,
    bias_old: jnp.ndarray,
    bias_new: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """mha_cached against an int8-quantized KV cache. The per-token scales
    fold into the score / probability axis (scores = s·(q·k8),
    out = (p·s)·v8), so HBM streams half the cache bytes and the dequantized
    K/V never materialize. The in-flight chunk stays full precision."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, S, H, D = q.shape
    Hkv = k8_old.shape[2]
    G = H // Hkv
    qg = q.reshape(B, S, Hkv, G, D)
    lo = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k8_old.astype(q.dtype), preferred_element_type=jnp.float32
    )
    lo = lo * (scale * jnp.moveaxis(ks_old, 1, -1)[:, :, None, None, :])  # (B,Hkv,1,1,Lkv)
    ln = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k_new, preferred_element_type=jnp.float32
    ) * scale
    lo = lo + _bias_grouped(bias_old, H, Hkv)
    ln = ln + _bias_grouped(bias_new, H, Hkv)
    m = jnp.maximum(jnp.max(lo, axis=-1), jnp.max(ln, axis=-1))
    po = jnp.exp(lo - m[..., None])
    pn = jnp.exp(ln - m[..., None])
    denom = jnp.sum(po, axis=-1) + jnp.sum(pn, axis=-1)
    po = po / denom[..., None] * jnp.moveaxis(vs_old, 1, -1)[:, :, None, None, :]
    pn = pn / denom[..., None]
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", po.astype(q.dtype), v8_old.astype(q.dtype)
    ) + jnp.einsum("bhgqk,bkhd->bqhgd", pn.astype(v_new.dtype), v_new)
    return out.reshape(B, S, H, D)
