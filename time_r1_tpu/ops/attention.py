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
