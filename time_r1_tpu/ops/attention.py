"""Attention ops for the TPU build.

Replaces the reference's FlashAttention-2 CUDA dependency (N1 in SURVEY §2.2;
`attn_implementation="flash_attention_2"` at timer1_trainer.py:205). Two tiers:

- `mha_reference`: plain jnp scaled-dot-product attention with an additive
  mask. Used for CPU tests and as the numerical oracle for the Pallas kernels.
- `flash_attention`: Pallas TPU flash kernel (see ops/flash_attention.py),
  dispatched when running on TPU with supported shapes.

Mask builders cover the three patterns the models need:
- causal (+ padding, + optional sliding window)  — decoder self-attention
- segment-equality                               — ViT window / per-frame
  full attention (the cu_seqlens pattern of HF's vision tower expressed as
  segment ids, which is the static-shape-friendly TPU form)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-finite; avoids NaN from full -inf rows


def causal_mask_bias(
    q_len: int,
    kv_len: int,
    *,
    q_offset=0,
    padding_mask: Optional[jnp.ndarray] = None,
    sliding_window: Optional[int] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Additive attention bias (B?, 1, q_len, kv_len).

    q position i (global index q_offset+i) may attend kv position j iff
    j <= q_offset+i, j is not padding, and (if sliding_window) within window.
    `q_offset` may be a traced scalar (decode step).
    """
    q_pos = q_offset + jnp.arange(q_len)[:, None]
    kv_pos = jnp.arange(kv_len)[None, :]
    allowed = kv_pos <= q_pos
    if sliding_window is not None:
        allowed &= kv_pos > q_pos - sliding_window
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None]
    if padding_mask is not None:
        pad = jnp.where(padding_mask, 0.0, NEG_INF).astype(dtype)
        bias = bias + pad[:, None, None, :]
    return bias


def segment_mask_bias(q_seg: jnp.ndarray, kv_seg: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Additive bias (1, q, kv): attend iff same non-negative segment id.

    Padding tokens carry segment id -1 and attend nothing (their outputs are
    garbage by design and masked downstream).
    """
    same = (q_seg[:, None] == kv_seg[None, :]) & (q_seg[:, None] >= 0)
    return jnp.where(same, 0.0, NEG_INF).astype(dtype)[None]


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B, S, Hkv, D) → (B, S, Hkv*n_rep, D) by head repetition (GQA)."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(b, s, h * n_rep, d)


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


@functools.partial(jax.jit, static_argnames=("scale", "use_flash"))
def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Dispatching attention entry point.

    `use_flash=True` routes to the Pallas TPU kernel when shapes permit
    (multiples of kernel tile sizes); otherwise falls back to the reference.
    """
    if use_flash:
        from .flash_attention import flash_attention_biased

        return flash_attention_biased(q, k, v, bias=bias, scale=scale)
    return mha_reference(q, k, v, bias=bias, scale=scale)
