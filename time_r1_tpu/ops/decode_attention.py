"""Pallas decode attention: fused single-token GQA attention over the KV cache.

The decode step's attention is tiny in FLOPs (one q row per sequence) but in
plain XLA it decomposes into several small padded ops per layer (logits einsum
→ bias add → fp32 softmax → value einsum). This kernel fuses the whole thing,
reading K/V once from HBM per (batch, kv-head) block:

    out[b, h*G+g] = softmax(q·Kᵀ/√d + bias_b) · V

Used by the decoder's cached path for S == 1 steps (language.py); masked
positions arrive as an additive fp32 bias row per sequence (covers both
causal-future cells and padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, n_kv: int):
    # blocks: q (1, Hkv, G, D), k/v (1, S, Hkv, D), bias (1, 1, S), out like q
    bias_row = bias_ref[0, 0][None, :]  # (1, S)
    for h in range(n_kv):  # static unroll over the (few) kv heads
        q = q_ref[0, h].astype(jnp.float32) * scale  # (G, D)
        k = k_ref[0, :, h, :].astype(jnp.float32)  # (S, D)
        v = v_ref[0, :, h, :]  # (S, D)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (G, S)
        s = s + bias_row
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, h] = (out / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def decode_attention(
    q: jnp.ndarray,  # (B, H, D) — one token per sequence
    k: jnp.ndarray,  # (B, S, Hkv, D) cache keys
    v: jnp.ndarray,  # (B, S, Hkv, D) cache values
    bias: jnp.ndarray,  # (B, S) additive fp32 (0 allowed / NEG_INF masked)
    scale=None,
) -> jnp.ndarray:
    """Fused decode attention → (B, H, D)."""
    B, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    if scale is None:
        scale = D**-0.5
    qg = q.reshape(B, Hkv, G, D)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_kv=Hkv),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, G, D), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, S, Hkv, D), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, S, Hkv, D), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hkv, G, D), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=_interpret(),
    )(qg, k, v, bias[:, None, :])
    return out.reshape(B, H, D)
