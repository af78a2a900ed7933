"""Pallas TPU flash attention (N1: FlashAttention-2 capability).

Causal (or full) multi-head attention with online softmax — the O(S) memory
pattern the reference gets from CUDA FlashAttention-2
(`attn_implementation="flash_attention_2"`, timer1_trainer.py:205). Supports:

- GQA natively: q heads are processed per kv head group (no KV repetition);
- padding via an additive kv-side bias row (B, Skv);
- causal masking with block-level early exit (blocks fully above the diagonal
  are skipped via the grid index map);
- custom VJP: the backward pass recomputes attention blockwise (standard
  FlashAttention-2 backward) — no (S, S) tensor ever materializes.

Block sizes default to (128, 128): MXU-aligned and VMEM-friendly for
head_dim 128 at bf16/fp32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
DEFAULT_BLOCK_Q = 0  # 0 → auto-select (largest aligned divisor)
DEFAULT_BLOCK_K = 0


def _pick_block(size: int, candidates: tuple) -> int:
    """Largest candidate dividing `size` (TPU sweep: bigger kv blocks win —
    (256, 896) beat (128, 128) by 1.4× at S=1792 on v5e)."""
    for c in candidates:
        if size % c == 0:
            return c
    return 128


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU (tests / virtual mesh)
    return jax.default_backend() != "tpu"


def _fwd_kernel(
    kv_bias_ref,  # (1, 1, Skv) additive kv bias (padding), fp32
    q_ref,  # (BQ, D)
    k_ref,  # (Skv, D)
    v_ref,  # (Skv, D)
    o_ref,  # (BQ, D)
    lse_ref,  # (BQ, 128) log-sum-exp (col 0 meaningful)
    *,
    causal: bool,
    scale: float,
    block_k: int,
    q_offset_blocks: int,
):
    bq = q_ref.shape[2]
    skv = k_ref.shape[2]
    d = q_ref.shape[3]
    qi = pl.program_id(2)  # q block index
    q = q_ref[0, 0].astype(jnp.float32) * scale

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    q_pos = (qi + q_offset_blocks) * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)

    num_kv_blocks = pl.cdiv(skv, block_k)
    if causal:
        # last kv block that can contain allowed keys for this q block
        limit = jax.lax.div((qi + q_offset_blocks + 1) * bq + block_k - 1, block_k)
        limit = jnp.minimum(limit, num_kv_blocks)
    else:
        limit = num_kv_blocks

    def body(kj, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(kj * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)
        s = s + kv_bias_ref[0, 0, pl.ds(kj * block_k, block_k)][None, :]
        if causal:
            k_pos = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, limit, body, (m0, l0, acc0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    lse = (m + jnp.log(l_safe)).astype(jnp.float32)  # (BQ, 1)
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_fwd(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Skv, Hkv, D)
    v: jnp.ndarray,
    kv_bias: jnp.ndarray,  # (B, Skv) fp32 additive (0 / NEG_INF padding)
    causal: bool,
    scale: float,
    q_offset: int,
    block_q: int,
    block_k: int,
):
    B, Sq, H, D = q.shape
    Skv, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    assert Sq % block_q == 0 and Skv % block_k == 0, (Sq, Skv, block_q, block_k)
    assert q_offset % block_q == 0

    # layout: (B, H, S, D) blocks over (b, h, qi)
    qT = q.transpose(0, 2, 1, 3)
    kT = k.transpose(0, 2, 1, 3)
    vT = v.transpose(0, 2, 1, 3)

    grid = (B, H, Sq // block_q)
    kernel = functools.partial(
        _fwd_kernel,
        causal=causal,
        scale=scale,
        block_k=block_k,
        q_offset_blocks=q_offset // block_q,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Skv), lambda b, h, qi: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, Skv, D), lambda b, h, qi: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Skv, D), lambda b, h, qi: (b, h // G, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda b, h, qi: (b, h, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Sq, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(kv_bias[:, None, :], qT, kT, vT)
    return out.transpose(0, 2, 1, 3), lse[..., 0]


def _bwd_kernel_dq(
    kv_bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, causal, scale, block_k, q_offset_blocks,
):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    skv = k_ref.shape[2]
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, :, 0][:, None]
    delta = delta_ref[0, 0, :, 0][:, None]
    q_pos = (qi + q_offset_blocks) * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)

    num_kv_blocks = pl.cdiv(skv, block_k)
    if causal:
        limit = jnp.minimum(
            jax.lax.div((qi + q_offset_blocks + 1) * bq + block_k - 1, block_k), num_kv_blocks
        )
    else:
        limit = num_kv_blocks

    def body(kj, dq):
        k = k_ref[0, 0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + kv_bias_ref[0, 0, pl.ds(kj * block_k, block_k)][None, :]
        if causal:
            k_pos = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, limit, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_kernel_dkv(
    kv_bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, causal, scale, block_q, q_offset_blocks, group, sq,
):
    bk, d = k_ref.shape[2], k_ref.shape[3]
    kj = pl.program_id(2)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    k_pos = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
    kv_bias = kv_bias_ref[0, 0, pl.ds(kj * bk, bk)][None, :]

    num_q_blocks = pl.cdiv(sq, block_q)
    if causal:
        # first q block whose last row can see this kv block
        start = jax.lax.div(kj * bk, block_q) - q_offset_blocks
        start = jnp.maximum(start, 0)
    else:
        start = 0

    def body(qi, carry):
        dk, dv = carry
        q = q_ref_load(qi)
        do = do_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q), 0][:, None]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q), 0][:, None]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + kv_bias
        if causal:
            q_pos = (qi + q_offset_blocks) * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse)
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    def q_ref_load(qi):
        return q_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32) * scale

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(start, num_q_blocks, body, (dk0, dv0))
    # q was pre-scaled inside q_ref_load, so dk already carries the scale
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def flash_attention(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Skv, Hkv, D)
    v: jnp.ndarray,
    kv_bias: jnp.ndarray,  # (B, Skv) fp32 additive (0 or NEG_INF)
    causal: bool = True,
    scale: Optional[float] = None,
    q_offset: int = 0,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Flash attention (B, Sq, H, D) with GQA and kv-side padding bias.

    `q_offset`: global position of q row 0 (for cached prefixes); must be a
    multiple of block_q. Sq/Skv must be multiples of the block sizes (pad
    inputs and mask pads via kv_bias). block_q/block_k = 0 → auto-select."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q, block_k = _resolve_blocks(q, k, q_offset, block_q, block_k)
    out, _ = _flash_fwd(q, k, v, kv_bias, causal, scale, q_offset, block_q, block_k)
    return out


def _resolve_blocks(q, k, q_offset, block_q, block_k):
    if not block_q:
        block_q = _pick_block(q.shape[1], (256, 128))
        while q_offset % block_q:
            block_q //= 2
    if not block_k:
        block_k = _pick_block(k.shape[1], (896, 768, 640, 512, 384, 256, 128))
    return block_q, block_k


def _flash_vjp_fwd(q, k, v, kv_bias, causal, scale, q_offset, block_q, block_k):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q, block_k = _resolve_blocks(q, k, q_offset, block_q, block_k)
    out, lse = _flash_fwd(q, k, v, kv_bias, causal, scale, q_offset, block_q, block_k)
    return out, (q, k, v, kv_bias, out, lse)


def _flash_bwd_dq(q, k, v, kv_bias, do, lse, delta, causal, scale, q_offset, block_q, block_k):
    """dq for one (q, kv) pair given GLOBAL lse (B, H, Sq) and delta (B, Sq, H).
    Reused by the ring-attention backward with per-ring-block kv shards."""
    B, Sq, H, D = q.shape
    Skv, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    qT = q.transpose(0, 2, 1, 3)
    kT = k.transpose(0, 2, 1, 3)
    vT = v.transpose(0, 2, 1, 3)
    doT = do.transpose(0, 2, 1, 3)
    deltaT = jnp.broadcast_to(delta.transpose(0, 2, 1)[..., None], (B, H, Sq, 128))
    lseT = jnp.broadcast_to(lse[..., None], (B, H, Sq, 128))
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_dq,
            causal=causal,
            scale=scale,
            block_k=block_k,
            q_offset_blocks=q_offset // block_q,
        ),
        grid=(B, H, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, Skv), lambda b, h, qi: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, Skv, D), lambda b, h, qi: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Skv, D), lambda b, h, qi: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda b, h, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda b, h, qi: (b, h, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        interpret=_interpret(),
    )(kv_bias[:, None, :], qT, kT, vT, doT, lseT, deltaT).transpose(0, 2, 1, 3)


def _flash_bwd_dkv(q, k, v, kv_bias, do, lse, delta, causal, scale, q_offset, block_q, block_k):
    """(dk, dv) (B, Skv, Hkv, D) f32, group-summed, for one (q, kv) pair given
    GLOBAL lse/delta. Reused by the ring-attention backward."""
    B, Sq, H, D = q.shape
    Skv, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    qT = q.transpose(0, 2, 1, 3)
    kT = k.transpose(0, 2, 1, 3)
    vT = v.transpose(0, 2, 1, 3)
    doT = do.transpose(0, 2, 1, 3)
    deltaT = jnp.broadcast_to(delta.transpose(0, 2, 1)[..., None], (B, H, Sq, 128))
    lseT = jnp.broadcast_to(lse[..., None], (B, H, Sq, 128))
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_dkv,
            causal=causal,
            scale=scale,
            block_q=block_q,
            q_offset_blocks=q_offset // block_q,
            group=G,
            sq=Sq,
        ),
        grid=(B, H, Skv // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, Skv), lambda b, h, kj: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sq, D), lambda b, h, kj: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, kj: (b, h // G, kj, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, kj: (b, h // G, kj, 0)),
            pl.BlockSpec((1, 1, Sq, D), lambda b, h, kj: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sq, 128), lambda b, h, kj: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sq, 128), lambda b, h, kj: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, kj: (b, h, kj, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, kj: (b, h, kj, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Skv, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Skv, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(kv_bias[:, None, :], qT, kT, vT, doT, lseT, deltaT)
    # sum q-head grads within each kv group
    dk = dk.reshape(B, Hkv, G, Skv, D).sum(axis=2).transpose(0, 2, 1, 3)
    dv = dv.reshape(B, Hkv, G, Skv, D).sum(axis=2).transpose(0, 2, 1, 3)
    return dk, dv


def _flash_vjp_bwd(causal, scale, q_offset, block_q, block_k, res, g):
    """FA-2 backward: delta, then delegate to the single-pair helpers (one
    copy of the kernel plumbing — the ring backward reuses the same two)."""
    q, k, v, kv_bias, out, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q, block_k = _resolve_blocks(q, k, q_offset, block_q, block_k)
    # delta = rowsum(dO * O)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B, Sq, H)
    dq = _flash_bwd_dq(
        q, k, v, kv_bias, g, lse, delta, causal, scale, q_offset, block_q, block_k
    )
    dk, dv = _flash_bwd_dkv(
        q, k, v, kv_bias, g, lse, delta, causal, scale, q_offset, block_q, block_k
    )
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)
