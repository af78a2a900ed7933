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
import os
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
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
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
    *, causal, scale, block_q, q_offset_blocks, group, sq, grouped,
):
    """dk/dv for one kv block.

    grouped=False: grid (B, H, Skv/bk), one per-q-head output block — the
    caller group-sums the (B, H, Skv, D) transients afterwards.
    grouped=True: grid (B, Skv/bk, H) with the q-head INNERMOST, so the G
    q-heads of a kv group accumulate into one resident (bk, D) output block
    (consecutive grid steps hit the same block → it stays in VMEM). The
    per-q-head (B, H, Skv, D) f32 transients — ~2 GB/layer at the GRPO
    split-loss shape — and the XLA group-sum pass over them never hit HBM."""
    bk, d = k_ref.shape[2], k_ref.shape[3]
    kj = pl.program_id(1) if grouped else pl.program_id(2)
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
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
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
    if not grouped:
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    else:
        h = pl.program_id(2)

        @pl.when(h % group == 0)
        def _():
            dk_ref[0, 0] = dk.astype(dk_ref.dtype)
            dv_ref[0, 0] = dv.astype(dv_ref.dtype)

        @pl.when(h % group != 0)
        def _():
            dk_ref[0, 0] += dk.astype(dk_ref.dtype)
            dv_ref[0, 0] += dv.astype(dv_ref.dtype)


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
    # lse/delta ride as (B·H, 1, Sq): thin blocks whose dim -2 equals the
    # array's (Mosaic constraint) — no (B, H, Sq, 128) f32 broadcast in HBM
    lse2 = lse.reshape(B * H, 1, Sq)
    delta2 = delta.transpose(0, 2, 1).reshape(B * H, 1, Sq)
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
            pl.BlockSpec((1, 1, block_q), lambda b, h, qi: (b * H + h, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, qi: (b * H + h, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        interpret=_interpret(),
    )(kv_bias[:, None, :], qT, kT, vT, doT, lse2, delta2).transpose(0, 2, 1, 3)


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
    lse2 = lse.reshape(B * H, 1, Sq)  # thin layout (see _flash_bwd_dq)
    delta2 = delta.transpose(0, 2, 1).reshape(B * H, 1, Sq)
    if G > 1 and os.environ.get("TIMER1_UNGROUPED_DKV", "0") != "1":
        # group-summed layout: q-head innermost, G heads of a kv group
        # accumulate into one resident output block. Panels cap at 896: the
        # q/do refetch above that is noise, while ≥1792-row panels take
        # Mosaic >100 s to compile (and crash the remote compile helper
        # inside the full train program).
        bk = _pick_block(Skv, (896, 768, 640, 512, 384, 256, 128))
        dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_kernel_dkv,
                causal=causal,
                scale=scale,
                block_q=block_q,
                q_offset_blocks=q_offset // block_q,
                group=G,
                sq=Sq,
                grouped=True,
            ),
            grid=(B, Skv // bk, H),
            in_specs=[
                pl.BlockSpec((1, 1, Skv), lambda b, kj, h: (b, 0, 0)),
                pl.BlockSpec((1, 1, Sq, D), lambda b, kj, h: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, kj, h: (b, h // G, kj, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, kj, h: (b, h // G, kj, 0)),
                pl.BlockSpec((1, 1, Sq, D), lambda b, kj, h: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Sq), lambda b, kj, h: (b * H + h, 0, 0)),
                pl.BlockSpec((1, 1, Sq), lambda b, kj, h: (b * H + h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bk, D), lambda b, kj, h: (b, h // G, kj, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, kj, h: (b, h // G, kj, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, Hkv, Skv, D), jnp.float32),
                jax.ShapeDtypeStruct((B, Hkv, Skv, D), jnp.float32),
            ],
            interpret=_interpret(),
        )(kv_bias[:, None, :], qT, kT, vT, doT, lse2, delta2)
        return dk.transpose(0, 2, 1, 3), dv.transpose(0, 2, 1, 3)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_dkv,
            causal=causal,
            scale=scale,
            block_q=block_q,
            q_offset_blocks=q_offset // block_q,
            group=G,
            sq=Sq,
            grouped=False,
        ),
        grid=(B, H, Skv // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, Skv), lambda b, h, kj: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sq, D), lambda b, h, kj: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, kj: (b, h // G, kj, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, kj: (b, h // G, kj, 0)),
            pl.BlockSpec((1, 1, Sq, D), lambda b, h, kj: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sq), lambda b, h, kj: (b, h, 0)),
            pl.BlockSpec((1, 1, Sq), lambda b, h, kj: (b, h, 0)),
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
    )(kv_bias[:, None, :], qT, kT, vT, doT, lse2, delta2)
    # sum q-head grads within each kv group (G == 1 here: plain transpose)
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


# ---------------------------------------------------------------------------
# Shared-prefix flash attention: B = P·R query rows (row-major by prompt)
# attend [their prompt's shared prefix | their own causal chunk]. The prefix
# K/V are passed ONCE PER PROMPT (P rows) and routed to the R rows of the
# group via the BlockSpec index map (b → b//R) — no jnp.repeat/concat
# materialization, and the backward accumulates each prompt's prefix K/V
# gradient across its R rows inside the kernel (the GRPO split-loss shape:
# rl/grpo.GRPOSplitBatch, models/qwen25vl/language.shared_decode_forward).
# ---------------------------------------------------------------------------


def _fwd_kernel_sp(
    pbias_ref,  # (1, 1, Lp) prefix additive bias (padding)
    q_ref,  # (1, 1, BQ, D)
    kp_ref,  # (1, 1, Lp, D) shared prefix (per prompt)
    vp_ref,
    ko_ref,  # (1, 1, Sc, D) own chunk
    vo_ref,
    o_ref,
    lse_ref,  # (1, 1, BQ, 128)
    *,
    scale: float,
    block_k: int,
):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    lp, sc = kp_ref.shape[2], ko_ref.shape[2]
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def prefix_body(kj, carry):
        m, l, acc = carry
        k = kp_ref[0, 0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        v = vp_ref[0, 0, pl.ds(kj * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + pbias_ref[0, 0, pl.ds(kj * block_k, block_k)][None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    carry = jax.lax.fori_loop(0, lp // block_k, prefix_body, (m0, l0, acc0))

    q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    bko = _sp_own_block(sc, block_k)
    limit = jax.lax.div((qi + 1) * bq + bko - 1, bko)
    limit = jnp.minimum(limit, sc // bko)

    def own_body(kj, carry):
        m, l, acc = carry
        k = ko_ref[0, 0, pl.ds(kj * bko, bko), :].astype(jnp.float32)
        v = vo_ref[0, 0, pl.ds(kj * bko, bko), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        k_pos = kj * bko + jax.lax.broadcasted_iota(jnp.int32, (1, bko), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, limit, own_body, carry)
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    lse = (m + jnp.log(l_safe)).astype(jnp.float32)
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _sp_blocks(sc: int, lp: int, block_q: int, block_k: int):
    if not block_q:
        block_q = _pick_block(sc, (256, 128))
    if not block_k:
        block_k = _pick_block(lp, (896, 768, 640, 512, 384, 256, 128))
    # _pick_block falls back to 128 when nothing divides; a non-dividing block
    # would silently truncate the prefix loop (lp // block_k) / leave q rows
    # unwritten (grid sc // block_q) — reject instead of corrupting. ValueError
    # (not assert): shape validation must survive `python -O`.
    if sc % block_q != 0 or lp % block_k != 0:
        raise ValueError(
            f"shared-prefix shapes must divide their blocks: Sc={sc} % block_q={block_q}, "
            f"Lp={lp} % block_k={block_k}"
        )
    return block_q, block_k


def _sp_own_block(sc: int, block_k: int) -> int:
    """k-block for the OWN-CHUNK loop: largest divisor of sc that is ≤
    block_k. block_k is picked from Lp alone, so min(block_k, sc) — the old
    choice — can fail to divide sc (e.g. Lp=1792 → 896 with Sc=1024) and the
    last pl.ds would read past the chunk block (clamped/garbage keys)."""
    for c in (896, 768, 640, 512, 384, 256, 128):
        if c <= block_k and sc % c == 0:
            return c
    if sc > block_k:
        # a caller-forced block_q can get sc past _sp_blocks with sc % 128 != 0
        # (e.g. block_q=64, sc=192); returning sc here would silently exceed
        # the requested k-block cap — reject instead.
        raise ValueError(f"no own-chunk k-block ≤ {block_k} divides Sc={sc}")
    return sc


def _sp_fwd(q, kp, vp, ko, vo, prefix_bias, scale, block_q, block_k):
    B, Sc, H, D = q.shape
    P, Lp, Hkv, _ = kp.shape
    R = B // P
    G = H // Hkv
    qT = q.transpose(0, 2, 1, 3)
    kpT = kp.transpose(0, 2, 1, 3)
    vpT = vp.transpose(0, 2, 1, 3)
    koT = ko.transpose(0, 2, 1, 3)
    voT = vo.transpose(0, 2, 1, 3)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_sp, scale=scale, block_k=block_k),
        grid=(B, H, Sc // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, Lp), lambda b, h, qi: (b // R, 0, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, Lp, D), lambda b, h, qi: (b // R, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Lp, D), lambda b, h, qi: (b // R, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Sc, D), lambda b, h, qi: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Sc, D), lambda b, h, qi: (b, h // G, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda b, h, qi: (b, h, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sc, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Sc, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(prefix_bias[:, None, :], qT, kpT, vpT, koT, voT)
    return out.transpose(0, 2, 1, 3), lse[..., 0]


def _bwd_kernel_dq_sp(
    pbias_ref, q_ref, kp_ref, vp_ref, ko_ref, vo_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, block_k,
):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    lp, sc = kp_ref.shape[2], ko_ref.shape[2]
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]

    def prefix_body(kj, dq):
        k = kp_ref[0, 0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        v = vp_ref[0, 0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + pbias_ref[0, 0, pl.ds(kj * block_k, block_k)][None, :]
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, lp // block_k, prefix_body, jnp.zeros((bq, d), jnp.float32))

    q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    bko = _sp_own_block(sc, block_k)
    limit = jnp.minimum(jax.lax.div((qi + 1) * bq + bko - 1, bko), sc // bko)

    def own_body(kj, dq):
        k = ko_ref[0, 0, pl.ds(kj * bko, bko), :].astype(jnp.float32)
        v = vo_ref[0, 0, pl.ds(kj * bko, bko), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        k_pos = kj * bko + jax.lax.broadcasted_iota(jnp.int32, (1, bko), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, limit, own_body, dq)
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_kernel_dkvp_sp(
    pbias_ref, q_ref, kp_ref, vp_ref, do_ref, lse_ref, delta_ref, dkp_ref, dvp_ref,
    *, scale, block_q, group, sc,
):
    """Prefix dk/dv: grid (P, Lp/bk, H, R) with the row index INNERMOST and
    the q-head next — the R rows of a prompt and the G q-heads of a kv group
    all accumulate into one resident (bk, D) f32 output block."""
    bk, d = kp_ref.shape[2], kp_ref.shape[3]
    kj = pl.program_id(1)
    h = pl.program_id(2)
    r = pl.program_id(3)
    k = kp_ref[0, 0].astype(jnp.float32)
    v = vp_ref[0, 0].astype(jnp.float32)
    pbias = pbias_ref[0, 0, pl.ds(kj * bk, bk)][None, :]

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32) * scale
        do = do_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + pbias
        p = jnp.exp(s - lse)
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, pl.cdiv(sc, block_q), body, (dk0, dv0))

    first = (h % group == 0) & (r == 0)

    @pl.when(first)
    def _():
        dkp_ref[0, 0] = dk.astype(dkp_ref.dtype)
        dvp_ref[0, 0] = dv.astype(dvp_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        dkp_ref[0, 0] += dk.astype(dkp_ref.dtype)
        dvp_ref[0, 0] += dv.astype(dvp_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def flash_attention_shared_prefix(
    q: jnp.ndarray,  # (B, Sc, H, D) — B = P·R rows, row-major by prompt
    kp: jnp.ndarray,  # (P, Lp, Hkv, D) shared prompt prefixes
    vp: jnp.ndarray,
    ko: jnp.ndarray,  # (B, Sc, Hkv, D) own chunk keys (causal within)
    vo: jnp.ndarray,
    prefix_bias: jnp.ndarray,  # (P, Lp) f32 additive (0 / NEG_INF pad)
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Row b attends [prefix_bias-masked prefix b//R | own causal chunk].
    Sc and Lp must be multiples of the (auto-selected) block sizes. The
    backward sums each prompt's prefix K/V gradient over its R rows in-kernel
    (the gradient contract of shared_decode_forward's loss path)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q, block_k = _sp_blocks(q.shape[1], kp.shape[1], block_q, block_k)
    out, _ = _sp_fwd(q, kp, vp, ko, vo, prefix_bias, scale, block_q, block_k)
    return out


def _sp_vjp_fwd(q, kp, vp, ko, vo, prefix_bias, scale, block_q, block_k):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q, block_k = _sp_blocks(q.shape[1], kp.shape[1], block_q, block_k)
    out, lse = _sp_fwd(q, kp, vp, ko, vo, prefix_bias, scale, block_q, block_k)
    return out, (q, kp, vp, ko, vo, prefix_bias, out, lse)


def _sp_vjp_bwd(scale, block_q, block_k, res, g):
    q, kp, vp, ko, vo, prefix_bias, out, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q, block_k = _sp_blocks(q.shape[1], kp.shape[1], block_q, block_k)
    B, Sc, H, D = q.shape
    P, Lp, Hkv, _ = kp.shape
    R = B // P
    G = H // Hkv
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B, Sc, H)

    # dq: one kernel over both KV sources (global lse/delta)
    qT = q.transpose(0, 2, 1, 3)
    kpT = kp.transpose(0, 2, 1, 3)
    vpT = vp.transpose(0, 2, 1, 3)
    koT = ko.transpose(0, 2, 1, 3)
    voT = vo.transpose(0, 2, 1, 3)
    doT = g.transpose(0, 2, 1, 3)
    lse2 = lse.reshape(B * H, 1, Sc)  # thin layout (see _flash_bwd_dq)
    delta2 = delta.transpose(0, 2, 1).reshape(B * H, 1, Sc)
    dq = pl.pallas_call(
        functools.partial(_bwd_kernel_dq_sp, scale=scale, block_k=block_k),
        grid=(B, H, Sc // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, Lp), lambda b, h, qi: (b // R, 0, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, Lp, D), lambda b, h, qi: (b // R, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Lp, D), lambda b, h, qi: (b // R, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Sc, D), lambda b, h, qi: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, Sc, D), lambda b, h, qi: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, qi: (b * H + h, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, qi: (b * H + h, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Sc, D), q.dtype),
        interpret=_interpret(),
    )(prefix_bias[:, None, :], qT, kpT, vpT, koT, voT, doT, lse2, delta2)
    dq = dq.transpose(0, 2, 1, 3)

    # own-chunk dk/dv: plain causal self-attention given GLOBAL lse/delta
    dko, dvo = _flash_bwd_dkv(
        q, ko, vo, jnp.zeros((B, Sc), jnp.float32), g, lse, delta,
        True, scale, 0, block_q,
        _pick_block(Sc, (896, 768, 640, 512, 384, 256, 128)),
    )

    # prefix dk/dv: accumulated over the R rows of each prompt in-kernel
    # (panel cap 896: see _flash_bwd_dkv's grouped branch)
    bkp = _pick_block(Lp, (896, 768, 640, 512, 384, 256, 128))
    dkp, dvp = pl.pallas_call(
        functools.partial(
            _bwd_kernel_dkvp_sp, scale=scale, block_q=block_q, group=G, sc=Sc
        ),
        grid=(P, Lp // bkp, H, R),
        in_specs=[
            pl.BlockSpec((1, 1, Lp), lambda p, kj, h, r: (p, 0, 0)),
            pl.BlockSpec((1, 1, Sc, D), lambda p, kj, h, r: (p * R + r, h, 0, 0)),
            pl.BlockSpec((1, 1, bkp, D), lambda p, kj, h, r: (p, h // G, kj, 0)),
            pl.BlockSpec((1, 1, bkp, D), lambda p, kj, h, r: (p, h // G, kj, 0)),
            pl.BlockSpec((1, 1, Sc, D), lambda p, kj, h, r: (p * R + r, h, 0, 0)),
            pl.BlockSpec((1, 1, Sc), lambda p, kj, h, r: ((p * R + r) * H + h, 0, 0)),
            pl.BlockSpec((1, 1, Sc), lambda p, kj, h, r: ((p * R + r) * H + h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bkp, D), lambda p, kj, h, r: (p, h // G, kj, 0)),
            pl.BlockSpec((1, 1, bkp, D), lambda p, kj, h, r: (p, h // G, kj, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, Hkv, Lp, D), jnp.float32),
            jax.ShapeDtypeStruct((P, Hkv, Lp, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(prefix_bias[:, None, :], qT, kpT, vpT, doT, lse2, delta2)
    dkp = dkp.transpose(0, 2, 1, 3).astype(kp.dtype)
    dvp = dvp.transpose(0, 2, 1, 3).astype(vp.dtype)
    return dq, dkp, dvp, dko.astype(ko.dtype), dvo.astype(vo.dtype), None


flash_attention_shared_prefix.defvjp(_sp_vjp_fwd, _sp_vjp_bwd)
