"""Ring attention: context-parallel flash attention over a mesh axis.

Splits the SEQUENCE across devices on a mesh axis; an N-step ring rotates
the kv shard (k, v, kv-side bias) one ICI hop per step via `lax.ppermute`
while every device runs the Pallas flash kernel (ops/flash_attention.py) on
its local q block against the kv block it currently holds, merging partials
with the online-softmax log-sum-exp rule. Per-device HBM stays O(S/N) and
the rotation rides the ICI ring — the TPU-native scaling path for contexts
too long for one chip, where the reference relies on single-device CUDA
FlashAttention-2 (`attn_implementation="flash_attention_2"`,
reference timer1_trainer.py:205).

Causality maps onto the block structure instead of a mask: for q shard r
receiving the kv block of source shard s,
  s < r  → block fully visible  → non-causal flash call,
  s == r → the diagonal         → causal flash call (q_offset 0),
  s > r  → fully masked         → skipped (zero / -inf partial, no kernel).
The three cases are a `lax.switch` on a traced branch index, so skipped
steps cost a branch, not a masked kernel launch. (Contiguous sharding puts
r+1 of the N steps' compute on shard r — shard 0 idles most; a zig-zag /
striped layout would balance it and is left as a future variant.)

Backward is FlashAttention-2-style with GLOBAL lse/delta (the
`_flash_bwd_dq` / `_flash_bwd_dkv` helpers): dq accumulates on the q owner;
dk/dv accumulators TRAVEL WITH their kv block around the ring and arrive
back at the block's owner after N hops — one extra 2×(S/N)·Hkv·D f32
payload per hop, no all-reduce.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.flash_attention import (
    NEG_INF,
    _flash_bwd_dq,
    _flash_bwd_dkv,
    _flash_fwd,
    _resolve_blocks,
)


def _merge(out, lse, o_i, lse_i):
    """Merge two normalized flash partials (out: (B, S, H, D) f32,
    lse: (B, H, S) f32) by the stable log-sum-exp rule. NEG_INF is the
    finite 'no mass' sentinel (kernel convention), so max(w) == 1 and the
    denominator is always ≥ 1 — no nan at empty/empty merges."""
    m = jnp.maximum(lse, lse_i)
    wa = jnp.exp(lse - m)
    wb = jnp.exp(lse_i - m)
    denom = wa + wb
    wa_t = (wa / denom).transpose(0, 2, 1)[..., None]  # (B, S, H, 1)
    wb_t = (wb / denom).transpose(0, 2, 1)[..., None]
    return out * wa_t + o_i.astype(jnp.float32) * wb_t, m + jnp.log(denom)


def _ring_perm(axis_size: int):
    return [(j, (j + 1) % axis_size) for j in range(axis_size)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def ring_flash_attention(
    q: jnp.ndarray,  # (B, S_loc, H, D) — LOCAL sequence shard
    k: jnp.ndarray,  # (B, S_loc, Hkv, D)
    v: jnp.ndarray,  # (B, S_loc, Hkv, D)
    kv_bias: jnp.ndarray,  # (B, S_loc) f32 additive (0 / NEG_INF padding)
    axis_name: str = "data",
    axis_size: int = 1,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Context-parallel flash attention. Call INSIDE shard_map with the
    sequence dim sharded over `axis_name` (size `axis_size`); shard r holds
    global positions [r·S_loc, (r+1)·S_loc). S_loc must be a multiple of the
    flash block size (pad globally and mask pads via kv_bias). GQA and the
    kv-side padding bias work exactly as in `flash_attention`."""
    out, _ = _ring_fwd_impl(q, k, v, kv_bias, axis_name, axis_size, causal, scale)
    return out


def _ring_fwd_impl(q, k, v, kv_bias, axis_name, axis_size, causal, scale):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q, block_k = _resolve_blocks(q, k, 0, 0, 0)
    B, S, H, D = q.shape
    r = jax.lax.axis_index(axis_name)
    perm = _ring_perm(axis_size)

    out = jnp.zeros((B, S, H, D), jnp.float32)
    lse = jnp.full((B, H, S), NEG_INF, jnp.float32)
    k_cur, v_cur, b_cur = k, v, kv_bias

    def _skip(q, kc, vc, bc):
        return (
            jnp.zeros(q.shape, q.dtype),
            jnp.full((B, H, S), NEG_INF, jnp.float32),
        )

    def _full(q, kc, vc, bc):
        return _flash_fwd(q, kc, vc, bc, False, scale, 0, block_q, block_k)

    def _diag(q, kc, vc, bc):
        return _flash_fwd(q, kc, vc, bc, True, scale, 0, block_q, block_k)

    for i in range(axis_size):
        if causal:
            src = (r - i) % axis_size
            idx = jnp.where(src < r, 1, jnp.where(src == r, 2, 0))
            o_i, lse_i = jax.lax.switch(idx, (_skip, _full, _diag), q, k_cur, v_cur, b_cur)
        else:
            o_i, lse_i = _full(q, k_cur, v_cur, b_cur)
        out, lse = _merge(out, lse, o_i, lse_i)
        if i < axis_size - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            b_cur = jax.lax.ppermute(b_cur, axis_name, perm)
    return out.astype(q.dtype), lse


def _ring_vjp_fwd(q, k, v, kv_bias, axis_name, axis_size, causal, scale):
    out, lse = _ring_fwd_impl(q, k, v, kv_bias, axis_name, axis_size, causal, scale)
    return out, (q, k, v, kv_bias, out, lse)


def _ring_vjp_bwd(axis_name, axis_size, causal, scale, res, g):
    q, k, v, kv_bias, out, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    block_q, block_k = _resolve_blocks(q, k, 0, 0, 0)
    B, S, H, D = q.shape
    Hkv = k.shape[2]
    r = jax.lax.axis_index(axis_name)
    perm = _ring_perm(axis_size)

    # delta = rowsum(dO ∘ O), global because out/lse are already globally
    # merged — exp(s - lse_global) inside the kernels gives true probs.
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B, S, H)

    zeros_kv = jnp.zeros((B, S, Hkv, D), jnp.float32)

    def _skip(q, kc, vc, bc, g, lse, delta):
        return jnp.zeros(q.shape, q.dtype), zeros_kv, zeros_kv

    def _mk(causal_blk):
        def f(q, kc, vc, bc, g, lse, delta):
            dq_i = _flash_bwd_dq(
                q, kc, vc, bc, g, lse, delta, causal_blk, scale, 0, block_q, block_k
            )
            dk_i, dv_i = _flash_bwd_dkv(
                q, kc, vc, bc, g, lse, delta, causal_blk, scale, 0, block_q, block_k
            )
            return dq_i, dk_i, dv_i

        return f

    _full, _diag = _mk(False), _mk(True)

    dq = jnp.zeros((B, S, H, D), jnp.float32)
    k_cur, v_cur, b_cur = k, v, kv_bias
    dk_cur, dv_cur = zeros_kv, zeros_kv
    for i in range(axis_size):
        if causal:
            src = (r - i) % axis_size
            idx = jnp.where(src < r, 1, jnp.where(src == r, 2, 0))
            dq_i, dk_i, dv_i = jax.lax.switch(
                idx, (_skip, _full, _diag), q, k_cur, v_cur, b_cur, g, lse, delta
            )
        else:
            dq_i, dk_i, dv_i = _full(q, k_cur, v_cur, b_cur, g, lse, delta)
        dq = dq + dq_i.astype(jnp.float32)
        dk_cur = dk_cur + dk_i
        dv_cur = dv_cur + dv_i
        # rotate ALL n steps: the accumulators complete the ring back to
        # their block's owner (block s sits at (s + i) % n after step i)
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        b_cur = jax.lax.ppermute(b_cur, axis_name, perm)
        dk_cur = jax.lax.ppermute(dk_cur, axis_name, perm)
        dv_cur = jax.lax.ppermute(dv_cur, axis_name, perm)
    return dq.astype(q.dtype), dk_cur.astype(k.dtype), dv_cur.astype(v.dtype), None


ring_flash_attention.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def zigzag_indices(seq_len: int, axis_size: int) -> "np.ndarray":
    """Permutation taking the GLOBAL sequence into zig-zag device-major
    order: shard r holds [chunk r | chunk 2n-1-r] of 2n equal chunks. With
    contiguous sharding, causal work piles onto the last shard (shard r does
    r+1 of n ring steps); pairing a front chunk with its mirrored back chunk
    gives every shard the SAME 2n+1 half-block visible pairs — the llama3-
    style balanced context-parallel layout. Apply with jnp.take(x, idx,
    axis=seq_axis); invert with zigzag_inverse."""
    import numpy as np

    assert seq_len % (2 * axis_size) == 0, (seq_len, axis_size)
    c = seq_len // (2 * axis_size)
    parts = []
    for r in range(axis_size):
        parts.append(np.arange(r * c, (r + 1) * c))
        parts.append(np.arange((2 * axis_size - 1 - r) * c, (2 * axis_size - r) * c))
    return np.concatenate(parts)


def zigzag_inverse(seq_len: int, axis_size: int) -> "np.ndarray":
    import numpy as np

    idx = zigzag_indices(seq_len, axis_size)
    inv = np.empty_like(idx)
    inv[idx] = np.arange(seq_len)
    return inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def ring_flash_attention_zigzag(
    q: jnp.ndarray,  # (B, 2C, H, D) — LOCAL [chunk r | chunk 2n-1-r]
    k: jnp.ndarray,  # (B, 2C, Hkv, D)
    v: jnp.ndarray,
    kv_bias: jnp.ndarray,  # (B, 2C)
    axis_name: str = "data",
    axis_size: int = 1,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Causal ring attention over the ZIG-ZAG layout (see zigzag_indices).
    Inputs/outputs are in the permuted layout; positions/masks must be
    permuted alongside (position-wise ops commute with the permutation, so a
    decoder stack runs unchanged on the permuted sequence).

    Per ring step, three half-block (C×C) interactions are live at most:
    front-q × front-kv (full/diag/skip on the chunk order), back-q × front-kv
    (always fully visible — every front chunk precedes every back chunk), and
    back-q × back-kv (skip/diag/full mirrored). Each shard executes exactly
    2n+1 visible half-blocks over the n steps — balanced, where the
    contiguous layout gives shard r only r+1 of n full blocks."""
    out, _ = _zz_fwd_impl(q, k, v, kv_bias, axis_name, axis_size, scale)
    return out


def _zz_cases(r, src, axis_size):
    """Branch indices (0 skip, 1 full, 2 diag) for the three live half-pairs
    when shard r processes the kv of source shard `src`."""
    # front q (chunk r) vs front kv (chunk src)
    ff = jnp.where(src < r, 1, jnp.where(src == r, 2, 0))
    # back q (chunk 2n-1-r) vs back kv (chunk 2n-1-src): visible iff src > r
    bb = jnp.where(src > r, 1, jnp.where(src == r, 2, 0))
    return ff, bb


def _zz_fwd_impl(q, k, v, kv_bias, axis_name, axis_size, scale):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, S2, H, D = q.shape
    C = S2 // 2
    block_q, block_k = _resolve_blocks(q[:, :C], k[:, :C], 0, 0, 0)
    r = jax.lax.axis_index(axis_name)
    perm = _ring_perm(axis_size)

    halves = lambda x: (x[:, :C], x[:, C:])  # noqa: E731
    qf, qb = halves(q)

    def _skip(q, kc, vc, bc):
        return (
            jnp.zeros(q.shape, q.dtype),
            jnp.full((B, H, C), NEG_INF, jnp.float32),
        )

    def _full(q, kc, vc, bc):
        return _flash_fwd(q, kc, vc, bc, False, scale, 0, block_q, block_k)

    def _diag(q, kc, vc, bc):
        return _flash_fwd(q, kc, vc, bc, True, scale, 0, block_q, block_k)

    branches = (_skip, _full, _diag)
    out_f = jnp.zeros((B, C, H, D), jnp.float32)
    lse_f = jnp.full((B, H, C), NEG_INF, jnp.float32)
    out_b, lse_b = out_f, lse_f
    k_cur, v_cur, b_cur = k, v, kv_bias
    for i in range(axis_size):
        src = (r - i) % axis_size
        kf, kb = halves(k_cur)
        vf, vb = halves(v_cur)
        bf, bb_bias = halves(b_cur)
        ff, bb = _zz_cases(r, src, axis_size)
        o_i, l_i = jax.lax.switch(ff, branches, qf, kf, vf, bf)
        out_f, lse_f = _merge(out_f, lse_f, o_i, l_i)
        o_i, l_i = _full(qb, kf, vf, bf)  # back q sees every front chunk
        out_b, lse_b = _merge(out_b, lse_b, o_i, l_i)
        o_i, l_i = jax.lax.switch(bb, branches, qb, kb, vb, bb_bias)
        out_b, lse_b = _merge(out_b, lse_b, o_i, l_i)
        if i < axis_size - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            b_cur = jax.lax.ppermute(b_cur, axis_name, perm)
    out = jnp.concatenate([out_f, out_b], axis=1).astype(q.dtype)
    lse = jnp.concatenate([lse_f, lse_b], axis=2)
    return out, lse


def _zz_vjp_fwd(q, k, v, kv_bias, axis_name, axis_size, scale):
    out, lse = _zz_fwd_impl(q, k, v, kv_bias, axis_name, axis_size, scale)
    return out, (q, k, v, kv_bias, out, lse)


def _zz_vjp_bwd(axis_name, axis_size, scale, res, g):
    q, k, v, kv_bias, out, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, S2, H, D = q.shape
    C = S2 // 2
    Hkv = k.shape[2]
    block_q, block_k = _resolve_blocks(q[:, :C], k[:, :C], 0, 0, 0)
    r = jax.lax.axis_index(axis_name)
    perm = _ring_perm(axis_size)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B, 2C, H)
    halves = lambda x: (x[:, :C], x[:, C:])  # noqa: E731
    qf, qb = halves(q)
    gf, gb = halves(g)
    df, db = halves(delta)
    lf, lb = lse[..., :C], lse[..., C:]

    zeros_q = jnp.zeros((B, C, H, D), jnp.float32)
    zeros_kv = jnp.zeros((B, C, Hkv, D), jnp.float32)

    def _skip(q, kc, vc, bc, g, lse, delta):
        return zeros_q, zeros_kv, zeros_kv

    def _mk(causal_blk):
        def f(q, kc, vc, bc, g, lse, delta):
            dq_i = _flash_bwd_dq(
                q, kc, vc, bc, g, lse, delta, causal_blk, scale, 0, block_q, block_k
            )
            dk_i, dv_i = _flash_bwd_dkv(
                q, kc, vc, bc, g, lse, delta, causal_blk, scale, 0, block_q, block_k
            )
            return dq_i.astype(jnp.float32), dk_i, dv_i

        return f

    branches = (_skip, _mk(False), _mk(True))
    dq_f = dq_b = zeros_q
    k_cur, v_cur, b_cur = k, v, kv_bias
    dk_cur = jnp.zeros((B, 2 * C, Hkv, D), jnp.float32)
    dv_cur = jnp.zeros((B, 2 * C, Hkv, D), jnp.float32)
    for i in range(axis_size):
        src = (r - i) % axis_size
        kf, kb = halves(k_cur)
        vf, vb = halves(v_cur)
        bf, bb_bias = halves(b_cur)
        ff, bb = _zz_cases(r, src, axis_size)
        dq_i, dk_i, dv_i = jax.lax.switch(ff, branches, qf, kf, vf, bf, gf, lf, df)
        dq_f = dq_f + dq_i
        dkf, dvf = dk_i, dv_i
        dq_i, dk_i, dv_i = _mk(False)(qb, kf, vf, bf, gb, lb, db)
        dq_b = dq_b + dq_i
        dkf, dvf = dkf + dk_i, dvf + dv_i
        dq_i, dk_i, dv_i = jax.lax.switch(bb, branches, qb, kb, vb, bb_bias, gb, lb, db)
        dq_b = dq_b + dq_i
        dk_cur = dk_cur + jnp.concatenate([dkf, dk_i], axis=1)
        dv_cur = dv_cur + jnp.concatenate([dvf, dv_i], axis=1)
        # rotate ALL n steps so the accumulators complete the ring
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        b_cur = jax.lax.ppermute(b_cur, axis_name, perm)
        dk_cur = jax.lax.ppermute(dk_cur, axis_name, perm)
        dv_cur = jax.lax.ppermute(dv_cur, axis_name, perm)
    dq = jnp.concatenate([dq_f, dq_b], axis=1).astype(q.dtype)
    return dq, dk_cur.astype(k.dtype), dv_cur.astype(v.dtype), None


ring_flash_attention_zigzag.defvjp(_zz_vjp_fwd, _zz_vjp_bwd)


def ring_attention_zigzag_sharded(
    q: jnp.ndarray,  # (B, S, H, D) GLOBAL, ORIGINAL order
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_bias: jnp.ndarray,  # (B, S)
    mesh: jax.sharding.Mesh,
    axis_name: str = "data",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Causal ring attention with the balanced zig-zag layout: permutes the
    sequence in, shards, rings, permutes back out. S must divide by
    2 × axis_size × flash block."""
    import numpy as np

    n = mesh.shape[axis_name]
    S = q.shape[1]
    assert S % (2 * n * 128) == 0, (
        f"zig-zag half-chunks must be flash-block aligned: S={S} needs "
        f"S % {2 * n * 128} == 0 for axis_size={n}"
    )
    idx = jnp.asarray(zigzag_indices(S, n))
    inv = jnp.asarray(zigzag_inverse(S, n))
    spec_x = P(None, axis_name, None, None)
    spec_b = P(None, axis_name)
    fn = jax.shard_map(
        functools.partial(
            ring_flash_attention_zigzag, axis_name=axis_name, axis_size=n, scale=scale
        ),
        mesh=mesh,
        in_specs=(spec_x, spec_x, spec_x, spec_b),
        out_specs=spec_x,
        check_vma=False,
    )
    out = fn(
        jnp.take(q, idx, axis=1),
        jnp.take(k, idx, axis=1),
        jnp.take(v, idx, axis=1),
        jnp.take(kv_bias, idx, axis=1),
    )
    return jnp.take(out, inv, axis=1)


def ring_attention_sharded(
    q: jnp.ndarray,  # (B, S, H, D) GLOBAL
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_bias: jnp.ndarray,  # (B, S)
    mesh: jax.sharding.Mesh,
    axis_name: str = "data",
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Convenience wrapper: shard the sequence dim over `axis_name` of
    `mesh` and run the ring. S must divide by axis_size × flash block."""
    n = mesh.shape[axis_name]
    spec_x = P(None, axis_name, None, None)
    spec_b = P(None, axis_name)
    fn = jax.shard_map(
        functools.partial(
            ring_flash_attention,
            axis_name=axis_name,
            axis_size=n,
            causal=causal,
            scale=scale,
        ),
        mesh=mesh,
        in_specs=(spec_x, spec_x, spec_x, spec_b),
        out_specs=spec_x,
        check_vma=False,
    )
    return fn(q, k, v, kv_bias)


def sequence_parallel_decoder(
    params: dict,
    cfg,
    hidden: jnp.ndarray,  # (B, S, hid) GLOBAL — embeddings, vision merged
    position_ids: jnp.ndarray,  # (3, B, S)
    attention_mask: Optional[jnp.ndarray],  # (B, S) 1/0
    mesh: jax.sharding.Mesh,
    axis_name: str = "data",
    remat: bool = False,
    layout: str = "contiguous",  # or "zigzag" (balanced causal work)
) -> jnp.ndarray:
    """Run the full decoder stack with the SEQUENCE sharded over `axis_name`:
    per-position compute (norms, projections, MLPs) is embarrassingly
    parallel on the shard; attention rides the ring. Per-device activation
    HBM is O(S/n) — the long-context training configuration (the reference
    trains 8k-token video contexts on one GPU's FlashAttention-2;
    timer1_trainer.py:205). Params replicated; param grads psum on the way
    back out of shard_map. Returns final hidden (B, S, hid), re-assembled.

    layout="zigzag": shard r holds chunks r and 2n-1-r (zigzag_indices), so
    every shard does the same 2n+1 half-blocks of causal attention work —
    the contiguous layout leaves shard 0 idle for most ring steps. Position
    ids/masks travel with the tokens, so the decoder runs unchanged on the
    permuted sequence; the output is permuted back.

    S must divide by axis_size × 128 (contiguous) or 2 × axis_size × 128
    (zigzag): pad tokens globally and mask pads via attention_mask."""
    from ..models.qwen25vl.language import decoder_forward

    n = mesh.shape[axis_name]
    B, S, _ = hidden.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    if layout == "zigzag":
        assert S % (2 * n * 128) == 0, (S, n)
        idx = jnp.asarray(zigzag_indices(S, n))
        hidden = jnp.take(hidden, idx, axis=1)
        position_ids = jnp.take(position_ids, idx, axis=2)
        attention_mask = jnp.take(attention_mask, idx, axis=1)
        cp = (axis_name, n, "zigzag")
    else:
        assert S % (n * 128) == 0, (S, n)
        cp = (axis_name, n)

    def inner(params, hidden_l, pos_l, mask_l):
        out, _ = decoder_forward(
            params, cfg, hidden_l, pos_l, mask_l, None,
            remat=remat, cp=cp,
        )
        return out

    fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(None, None, axis_name), P(None, axis_name)),
        out_specs=P(None, axis_name),
        check_vma=False,
    )
    out = fn(params, hidden, position_ids, attention_mask)
    if layout == "zigzag":
        out = jnp.take(out, jnp.asarray(zigzag_inverse(S, n)), axis=1)
    return out
