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
) -> jnp.ndarray:
    """Run the full decoder stack with the SEQUENCE sharded over `axis_name`:
    per-position compute (norms, projections, MLPs) is embarrassingly
    parallel on the shard; attention rides the ring. Per-device activation
    HBM is O(S/n) — the long-context training configuration (the reference
    trains 8k-token video contexts on one GPU's FlashAttention-2;
    timer1_trainer.py:205). Params replicated; param grads psum on the way
    back out of shard_map. Returns final hidden (B, S, hid), re-assembled.

    S must divide by axis_size × 128 (flash block alignment): pad tokens
    globally and mask pads via attention_mask."""
    from ..models.qwen25vl.language import decoder_forward

    n = mesh.shape[axis_name]
    B, S, _ = hidden.shape
    assert S % (n * 128) == 0, (S, n)
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)

    def inner(params, hidden_l, pos_l, mask_l):
        out, _ = decoder_forward(
            params, cfg, hidden_l, pos_l, mask_l, None,
            remat=remat, cp=(axis_name, n),
        )
        return out

    fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(None, None, axis_name), P(None, axis_name)),
        out_specs=P(None, axis_name),
        check_vma=False,
    )
    return fn(params, hidden, position_ids, attention_mask)
