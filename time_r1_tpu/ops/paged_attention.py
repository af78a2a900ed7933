"""Pallas TPU paged-attention decode kernel (N2 finish line: the vLLM
PagedAttention CUDA kernel capability).

One query token per slot attends over its KV PAGES in place: the page table
is a scalar-prefetch argument, so each grid step DMAs exactly the page the
slot owns — no (slots, max_pages·P, …) contiguous view is ever materialized
(the round-1 gather cost the paged engine its memory-model advantage,
sampler/paged.py docstring).

The kernel covers the cache PREFIX [0, lengths[s]). The in-flight token's
KV stays in registers and is combined outside via the returned online-softmax
state (m, l) — same split as ops.attention.mha_cached, so the pool takes ONE
scatter per decode step.

Layout: pages are (nkv, n_pages, page_size, head_dim) per layer — the last
two dims (P=128, hd=128) tile the TPU (8,128)/(16,128) registers exactly.
Pages past a slot's length are index-mapped to the slot's LAST valid page:
Pallas skips the DMA when consecutive grid steps map to the same block, so
short slots don't stream garbage pages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    # scalar prefetch
    pt_ref,  # (S, max_pages) int32 page table
    len_ref,  # (S,) int32 prefix lengths
    # blocks
    q_ref,  # (1, 1, G, hd)
    k_ref,  # (1, 1, P, hd)
    v_ref,  # (1, 1, P, hd)
    o_ref,  # (1, 1, G, hd) fp32 — UNNORMALIZED acc (caller divides)
    m_ref,  # (1, 1, G, 128) fp32 — running max (col 0)
    l_ref,  # (1, 1, G, 128) fp32 — running sum-exp (col 0)
    # scratch
    macc,  # (G, 1) fp32
    lacc,  # (G, 1) fp32
    acc,  # (G, hd) fp32
    *,
    page_size: int,
    scale: float,
):
    s = pl.program_id(0)
    j = pl.program_id(2)
    n_pages = pl.num_programs(2)
    G, hd = q_ref.shape[2], q_ref.shape[3]
    P = page_size

    @pl.when(j == 0)
    def _init():
        macc[...] = jnp.full((G, 1), NEG_INF, jnp.float32)
        lacc[...] = jnp.zeros((G, 1), jnp.float32)
        acc[...] = jnp.zeros((G, hd), jnp.float32)

    length = len_ref[s]
    start = j * P

    @pl.when(start < length)
    def _page():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # (G, hd)
        k = k_ref[0, 0].astype(jnp.float32)  # (P, hd)
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, P)
        pos = start + jax.lax.broadcasted_iota(jnp.int32, (G, P), 1)
        sc = jnp.where(pos < length, sc, NEG_INF)
        m_new = jnp.maximum(macc[...], jnp.max(sc, axis=1, keepdims=True))
        corr = jnp.exp(macc[...] - m_new)
        p = jnp.exp(sc - m_new)  # (G, P)
        lacc[...] = lacc[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)  # (P, hd)
        acc[...] = acc[...] * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        macc[...] = m_new

    @pl.when(j == n_pages - 1)
    def _out():
        o_ref[0, 0] = acc[...]
        m_ref[0, 0] = jnp.broadcast_to(macc[...], (G, 128))
        l_ref[0, 0] = jnp.broadcast_to(lacc[...], (G, 128))


@functools.partial(jax.jit, static_argnames=("page_size", "interpret"))
def paged_prefix_attention(
    q: jnp.ndarray,  # (S, nkv, G, hd) — grouped query heads, post-rope
    k_pages: jnp.ndarray,  # (nkv, n_pages, P, hd)
    v_pages: jnp.ndarray,  # (nkv, n_pages, P, hd)
    page_table: jnp.ndarray,  # (S, max_pages) int32
    lengths: jnp.ndarray,  # (S,) int32 — valid prefix per slot
    page_size: int,
    interpret: bool | None = None,
):
    """Online-softmax attention over each slot's pages.

    Returns (acc (S, nkv, G, hd) fp32 UNNORMALIZED, m (S, nkv, G) fp32,
    l (S, nkv, G) fp32): out = acc/l after optionally folding more keys in
    (the current token) via the flash combine rule. Empty prefixes yield
    m=-inf, l=0."""
    S, nkv, G, hd = q.shape
    max_pages = page_table.shape[1]
    P = page_size
    scale = hd**-0.5
    if interpret is None:
        interpret = _interpret()

    pt = page_table.astype(jnp.int32)
    ln = lengths.astype(jnp.int32)

    def q_index(s, h, j, pt_ref, len_ref):
        return (s, h, 0, 0)

    def kv_index(s, h, j, pt_ref, len_ref):
        # clamp overflow pages to the slot's last valid page: consecutive
        # identical block indices skip the DMA
        last = jnp.maximum((len_ref[s] - 1) // P, 0)
        return (h, pt_ref[s, jnp.minimum(j, last)], 0, 0)

    def o_index(s, h, j, pt_ref, len_ref):
        return (s, h, 0, 0)

    grid = (S, nkv, max_pages)
    kernel = functools.partial(_kernel, page_size=P, scale=scale)
    out_shape = [
        jax.ShapeDtypeStruct((S, nkv, G, hd), jnp.float32),
        jax.ShapeDtypeStruct((S, nkv, G, 128), jnp.float32),
        jax.ShapeDtypeStruct((S, nkv, G, 128), jnp.float32),
    ]
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G, hd), q_index),
            pl.BlockSpec((1, 1, P, hd), kv_index),
            pl.BlockSpec((1, 1, P, hd), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, hd), o_index),
            pl.BlockSpec((1, 1, G, 128), o_index),
            pl.BlockSpec((1, 1, G, 128), o_index),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, hd), jnp.float32),
        ],
    )
    acc, m, l = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(pt, ln, q, k_pages, v_pages)
    return acc, m[..., 0], l[..., 0]


def _kernel_q8(
    # scalar prefetch
    pt_ref,  # (S, max_pages) int32 page table
    len_ref,  # (S,) int32 prefix lengths
    # blocks
    q_ref,  # (1, 1, G, hd)
    k_ref,  # (1, 1, P, hd) int8
    v_ref,  # (1, 1, P, hd) int8
    ks_ref,  # (1, 1, 1, P) f32 per-token K scales (unit sublane dim: a
    # (1, 1, P) block over (nkv, n_pages, P) puts the unit dim in the
    # sublane position over a large array dim — Mosaic rejects it; the
    # trailing (1, P) tile is native)
    vs_ref,  # (1, 1, 1, P) f32 per-token V scales
    o_ref,  # (1, 1, G, hd) fp32 — UNNORMALIZED acc
    m_ref,  # (1, 1, G, 128) fp32
    l_ref,  # (1, 1, G, 128) fp32
    # scratch
    macc,
    lacc,
    acc,
    *,
    page_size: int,
    scale: float,
):
    """int8-KV variant: pages stream as int8 + per-(token, head) f32 scales;
    the dequant folds into the score/probability axes — scores = s_k·(q·k8)
    and out += (p·s_v)·v8 — so the bf16 K/V never materialize (ops/quant.py
    exactness trick, here applied per page)."""
    s = pl.program_id(0)
    j = pl.program_id(2)
    n_pages = pl.num_programs(2)
    G, hd = q_ref.shape[2], q_ref.shape[3]
    P = page_size

    @pl.when(j == 0)
    def _init():
        macc[...] = jnp.full((G, 1), NEG_INF, jnp.float32)
        lacc[...] = jnp.zeros((G, 1), jnp.float32)
        acc[...] = jnp.zeros((G, hd), jnp.float32)

    length = len_ref[s]
    start = j * P

    @pl.when(start < length)
    def _page():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # (G, hd)
        k = k_ref[0, 0].astype(jnp.float32)  # (P, hd) dequant-free int8→f32
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, P)
        sc = sc * ks_ref[0, 0]  # (1, P) row: fold K scales on the key axis
        pos = start + jax.lax.broadcasted_iota(jnp.int32, (G, P), 1)
        sc = jnp.where(pos < length, sc, NEG_INF)
        m_new = jnp.maximum(macc[...], jnp.max(sc, axis=1, keepdims=True))
        corr = jnp.exp(macc[...] - m_new)
        p = jnp.exp(sc - m_new)  # (G, P)
        lacc[...] = lacc[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)  # (P, hd)
        pv = p * vs_ref[0, 0]  # (1, P) row: fold V scales on the prob axis
        acc[...] = acc[...] * corr + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        macc[...] = m_new

    @pl.when(j == n_pages - 1)
    def _out():
        o_ref[0, 0] = acc[...]
        m_ref[0, 0] = jnp.broadcast_to(macc[...], (G, 128))
        l_ref[0, 0] = jnp.broadcast_to(lacc[...], (G, 128))


@functools.partial(jax.jit, static_argnames=("page_size", "interpret"))
def paged_prefix_attention_q8(
    q: jnp.ndarray,  # (S, nkv, G, hd) — grouped query heads, post-rope
    k_pages: jnp.ndarray,  # (nkv, n_pages, P, hd) int8
    v_pages: jnp.ndarray,  # (nkv, n_pages, P, hd) int8
    k_scale: jnp.ndarray,  # (nkv, n_pages, P) f32
    v_scale: jnp.ndarray,  # (nkv, n_pages, P) f32
    page_table: jnp.ndarray,  # (S, max_pages) int32
    lengths: jnp.ndarray,  # (S,) int32
    page_size: int,
    interpret: bool | None = None,
):
    """int8-paged variant of paged_prefix_attention — same (acc, m, l)
    contract; HBM streams half the page bytes (vLLM --kv-cache-dtype int8
    capability composed with paged KV)."""
    S, nkv, G, hd = q.shape
    max_pages = page_table.shape[1]
    P = page_size
    scale = hd**-0.5
    if interpret is None:
        interpret = _interpret()

    pt = page_table.astype(jnp.int32)
    ln = lengths.astype(jnp.int32)

    def q_index(s, h, j, pt_ref, len_ref):
        return (s, h, 0, 0)

    def kv_index(s, h, j, pt_ref, len_ref):
        last = jnp.maximum((len_ref[s] - 1) // P, 0)
        return (h, pt_ref[s, jnp.minimum(j, last)], 0, 0)

    def scale_index(s, h, j, pt_ref, len_ref):
        last = jnp.maximum((len_ref[s] - 1) // P, 0)
        return (h, pt_ref[s, jnp.minimum(j, last)], 0, 0)

    def o_index(s, h, j, pt_ref, len_ref):
        return (s, h, 0, 0)

    grid = (S, nkv, max_pages)
    kernel = functools.partial(_kernel_q8, page_size=P, scale=scale)
    out_shape = [
        jax.ShapeDtypeStruct((S, nkv, G, hd), jnp.float32),
        jax.ShapeDtypeStruct((S, nkv, G, 128), jnp.float32),
        jax.ShapeDtypeStruct((S, nkv, G, 128), jnp.float32),
    ]
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G, hd), q_index),
            pl.BlockSpec((1, 1, P, hd), kv_index),
            pl.BlockSpec((1, 1, P, hd), kv_index),
            pl.BlockSpec((1, 1, 1, P), scale_index),
            pl.BlockSpec((1, 1, 1, P), scale_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, hd), o_index),
            pl.BlockSpec((1, 1, G, 128), o_index),
            pl.BlockSpec((1, 1, G, 128), o_index),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, hd), jnp.float32),
        ],
    )
    ks4 = k_scale.reshape(nkv, -1, 1, P)  # unit sublane dim — see _kernel_q8
    vs4 = v_scale.reshape(nkv, -1, 1, P)
    acc, m, l = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(pt, ln, q, k_pages, v_pages, ks4, vs4)
    return acc, m[..., 0], l[..., 0]


def paged_prefix_attention_q8_reference(
    q, k_pages, v_pages, k_scale, v_scale, page_table, lengths, page_size
):
    """jnp oracle for the int8-paged kernel: dequantize the pages, then run
    the bf16 oracle (used for parity tests and the non-TPU engine path)."""
    kd = k_pages.astype(jnp.float32) * k_scale[..., None]
    vd = v_pages.astype(jnp.float32) * v_scale[..., None]
    return paged_prefix_attention_reference(
        q, kd, vd, page_table, lengths, page_size
    )


def paged_prefix_attention_reference(q, k_pages, v_pages, page_table, lengths, page_size):
    """jnp oracle with the same (acc, m, l) contract — materializes the
    contiguous per-slot view (the round-1 approach); used for kernel parity
    tests and as the non-TPU engine path."""
    S, nkv, G, hd = q.shape
    max_pages = page_table.shape[1]
    view_len = max_pages * page_size
    # (nkv, S, view_len, hd)
    k_view = jnp.take(k_pages, page_table, axis=1).reshape(nkv, S, view_len, hd)
    v_view = jnp.take(v_pages, page_table, axis=1).reshape(nkv, S, view_len, hd)
    scale = hd**-0.5
    sc = jnp.einsum("shgd,hskd->shgk", q.astype(jnp.float32), k_view.astype(jnp.float32)) * scale
    pos = jnp.arange(view_len)[None, None, None, :]
    sc = jnp.where(pos < lengths[:, None, None, None], sc, NEG_INF)
    m = jnp.max(sc, axis=-1)
    # fully-masked rows: keep m = NEG_INF and l = 0 (matches the kernel init)
    p = jnp.exp(sc - m[..., None])
    p = jnp.where(pos < lengths[:, None, None, None], p, 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("shgk,hskd->shgd", p, v_view.astype(jnp.float32))
    return acc, m, l


def combine_with_new_token(acc, m, l, q, k_new, v_new):
    """Fold the current (in-register) token into the prefix attention state:
    out[s,h,g] = softmax([prefix scores, q·k_new]) @ [V_prefix, v_new].

    q: (S, nkv, G, hd); k_new/v_new: (S, nkv, hd). Returns (S, nkv, G, hd)
    fp32. Empty prefixes (m=-inf, l=0) reduce to out = v_new."""
    hd = q.shape[-1]
    scale = hd**-0.5
    s_new = jnp.einsum(
        "shgd,shd->shg", q.astype(jnp.float32), k_new.astype(jnp.float32)
    ) * scale
    m_tot = jnp.maximum(m, s_new)
    a = jnp.exp(m - m_tot)  # prefix correction
    b = jnp.exp(s_new - m_tot)  # new-token weight
    num = acc * a[..., None] + b[..., None] * v_new.astype(jnp.float32)[:, :, None, :]
    den = l * a + b
    return num / den[..., None]
