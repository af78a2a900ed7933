"""Pallas TPU kernel for the shared-prefix DECODE step's prefix pass.

The GRPO G-way decode (sampler/engine.decode_loop_shared) keeps ONE physical
prompt-KV copy per prompt; every decode step all R = B/P rows of a prompt
attend the same (Lp, hd) prefix. The jnp path (ops/attention.mha_shared_prefix)
spends ~4 XLA kernels per layer on this: the QK^T dot, the scale/bias/exp
fusion, and the two PV dots — each materializing (B, Hkv, G, Lp) f32
score/prob tensors in HBM. This kernel does the whole prefix pass in ONE
launch per layer with online softmax in VMEM, streaming the int8 pages once:
reference capability class is the vLLM PagedAttention decode kernel
(/root/reference/src/vllm_inference/vllm_infer.py:48-57), redesigned for the
shared-prefix layout instead of per-row page tables.

Contract mirrors ops/paged_attention.py: returns UNNORMALIZED (acc, m, l);
the caller folds the per-row generated suffix and the in-register token via
the flash combine rule (merge_shared_tail below), so the softmax is exact
over [prefix | own suffix | new token].

Layout: the prefix enters HEAD-MAJOR — (P, Hkv, Lp, hd) — so a block is
(1, 1, BLK, hd) with native (sublane, lane) tiling; the caller transposes the
(P, Lp, Hkv, hd) cache once per decode SESSION (decode_loop_shared), not per
step. Scales/bias ride as trailing (1, BLK) tiles (unit sublane dims over
large array dims are rejected by Mosaic — see ops/paged_attention._kernel_q8).

Padding: prompts are LEFT-padded (engine _pack), masked by the additive
prefix_bias (0 valid / -1e30 pad). Fully-masked blocks would poison the
online softmax (exp(-1e30 - (-1e30)) = 1), so probabilities are zeroed
where the score sits at the mask floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pick_block(lp: int) -> int:
    for blk in (512, 256, 128):
        if lp % blk == 0:
            return blk
    return 0


def _kernel(
    q_ref,  # (1, 1, N, hd) bf16 — N = R·G rows of this prompt
    k_ref,  # (1, 1, BLK, hd) int8 | bf16
    v_ref,  # (1, 1, BLK, hd) int8 | bf16
    ks_ref,  # (1, 1, 1, BLK) f32 | None
    vs_ref,  # (1, 1, 1, BLK) f32 | None
    b_ref,  # (1, 1, BLK) f32 additive bias
    o_ref,  # (1, 1, N, hd) f32 UNNORMALIZED
    m_ref,  # (1, 1, N, 128) f32
    l_ref,  # (1, 1, N, 128) f32
    macc,  # (N, 1) f32
    lacc,  # (N, 1) f32
    acc,  # (N, hd) f32
    *,
    scale: float,
    quant: bool,
):
    j = pl.program_id(2)
    nblk = pl.num_programs(2)
    N, hd = q_ref.shape[2], q_ref.shape[3]

    @pl.when(j == 0)
    def _init():
        macc[...] = jnp.full((N, 1), NEG_INF, jnp.float32)
        lacc[...] = jnp.zeros((N, 1), jnp.float32)
        acc[...] = jnp.zeros((N, hd), jnp.float32)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (N, hd)
    k = k_ref[0, 0].astype(jnp.float32)  # (BLK, hd)
    sc = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, BLK)
    if quant:
        sc = sc * ks_ref[0, 0]  # fold K scales on the key axis
    sc = sc + b_ref[0]  # (1, BLK) additive bias (pad → -1e30)
    m_new = jnp.maximum(macc[...], jnp.max(sc, axis=1, keepdims=True))
    corr = jnp.exp(macc[...] - m_new)
    p = jnp.exp(sc - m_new)
    p = jnp.where(sc > NEG_INF * 0.5, p, 0.0)  # masked slots contribute 0
    lacc[...] = lacc[...] * corr + jnp.sum(p, axis=1, keepdims=True)
    if quant:
        p = p * vs_ref[0, 0]  # fold V scales on the prob axis
    v = v_ref[0, 0].astype(jnp.float32)
    acc[...] = acc[...] * corr + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    macc[...] = m_new

    @pl.when(j == nblk - 1)
    def _out():
        o_ref[0, 0] = acc[...]
        m_ref[0, 0] = jnp.broadcast_to(macc[...], (N, 128))
        l_ref[0, 0] = jnp.broadcast_to(lacc[...], (N, 128))


@functools.partial(jax.jit, static_argnames=("interpret",))
def shared_prefix_decode_attention(
    q: jnp.ndarray,  # (P, Hkv, N, hd) bf16 — N = R·G grouped rows, post-rope
    k_pref: jnp.ndarray,  # (P, Hkv, Lp, hd) int8|bf16 HEAD-MAJOR prefix
    v_pref: jnp.ndarray,
    ks: jnp.ndarray | None,  # (P, Hkv, Lp) f32 per-token K scales (int8 only)
    vs: jnp.ndarray | None,
    bias: jnp.ndarray,  # (P, Lp) f32 additive (0 valid / NEG_INF pad)
    interpret: bool | None = None,
):
    """Online-softmax attention of every rollout row over its prompt's shared
    prefix. Returns (acc (P, Hkv, N, hd) f32 UNNORMALIZED, m (P, Hkv, N),
    l (P, Hkv, N)) — merge the suffix/new-token sources with
    merge_shared_tail. Fully-masked prefixes yield m=NEG_INF, l=0."""
    P, Hkv, N, hd = q.shape
    Lp = k_pref.shape[2]
    BLK = pick_block(Lp)
    assert BLK, f"prefix length {Lp} not 128-divisible"
    nblk = Lp // BLK
    scale = hd**-0.5
    quant = k_pref.dtype == jnp.int8
    if interpret is None:
        interpret = _interpret()

    def qo_index(p, h, j):
        return (p, h, 0, 0)

    def kv_index(p, h, j):
        return (p, h, j, 0)

    def s_index(p, h, j):
        return (p, h, 0, j)

    def b_index(p, h, j):
        return (p, 0, j)

    in_specs = [
        pl.BlockSpec((1, 1, N, hd), qo_index),
        pl.BlockSpec((1, 1, BLK, hd), kv_index),
        pl.BlockSpec((1, 1, BLK, hd), kv_index),
    ]
    args = [q, k_pref, v_pref]
    if quant:
        in_specs += [
            pl.BlockSpec((1, 1, 1, BLK), s_index),
            pl.BlockSpec((1, 1, 1, BLK), s_index),
        ]
        args += [ks.reshape(P, Hkv, 1, Lp), vs.reshape(P, Hkv, 1, Lp)]
    in_specs.append(pl.BlockSpec((1, 1, BLK), b_index))
    args.append(bias.reshape(P, 1, Lp).astype(jnp.float32))

    kernel = functools.partial(_kernel, scale=scale, quant=quant)
    if not quant:
        kernel = functools.partial(
            lambda qr, kr, vr, br, *rest, f=None: f(qr, kr, vr, None, None, br, *rest),
            f=kernel,
        )
    out_shape = [
        jax.ShapeDtypeStruct((P, Hkv, N, hd), jnp.float32),
        jax.ShapeDtypeStruct((P, Hkv, N, 128), jnp.float32),
        jax.ShapeDtypeStruct((P, Hkv, N, 128), jnp.float32),
    ]
    acc, m, l = pl.pallas_call(
        kernel,
        grid=(P, Hkv, nblk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, N, hd), qo_index),
            pl.BlockSpec((1, 1, N, 128), qo_index),
            pl.BlockSpec((1, 1, N, 128), qo_index),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((N, 1), jnp.float32),
            pltpu.VMEM((N, 1), jnp.float32),
            pltpu.VMEM((N, hd), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return acc, m[..., 0], l[..., 0]


def _kernel_full(
    q_ref,  # (1, 1, N, hd) bf16 — N = R·G rows of this prompt
    k_ref,  # (1, 1, BLK, hd) int8|bf16 prefix block
    v_ref,
    ks_ref,  # (1, 1, 1, BLK) f32 | None
    vs_ref,
    b_ref,  # (1, 1, BLK) f32 prefix bias
    ko_ref,  # (R, 1, Lo, hd) int8|bf16 own suffix (HEAD-MAJOR cache)
    vo_ref,
    kos_ref,  # (R, 1, 1, Lo) f32 | None
    vos_ref,
    bo_ref,  # (1, Lo) f32 own-suffix validity bias (uniform length)
    kn_ref,  # (1, R, hd) bf16 current token K — (Hkv, B, hd) layout: a
    # (R, 1, hd) block over (B, Hkv, hd) has a unit second-minor block dim
    # over a non-unit array dim, which Mosaic rejects
    vn_ref,
    o_ref,  # (1, 1, N, hd) — NORMALIZED output
    macc,  # (N, 1) f32
    lacc,  # (N, 1) f32
    acc,  # (N, hd) f32
    *,
    scale: float,
    quant_pref: bool,
    quant_own: bool,
    rows: int,  # R
):
    """One launch per layer: online softmax over [shared prefix | own suffix |
    new token]. Grid = (P, Hkv, nblk + 1); the last grid step folds the
    per-row tail (suffix + in-register token) and writes the normalized
    output — no jnp merge afterwards."""
    j = pl.program_id(2)
    nblk = pl.num_programs(2) - 1
    N, hd = q_ref.shape[2], q_ref.shape[3]
    G = N // rows

    @pl.when(j == 0)
    def _init():
        macc[...] = jnp.full((N, 1), NEG_INF, jnp.float32)
        lacc[...] = jnp.zeros((N, 1), jnp.float32)
        acc[...] = jnp.zeros((N, hd), jnp.float32)

    @pl.when(j < nblk)
    def _prefix_block():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # (N, hd)
        k = k_ref[0, 0].astype(jnp.float32)
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if quant_pref:
            sc = sc * ks_ref[0, 0]
        sc = sc + b_ref[0]
        m_new = jnp.maximum(macc[...], jnp.max(sc, axis=1, keepdims=True))
        corr = jnp.exp(macc[...] - m_new)
        p = jnp.exp(sc - m_new)
        p = jnp.where(sc > NEG_INF * 0.5, p, 0.0)
        lacc[...] = lacc[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        if quant_pref:
            p = p * vs_ref[0, 0]
        v = v_ref[0, 0].astype(jnp.float32)
        acc[...] = acc[...] * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        macc[...] = m_new

    @pl.when(j == nblk)
    def _tail():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # (N, hd)
        for r in range(rows):
            qr = q[r * G : (r + 1) * G]  # (G, hd)
            ko = ko_ref[r, 0].astype(jnp.float32)  # (Lo, hd)
            sco = jax.lax.dot_general(
                qr, ko, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (G, Lo)
            if quant_own:
                sco = sco * kos_ref[r, 0]  # (1, Lo)
            sco = sco + bo_ref[...]  # (1, Lo) validity bias
            kn = kn_ref[0, r : r + 1].astype(jnp.float32)  # (1, hd)
            scn = jax.lax.dot_general(
                qr, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (G, 1)
            m_r = macc[r * G : (r + 1) * G]  # (G, 1)
            m_new = jnp.maximum(
                m_r, jnp.maximum(jnp.max(sco, axis=1, keepdims=True), scn)
            )
            corr = jnp.exp(m_r - m_new)
            po = jnp.exp(sco - m_new)
            po = jnp.where(sco > NEG_INF * 0.5, po, 0.0)
            pn = jnp.exp(scn - m_new)  # (G, 1) — always valid
            l_r = lacc[r * G : (r + 1) * G] * corr + jnp.sum(
                po, axis=1, keepdims=True
            ) + pn
            if quant_own:
                po = po * vos_ref[r, 0]
            vo = vo_ref[r, 0].astype(jnp.float32)  # (Lo, hd)
            a_r = acc[r * G : (r + 1) * G] * corr
            a_r = a_r + jax.lax.dot_general(
                po, vo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            vn = vn_ref[0, r : r + 1].astype(jnp.float32)  # (1, hd)
            a_r = a_r + jax.lax.dot_general(
                pn, vn, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            o_ref[0, 0, r * G : (r + 1) * G] = (a_r / l_r).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def shared_prefix_decode_full(
    q: jnp.ndarray,  # (P, Hkv, N, hd) bf16 — N = R·G grouped rows, post-rope
    k_pref: jnp.ndarray,  # (P, Hkv, Lp, hd) int8|bf16 HEAD-MAJOR prefix
    v_pref: jnp.ndarray,
    ks: jnp.ndarray | None,  # (P, Hkv, Lp) f32 (int8 prefix only)
    vs: jnp.ndarray | None,
    bias: jnp.ndarray,  # (P, Lp) f32 additive prefix bias
    k_own: jnp.ndarray,  # (B, Hkv, Lo, hd) int8|bf16 HEAD-MAJOR suffix cache
    v_own: jnp.ndarray,
    ks_own: jnp.ndarray | None,  # (B, Hkv, Lo) f32 (int8 suffix only)
    vs_own: jnp.ndarray | None,
    bias_own: jnp.ndarray,  # (Lo,) f32 validity bias (uniform across rows)
    k_new: jnp.ndarray,  # (B, Hkv, hd) bf16 current token
    v_new: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Whole decode-step attention in ONE kernel launch: exact softmax over
    [shared prefix | own generated suffix | new token]. Returns the
    normalized (P, Hkv, N, hd) context in q.dtype."""
    P, Hkv, N, hd = q.shape
    B = k_own.shape[0]
    R = B // P
    Lp = k_pref.shape[2]
    Lo = k_own.shape[2]
    BLK = pick_block(Lp)
    assert BLK, f"prefix length {Lp} not 128-divisible"
    nblk = Lp // BLK
    scale = hd**-0.5
    quant_pref = k_pref.dtype == jnp.int8
    quant_own = k_own.dtype == jnp.int8
    if interpret is None:
        interpret = _interpret()

    def qo_index(p, h, j):
        return (p, h, 0, 0)

    def kv_index(p, h, j):
        return (p, h, jnp.minimum(j, nblk - 1), 0)  # tail step: skip the DMA

    def s_index(p, h, j):
        return (p, h, 0, jnp.minimum(j, nblk - 1))

    def b_index(p, h, j):
        return (p, 0, jnp.minimum(j, nblk - 1))

    def own_index(p, h, j):
        return (p, h, 0, 0)  # rows [p·R, (p+1)·R) via block shape

    def owns_index(p, h, j):
        return (p, h, 0, 0)

    def bo_index(p, h, j):
        return (0, 0)

    def n_index(p, h, j):
        return (h, p, 0)

    in_specs = [pl.BlockSpec((1, 1, N, hd), qo_index)]
    args = [q]
    in_specs += [
        pl.BlockSpec((1, 1, BLK, hd), kv_index),
        pl.BlockSpec((1, 1, BLK, hd), kv_index),
    ]
    args += [k_pref, v_pref]
    if quant_pref:
        in_specs += [
            pl.BlockSpec((1, 1, 1, BLK), s_index),
            pl.BlockSpec((1, 1, 1, BLK), s_index),
        ]
        args += [ks.reshape(P, Hkv, 1, Lp), vs.reshape(P, Hkv, 1, Lp)]
    in_specs.append(pl.BlockSpec((1, 1, BLK), b_index))
    args.append(bias.reshape(P, 1, Lp).astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((R, 1, Lo, hd), own_index),
        pl.BlockSpec((R, 1, Lo, hd), own_index),
    ]
    args += [k_own, v_own]
    if quant_own:
        in_specs += [
            pl.BlockSpec((R, 1, 1, Lo), owns_index),
            pl.BlockSpec((R, 1, 1, Lo), owns_index),
        ]
        args += [ks_own.reshape(B, Hkv, 1, Lo), vs_own.reshape(B, Hkv, 1, Lo)]
    in_specs.append(pl.BlockSpec((1, Lo), bo_index))
    args.append(bias_own.reshape(1, Lo).astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((1, R, hd), n_index),
        pl.BlockSpec((1, R, hd), n_index),
    ]
    args += [k_new.swapaxes(0, 1), v_new.swapaxes(0, 1)]  # → (Hkv, B, hd)

    base = functools.partial(
        _kernel_full, scale=scale, quant_pref=quant_pref, quant_own=quant_own, rows=R
    )
    if quant_pref and quant_own:
        kernel = base
    elif quant_pref:
        def kernel(qr, kr, vr, ksr, vsr, br, kor, vor, bor, knr, vnr, *rest):
            base(qr, kr, vr, ksr, vsr, br, kor, vor, None, None, bor, knr, vnr, *rest)
    elif quant_own:
        def kernel(qr, kr, vr, br, kor, vor, kosr, vosr, bor, knr, vnr, *rest):
            base(qr, kr, vr, None, None, br, kor, vor, kosr, vosr, bor, knr, vnr, *rest)
    else:
        def kernel(qr, kr, vr, br, kor, vor, bor, knr, vnr, *rest):
            base(qr, kr, vr, None, None, br, kor, vor, None, None, bor, knr, vnr, *rest)

    out = pl.pallas_call(
        kernel,
        grid=(P, Hkv, nblk + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, N, hd), qo_index),
        out_shape=jax.ShapeDtypeStruct((P, Hkv, N, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((N, 1), jnp.float32),
            pltpu.VMEM((N, 1), jnp.float32),
            pltpu.VMEM((N, hd), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out


def merge_shared_tail(
    acc: jnp.ndarray,  # (P, Hkv, N, hd) f32 — kernel output (unnormalized)
    m: jnp.ndarray,  # (P, Hkv, N) f32
    l: jnp.ndarray,  # (P, Hkv, N) f32
    q: jnp.ndarray,  # (B, 1, H, hd) — the SAME post-rope queries
    k_own,  # (B, Lo, Hkv, hd) int8|bf16 per-row suffix | None
    v_own,
    ks_own,  # (B, Lo, Hkv) f32 | None
    vs_own,
    k_new: jnp.ndarray,  # (B, 1, Hkv, hd) bf16 current token
    v_new: jnp.ndarray,
    bias_own,  # (B|1, 1, 1, Lo) f32 | None
    scale: float | None = None,
) -> jnp.ndarray:
    """Fold the per-row generated suffix and the in-register token into the
    kernel's prefix softmax state — the softmax is exact over the union
    (same combine rule as ops/paged_attention.combine_with_new_token).
    Returns (B, 1, H, hd) in q.dtype."""
    B, S, H, hd = q.shape
    P, Hkv, N, _ = acc.shape
    G = H // Hkv
    R = B // P
    if scale is None:
        scale = hd**-0.5

    # kernel row r·G+g of prompt p ↔ batch row p·R+r, head h·G+g
    accb = acc.reshape(P, Hkv, R, G, hd).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, G, hd)
    mb = m.reshape(P, Hkv, R, G).transpose(0, 2, 1, 3).reshape(B, Hkv, G)
    lb = l.reshape(P, Hkv, R, G).transpose(0, 2, 1, 3).reshape(B, Hkv, G)

    qg = q.reshape(B, Hkv, G, hd).astype(jnp.float32) * scale
    ln = jnp.einsum(
        "bhgd,bhd->bhg", qg, k_new.reshape(B, Hkv, hd).astype(jnp.float32)
    )  # (B, Hkv, G)

    if k_own is not None:
        lo = jnp.einsum(
            "bhgd,bkhd->bhgk", qg, k_own.astype(jnp.float32)
        )  # (B, Hkv, G, Lo)
        if ks_own is not None:
            lo = lo * jnp.moveaxis(ks_own, 1, -1)[:, :, None, :]
        if bias_own is not None:
            # (B|1, 1, 1, Lo) additive validity mask → broadcast over heads
            lo = lo + bias_own[:, :, 0, :][:, :, None, :]
        m_tail = jnp.maximum(jnp.max(lo, axis=-1), ln)
    else:
        lo = None
        m_tail = ln

    m_tot = jnp.maximum(mb, m_tail)  # (B, Hkv, G)
    corr = jnp.exp(mb - m_tot)
    pn = jnp.exp(ln - m_tot)  # (B, Hkv, G)
    num = accb * corr[..., None] + pn[..., None] * v_new.reshape(B, Hkv, hd).astype(
        jnp.float32
    )[:, :, None, :]
    den = lb * corr + pn
    if lo is not None:
        po = jnp.exp(lo - m_tot[..., None])
        po = jnp.where(lo > NEG_INF * 0.5, po, 0.0)
        den = den + jnp.sum(po, axis=-1)
        if vs_own is not None:
            po = po * jnp.moveaxis(vs_own, 1, -1)[:, :, None, :]
        num = num + jnp.einsum("bhgk,bkhd->bhgd", po, v_own.astype(jnp.float32))
    out = num / den[..., None]
    return out.reshape(B, 1, H, hd).astype(q.dtype)
