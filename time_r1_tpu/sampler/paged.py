"""Paged KV cache pool (N2: vLLM PagedAttention memory model).

The slot cache in sampler/continuous.py reserves max_len rows per slot; this
pool instead shares fixed-size PAGES across slots, so HBM is bounded by the
TOTAL tokens resident rather than slots × max_len — the property that lets
vLLM pack heterogeneous-length sequences (e.g. VideoMME long prompts next to
short Charades ones).

Layout:
  pool.k / pool.v : (L, Hkv, n_pages, page_size, hd) — (P, hd) = (128, 128)
                    minor dims tile TPU registers exactly
  page_table      : (slots, max_pages_per_slot) int32 — pool page per block
  lengths         : (slots,) written tokens per slot

Host side: a free-list allocator assigns/releases pages at admission/retire.
Device side (jit):
  - `write_prompt`: scatter a prefilled (L, S, Hkv, hd) sequence into its pages;
  - `paged_decode_segment`: K decode steps on device. Attention over the
    page-resident prefix runs the Pallas paged-attention kernel
    (ops/paged_attention.py) with the page table scalar-prefetched — pages
    are read IN PLACE, no contiguous view is materialized (vLLM
    PagedAttention capability). The current token combines in-register via
    the online-softmax state, and the pool takes ONE all-layer scatter per
    step. Non-TPU backends use the gather-view jnp oracle.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen25vl import Qwen25VLConfig
from ..models.qwen25vl.language import _rms_norm, _rotate_half, lm_logits, mrope_cos_sin
from ..ops.quant import attn_qkv_proj, embed_lookup, mlp_proj, qmatmul
from .engine import sample_tokens
from .params import SamplingParams


class PagedPool(NamedTuple):
    k: jnp.ndarray  # (L, Hkv, n_pages, P, hd) — bf16, or int8 when quantized
    v: jnp.ndarray
    page_table: jnp.ndarray  # (slots, max_pages) int32
    lengths: jnp.ndarray  # (slots,) int32
    # int8-KV mode (vLLM --kv-cache-dtype int8 capability composed with the
    # paged pool): per-(token, head) f32 scales; None in bf16 mode
    k_scale: jnp.ndarray | None = None  # (L, Hkv, n_pages, P)
    v_scale: jnp.ndarray | None = None


class PageAllocator:
    """Host free-list over pool pages. Page 0 is RESERVED as the scratch sink
    for dead slots' decode writes (a retired slot's stale page table must
    never receive writes — its pages may already belong to another slot)."""

    def __init__(self, n_pages: int):
        self.free: List[int] = list(range(n_pages - 1, 0, -1))

    def alloc(self, n: int) -> List[int]:
        if n > len(self.free):
            raise MemoryError(f"KV pool exhausted: need {n} pages, have {len(self.free)}")
        return [self.free.pop() for _ in range(n)]

    def release(self, pages: List[int]) -> None:
        self.free.extend(pages)


def make_pool(
    cfg: Qwen25VLConfig,
    n_pages: int,
    page_size: int,
    slots: int,
    max_pages: int,
    dtype=jnp.bfloat16,
    kv_quant: bool = False,
) -> PagedPool:
    t = cfg.text
    shape = (t.num_hidden_layers, t.num_key_value_heads, n_pages, page_size, t.head_dim)
    kv_dtype = jnp.int8 if kv_quant else dtype
    return PagedPool(
        k=jnp.zeros(shape, kv_dtype),
        v=jnp.zeros(shape, kv_dtype),
        page_table=jnp.zeros((slots, max_pages), jnp.int32),
        lengths=jnp.zeros((slots,), jnp.int32),
        k_scale=jnp.zeros(shape[:-1], jnp.float32) if kv_quant else None,
        v_scale=jnp.zeros(shape[:-1], jnp.float32) if kv_quant else None,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def write_prompt(
    pool: PagedPool,
    slot: jnp.ndarray,  # () int32
    prompt_pages: jnp.ndarray,  # (n_prompt_pages,) page ids holding the prompt KV
    table_row: jnp.ndarray,  # (max_pages,) full page table row (prompt + decode pages)
    k_seq: jnp.ndarray,  # (L, S, Hkv, hd) — S == n_prompt_pages · page_size
    v_seq: jnp.ndarray,
    length: jnp.ndarray,  # () int32 true token count (≤ S)
) -> PagedPool:
    """Scatter a prefilled sequence into its pages and register the slot.
    int8 pools quantize per (token, head) at write time (prefill stays bf16)."""
    L = pool.k.shape[0]
    P = pool.k.shape[3]
    n = prompt_pages.shape[0]

    def to_pages(seq):  # (L, S, Hkv, hd) → (L, Hkv, n, P, hd)
        return seq.reshape(L, n, P, *seq.shape[2:]).transpose(0, 3, 1, 2, 4)

    new_ks, new_vs = pool.k_scale, pool.v_scale
    if pool.k_scale is not None:
        from ..ops.quant import quantize_kv

        k8, ks = quantize_kv(k_seq)  # scales (L, S, Hkv)
        v8, vs = quantize_kv(v_seq)
        kp, vp = to_pages(k8), to_pages(v8)
        ksp = ks.reshape(L, n, P, -1).transpose(0, 3, 1, 2)  # (L, Hkv, n, P)
        vsp = vs.reshape(L, n, P, -1).transpose(0, 3, 1, 2)
        new_ks = pool.k_scale.at[:, :, prompt_pages].set(ksp)
        new_vs = pool.v_scale.at[:, :, prompt_pages].set(vsp)
    else:
        kp = to_pages(k_seq).astype(pool.k.dtype)
        vp = to_pages(v_seq).astype(pool.v.dtype)
    new_k = pool.k.at[:, :, prompt_pages].set(kp)
    new_v = pool.v.at[:, :, prompt_pages].set(vp)
    new_table = pool.page_table.at[slot].set(table_row.astype(jnp.int32))
    new_lengths = pool.lengths.at[slot].set(length.astype(jnp.int32))
    return PagedPool(new_k, new_v, new_table, new_lengths, new_ks, new_vs)


def _paged_one_step(
    params,
    pool: PagedPool,
    cfg: Qwen25VLConfig,
    sp: SamplingParams,
    last: jnp.ndarray,  # (slots,) last token per slot
    start_pos: jnp.ndarray,  # (slots,) rope base of the next token
    steps: jnp.ndarray,  # (slots,) generated so far
    live: jnp.ndarray,  # (slots,) bool
    rng: jnp.ndarray,
    lora_side=None,  # (stacked decoder-adapter tree, scaling) — language docs
):
    """One decode step over the paged pool → (pool, next_token (slots,)).

    lora_side: UNMERGED side-path adapters (ops/quant.lora_delta) applied at
    every projection — vLLM --enable-lora capability on the paged engine
    (one adapter set; the base weights stay shared/quantized)."""
    from ..ops.paged_attention import (
        combine_with_new_token,
        paged_prefix_attention,
        paged_prefix_attention_q8,
        paged_prefix_attention_q8_reference,
        paged_prefix_attention_reference,
    )

    tcfg = cfg.text
    nh, nkv, hd = tcfg.num_attention_heads, tcfg.num_key_value_heads, tcfg.head_dim
    G = nh // nkv
    eps = tcfg.rms_norm_eps
    slots, max_pages = pool.page_table.shape
    P = pool.k.shape[3]
    kv_quant = pool.k_scale is not None

    pos = start_pos + steps
    pos3 = jnp.broadcast_to(pos[None, :, None], (3, slots, 1))
    cos, sin = mrope_cos_sin(tcfg, pos3)
    cos_b, sin_b = cos[:, :, None, :], sin[:, :, None, :]

    x = embed_lookup(
        params["text"]["embed_tokens"]["embedding"], last[:, None],
        dtype=params["text"]["norm"]["scale"].dtype,
    )

    use_kernel = jax.default_backend() == "tpu" and hd % 128 == 0 and P % 128 == 0

    def layer(x, scanned):
        lslice = None
        if lora_side is not None:
            scanned, lslice = scanned  # adapter tree scans WITH the layers
        if kv_quant:
            lp, layer_k, layer_v, layer_ks, layer_vs = scanned
        else:
            lp, layer_k, layer_v = scanned  # layer_k/v: (nkv, n_pages, P, hd)
        side_attn = side_mlp = None
        if lora_side is not None:
            side_attn = (lslice.get("self_attn", {}), lora_side[1])
            side_mlp = (lslice.get("mlp", {}), lora_side[1])
        h = _rms_norm(x, lp["input_layernorm"]["scale"], eps)
        q, k, v = attn_qkv_proj(h, lp["self_attn"], nh, nkv, hd, lora=side_attn)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos_b + _rotate_half(qf) * sin_b).astype(x.dtype)
        k = (kf * cos_b + _rotate_half(kf) * sin_b).astype(x.dtype)
        # grouped queries (slots, nkv, G, hd); prefix attention over pages
        # IN PLACE (scalar-prefetched page table — no contiguous view)
        qg = q[:, 0].reshape(slots, nkv, G, hd)
        if kv_quant:
            fn = paged_prefix_attention_q8 if use_kernel else paged_prefix_attention_q8_reference
            acc, m, l = fn(
                qg, layer_k, layer_v, layer_ks, layer_vs,
                pool.page_table, pool.lengths, P,
            )
        else:
            fn = paged_prefix_attention if use_kernel else paged_prefix_attention_reference
            acc, m, l = fn(
                qg, layer_k.astype(q.dtype), layer_v.astype(q.dtype),
                pool.page_table, pool.lengths, P,
            )
        attn = combine_with_new_token(acc, m, l, qg, k[:, 0], v[:, 0])
        attn = attn.reshape(slots, 1, nh * hd).astype(x.dtype)
        a = qmatmul(attn, lp["self_attn"]["o_w"])
        if side_attn is not None and "o_w" in side_attn[0]:
            from ..ops.quant import lora_delta

            a = a + lora_delta(attn, side_attn[0]["o_w"], lora_side[1])
        x = x + a
        h = _rms_norm(x, lp["post_attention_layernorm"]["scale"], eps)
        x = x + mlp_proj(h, lp["mlp"], lora=side_mlp)
        return x, (k[:, 0], v[:, 0])

    scanned = (
        (params["text"]["layers"], pool.k, pool.v, pool.k_scale, pool.v_scale)
        if kv_quant
        else (params["text"]["layers"], pool.k, pool.v)
    )
    if lora_side is not None:
        scanned = (scanned, lora_side[0])
    x, (ks, vs) = jax.lax.scan(layer, x, scanned)
    # ks/vs: (L, slots, nkv, hd) — ONE all-layer scatter at each slot's write
    # cell. Dead slots write into the reserved scratch page 0 (their stale
    # page tables may reference pages reallocated to other slots).
    write_page = jnp.take_along_axis(
        pool.page_table, (pool.lengths // P)[:, None], axis=1
    )[:, 0]
    write_page = jnp.where(live, write_page, 0)
    write_off = jnp.where(live, pool.lengths % P, 0)
    new_ksc, new_vsc = pool.k_scale, pool.v_scale
    if kv_quant:
        from ..ops.quant import quantize_kv

        k8, ksc = quantize_kv(ks)  # (L, slots, nkv) scales
        v8, vsc = quantize_kv(vs)
        ks, vs = k8, v8
        new_ksc = pool.k_scale.at[:, :, write_page, write_off].set(ksc.transpose(0, 2, 1))
        new_vsc = pool.v_scale.at[:, :, write_page, write_off].set(vsc.transpose(0, 2, 1))
    pk = pool.k.at[:, :, write_page, write_off].set(
        ks.transpose(0, 2, 1, 3).astype(pool.k.dtype)
    )
    pv = pool.v.at[:, :, write_page, write_off].set(
        vs.transpose(0, 2, 1, 3).astype(pool.v.dtype)
    )

    x = _rms_norm(x, params["text"]["norm"]["scale"], eps)
    logits = lm_logits(params["text"], tcfg, x)[:, 0]
    rng, sub = jax.random.split(rng)
    nxt = sample_tokens(logits, sub, sp)
    nxt = jnp.where(live, nxt, cfg.pad_token_id)
    pool = PagedPool(
        k=pk, v=pv, page_table=pool.page_table,
        lengths=pool.lengths + live.astype(jnp.int32),
        k_scale=new_ksc, v_scale=new_vsc,
    )
    return pool, nxt


@functools.partial(jax.jit, static_argnames=("cfg", "segment", "sp"), donate_argnums=(1,))
def paged_decode_segment(
    params,
    pool: PagedPool,
    cfg: Qwen25VLConfig,
    segment: int,
    sp: SamplingParams,
    last: jnp.ndarray,  # (slots,)
    start_pos: jnp.ndarray,  # (slots,)
    steps: jnp.ndarray,  # (slots,) generated so far
    active: jnp.ndarray,  # (slots,) bool — occupied slots
    max_steps: jnp.ndarray,  # (slots,) per-slot remaining budget
    rng: jnp.ndarray,
    lora_side=None,  # (tree, scaling) side-path adapters (_paged_one_step docs)
):
    """Up to `segment` on-device decode steps (iteration-level scheduling —
    same K-step host-sync pattern as sampler.continuous.decode_segment).
    Returns (pool, tokens (slots, segment), last, steps, done)."""
    stop_ids = jnp.array(sp.stop_token_ids, jnp.int32)

    def one(carry, _):
        pool, last, steps, done, rng = carry
        live = active & ~done & (steps < max_steps)
        rng, sub = jax.random.split(rng)
        pool, nxt = _paged_one_step(
            params, pool, cfg, sp, last, start_pos, steps, live, sub, lora_side
        )
        done = done | (live & jnp.isin(nxt, stop_ids))
        last = jnp.where(live, nxt, last)
        steps = steps + live.astype(jnp.int32)
        return (pool, last, steps, done, rng), nxt

    done0 = jnp.isin(last, jnp.array(sp.stop_token_ids, jnp.int32)) | ~active
    (pool, last, steps, done, _), toks = jax.lax.scan(
        one, (pool, last, steps, done0, rng), None, length=segment
    )
    return pool, toks.T, last, steps, done


class PagedEngine:
    """Continuous batching over the paged pool (same semantics as
    sampler.continuous.ContinuousEngine; memory bounded by resident tokens)."""

    def __init__(
        self,
        params: dict,
        cfg: Qwen25VLConfig,
        max_slots: int = 8,
        max_len: int = 4096,
        page_size: int = 128,
        n_pages: int | None = None,
        dtype=jnp.bfloat16,
        prefill_chunk_tokens: int = 8192,
        segment: int = 16,
        quantization: str | None = None,  # None | "int8" (weight-only, ops/quant.py)
        kv_cache_quant: bool = False,  # int8 pages + per-token scales
        interleave_decode: bool = True,  # decode segments BETWEEN prefill chunks
    ):
        from .engine import Engine

        if quantization:
            from ..ops.quant import quantize_params_jit

            params = quantize_params_jit(params, bits={"int8": 8, "int4": 4}[quantization])
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_len = max_len
        self.P = page_size
        self.max_pages = (max_len + page_size - 1) // page_size
        self.n_pages = n_pages or self.max_pages * max_slots
        self.dtype = dtype
        self.segment = segment
        self.kv_cache_quant = kv_cache_quant
        self.interleave_decode = interleave_decode
        self.prefill_chunk_tokens = prefill_chunk_tokens
        # prefill (and its cache) stay bf16; pages quantize at write_prompt
        self._prefill_engine = Engine(params, cfg, dtype, prefill_chunk_tokens)
        self.lora_side = None

    def set_lora_side(self, tree, scaling: float = 1.0) -> None:
        """Install (or clear) ONE set of side-path LoRA adapters for every
        subsequent prefill/decode — vLLM --enable-lora capability on the
        continuous paged engine. The prefill engine prepares the tree
        (dtype pre-cast / optional grouping, Engine.set_lora_side docs) and
        the decode segments reuse the prepared form."""
        self._prefill_engine.set_lora_side(tree, scaling)
        self.lora_side = self._prefill_engine.lora_side

    def _admit_many(self, pool_box, allocator, admits, sp, on_chunk=None, register=None):
        """Admissions grouped by prompt bucket, one batched prefill per group.
        Engine._pack pads a batch to its LONGEST row's power-of-two bucket, so
        a mixed admission wave (200- and 1800-token prompts together) would
        prefill EVERY row at 2048 tokens; splitting the wave by bucket makes
        each prompt pay only its own padded length (~2× less prefill compute
        at a uniform length mix). Resident slots decode between group
        prefills via on_chunk, same as between a long admission's chunks.

        `register(admit_tuple, info)` is called per row as soon as its group's
        prefill lands — BEFORE the next group runs — so slots admitted by an
        earlier group are already live for the between-group/chunk decode
        segments (the cold-start case: a wave of [long, short] prompts decodes
        the long slot while the short group prefills, and vice versa)."""
        from .engine import _bucket

        groups: dict[int, list] = {}
        for a in admits:
            groups.setdefault(_bucket(len(a[2].input_ids)), []).append(a)
        out: dict[int, tuple] = {}
        for gi, bucket in enumerate(sorted(groups, reverse=True)):
            if gi and on_chunk is not None:
                on_chunk()
            group = groups[bucket]
            infos = self._admit_group(pool_box, allocator, group, sp, on_chunk)
            for a, res in zip(group, infos):
                out[id(a)] = res
                if register is not None:
                    register(a, res)
        return [out[id(a)] for a in admits]

    def _admit_group(self, pool_box, allocator, admits, sp, on_chunk=None):
        """ONE batched prefill for a same-bucket admission group; each row's
        KV is paged into its freshly-allocated pages. admits: [(slot, req_idx,
        Request)] → [(first, start_pos, pages)]; the pool is threaded through
        the MUTABLE pool_box["pool"] because on_chunk may decode (donating
        and replacing the pool buffer) mid-admission.

        on_chunk (vLLM chunked-prefill INTERLEAVE, vllm_infer.py:53): called
        between prefill chunks so resident slots keep decoding while a long
        admission streams in — a 10k-token VideoMME prompt no longer stalls
        every live slot for its whole prefill."""
        eng = self._prefill_engine
        eng.params = self.params
        reqs = [r for _, _, r in admits]
        ids, mask, pos_ids, start_pos, vis, S, _ = eng._pack(reqs, extra_len=0)
        if on_chunk is not None and S > self.prefill_chunk_tokens:
            first_logits, cache = self._prefill_interleaved(
                eng, ids, mask, pos_ids, vis, S, on_chunk
            )
        else:
            first_logits, cache = eng._prefill(ids, mask, pos_ids, vis, S, S)
        seed0 = sp.seed if sp.seed is not None else 0
        out = []
        for row, (slot, req_idx, req) in enumerate(admits):
            rng = jax.random.fold_in(jax.random.PRNGKey(seed0), req_idx)
            first = int(
                np.asarray(sample_tokens(jnp.asarray(first_logits[row : row + 1]), rng, sp))[0]
            )
            L_prompt = len(req.input_ids)
            lead = S - L_prompt
            n_prompt_pages = -(-L_prompt // self.P)
            n_total = min(-(-(L_prompt + sp.max_new_tokens) // self.P), self.max_pages)
            pages = allocator.alloc(n_total)
            # contiguous prompt KV, right-padded to a page multiple
            k = jax.lax.dynamic_slice_in_dim(cache.k[:, row], lead, L_prompt, axis=1)
            v = jax.lax.dynamic_slice_in_dim(cache.v[:, row], lead, L_prompt, axis=1)
            pad = n_prompt_pages * self.P - L_prompt
            if pad:
                k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
                v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
            table_row = np.zeros((self.max_pages,), np.int32)
            table_row[:n_total] = pages
            pool_box["pool"] = write_prompt(
                pool_box["pool"],
                jnp.asarray(slot, jnp.int32),
                jnp.asarray(pages[:n_prompt_pages], jnp.int32),
                jnp.asarray(table_row),
                k,
                v,
                jnp.asarray(L_prompt, jnp.int32),
            )
            out.append((first, int(start_pos[row]), pages))
        return out

    def _prefill_interleaved(self, eng, ids, mask, pos_ids, vis, S, on_chunk):
        """Engine._prefill with `on_chunk()` BETWEEN chunks — resident slots
        decode while a long admission streams in. One chunk-loop
        implementation (eng.params was synced to self.params by the caller)."""
        return eng._prefill(ids, mask, pos_ids, vis, S, S, on_chunk=on_chunk)

    def generate(self, requests, sp: SamplingParams):
        from collections import deque

        G = sp.num_return_sequences
        rows = [(i, r) for i, r in enumerate([r for r in requests for _ in range(G)])]
        # longest-first: admission waves become bucket-homogeneous (one
        # prefill shape per wave) and the long-prompt tail is never the last
        # thing keeping the pool half-empty; results keyed by row index, so
        # output order is unchanged
        rows.sort(key=lambda t: len(t[1].input_ids), reverse=True)
        queue = deque(rows)
        n_total = len(queue)
        results: dict[int, list[int]] = {}
        stop_set = set(sp.stop_token_ids)

        pool_box = {
            "pool": make_pool(
                self.cfg, self.n_pages, self.P, self.max_slots, self.max_pages,
                self.dtype, kv_quant=self.kv_cache_quant,
            )
        }
        allocator = PageAllocator(self.n_pages)
        slot_req = [None] * self.max_slots
        slot_tokens: list[list[int]] = [[] for _ in range(self.max_slots)]
        slot_pages: list[list[int]] = [[] for _ in range(self.max_slots)]
        start_pos = np.zeros((self.max_slots,), np.int64)
        steps = np.zeros((self.max_slots,), np.int64)
        last = np.zeros((self.max_slots,), np.int64)
        rng = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)

        def retire(slot, idx):
            row = []
            for t in slot_tokens[slot]:
                if t in stop_set:
                    if sp.include_stop_token:
                        row.append(t)
                    break
                row.append(t)
            results[idx] = row[: sp.max_new_tokens]
            allocator.release(slot_pages[slot])
            slot_pages[slot] = []
            slot_req[slot] = None

        def segment_and_retire() -> bool:
            """One K-step decode segment over the live slots + retirement.
            Returns False when no slot was live (nothing decoded)."""
            nonlocal last, steps, rng
            active_np = np.array(
                [slot_req[s] is not None and len(slot_tokens[s]) < sp.max_new_tokens
                 and slot_tokens[s][-1] not in stop_set for s in range(self.max_slots)]
            )
            if not active_np.any():
                return False
            max_steps = np.array(
                [sp.max_new_tokens - len(slot_tokens[s]) + steps[s] if slot_req[s] is not None else 0
                 for s in range(self.max_slots)],
                np.int64,
            )
            rng, sub = jax.random.split(rng)
            pool_box["pool"], toks, last_j, steps_j, done_j = paged_decode_segment(
                self.params,
                pool_box["pool"],
                self.cfg,
                self.segment,
                sp,
                jnp.asarray(last, jnp.int32),
                jnp.asarray(start_pos, jnp.int32),
                jnp.asarray(steps, jnp.int32),
                jnp.asarray(active_np),
                jnp.asarray(max_steps, jnp.int32),
                sub,
                self.lora_side,
            )
            toks = np.asarray(toks)
            steps_old = steps.copy()
            last = np.asarray(last_j).astype(np.int64)
            steps = np.asarray(steps_j).astype(np.int64)
            done_np = np.asarray(done_j)
            for slot in range(self.max_slots):
                if not active_np[slot]:
                    continue
                # exactly steps_new - steps_old real tokens were generated;
                # the rest of the row is pad (slot went done / out of budget)
                n_new = int(steps[slot] - steps_old[slot])
                for t in toks[slot][:n_new]:
                    slot_tokens[slot].append(int(t))
                finished = done_np[slot] or len(slot_tokens[slot]) >= sp.max_new_tokens
                if finished:
                    retire(slot, slot_req[slot])
            return True

        while len(results) < n_total:
            admits = []
            for slot in range(self.max_slots):
                if slot_req[slot] is None and queue:
                    idx, req = queue.popleft()
                    if len(req.input_ids) + sp.max_new_tokens > self.max_len:
                        raise ValueError("request exceeds max_len")
                    admits.append((slot, idx, req))
            if admits:
                # resident slots keep decoding between a long admission's
                # prefill chunks AND between bucket groups (the chunked-prefill
                # interleave); each group's slots register via the callback as
                # soon as its prefill lands, so they are live for the segments
                # fired while LATER groups of the same wave still prefill
                on_chunk = segment_and_retire if self.interleave_decode else None

                def register(admit, info):
                    slot, idx, _req = admit
                    first, sp0, pages = info
                    slot_req[slot] = idx
                    slot_pages[slot] = pages
                    slot_tokens[slot] = [first]
                    start_pos[slot] = sp0
                    steps[slot] = 0
                    last[slot] = first
                    if first in stop_set:
                        retire(slot, idx)

                self._admit_many(pool_box, allocator, admits, sp, on_chunk, register)

            if not segment_and_retire():
                # every occupied slot already finished (stop/budget) — retire
                for slot in range(self.max_slots):
                    if slot_req[slot] is not None:
                        retire(slot, slot_req[slot])
        return [results[i] for i in range(n_total)]
