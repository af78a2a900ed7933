"""Continuous-batching inference engine (N2: vLLM scheduler capability).

The bucket-batch `Engine` pads every request to the longest prompt and waits
for the slowest row. This engine instead keeps a fixed pool of SLOTS over a
shared static KV cache and schedules at iteration level, like vLLM:

- a host-side queue feeds free slots; each admission runs a (chunked) prefill
  into a per-request cache and scatters it into the slot's rows;
- decode runs in SEGMENTS of K steps fully on device (one jitted program,
  per-slot lengths/positions/done handled with scatter writes and per-row
  causal bias), then syncs to the host, retires finished slots and admits
  new requests — iteration-level scheduling with K-step granularity, the
  TPU-friendly version of continuous batching (per-step host sync would pay
  a tunnel round trip per token);
- slot recycling bounds HBM: pool = (L, max_slots, max_len, Hkv, D).

Same request/response semantics as Engine.generate (stop ids, include-stop).
"""

from __future__ import annotations

import functools
from collections import deque
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen25vl import Qwen25VLConfig
from ..models.qwen25vl.language import _rms_norm, _rotate_half, lm_logits, mrope_cos_sin
from ..ops.attention import NEG_INF, mha_cached
from ..ops.quant import attn_qkv_proj, embed_lookup, mlp_proj, qmatmul
from .engine import Engine, Request, sample_tokens
from .params import SamplingParams


class SlotState(NamedTuple):
    k: jnp.ndarray  # (L, slots, max_len, Hkv, hd)
    v: jnp.ndarray
    lengths: jnp.ndarray  # (slots,) written kv length per slot
    last: jnp.ndarray  # (slots,) last token
    start_pos: jnp.ndarray  # (slots,) rope position of next generated token
    done: jnp.ndarray  # (slots,) bool
    steps: jnp.ndarray  # (slots,) generated count


@functools.partial(jax.jit, static_argnames=("cfg", "segment", "sp"), donate_argnums=(1,))
def decode_segment(
    params,
    state: SlotState,
    cfg: Qwen25VLConfig,
    segment: int,
    sp: SamplingParams,
    rng: jnp.ndarray,
    active: jnp.ndarray,  # (slots,) bool — occupied slots
    max_steps: jnp.ndarray,  # (slots,) per-slot remaining budget
):
    """Run up to `segment` decode steps for all active slots on device.
    Returns (state, tokens (slots, segment) — pad_id where inactive/done)."""
    tcfg = cfg.text
    nh, nkv, hd = tcfg.num_attention_heads, tcfg.num_key_value_heads, tcfg.head_dim
    eps = tcfg.rms_norm_eps
    slots = state.lengths.shape[0]
    max_len = state.k.shape[2]
    stop_ids = jnp.array(sp.stop_token_ids, jnp.int32)
    layers = params["text"]["layers"]

    def one_step(carry, _):
        state, rng = carry
        live = active & ~state.done & (state.steps < max_steps)
        pos = state.start_pos + state.steps  # (slots,)
        pos3 = jnp.broadcast_to(pos[None, :, None], (3, slots, 1))
        cos, sin = mrope_cos_sin(tcfg, pos3)
        cos_b, sin_b = cos[:, :, None, :], sin[:, :, None, :]

        x = embed_lookup(
            params["text"]["embed_tokens"]["embedding"], state.last[:, None],
            dtype=params["text"]["norm"]["scale"].dtype,
        )
        kv_pos = jnp.arange(max_len)[None, :]
        # prefix-only bias (strict <): the current token rides mha_cached's
        # in-register path, so the cache is never copied per layer — one
        # all-layer scatter per step below
        bias_old = jnp.where(kv_pos < state.lengths[:, None], 0.0, NEG_INF).astype(jnp.float32)
        bias_old = bias_old[:, None, None, :]  # (slots, 1, 1, max_len)
        bias_new = jnp.zeros((slots, 1, 1, 1), jnp.float32)

        def layer(x, scanned):
            lp, layer_k, layer_v = scanned
            h = _rms_norm(x, lp["input_layernorm"]["scale"], eps)
            q, k, v = attn_qkv_proj(h, lp["self_attn"], nh, nkv, hd)
            qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
            q = (qf * cos_b + _rotate_half(qf) * sin_b).astype(x.dtype)
            k = (kf * cos_b + _rotate_half(kf) * sin_b).astype(x.dtype)
            attn = mha_cached(
                q, layer_k.astype(q.dtype), layer_v.astype(q.dtype), k, v, bias_old, bias_new
            )
            x = x + qmatmul(attn.reshape(slots, 1, nh * hd), lp["self_attn"]["o_w"])
            h = _rms_norm(x, lp["post_attention_layernorm"]["scale"], eps)
            x = x + mlp_proj(h, lp["mlp"])
            return x, (k[:, 0], v[:, 0])

        x, (ks, vs) = jax.lax.scan(layer, x, (layers, state.k, state.v))
        # ks/vs: (L, slots, Hkv, hd) — ONE scatter for all layers at each
        # slot's write column (in-place on the donated pool)
        ck = state.k.at[:, jnp.arange(slots), state.lengths].set(ks.astype(state.k.dtype))
        cv = state.v.at[:, jnp.arange(slots), state.lengths].set(vs.astype(state.v.dtype))
        x = _rms_norm(x, params["text"]["norm"]["scale"], eps)
        logits = lm_logits(params["text"], tcfg, x)[:, 0]
        rng, sub = jax.random.split(rng)
        nxt = sample_tokens(logits, sub, sp)
        nxt = jnp.where(live, nxt, cfg.pad_token_id)
        done = state.done | (live & jnp.isin(nxt, stop_ids))
        new_state = SlotState(
            k=ck,
            v=cv,
            lengths=state.lengths + live.astype(jnp.int32),
            last=jnp.where(live, nxt, state.last),
            start_pos=state.start_pos,
            done=done,
            steps=state.steps + live.astype(jnp.int32),
        )
        return (new_state, rng), nxt

    (state, _), toks = jax.lax.scan(one_step, (state, rng), None, length=segment)
    return state, toks.T  # (slots, segment)


class ContinuousEngine:
    """Iteration-level scheduler over a slot pool (vLLM-style)."""

    def __init__(
        self,
        params: dict,
        cfg: Qwen25VLConfig,
        max_slots: int = 8,
        max_len: int = 4096,
        segment: int = 16,
        dtype=jnp.bfloat16,
        prefill_chunk_tokens: int = 8192,
        quantization: str | None = None,  # None | "int8" (weight-only, ops/quant.py)
    ):
        if quantization:
            from ..ops.quant import quantize_params_jit

            params = quantize_params_jit(params, bits={"int8": 8, "int4": 4}[quantization])
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_len = max_len
        self.segment = segment
        self.dtype = dtype
        # the bucket engine does per-request prefill (B=1) for admissions
        # (params already quantized — shares buffers with this engine)
        self._prefill_engine = Engine(params, cfg, dtype, prefill_chunk_tokens)

    # ------------------------------------------------------------------
    def _admit_many(self, state: SlotState, admits, sp: SamplingParams,
                    on_group=None, register=None):
        """Admissions grouped by prompt bucket (one batched prefill per
        group): _pack pads a batch to its longest row's bucket, so a mixed
        wave would prefill every row at the longest prompt's padded length —
        see PagedEngine._admit_many.

        Like the paged engine, each group's rows `register` as soon as its
        prefill lands, and `on_group(state) -> state` runs a decode segment
        between groups so already-registered slots keep emitting tokens while
        later groups of the same wave prefill."""
        from .engine import _bucket

        groups: dict[int, list] = {}
        for a in admits:
            groups.setdefault(_bucket(len(a[2].input_ids)), []).append(a)
        out: dict[int, int] = {}
        for gi, bucket in enumerate(sorted(groups, reverse=True)):
            if gi and on_group is not None:
                state = on_group(state)
            group = groups[bucket]
            state, firsts = self._admit_group(state, group, sp)
            for a, f in zip(group, firsts):
                out[id(a)] = f
                if register is not None:
                    state = register(state, a, f)
        return state, [out[id(a)] for a in admits]

    def _admit_group(self, state: SlotState, admits, sp: SamplingParams):
        """ONE batched prefill for a same-bucket admission group, KV scattered
        into each target slot. Batching admissions keeps the pool's stall per
        scheduling wave to a single prefill instead of one per request (the
        reference's engine interleaves via max_num_batched_tokens; a batched
        admission is the same budget spent at wave granularity).

        admits: [(slot, req_idx, Request)]. Returns (state, [first_token])."""
        eng = self._prefill_engine
        eng.params = self.params
        reqs = [r for _, _, r in admits]
        ids, mask, pos_ids, start_pos, vis, S, _ = eng._pack(reqs, extra_len=0)
        first_logits, cache = eng._prefill(ids, mask, pos_ids, vis, S, S)
        seed0 = sp.seed if sp.seed is not None else 0
        firsts = []
        for row, (slot, req_idx, req) in enumerate(admits):
            rng = jax.random.fold_in(jax.random.PRNGKey(seed0), req_idx)
            first = int(np.asarray(sample_tokens(jnp.asarray(first_logits[row : row + 1]), rng, sp))[0])
            L_prompt = len(req.input_ids)
            lead = S - L_prompt  # left padding in the batched prefill cache
            k = jax.lax.dynamic_slice_in_dim(cache.k[:, row], lead, L_prompt, axis=1)
            v = jax.lax.dynamic_slice_in_dim(cache.v[:, row], lead, L_prompt, axis=1)
            new_k = jax.lax.dynamic_update_slice(
                state.k, k[:, None].astype(state.k.dtype), (0, slot, 0, 0, 0)
            )
            new_v = jax.lax.dynamic_update_slice(
                state.v, v[:, None].astype(state.v.dtype), (0, slot, 0, 0, 0)
            )
            state = state._replace(
                k=new_k,
                v=new_v,
                lengths=state.lengths.at[slot].set(L_prompt),
                last=state.last.at[slot].set(first),
                start_pos=state.start_pos.at[slot].set(int(start_pos[row])),
                done=state.done.at[slot].set(False),
                steps=state.steps.at[slot].set(0),
            )
            firsts.append(first)
        return state, firsts

    # ------------------------------------------------------------------
    def generate(self, requests: Sequence[Request], sp: SamplingParams) -> list[list[int]]:
        """Schedule all requests through the slot pool; results in input order."""
        G = sp.num_return_sequences
        rows = [(i, r) for i, r in enumerate([r for r in requests for _ in range(G)])]
        # longest-first admission (see PagedEngine.generate)
        rows.sort(key=lambda t: len(t[1].input_ids), reverse=True)
        queue = deque(rows)
        n_total = len(queue)
        results: dict[int, list[int]] = {}
        stop_set = set(sp.stop_token_ids)

        tcfg = self.cfg.text
        shape = (tcfg.num_hidden_layers, self.max_slots, self.max_len, tcfg.num_key_value_heads, tcfg.head_dim)
        state = SlotState(
            k=jnp.zeros(shape, self.dtype),
            v=jnp.zeros(shape, self.dtype),
            lengths=jnp.zeros((self.max_slots,), jnp.int32),
            last=jnp.zeros((self.max_slots,), jnp.int32),
            start_pos=jnp.zeros((self.max_slots,), jnp.int32),
            done=jnp.ones((self.max_slots,), jnp.bool_),
            steps=jnp.zeros((self.max_slots,), jnp.int32),
        )
        slot_req = [None] * self.max_slots  # request index per slot
        slot_tokens: list[list[int]] = [[] for _ in range(self.max_slots)]
        rng = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)

        def register(state, admit, first):
            slot, idx, _req = admit
            slot_req[slot] = idx
            slot_tokens[slot] = [first]
            if first in stop_set:
                # finished at the very first token
                results[idx] = [first] if sp.include_stop_token else []
                slot_req[slot] = None
                state = state._replace(done=state.done.at[slot].set(True))
            return state

        def run_segment(state):
            """One K-step decode segment over the live slots + retirement.
            No-op (state unchanged) when no slot is live."""
            nonlocal rng
            active = jnp.asarray([slot_req[s] is not None for s in range(self.max_slots)])
            if not bool(active.any()):
                return state
            max_steps = jnp.asarray(
                [sp.max_new_tokens - 1 if slot_req[s] is not None else 0 for s in range(self.max_slots)],
                jnp.int32,
            )
            rng, sub = jax.random.split(rng)
            steps_before = np.asarray(state.steps)
            state, toks = decode_segment(
                self.params, state, self.cfg, self.segment, sp, sub, active, max_steps
            )
            toks = np.asarray(toks)
            done_now = np.asarray(state.done)
            steps_now = np.asarray(state.steps)
            for slot in range(self.max_slots):
                idx = slot_req[slot]
                if idx is None:
                    continue
                # exactly steps_now - steps_before real tokens were generated
                # this segment; everything after is pad (slot went done /
                # out of budget) — never appended, even when pad_token_id is
                # itself a stop id (Qwen pad 151643 IS one)
                n_new = int(steps_now[slot] - steps_before[slot])
                for t in toks[slot][:n_new]:
                    slot_tokens[slot].append(int(t))
                finished = done_now[slot] or len(slot_tokens[slot]) >= sp.max_new_tokens
                if finished:
                    row = []
                    for t in slot_tokens[slot]:
                        if t in stop_set:
                            if sp.include_stop_token:
                                row.append(t)
                            break
                        row.append(t)
                    results[idx] = row[: sp.max_new_tokens]
                    slot_req[slot] = None
            return state

        while len(results) < n_total:
            # admit into free slots (ONE batched prefill per bucket group;
            # resident slots decode between groups via on_group)
            admits = []
            for slot in range(self.max_slots):
                if slot_req[slot] is None and queue:
                    idx, req = queue.popleft()
                    if len(req.input_ids) + sp.max_new_tokens > self.max_len:
                        raise ValueError(
                            f"request length {len(req.input_ids)}+{sp.max_new_tokens} exceeds max_len {self.max_len}"
                        )
                    admits.append((slot, idx, req))
            if admits:
                state, _ = self._admit_many(
                    state, admits, sp, on_group=run_segment, register=register
                )
            state = run_segment(state)
        return [results[i] for i in range(n_total)]
