"""Batched autoregressive generation engine (TPU-native vLLM-capability, N2).

Replaces the reference's vLLM dependency (vllm_infer.py:40-171) with jitted
JAX programs:

- vision features computed once per batch (own program);
- CHUNKED PREFILL: prompts longer than `prefill_chunk` tokens stream through
  the decoder in fixed-size chunks writing into the static KV cache —
  the reference's max_num_batched_tokens=8192 budget (vllm_infer.py:53);
- decode loop under `jax.lax.while_loop` with early exit when every row hit a
  stop token — all sampling (greedy / temperature / top-k / top-p /
  repetition-penalty) happens ON DEVICE;
- G-way grouped rollouts for GRPO (`num_return_sequences`, parity with
  timer1_trainer.py:371-377);
- stop ids [151645, 151643] with include-stop-in-output semantics
  (vllm_infer.py:112-114 parity);
- left-padded power-of-two prompt buckets keep recompiles bounded; the
  Pallas flash kernel drives prefill attention on TPU.

The two-pass MCQ answer-forcing flow lives at the text level in
sampler/text_engine.py (vllm_infer.py:130-169 parity).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen25vl import (
    KVCache,
    Qwen25VLConfig,
    VisionInputs,
    forward,
    get_rope_index,
    prepare_vision_inputs,
)
from ..models.qwen25vl.model import merge_vision_embeddings
from ..models.qwen25vl.language import decoder_forward, lm_logits
from ..models.qwen25vl.vision import vision_forward
from .params import SamplingParams

PREFILL_CHUNK = 8192  # max_num_batched_tokens parity


@dataclass
class Request:
    """One tokenized generation request."""

    input_ids: list  # prompt token ids (video placeholder tokens already expanded)
    patches: Optional[np.ndarray] = None  # (P, patch_input_dim) fp32
    grid_thw: Optional[tuple] = None  # (t, h, w)
    second_per_grid_t: float = 1.0


def _bucket(n: int, minimum: int = 128) -> int:
    """Power-of-two bucket (≥128 keeps shapes MXU/flash-block aligned)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def sample_tokens(
    logits: jnp.ndarray,  # (B, V) fp32
    rng: jnp.ndarray,
    sp: SamplingParams,
    token_counts: Optional[jnp.ndarray] = None,  # (B, V) generated-token counts
) -> jnp.ndarray:
    """On-device token sampling. Greedy when temperature == 0."""
    if sp.repetition_penalty != 1.0 and token_counts is not None:
        seen = token_counts > 0
        penalized = jnp.where(
            logits > 0, logits / sp.repetition_penalty, logits * sp.repetition_penalty
        )
        logits = jnp.where(seen, penalized, logits)
    if sp.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / sp.temperature
    if sp.top_k > 0:
        kth = jax.lax.top_k(logits, sp.top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if sp.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < sp.top_p  # smallest prefix reaching top_p
        threshold = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    # Gumbel-argmax (jax.random.categorical). Measured alternative for the
    # record: inverse-CDF with ONE uniform per row (softmax→cumsum→search)
    # is SLOWER on v5e — cumsum along the 152k lane axis costs more than
    # threefry bits for V gumbels (head-phase 0.69 → 0.99 ms/step at the
    # bench shape), so the V-uniform trick stays.
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def compute_vision_features(params, cfg: Qwen25VLConfig, vis: VisionInputs) -> jnp.ndarray:
    # serving path: window attention rides the fused Pallas rope+SDPA kernel
    # on TPU (ops/vision_attention.py); elsewhere the jnp path
    return vision_forward(
        params["visual"], cfg.vision, vis.patches, vis.perm, vis.pos_hw,
        vis.key_valid, vis.full_gather, vis.full_inverse, vis.reverse,
        use_window_kernel=jax.default_backend() == "tpu",
    )


@functools.partial(jax.jit, static_argnames=("cfg", "q_offset"), donate_argnums=(2,))
def prefill_chunk(
    params,
    cfg: Qwen25VLConfig,
    cache: KVCache,
    ids: jnp.ndarray,  # (B, C)
    pos_ids: jnp.ndarray,  # (3, B, C)
    mask: jnp.ndarray,  # (B, max_len)
    feats: Optional[jnp.ndarray],  # (U_pad, hidden) or None
    feat_offsets: Optional[jnp.ndarray],  # (B,) absolute feature starts
    q_offset: int,
    lora_side=None,  # (tree, scaling) side-path adapters (language docs)
):
    """One prompt chunk through the decoder, appending to the cache."""
    from ..ops.quant import embed_lookup

    embeds = embed_lookup(
        params["text"]["embed_tokens"]["embedding"], ids,
        dtype=params["text"]["norm"]["scale"].dtype,
    )
    if feats is not None:
        embeds = merge_vision_embeddings(
            embeds, ids, feats, (cfg.video_token_id, cfg.image_token_id), feat_offsets
        )
    hidden, cache = decoder_forward(
        params["text"], cfg.text, embeds, pos_ids,
        attention_mask=mask, cache=cache, flash_q_offset=q_offset,
        lora_side=lora_side,
    )
    return lm_logits(params["text"], cfg.text, hidden[:, -1:]), cache


class DecodeState(NamedTuple):
    cache: KVCache
    tokens: jnp.ndarray  # (B, max_new) generated tokens (pad_id after stop)
    last: jnp.ndarray  # (B,) last sampled token
    done: jnp.ndarray  # (B,) bool
    step: jnp.ndarray  # () int32
    rng: jnp.ndarray
    counts: jnp.ndarray  # (B, V) int32 (or (B, 1) when unused)


def _run_decode_loop(
    cfg: Qwen25VLConfig,
    cache0,  # any pytree carried as s.cache (full KV cache / suffix cache)
    first_logits: jnp.ndarray,  # (B, V) logits at the last prompt position
    sp: SamplingParams,
    rng: jnp.ndarray,
    step_fn,  # (s: DecodeState, pos3 (3, B, 1)) -> (logits (B, V), new cache)
    start_pos: jnp.ndarray,  # (B,) rope position of the first generated token
) -> jnp.ndarray:
    """Shared sample/stop/repetition bookkeeping for the decode loops; the
    cache layout lives entirely in `step_fn`. One copy of the semantics —
    the full-cache and shared-prefix loops cannot drift apart.

    Position convention: s.last is generated token index s.step-1 (0-based),
    which sits AT rope position start_pos + s.step - 1 (all three mrope axes
    advance together). A +1 here shifts every completion token relative to
    the prompt — off-by-one vs HF and vs the trainer's logp recompute
    (pinned by test_engine.test_decode_positions_match_full_forward)."""
    B = first_logits.shape[0]
    max_new = sp.max_new_tokens
    stop_ids = jnp.array(sp.stop_token_ids, jnp.int32)
    track_counts = sp.repetition_penalty != 1.0
    V = first_logits.shape[-1]

    rng, sub = jax.random.split(rng)
    first = sample_tokens(first_logits, sub, sp)
    counts0 = jnp.zeros((B, V if track_counts else 1), jnp.int32)
    if track_counts:
        counts0 = counts0.at[jnp.arange(B), first].add(1)
    tokens0 = jnp.full((B, max_new), cfg.pad_token_id, jnp.int32).at[:, 0].set(first)
    done0 = jnp.isin(first, stop_ids)

    def cond(s: DecodeState):
        return (s.step < max_new) & ~jnp.all(s.done)

    def body(s: DecodeState):
        pos = start_pos + s.step - 1
        pos3 = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
        lg, cache = step_fn(s, pos3)
        rng2, sub2 = jax.random.split(s.rng)
        nxt = sample_tokens(lg, sub2, sp, s.counts if track_counts else None)
        nxt = jnp.where(s.done, cfg.pad_token_id, nxt)
        if track_counts:
            counts = s.counts.at[jnp.arange(B), nxt].add(jnp.where(s.done, 0, 1))
        else:
            counts = s.counts
        tokens = jax.lax.dynamic_update_slice(s.tokens, nxt[:, None], (0, s.step))
        done = s.done | jnp.isin(nxt, stop_ids)
        return DecodeState(cache, tokens, nxt, done, s.step + 1, rng2, counts)

    init = DecodeState(cache0, tokens0, first, done0, jnp.ones((), jnp.int32), rng, counts0)
    final = jax.lax.while_loop(cond, body, init)
    return final.tokens


@functools.partial(jax.jit, static_argnames=("cfg", "sp"), donate_argnums=(2,))
def decode_loop(
    params,
    cfg: Qwen25VLConfig,
    cache: KVCache,
    first_logits: jnp.ndarray,  # (B, V) logits at the last prompt position
    start_pos: jnp.ndarray,  # (B,) position of the first generated token
    mask: jnp.ndarray,  # (B, max_len)
    sp: SamplingParams,
    rng: jnp.ndarray,
    lora_side=None,  # (tree, scaling) side-path adapters (language docs)
) -> jnp.ndarray:
    """Sample + decode up to sp.max_new_tokens; returns tokens (B, max_new)."""

    def step_fn(s: DecodeState, pos3):
        lg, cache = forward(
            params, cfg, s.last[:, None], pos3, attention_mask=mask, cache=s.cache,
            lora_side=lora_side,
        )
        return lg[:, -1], cache

    return _run_decode_loop(cfg, cache, first_logits, sp, rng, step_fn, start_pos)


@functools.partial(jax.jit, static_argnames=("cfg", "sp"), donate_argnums=(3,))
def decode_loop_shared(
    params,
    cfg: Qwen25VLConfig,
    prefix: KVCache,  # (L, P, Lp, …) shared prompt prefixes (one per prompt)
    suffix: KVCache,  # (L, B, max_new_pad, …) per-row suffix, B = P·G
    first_logits: jnp.ndarray,  # (B, V)
    start_pos: jnp.ndarray,  # (B,)
    prefix_bias: jnp.ndarray,  # (P, Lp) f32 additive (prompt padding)
    sp: SamplingParams,
    rng: jnp.ndarray,
    lora_side=None,  # (tree, scaling) side-path adapters (language docs)
) -> jnp.ndarray:
    """decode_loop over the shared-prefix cache layout: the prompt KV is
    stored once per prompt and every rollout row keeps only its own
    generated-suffix cache (models/qwen25vl/language.shared_decode_forward).
    Same sampling/stop semantics as decode_loop (shared _run_decode_loop).

    TIMER1_DECODE_ATTN_KERNEL=1 transposes the caches head-major ONCE here
    and routes every step's attention through the one-launch Pallas kernel
    (ops/decode_attention.shared_prefix_decode_full). OFF by default: measured
    SLOWER than the jnp chain on v5e (5.25 vs 4.94 ms/step at the bench
    shape) — TPU kernels execute sequentially, so XLA's fused graph hides the
    attention ops' HBM latency behind the next matmul's weight stream while a
    small-block Pallas launch exposes it (same result as the fused int8 MLP,
    ops/quant.mlp_proj). Kept for bigger-batch/longer-prefix regimes where
    the kernel's single-launch softmax wins."""
    import os

    from ..models.qwen25vl import forward_shared_decode
    from ..ops.decode_attention import pick_block

    head_major = (
        jax.default_backend() == "tpu"
        and os.environ.get("TIMER1_DECODE_ATTN_KERNEL", "0") == "1"
        and pick_block(prefix.k.shape[2]) > 0
    )
    if head_major:
        prefix = prefix._replace(
            k=prefix.k.transpose(0, 1, 3, 2, 4),
            v=prefix.v.transpose(0, 1, 3, 2, 4),
            k_scale=None if prefix.k_scale is None else prefix.k_scale.transpose(0, 1, 3, 2),
            v_scale=None if prefix.v_scale is None else prefix.v_scale.transpose(0, 1, 3, 2),
        )
        suffix = suffix._replace(  # empty at this point — a zeros relayout
            k=suffix.k.transpose(0, 1, 3, 2, 4),
            v=suffix.v.transpose(0, 1, 3, 2, 4),
            k_scale=None if suffix.k_scale is None else suffix.k_scale.transpose(0, 1, 3, 2),
            v_scale=None if suffix.v_scale is None else suffix.v_scale.transpose(0, 1, 3, 2),
        )

    def step_fn(s: DecodeState, pos3):
        lg, suf = forward_shared_decode(
            params, cfg, s.last[:, None], pos3, prefix, s.cache, prefix_bias,
            prefix_head_major=head_major, lora_side=lora_side,
        )
        return lg[:, -1], suf

    return _run_decode_loop(cfg, suffix, first_logits, sp, rng, step_fn, start_pos)


class Engine:
    """Request-level generation engine over a loaded model."""

    def __init__(
        self,
        params: dict,
        cfg: Qwen25VLConfig,
        dtype=jnp.bfloat16,
        prefill_chunk_tokens: int = PREFILL_CHUNK,
        quantization: Optional[str] = None,  # None | "int8" | "int4" (weight-only)
        kv_cache_quant: bool = False,  # int8 KV cache for the decode phase
    ):
        if quantization:
            from ..ops.quant import quantize_params_jit

            params = quantize_params_jit(params, bits={"int8": 8, "int4": 4}[quantization])
        self.params = params
        self.cfg = cfg
        self.dtype = dtype
        self.quantization = quantization
        self.kv_cache_quant = kv_cache_quant
        self.prefill_chunk_tokens = prefill_chunk_tokens
        # fix_vit cross-phase vision reuse: with capture on, the prefill runs
        # the tower as blocks→merger (two programs) and stashes the pre-merger
        # hidden states as (signature, hidden); the GRPO trainer reuses them
        # for the loss/ref forwards instead of re-running the frozen blocks
        # (valid because quantize_params passes `visual` through untouched and
        # fix_vit drops visual LoRA adapters + zero_frozen pins the blocks —
        # the rollout and loss towers are the same function of the same bytes)
        self.capture_vision_hidden = False
        self.captured_vision: Optional[tuple] = None
        # side-path LoRA (ops/quant.lora_delta): rollouts sample from the
        # SAME base tree the trainer holds, adapters applied unmerged at each
        # projection — the zero-copy weight sync for quantized-base training
        self.lora_side: Optional[tuple] = None
        self._side_prep_jit = None

    def set_lora_side(self, tree: Optional[dict], scaling: float = 1.0) -> None:
        """Install (or clear, tree=None) side-path adapters for every
        subsequent prefill/decode. The tree is rl/lora.lora_layers_tree's
        stacked decoder-layers form; GRPO weight sync is just this call —
        no merge, no re-quantize, no second weight tree.

        The adapters are pre-cast to the engine dtype: the decode path casts
        per step anyway, so the math is unchanged and the per-step stream
        bytes halve (f32 trainer adapters → bf16 engine).

        TIMER1_GROUP_SIDE_LORA=1 opt-in: rewrite into the GROUPED layout
        (ops/quant.group_side_adapters) — q/k/v (and gate/up) side products
        collapse to one A_cat/B_blockdiag pair per group, 8 side ops per
        layer instead of 14. Measured SLIGHTLY SLOWER on v5e at the 7B
        rollout shape (A/B in scripts/profile_side_delta.py: none 11.44,
        per-projection 11.94, grouped 12.13 ms/step) — XLA already fuses the
        skinny per-projection matmuls into the decode graph, and B_bd's
        zero-block stream outweighs the saved dispatch. Parked like the
        other measured losers (docs/ROADMAP.md round 5); kept for regimes
        with more adapters or higher rank."""
        if tree is None:
            self.lora_side = None
            return
        if self._side_prep_jit is None:
            import os as _os
            from functools import partial

            from ..ops.quant import group_side_adapters

            if _os.environ.get("TIMER1_GROUP_SIDE_LORA", "0") == "1":
                self._side_prep_jit = jax.jit(
                    partial(group_side_adapters, dtype=self.dtype)
                )
            else:
                self._side_prep_jit = jax.jit(
                    lambda t: jax.tree.map(lambda x: x.astype(self.dtype), t)
                )
        self.lora_side = (self._side_prep_jit(tree), scaling)

    def set_params(self, params: dict, *, prequantized: bool = False) -> None:
        """Swap in live policy weights (GRPO rollouts), re-quantizing when the
        engine runs a weight-only quantized decode path.

        prequantized=True: the caller already produced the quantized tree
        (e.g. the trainer's fused LoRA merge+quantize program) — install as-is.
        The previous copy is dropped BEFORE the re-quantize pass runs so its
        HBM is reusable as the pass's output buffer (the swap happens once per
        optimizer step; without the early drop the old int8 tree, the new
        input tree and the new int8 tree are all live at once)."""
        self.params = None
        if self.quantization and not prequantized:
            from ..ops.quant import quantize_params_jit

            params = quantize_params_jit(params, bits={"int8": 8, "int4": 4}[self.quantization])
        self.params = params

    # ------------------------------------------------------------------
    def _pack(self, reqs: Sequence[Request], extra_len: int = 0):
        """Left-pad prompts into (ids, mask, pos_ids, start_pos, vis, feat_base)."""
        B = len(reqs)
        prompt_lens = [len(r.input_ids) for r in reqs]
        S = _bucket(max(prompt_lens))
        max_len = S + _round_up(extra_len, 128) if extra_len else S
        ids = np.full((B, S), self.cfg.pad_token_id, np.int64)
        mask = np.zeros((B, max_len), np.int64)
        for i, r in enumerate(reqs):
            L = len(r.input_ids)
            ids[i, S - L :] = r.input_ids
            mask[i, S - L : S] = 1
        if extra_len:
            mask[:, S:] = 1  # decode slots: causal bias hides unwritten cells

        vis, grids, spgs, patch_list = None, [], [], []
        for r in reqs:
            if r.patches is not None:
                grids.append(tuple(int(x) for x in r.grid_thw))
                spgs.append(r.second_per_grid_t)
                patch_list.append(r.patches)
        if patch_list:
            # keep patches on-device when the caller already put them there
            # (np.concatenate would round-trip device arrays through the
            # host — ~15 MB per video, seconds through a tunneled TPU)
            if len(patch_list) == 1:
                patches = patch_list[0]
            elif any(isinstance(p, jax.Array) for p in patch_list):
                patches = jnp.concatenate([jnp.asarray(p) for p in patch_list], axis=0)
            else:
                patches = np.concatenate(patch_list, axis=0)
            unit = self.cfg.vision.merge_unit
            pad_patches = ((_bucket(patches.shape[0], 256) + unit - 1) // unit) * unit
            prep = prepare_vision_inputs(grids, self.cfg.vision, pad_patches_to=pad_patches)
            vis = VisionInputs.build(prep, jnp.asarray(patches, self.dtype))
            # signature for the fix_vit vision-hidden capture: the loss batch
            # builder (rl/rollout._pack_vision) derives the identical padded
            # layout from the same (grids, patch-row) inputs, so matching
            # grids + padded rows ⇒ identical VisionInputs ⇒ reusable hidden
            self._last_vis_sig = (tuple(grids), int(vis.perm.shape[0]))

        pos_ids, _ = get_rope_index(
            self.cfg,
            ids,
            video_grid_thw=np.array(grids, np.int64) if grids else None,
            second_per_grid_ts=spgs if spgs else None,
            attention_mask=mask[:, :S],
        )
        start_pos = pos_ids.max(axis=(0, 2)) + 1
        return ids, mask, pos_ids, start_pos, vis, S, max_len

    def _prefill(self, ids, mask, pos_ids, vis, S: int, max_len: int, on_chunk=None):
        """Chunked prefill → (last-position logits, cache).

        on_chunk: called BETWEEN chunks (paged-engine admission interleave —
        resident slots decode while a long prompt streams in)."""
        B = ids.shape[0]
        cache = KVCache.zeros(self.cfg.text, B, max_len, dtype=self.dtype)
        feats = None
        if self.capture_vision_hidden:
            self.captured_vision = None  # never serve a previous batch's videos
        if vis is not None:
            if self.capture_vision_hidden:
                # split tower: blocks (the shared jit rl.grpo also uses) then
                # merger — the pre-merger hidden is stashed for the trainer's
                # loss forward (fix_vit: one ViT-blocks pass per step instead
                # of rollout + loss each running their own)
                from ..models.qwen25vl.vision import (
                    vision_blocks_forward_jit,
                    vision_merge_forward_jit,
                )

                hidden = vision_blocks_forward_jit(
                    self.params["visual"], self.cfg.vision, vis.patches, vis.perm,
                    vis.pos_hw, vis.key_valid, vis.full_gather, vis.full_inverse,
                    use_window_kernel=jax.default_backend() == "tpu"
                    and os.environ.get("TIMER1_NO_VISION_KERNEL", "0") != "1",
                )
                feats = vision_merge_forward_jit(
                    self.params["visual"], self.cfg.vision, hidden, vis.reverse
                )
                self.captured_vision = (self._last_vis_sig, hidden)
            else:
                feats = compute_vision_features(self.params, self.cfg, vis)

        chunk = self.prefill_chunk_tokens
        is_vis_np = np.isin(ids, [self.cfg.video_token_id, self.cfg.image_token_id])
        row_total = is_vis_np.sum(axis=1)
        row_start = np.cumsum(row_total) - row_total  # absolute feature starts

        logits = None
        for c0 in range(0, S, chunk):
            if c0 > 0 and on_chunk is not None:
                on_chunk()
            c1 = min(S, c0 + chunk)
            feat_off = row_start + is_vis_np[:, :c0].sum(axis=1)
            logits, cache = prefill_chunk(
                self.params,
                self.cfg,
                cache,
                jnp.asarray(ids[:, c0:c1]),
                jnp.asarray(pos_ids[:, :, c0:c1]),
                jnp.asarray(mask),
                feats,
                jnp.asarray(feat_off, jnp.int32) if feats is not None else None,
                c0,
                self.lora_side,
            )
        return logits[:, -1], cache

    # ------------------------------------------------------------------
    def generate(self, requests: Sequence[Request], sp: SamplingParams) -> list[list[int]]:
        """Generate completions for a batch of requests; returns token lists
        (stop token included when sp.include_stop_token).

        G-way grouped rollouts (the GRPO shape) prefill each UNIQUE prompt
        once and keep ONE shared copy of its prompt KV: the G rows decode
        against [shared prefix | own suffix] via the combined-softmax
        attention (shared_decode_forward) — the reference pays the full
        prefill (and ZeRO-3 gather) per rollout row, and even its vLLM
        rollouts replicate nothing only because of paged prefix sharing."""
        G = sp.num_return_sequences
        if G > 1:
            from ..models.qwen25vl import suffix_cache_zeros
            from ..models.qwen25vl.language import NEG_INF as _NEG_INF

            ids1, mask1, pos1, start1, vis, S, _ = self._pack(list(requests), extra_len=0)
            fl1, prefix = self._prefill(ids1, mask1, pos1, vis, S, S)
            # rows [i·G, (i+1)·G) belong to prompt i (row-major)
            first_logits = jnp.repeat(fl1, G, axis=0)
            reqs = [r for r in requests for _ in range(G)]
            start_pos = np.repeat(start1, G, axis=0)
            prefix = self._maybe_quant_cache(prefix)
            suffix = suffix_cache_zeros(
                self.cfg.text, len(reqs), _round_up(sp.max_new_tokens, 128),
                quant=self.kv_cache_quant, dtype=self.dtype,
            )
            prefix_bias = jnp.where(
                jnp.asarray(mask1[:, :S]) > 0, 0.0, _NEG_INF
            ).astype(jnp.float32)
            rng = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
            tokens = decode_loop_shared(
                self.params, self.cfg, prefix, suffix, first_logits,
                jnp.asarray(start_pos), prefix_bias, sp, rng,
                lora_side=self.lora_side,
            )
            return self._postprocess(np.asarray(tokens), len(reqs), sp)

        reqs = list(requests)
        ids, mask, pos_ids, start_pos, vis, S, max_len = self._pack(
            reqs, extra_len=sp.max_new_tokens
        )
        first_logits, cache = self._prefill(ids, mask, pos_ids, vis, S, max_len)
        cache = self._maybe_quant_cache(cache)
        rng = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        tokens = decode_loop(
            self.params, self.cfg, cache, first_logits,
            jnp.asarray(start_pos), jnp.asarray(mask), sp, rng,
            lora_side=self.lora_side,
        )
        return self._postprocess(np.asarray(tokens), len(reqs), sp)

    def _maybe_quant_cache(self, cache: KVCache) -> KVCache:
        """Prefill runs bf16; the decode phase optionally streams an
        int8-quantized cache (one conversion pass — ops/quant.py)."""
        if not self.kv_cache_quant:
            return cache
        from ..ops.quant import quantize_kv_cache

        return quantize_kv_cache(cache)

    def _postprocess(self, tokens: np.ndarray, n: int, sp: SamplingParams) -> list[list[int]]:
        out = []
        stop_set = set(sp.stop_token_ids)
        for i in range(n):
            row = []
            for tok in tokens[i]:
                t = int(tok)
                if t in stop_set:
                    if sp.include_stop_token:
                        row.append(t)
                    break
                row.append(t)
            out.append(row)
        return out

    # ------------------------------------------------------------------
    def last_token_logits(self, requests: Sequence[Request]) -> np.ndarray:
        """(B, V) fp32 logits at each prompt's last position — the prob-based
        MCQ path (reference evaluate.py:104-122)."""
        reqs = list(requests)
        ids, mask, pos_ids, _, vis, S, max_len = self._pack(reqs, extra_len=0)
        logits, _ = self._prefill(ids, mask, pos_ids, vis, S, max_len)
        return np.asarray(logits)
