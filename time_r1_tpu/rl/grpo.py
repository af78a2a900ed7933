"""GRPO loss + pjit train step (TPU-native re-design of C1/C2).

Reference semantics (timer1_trainer.py:512-782, timer1_trainer_ft.py:537-857):

- G rollouts per prompt (num_generations, recipes use G=8, T=1.0);
- completion mask: everything up to and INCLUDING the first EOS (:581-590);
- per-token logps + full-distribution entropy (:449-481) — computed here in
  sequence chunks so the (B·G, T, V) fp32 logits never materialize;
- optional KL vs reference weights: exp(Δ) − Δ − 1 with Δ = ref_logp − logp
  (:635-639), β = GRPOConfig default 0.04 unless overridden;
- group-normalized advantages (r − μ_G)/(σ_G + 1e-4) with the unbiased
  (Bessel, n−1) std that torch.std uses (:701-712);
- two loss reductions (:713-737):
  * use_grpo=True : vanilla GRPO — per-sequence token-mean, then batch mean;
  * use_grpo=False: PPO-clip ε_low=ε_high=0.2 — GLOBAL token mean;
  both use the ratio trick exp(logp − stop_grad(logp)) (on-policy: ratio ≡ 1
  forward, policy-gradient backward).
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen25vl import Qwen25VLConfig, VisionInputs
from ..models.qwen25vl.language import KVCache, decoder_forward, shared_decode_forward
from ..models.qwen25vl.model import merge_vision_embeddings
from ..models.qwen25vl.vision import (
    vision_blocks_forward_jit,
    vision_forward,
    vision_merge_forward,
)


@dataclass(frozen=True)
class GRPOHyperParams:
    num_generations: int = 8
    beta: float = 0.04
    epsilon_low: float = 0.2  # hard-coded in reference (timer1_trainer.py:388-393)
    epsilon_high: float = 0.2
    use_grpo: bool = False  # False → PPO-clip (reference default path)
    logp_chunk: int = 128  # sequence chunk for log_softmax memory bound
    fix_vit: bool = True  # freeze ViT except merger (timer1_trainer.py:272-288)
    # False | True/"full" | "dots" | "dots_small" — per-layer jax.checkpoint
    # with an optional residual-save policy (language.REMAT_POLICIES)
    gradient_checkpointing: object = False


class GRPOBatch(NamedTuple):
    """One train step's device batch (B = prompts·G rows)."""

    input_ids: jnp.ndarray  # (B, T) prompt+completion, left-padded prompts
    position_ids: jnp.ndarray  # (3, B, T)
    attention_mask: jnp.ndarray  # (B, T) 1 for real tokens
    completion_mask: jnp.ndarray  # (B, T) 1 on completion tokens (incl. first EOS)
    advantages: jnp.ndarray  # (B,)
    vision: Optional[VisionInputs]  # UNIQUE videos' patches (one copy per video)
    ref_logps: Optional[jnp.ndarray]  # (B, T-1) or None when beta == 0
    # (B,) absolute feature-row start per row: the G rows of one video all
    # point at the same feature span, so the ViT runs once per unique video
    # (the reference reruns it over every B·G row, timer1_trainer.py:601-607)
    feat_offsets: Optional[jnp.ndarray] = None
    # fix_vit: pre-merger hidden states from precompute_frozen_vision — the
    # frozen ViT blocks run OUTSIDE the grad program (see that docstring);
    # when set, the loss forward runs only the trainable merger
    vision_hidden: Optional[jnp.ndarray] = None


class GRPOSplitBatch(NamedTuple):
    """Shared-prefix train batch: prompts and completions SPLIT so the loss
    forward runs each prompt ONCE (P rows) and only the completion chunk per
    rollout row (B = P·G rows, row-major by prompt). The completion chunk
    attends [shared prompt prefix | itself, causal] via mha_shared_prefix —
    mathematically identical to the full concatenated rows, at ~(Lp+Lc)/Lc×
    fewer decoder FLOPs per row (the reference runs every B·G row over the
    full prompt+completion length, timer1_trainer.py:568-607)."""

    prompt_ids: jnp.ndarray  # (P, Lp) LEFT-padded (last real token at Lp-1)
    prompt_pos: jnp.ndarray  # (3, P, Lp)
    prompt_mask: jnp.ndarray  # (P, Lp) 1 for real prompt tokens
    comp_ids: jnp.ndarray  # (B, Lc) RIGHT-padded completion tokens
    comp_pos: jnp.ndarray  # (3, B, Lc)
    comp_mask: jnp.ndarray  # (B, Lc) 1 up to & incl first EOS (the loss mask)
    advantages: jnp.ndarray  # (B,)
    vision: Optional[VisionInputs]  # UNIQUE videos' patches (one copy per video)
    ref_logps: Optional[jnp.ndarray]  # (B, Lc) or None when beta == 0
    feat_offsets: Optional[jnp.ndarray] = None  # (P,) feature-row start per prompt
    vision_hidden: Optional[jnp.ndarray] = None  # see GRPOBatch.vision_hidden


def compute_group_advantages(rewards: np.ndarray, num_generations: int) -> np.ndarray:
    """(r − group mean) / (group std + 1e-4), torch-std (ddof=1) parity."""
    r = np.asarray(rewards, np.float32).reshape(-1, num_generations)
    mean = r.mean(axis=1, keepdims=True)
    std = r.std(axis=1, ddof=1, keepdims=True)
    return ((r - mean) / (std + 1e-4)).reshape(-1)


def _vision_feats(params, cfg: Qwen25VLConfig, batch, fix_vit: bool) -> jnp.ndarray:
    """Merged vision features for a batch, inside the loss program.

    With batch.vision_hidden set (fix_vit: precompute_frozen_vision ran the
    frozen blocks as their own program), only the trainable merger runs here.
    Otherwise the full tower runs inline:
    - fix_vit stops gradients at the ViT blocks so the backward pass skips
      them (the optimizer zeroes those grads anyway; the merger stays
      differentiable — timer1_trainer.py:272-288);
    - frozen blocks need no VJP, so on TPU they may ride the fused Pallas
      window-attention kernels (ops/vision_attention.py) — though embedding
      those kernels in a grad program multiplies XLA's compile time ~5x,
      which is why the trainer prefers the precompute path."""
    v = batch.vision
    if batch.vision_hidden is not None:
        return vision_merge_forward(params["visual"], cfg.vision, batch.vision_hidden, v.reverse)
    return vision_forward(
        params["visual"], cfg.vision, v.patches, v.perm, v.pos_hw,
        v.key_valid, v.full_gather, v.full_inverse, v.reverse,
        freeze_blocks=fix_vit,
        use_window_kernel=fix_vit and jax.default_backend() == "tpu"
        and os.environ.get("TIMER1_NO_VISION_KERNEL", "0") != "1",
    )


def precompute_frozen_vision(params, cfg: Qwen25VLConfig, batch):
    """fix_vit capability: run the FROZEN ViT blocks as their own jit program
    and attach the pre-merger hidden states to the batch (loss forwards then
    run only the trainable merger — see _vision_feats).

    Why a separate program: the 32-block vision graph embedded in the grad
    program multiplied XLA's compile time ~5x (345 s vs 70 s at 8 decoder
    layers with the Pallas window kernels; enough to crash the remote compile
    helper at 36 layers), and the frozen blocks' output is reused by the
    policy AND ref forwards — with KL enabled this also removes a whole
    redundant ViT pass per step (ref.visual.blocks == policy.visual.blocks
    forever under fix_vit: the optimizer zeroes their updates)."""
    if batch.vision is None or batch.vision_hidden is not None:
        return batch
    v = batch.vision
    x = _frozen_vision_jit(
        params["visual"], cfg.vision, v.patches, v.perm, v.pos_hw, v.key_valid,
        v.full_gather, v.full_inverse,
        use_window_kernel=jax.default_backend() == "tpu"
        and os.environ.get("TIMER1_NO_VISION_KERNEL", "0") != "1",
    )
    return batch._replace(vision_hidden=x)


# the canonical blocks jit — shared with the sampler's capture path so both
# resolve to one compiled program (see vision.py)
_frozen_vision_jit = vision_blocks_forward_jit


def _hidden_states(
    params, cfg: Qwen25VLConfig, batch: GRPOBatch, remat: bool = False,
    fix_vit: bool = False, cp=None, lora=None,
) -> jnp.ndarray:
    """Embed + merge vision + run decoder → final hidden (B, T, H).

    cp=(mesh, axis_name, layout): context parallelism — the decoder runs
    sequence-sharded over the mesh axis via ring attention
    (parallel/ring_attention.sequence_parallel_decoder; layout 'contiguous'
    or the balanced 'zigzag'), O(T/n) activation HBM per device. The vision
    tower and the embed/merge stay replicated (they are prefill-sized)."""
    from ..ops.quant import embed_lookup

    embeds = embed_lookup(params["text"]["embed_tokens"]["embedding"], batch.input_ids)
    if batch.vision is not None:
        feats = _vision_feats(params, cfg, batch, fix_vit)
        embeds = merge_vision_embeddings(
            embeds, batch.input_ids, feats, (cfg.video_token_id, cfg.image_token_id),
            feature_offset=batch.feat_offsets if batch.feat_offsets is not None else 0,
        )
    if cp is not None:
        from ..parallel.ring_attention import sequence_parallel_decoder

        assert lora is None, "LoRA x context-parallel loss is not plumbed; merge instead"
        mesh, axis_name, layout = cp
        return sequence_parallel_decoder(
            params["text"], cfg.text, embeds, batch.position_ids,
            batch.attention_mask, mesh, axis_name=axis_name, remat=remat,
            layout=layout,
        )
    hidden, _ = decoder_forward(
        params["text"], cfg.text, embeds, batch.position_ids,
        attention_mask=batch.attention_mask, remat=remat, lora=lora,
    )
    return hidden


def _split_logps_entropy(
    params, cfg: Qwen25VLConfig, hp: GRPOHyperParams, batch: GRPOSplitBatch,
    remat: bool = False, fix_vit: bool = False, lora=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared-prefix forward → per-token (logps, entropy), both (B, Lc) fp32.

    Prompt rows run ONCE per prompt through the cached decoder prefill
    (vision merged on the P rows, flash kernel on TPU), yielding the prompt
    KV prefix; completion rows run as one causal chunk attending the shared
    prefix. Completion token 0 is predicted by the LAST prompt token's hidden
    state (column Lp-1 — prompts are left-padded), identical for the G rows
    of a group; token t≥1 by the chunk's position t-1. Gradients flow through
    the shared prefix once per prompt and accumulate across its rows."""
    from ..models.qwen25vl.language import NEG_INF

    from ..ops.quant import embed_lookup

    text = params["text"]
    embeds = embed_lookup(text["embed_tokens"]["embedding"], batch.prompt_ids)
    if batch.vision is not None:
        feats = _vision_feats(params, cfg, batch, fix_vit)
        embeds = merge_vision_embeddings(
            embeds, batch.prompt_ids, feats, (cfg.video_token_id, cfg.image_token_id),
            feature_offset=batch.feat_offsets if batch.feat_offsets is not None else 0,
        )
    P, Lp, _ = embeds.shape
    B, Lc = batch.comp_ids.shape
    G = B // P
    cache = KVCache.zeros(cfg.text, P, Lp, dtype=embeds.dtype)
    hidden_p, prefix = decoder_forward(
        text, cfg.text, embeds, batch.prompt_pos,
        attention_mask=batch.prompt_mask, cache=cache, flash_q_offset=0, remat=remat,
        lora=lora,
    )
    embeds_c = embed_lookup(text["embed_tokens"]["embedding"], batch.comp_ids)
    prefix_bias = jnp.where(batch.prompt_mask > 0, 0.0, NEG_INF).astype(jnp.float32)
    hidden_c, _ = shared_decode_forward(
        text, cfg.text, embeds_c, batch.comp_pos, prefix, None, prefix_bias, remat=remat,
        lora=lora,
    )
    h_last = jnp.repeat(hidden_p[:, -1:], G, axis=0)  # (B, 1, H) — shared within a group
    h_pred = jnp.concatenate([h_last, hidden_c[:, :-1]], axis=1)  # (B, Lc, H)
    return per_token_logps_entropy(params, cfg, h_pred, batch.comp_ids, hp.logp_chunk)


def per_token_logps_entropy(
    params, cfg: Qwen25VLConfig, hidden: jnp.ndarray, targets: jnp.ndarray, chunk: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Chunked per-token log p(target) and full-dist entropy.

    hidden: (B, T-1, H) — hidden states at predicting positions.
    targets: (B, T-1) — the next tokens.
    Returns (logps (B, T-1), entropy (B, T-1)), both fp32.

    Quantized heads (int8 training base, quantize_params): the
    int8 table streams into the chunk einsum and the per-channel scale folds
    into the fp32 logits — the dequantized table never materializes.
    """
    from ..ops.quant import is_quantized

    tied = cfg.text.tie_word_embeddings
    w = (
        params["text"]["embed_tokens"]["embedding"]
        if tied
        else params["text"]["lm_head"]["kernel"]
    )
    if is_quantized(w):
        assert "q8" in w, "int4 embed/head has no training-path layout"
        wq, ws = w["q8"], w["s"]
        if tied:  # (V, H) per-row scales (V, 1)
            def chunk_logits(h):
                y = jnp.einsum(
                    "bch,vh->bcv", h, wq.astype(h.dtype),
                    preferred_element_type=jnp.float32,
                )
                return y * ws[:, 0][None, None, :]
        else:  # (H, V) per-column scales (1, V)
            def chunk_logits(h):
                y = jnp.einsum(
                    "bch,hv->bcv", h, wq.astype(h.dtype),
                    preferred_element_type=jnp.float32,
                )
                return y * ws[0][None, None, :]
    else:
        w_hv = w.T if tied else w

        def chunk_logits(h):
            return jnp.einsum(
                "bch,hv->bcv", h, w_hv, preferred_element_type=jnp.float32
            )

    B, Tm1, H = hidden.shape
    pad = (-Tm1) % chunk
    hp = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
    tp = jnp.pad(targets, ((0, 0), (0, pad)))
    n_chunks = (Tm1 + pad) // chunk
    hp = hp.reshape(B, n_chunks, chunk, H).swapaxes(0, 1)  # (n, B, c, H)
    tp = tp.reshape(B, n_chunks, chunk).swapaxes(0, 1)

    def step(_, ht):
        h, t = ht
        logits = chunk_logits(h)
        logz = jax.nn.logsumexp(logits, axis=-1)
        tgt_logit = jnp.take_along_axis(logits, t[..., None], axis=-1)[..., 0]
        logp = tgt_logit - logz
        # H = −Σ p·log p = logz − Σ p·logit
        p = jax.nn.softmax(logits, axis=-1)
        ent = logz - jnp.sum(p * logits, axis=-1)
        return None, (logp, ent)

    # rematerialize each chunk's logits in the backward: the scan would
    # otherwise SAVE the (B, chunk, V) fp32 probs of every chunk as residuals
    # (~10 GB at the 3B × 8-row × 2k recipe shape) — recomputing is one extra
    # (B·chunk, H)×(H, V) matmul per chunk
    _, (logps, ents) = jax.lax.scan(jax.checkpoint(step), None, (hp, tp))
    logps = logps.swapaxes(0, 1).reshape(B, Tm1 + pad)[:, :Tm1]
    ents = ents.swapaxes(0, 1).reshape(B, Tm1 + pad)[:, :Tm1]
    return logps, ents


def compute_ref_logps(
    params, cfg: Qwen25VLConfig, hp: GRPOHyperParams, batch, cp=None
) -> jnp.ndarray:
    """Per-token logps under reference weights (no grad)."""
    # fix_vit passed through for numeric symmetry with the policy forward
    # (same vision kernel choice → the KL sees identical vision features)
    if isinstance(batch, GRPOSplitBatch):
        logps, _ = _split_logps_entropy(params, cfg, hp, batch, fix_vit=hp.fix_vit)
        return logps
    hidden = _hidden_states(params, cfg, batch, fix_vit=hp.fix_vit, cp=cp)
    logps, _ = per_token_logps_entropy(
        params, cfg, hidden[:, :-1], batch.input_ids[:, 1:], hp.logp_chunk
    )
    return logps


def grpo_loss(
    params, cfg: Qwen25VLConfig, hp: GRPOHyperParams, batch, cp=None, lora=None
) -> tuple[jnp.ndarray, dict]:
    """Loss + metrics for one batch (GRPOBatch full rows, or GRPOSplitBatch
    via the shared-prefix forward). Differentiable in `params` (and in the
    adapter arrays inside `lora` when given).

    cp=(mesh, axis, layout): context-parallel decoder forward (full-row
    batches only — the shared-prefix layout has its own factorization).
    lora=(stacked layer-adapter tree, scaling): decoder LoRA merged per layer
    inside the scan (rl/lora.lora_layers_tree) — `params` stays the base."""
    if isinstance(batch, GRPOSplitBatch):
        assert cp is None, "context parallelism covers the full-row layout"
        logps, entropy = _split_logps_entropy(
            params, cfg, hp, batch, remat=hp.gradient_checkpointing, fix_vit=hp.fix_vit,
            lora=lora,
        )
        # every chunk position IS a completion-predicting position: no shift
        comp_mask = batch.comp_mask.astype(jnp.float32)
        comp_len = batch.comp_mask.sum(axis=1).astype(jnp.float32)
    else:
        hidden = _hidden_states(
            params, cfg, batch, remat=hp.gradient_checkpointing, fix_vit=hp.fix_vit,
            cp=cp, lora=lora,
        )
        logps, entropy = per_token_logps_entropy(
            params, cfg, hidden[:, :-1], batch.input_ids[:, 1:], hp.logp_chunk
        )
        # masks aligned with the shifted token axis (token t predicted at t-1)
        comp_mask = batch.completion_mask[:, 1:].astype(jnp.float32)
        comp_len = batch.completion_mask.sum(axis=1).astype(jnp.float32)
    adv = batch.advantages[:, None].astype(jnp.float32)

    coef_1 = jnp.exp(logps - jax.lax.stop_gradient(logps))
    metrics = {}
    if hp.beta != 0.0 and batch.ref_logps is not None:
        delta = batch.ref_logps - logps
        per_token_kl = jnp.exp(delta) - delta - 1.0
    else:
        per_token_kl = None

    denom_seq = jnp.maximum(comp_mask.sum(axis=1), 1.0)
    if hp.use_grpo:
        per_token_loss = coef_1 * adv
        if per_token_kl is not None:
            per_token_loss = -(per_token_loss - hp.beta * per_token_kl)
        else:
            per_token_loss = -per_token_loss
        loss = jnp.mean(jnp.sum(per_token_loss * comp_mask, axis=1) / denom_seq)
    else:
        coef_2 = jnp.clip(coef_1, 1.0 - hp.epsilon_low, 1.0 + hp.epsilon_high)
        per_token_loss = -jnp.minimum(coef_1 * adv, coef_2 * adv)
        if per_token_kl is not None:
            per_token_loss = per_token_loss + hp.beta * per_token_kl
        loss = jnp.sum(per_token_loss * comp_mask) / jnp.maximum(comp_mask.sum(), 1.0)
        # clip-ratio diagnostics (timer1_trainer_ft.py:820-842)
        is_low_clipped = (coef_1 < 1 - hp.epsilon_low) & (adv < 0)
        is_high_clipped = (coef_1 > 1 + hp.epsilon_high) & (adv > 0)
        denom = jnp.maximum(comp_mask.sum(), 1.0)
        metrics["clip_ratio/low_mean"] = jnp.sum(is_low_clipped * comp_mask) / denom
        metrics["clip_ratio/high_mean"] = jnp.sum(is_high_clipped * comp_mask) / denom
        metrics["clip_ratio/region_mean"] = (
            jnp.sum((is_low_clipped | is_high_clipped) * comp_mask) / denom
        )

    if per_token_kl is not None:
        metrics["kl"] = jnp.mean(jnp.sum(per_token_kl * comp_mask, axis=1) / denom_seq)
    metrics["completion_length"] = jnp.mean(comp_len)
    metrics["generation_entropy"] = jnp.mean(jnp.sum(entropy * comp_mask, axis=1) / denom_seq)
    return loss, metrics


def _offloadable(leaf) -> bool:
    """Leaves worth host-offloading: real moment tensors, not scalars.
    Scalar/small leaves (adamw count, MultiSteps counters) stay in HBM —
    their bytes are nil, and XLA's SPMD partitioner RET_CHECKs on
    host-placement custom-calls for scalar side-effect HLOs."""
    return getattr(leaf, "ndim", 0) >= 1 and getattr(leaf, "size", 0) >= 1024


def _stream_opt_to_device(opt_state, opt_state_sharding):
    """Inside-jit host→HBM stream of the offloaded optimizer leaves (see
    make_train_step's offload notes). ONLY pinned-host leaves get an explicit
    device placement — re-placing already-device-resident leaves (scalar
    counters) emits annotate_device_placement custom-calls that XLA's SPMD
    partitioner RET_CHECKs on for scalars."""
    if opt_state_sharding is None:
        return opt_state
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s.with_memory_kind("device"))
        if getattr(s, "memory_kind", None) == "pinned_host"
        else x,
        opt_state,
        opt_state_sharding,
    )


def make_train_step(
    cfg: Qwen25VLConfig, hp: GRPOHyperParams, optimizer, opt_state_sharding=None, cp=None
):
    """Build the jitted (pjit-compatible) train step:
    (params, opt_state, batch) → (params, opt_state, loss, metrics).

    fix_vit: gradients for the vision tower (except merger) are zeroed
    (timer1_trainer.py:272-288 capability).
    opt_state_sharding: optional sharding pytree pinning the optimizer state
    to pinned host memory between steps (ZeRO-offload capability parity,
    scripts/zero3_offload.json). The update program streams the state through
    device memory with an explicit device_put on entry (host→HBM) — math on
    host-space operands is not a thing XLA does — and the CALLER device_puts
    the returned state back to `opt_state_sharding` outside jit (the trainer
    does; memory-kind out_shardings trip an XLA SPMD RET_CHECK on scalar
    placement custom-calls). With the state FSDP-sharded like the params the
    per-device transient is opt_bytes/n_devices, amortized against the
    backward pass. Steady-state HBM between steps holds params+grads only.
    cp=(mesh, axis, layout): sequence-sharded (ring attention) loss forward."""

    def zero_frozen(tree):
        """fix_vit: ViT patch-embed + blocks frozen; merger stays trainable
        (timer1_trainer.py:272-288). Applied to grads (correct grad-norm) AND
        to updates (so weight decay can't drift frozen params either)."""
        if not hp.fix_vit:
            return tree
        vis = dict(tree["visual"])
        vis["patch_embed"] = jax.tree.map(jnp.zeros_like, vis["patch_embed"])
        vis["blocks"] = jax.tree.map(jnp.zeros_like, vis["blocks"])
        return {**tree, "visual": vis}


    def train_step(params, opt_state, batch: GRPOBatch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: grpo_loss(p, cfg, hp, batch, cp=cp), has_aux=True
        )(params)
        grads = zero_frozen(grads)
        opt_state = _stream_opt_to_device(opt_state, opt_state_sharding)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = zero_frozen(updates)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        gnorm = jnp.sqrt(
            sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
        )
        metrics = dict(metrics, grad_norm=gnorm, loss=loss)
        return params, opt_state, loss, metrics

    # NOTE: params/opt_state donation is intentionally off — callers (tests,
    # ref-weights trick) may hold references to the previous params pytree.
    # The trainer re-binds its references each step, so peak memory is
    # bounded by XLA's buffer reuse regardless.
    return jax.jit(train_step)


def make_lora_train_step(
    cfg: Qwen25VLConfig, hp: GRPOHyperParams, optimizer, lora_cfg,
    opt_state_sharding=None, cp=None,
):
    """LoRA train step (N9 parity: peft wrapping, timer1_trainer.py:264-265):
    (base_params, lora, opt_state, batch) → (lora, opt_state, loss, metrics).

    Only the adapter pytree is differentiated/updated; the base stays frozen
    (so fix_vit zeroing is unnecessary — adapters for the vision tower are
    filtered out at init when fix_vit is set). The forward runs on the
    functionally merged weights W + (α/r)·A@B, merged PER LAYER inside the
    decoder scan (rl/lora.lora_layers_tree): a full merged copy of the 3B
    stacked tree is another 6.2 GB next to the base and OOMs a 16 GB v5e in
    the backward (measured); the in-scan merge holds one layer's merged
    weights at a time. Adapters outside the decoder layers (none with
    DEFAULT_TARGETS) still merge conventionally."""
    from .lora import lora_layers_tree, merge_lora


    def train_step(base_params, lora, opt_state, batch: GRPOBatch):
        def loss_fn(lora):
            dec_tree, rest = lora_layers_tree(lora)
            p = merge_lora(base_params, rest, lora_cfg) if rest else base_params
            dec = (dec_tree, lora_cfg.scaling) if dec_tree is not None else None
            if cp is not None and dec is not None:
                # ring decoder doesn't thread adapters; fall back to merging
                p = merge_lora(p, {k: v for k, v in lora.items() if k not in rest}, lora_cfg)
                dec = None
            return grpo_loss(p, cfg, hp, batch, cp=cp, lora=dec)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora)
        opt_state = _stream_opt_to_device(opt_state, opt_state_sharding)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = jax.tree.map(lambda p, u: p + u, lora, updates)
        gnorm = jnp.sqrt(
            sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
        )
        metrics = dict(metrics, grad_norm=gnorm, loss=loss)
        return lora, opt_state, loss, metrics

    return jax.jit(train_step)
