"""Qwen2.5-VL combined model: vision features merged into token embeddings.

Equivalent capability to HF `Qwen2_5_VLForConditionalGeneration.forward`
(used by the reference at timer1_trainer.py:449-457 for per-token logps and
via `generate` at :568-573). The vision-token scatter is implemented as a
static-shape cumsum gather + where (no boolean indexing), so the whole
forward jits cleanly under pjit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import Qwen25VLConfig
from .language import (
    KVCache,
    decoder_forward,
    init_text_params,
    lm_logits,
    shared_decode_forward,
)
from .vision import init_vision_params, vision_forward


class VisionInputs(NamedTuple):
    """Device-side vision inputs (host prep arrays already materialized)."""

    patches: jnp.ndarray  # (n_patch_rows, patch_input_dim)
    perm: jnp.ndarray
    pos_hw: jnp.ndarray
    key_valid: jnp.ndarray
    full_gather: jnp.ndarray
    full_inverse: jnp.ndarray
    reverse: jnp.ndarray

    @staticmethod
    def build(prep, patches: jnp.ndarray) -> "VisionInputs":
        """Materialize a VisionPrep + patch buffer as device arrays."""
        return VisionInputs(
            patches=patches,
            perm=jnp.asarray(prep.perm),
            pos_hw=jnp.asarray(prep.pos_hw),
            key_valid=jnp.asarray(prep.key_valid),
            full_gather=jnp.asarray(prep.full_gather),
            full_inverse=jnp.asarray(prep.full_inverse),
            reverse=jnp.asarray(prep.reverse),
        )


def init_params(cfg: Qwen25VLConfig, key, dtype=jnp.float32) -> dict:
    kv, kt = jax.random.split(key)
    return {
        "visual": init_vision_params(cfg.vision, kv, dtype),
        "text": init_text_params(cfg.text, kt, dtype),
    }


def merge_vision_embeddings(
    embeds: jnp.ndarray,  # (B, S, hidden)
    input_ids: jnp.ndarray,  # (B, S)
    vision_features: jnp.ndarray,  # (U_pad, hidden) in original unit order
    vision_token_ids: tuple[int, ...],
    feature_offset=0,  # first feature row consumed (chunked prefill)
) -> jnp.ndarray:
    """Replace embeddings at vision-token positions with vision features,
    consumed in order across the flattened (B, S) sequence starting at
    `feature_offset` (may be a traced scalar).

    `feature_offset` is either a scalar added to every row's start (0 for a
    full-sequence forward — row starts are derived from the ids themselves)
    or a (B,) vector of absolute per-row feature starts (chunked prefill,
    host-computed from the full sequence).

    Supports one vision modality per call (video OR image — the Time-R1
    pipeline is video-only; both ids are accepted so image-only prompts work)."""
    B, S, H = embeds.shape
    is_vis = jnp.zeros_like(input_ids, dtype=bool)
    for tid in vision_token_ids:
        is_vis |= input_ids == tid
    within_row = jnp.cumsum(is_vis.astype(jnp.int32), axis=1) - 1  # (B, S)
    offset = jnp.asarray(feature_offset)
    if offset.ndim == 0:
        per_row_total = is_vis.sum(axis=1).astype(jnp.int32)
        row_start = jnp.cumsum(per_row_total) - per_row_total  # exclusive
        offset = offset + row_start  # (B,)
    idx = offset[:, None] + within_row
    idx = jnp.clip(idx, 0, vision_features.shape[0] - 1)
    gathered = jnp.take(vision_features, idx.reshape(-1), axis=0).astype(embeds.dtype)
    merged = jnp.where(is_vis.reshape(-1)[:, None], gathered, embeds.reshape(-1, H))
    return merged.reshape(B, S, H)


def forward(
    params: dict,
    cfg: Qwen25VLConfig,
    input_ids: jnp.ndarray,  # (B, S)
    position_ids: jnp.ndarray,  # (3, B, S) from rope.get_rope_index
    attention_mask: Optional[jnp.ndarray] = None,  # (B, S)
    vision: Optional[VisionInputs] = None,
    cache: Optional[KVCache] = None,
    use_flash: Optional[bool] = None,
    flash_q_offset: Optional[int] = None,
    lora_side: Optional[tuple[dict, float]] = None,  # language.decoder_forward docs
) -> tuple[jnp.ndarray, Optional[KVCache]]:
    """Full forward → (logits (B, S, V) fp32, updated KV cache)."""
    from ...ops.quant import embed_lookup

    embeds = embed_lookup(
        params["text"]["embed_tokens"]["embedding"],
        input_ids,
        dtype=params["text"]["norm"]["scale"].dtype,  # norm scales are never quantized
    )
    if vision is not None:
        feats = vision_forward(
            params["visual"],
            cfg.vision,
            vision.patches,
            vision.perm,
            vision.pos_hw,
            vision.key_valid,
            vision.full_gather,
            vision.full_inverse,
            vision.reverse,
        )
        embeds = merge_vision_embeddings(
            embeds, input_ids, feats, (cfg.video_token_id, cfg.image_token_id)
        )
    hidden, new_cache = decoder_forward(
        params["text"], cfg.text, embeds, position_ids,
        attention_mask=attention_mask, cache=cache, use_flash=use_flash,
        flash_q_offset=flash_q_offset, lora_side=lora_side,
    )
    return lm_logits(params["text"], cfg.text, hidden), new_cache


def forward_shared_decode(
    params: dict,
    cfg: Qwen25VLConfig,
    input_ids: jnp.ndarray,  # (B, S) — decode chunk (no vision tokens)
    position_ids: jnp.ndarray,  # (3, B, S)
    prefix: KVCache,  # (L, P, Lp, …) shared prompt prefixes
    suffix: KVCache,  # (L, B, max_new, …) per-row generated suffix
    prefix_bias: jnp.ndarray,  # (P, Lp) f32 additive
    prefix_head_major: bool = False,  # (L, P, Hkv, Lp, hd) → Pallas prefix pass
    lora_side: Optional[tuple[dict, float]] = None,  # language.decoder_forward docs
) -> tuple[jnp.ndarray, KVCache]:
    """Decode-phase forward with the prompt KV shared across rollout rows
    (language.shared_decode_forward) → (logits (B, S, V) fp32, new suffix)."""
    from ...ops.quant import embed_lookup

    embeds = embed_lookup(
        params["text"]["embed_tokens"]["embedding"],
        input_ids,
        dtype=params["text"]["norm"]["scale"].dtype,
    )
    hidden, new_suffix = shared_decode_forward(
        params["text"], cfg.text, embeds, position_ids, prefix, suffix, prefix_bias,
        prefix_head_major=prefix_head_major, lora_side=lora_side,
    )
    return lm_logits(params["text"], cfg.text, hidden), new_suffix
