"""Rollout post-processing: engine outputs → GRPOBatch device arrays.

Mirrors the sequence assembly of the reference compute_loss
(timer1_trainer.py:568-607): prompt+completion concat, EOS-based completion
masking (everything up to and INCLUDING the first eos, :581-590), and
position-id extension for the generated region.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..models.qwen25vl import Qwen25VLConfig, VisionInputs, get_rope_index, prepare_vision_inputs
from .grpo import GRPOBatch


def _bucket(n: int, minimum: int = 128) -> int:
    """Power-of-two bucket (≥128 keeps train-batch shapes flash-eligible)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def build_grpo_batch(
    cfg: Qwen25VLConfig,
    prompt_ids: Sequence[int],
    completions: Sequence[Sequence[int]],  # G token lists from the engine
    advantages: np.ndarray,  # (G,)
    patches: Optional[np.ndarray] = None,  # one video's (P, 1176)
    grid_thw: Optional[tuple] = None,
    second_per_grid_t: float = 1.0,
    pad_to: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> GRPOBatch:
    """Assemble the (G, T) train batch for one prompt's rollout group.

    The reference effectively supports per_device_train_batch_size=1 with
    G = num_generations rows (SURVEY §3.1 quirk) — same layout here."""
    G = len(completions)
    P = len(prompt_ids)
    Cmax = max((len(c) for c in completions), default=1)
    T = pad_to or _bucket(P + Cmax)
    assert T >= P + Cmax

    ids = np.full((G, T), cfg.pad_token_id, np.int64)
    attn = np.zeros((G, T), np.int64)
    comp_mask = np.zeros((G, T), np.int64)
    lead = T - (P + Cmax)  # left-pad so prompts align identically
    for g, comp in enumerate(completions):
        ids[g, lead : lead + P] = prompt_ids
        attn[g, lead : lead + P] = 1
        L = len(comp)
        ids[g, lead + P : lead + P + L] = comp
        # completion mask: ≤ first eos (reference: all-ones when no eos)
        eos_pos = next((i for i, t in enumerate(comp) if t == cfg.eos_token_id), None)
        span = L if eos_pos is None else eos_pos + 1
        comp_mask[g, lead + P : lead + P + span] = 1
        attn[g, lead + P : lead + P + L] = 1

    video_grid_thw = np.array([grid_thw], np.int64) if grid_thw is not None else None
    # completion tokens are plain text: get_rope_index continues all axes
    pos_ids, _ = get_rope_index(
        cfg,
        ids,
        video_grid_thw=np.repeat(video_grid_thw, G, axis=0) if video_grid_thw is not None else None,
        second_per_grid_ts=[second_per_grid_t] * G if grid_thw is not None else None,
        attention_mask=attn,
    )

    vis = None
    if patches is not None:
        grids = [tuple(int(x) for x in grid_thw)] * G
        unit = cfg.vision.merge_unit
        n = patches.shape[0] * G
        pad_patches = ((_bucket(n, 256) + unit - 1) // unit) * unit
        prep = prepare_vision_inputs(grids, cfg.vision, pad_patches_to=pad_patches)
        vis = VisionInputs.build(prep, jnp.asarray(np.tile(patches, (G, 1)), dtype))

    return GRPOBatch(
        input_ids=jnp.asarray(ids),
        position_ids=jnp.asarray(pos_ids),
        attention_mask=jnp.asarray(attn),
        completion_mask=jnp.asarray(comp_mask),
        advantages=jnp.asarray(advantages, jnp.float32),
        vision=vis,
        ref_logps=None,
    )
