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
from .grpo import GRPOBatch, GRPOSplitBatch


def _bucket(n: int, minimum: int = 128) -> int:
    """Power-of-two bucket (≥128 keeps train-batch shapes flash-eligible)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _pack_vision(cfg: Qwen25VLConfig, grids: list, patch_list: list, dtype) -> VisionInputs:
    """Vision inputs for a batch of UNIQUE videos (group-major feature
    order), patch rows bucketed to a merge-unit multiple — the ONE place the
    train-batch padding rule lives (both batch builders call it)."""
    if len(patch_list) == 1:
        # keep already-staged device arrays on device (the trainer's prefetch
        # thread device_puts each video's patches ahead of the step; an
        # np.concatenate here would pull them back through the host)
        patches = patch_list[0]
    elif any(isinstance(p, jnp.ndarray) for p in patch_list):
        patches = jnp.concatenate([jnp.asarray(p) for p in patch_list], axis=0)
    else:
        patches = np.concatenate(patch_list, axis=0)
    unit = cfg.vision.merge_unit
    pad_patches = ((_bucket(patches.shape[0], 256) + unit - 1) // unit) * unit
    prep = prepare_vision_inputs(grids, cfg.vision, pad_patches_to=pad_patches)
    return VisionInputs.build(prep, jnp.asarray(patches, dtype))


def _bucket256(n: int) -> int:
    """256-granular bucket (min 128): the shared-prefix prompt rows pay the
    padded length in the prefill AND in every chunk-attention key pass, so
    the finer ladder is worth the extra compiled shapes (the recipes' 1792-
    token video prompt buckets to 1792, not 2048 — 12% less prefix work;
    shapes persist in the compilation cache)."""
    if n <= 128:
        return 128
    return ((n + 255) // 256) * 256


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
    """Assemble the (G, T) train batch for one prompt's rollout group
    (the reference's per_device_train_batch_size=1 shape, SURVEY §3.1)."""
    return build_grpo_batch_groups(
        cfg,
        [
            {
                "prompt_ids": prompt_ids,
                "completions": completions,
                "advantages": advantages,
                "patches": patches,
                "grid_thw": grid_thw,
                "second_per_grid_t": second_per_grid_t,
            }
        ],
        pad_to=pad_to,
        dtype=dtype,
    )


def build_grpo_batch_groups(
    cfg: Qwen25VLConfig,
    groups: Sequence[dict],
    pad_to: Optional[int] = None,
    dtype=jnp.bfloat16,
    pad_multiple: Optional[int] = None,  # context parallelism: T % (2n·128) == 0
) -> GRPOBatch:
    """Example-level data-parallel batch: P prompt groups × G rollouts each →
    (P·G, T) rows, group-major. Each group dict carries prompt_ids,
    completions (G lists), advantages (G,), and optional patches/grid_thw/
    second_per_grid_t for its video.

    This is the TPU equivalent of the reference's torchrun DP (one example
    per rank per step, effective batch N×G — scripts/posttrain/train_rl.sh:
    12-17): the mesh `data` axis shards the P·G rows, so effective batch
    scales with chips while advantages stay normalized within each group."""
    P_groups = len(groups)
    assert P_groups >= 1
    need = 0
    for g in groups:
        Cmax = max((len(c) for c in g["completions"]), default=1)
        need = max(need, len(g["prompt_ids"]) + Cmax)
    T = pad_to or _bucket(need)
    if pad_multiple:
        T = -(-T // pad_multiple) * pad_multiple
    assert T >= need

    rows_ids, rows_attn, rows_comp, rows_adv = [], [], [], []
    row_grids, row_spgs = [], []  # per ROW (rope consumes one grid per row)
    vis_grids, patch_list, row_feat_starts = [], [], []  # per GROUP (dedup)
    feat_cursor = 0
    for g in groups:
        prompt_ids = list(g["prompt_ids"])
        P = len(prompt_ids)
        completions = g["completions"]
        Cmax = max((len(c) for c in completions), default=1)
        lead = T - (P + Cmax)  # left-pad so the group's prompts align
        has_video = g.get("grid_thw") is not None
        group_start = 0  # text-only rows carry offset 0 (no video tokens to merge)
        if has_video:
            # each video's patches enter the batch ONCE; its G rows all point
            # at the same feature span via per-row feature offsets (the
            # reference reruns the ViT over every B·G row instead —
            # timer1_trainer.py:601-607)
            grid = tuple(int(x) for x in g["grid_thw"])
            vis_grids.append(grid)
            patch_list.append(g["patches"])
            group_start = feat_cursor
            feat_cursor += (grid[0] * grid[1] * grid[2]) // cfg.vision.merge_unit
        for comp in completions:
            ids = np.full((T,), cfg.pad_token_id, np.int64)
            attn = np.zeros((T,), np.int64)
            comp_mask = np.zeros((T,), np.int64)
            ids[lead : lead + P] = prompt_ids
            attn[lead : lead + P] = 1
            L = len(comp)
            ids[lead + P : lead + P + L] = comp
            # completion mask: ≤ first eos (reference: all-ones when no eos)
            eos_pos = next((i for i, t in enumerate(comp) if t == cfg.eos_token_id), None)
            span = L if eos_pos is None else eos_pos + 1
            comp_mask[lead + P : lead + P + span] = 1
            attn[lead + P : lead + P + L] = 1
            rows_ids.append(ids)
            rows_attn.append(attn)
            rows_comp.append(comp_mask)
            if has_video:
                row_grids.append(grid)
                row_spgs.append(float(g.get("second_per_grid_t", 1.0)))
            # EVERY row gets an offset (text-only rows: 0, unused by the
            # merge) so a batch mixing video and text-only groups keeps
            # feat_offsets row-aligned with input_ids
            row_feat_starts.append(group_start)
        rows_adv.append(np.asarray(g["advantages"], np.float32))

    ids = np.stack(rows_ids)
    attn = np.stack(rows_attn)
    comp_mask = np.stack(rows_comp)
    advantages = np.concatenate(rows_adv)

    # completion tokens are plain text: get_rope_index continues all axes
    pos_ids, _ = get_rope_index(
        cfg,
        ids,
        video_grid_thw=np.array(row_grids, np.int64) if row_grids else None,
        second_per_grid_ts=row_spgs if row_spgs else None,
        attention_mask=attn,
    )

    vis, feat_offsets = None, None
    if patch_list:
        vis = _pack_vision(cfg, vis_grids, patch_list, dtype)
        feat_offsets = jnp.asarray(np.array(row_feat_starts, np.int32))

    return GRPOBatch(
        input_ids=jnp.asarray(ids),
        position_ids=jnp.asarray(pos_ids),
        attention_mask=jnp.asarray(attn),
        completion_mask=jnp.asarray(comp_mask),
        advantages=jnp.asarray(advantages, jnp.float32),
        vision=vis,
        ref_logps=None,
        feat_offsets=feat_offsets,
    )


def build_grpo_split_batch(
    cfg: Qwen25VLConfig,
    groups: Sequence[dict],
    dtype=jnp.bfloat16,
) -> GRPOSplitBatch:
    """Shared-prefix train batch: prompts (P, Lp) and completions (B, Lc)
    SPLIT, so the loss forward runs each prompt once and only the completion
    chunk per rollout row (grpo.GRPOSplitBatch). Same group-dict surface as
    build_grpo_batch_groups; requires a uniform G across groups (the GRPO
    shape — num_generations is one hyperparameter).

    Completion positions continue the prompt's M-RoPE: completions are plain
    text, so all three axes advance by 1 per token from (max valid prompt
    position + 1) — exactly what get_rope_index yields on the concatenated
    row (oracle-tested in tests/test_grpo.py)."""
    P_groups = len(groups)
    assert P_groups >= 1
    G = len(groups[0]["completions"])
    assert all(len(g["completions"]) == G for g in groups), "uniform G required"
    Lp = _bucket256(max(len(g["prompt_ids"]) for g in groups))
    Lc = _bucket(max(max((len(c) for c in g["completions"]), default=1) for g in groups))

    ids_p = np.full((P_groups, Lp), cfg.pad_token_id, np.int64)
    mask_p = np.zeros((P_groups, Lp), np.int64)
    grids, spgs, patch_list, feat_starts = [], [], [], []
    feat_cursor = 0
    comp_rows, comp_mask_rows, advs = [], [], []
    for gi, g in enumerate(groups):
        pids = list(g["prompt_ids"])
        ids_p[gi, Lp - len(pids):] = pids  # LEFT-pad: last real token at Lp-1
        mask_p[gi, Lp - len(pids):] = 1
        if g.get("grid_thw") is not None:
            grid = tuple(int(x) for x in g["grid_thw"])
            grids.append(grid)
            spgs.append(float(g.get("second_per_grid_t", 1.0)))
            patch_list.append(g["patches"])
            feat_starts.append(feat_cursor)
            feat_cursor += (grid[0] * grid[1] * grid[2]) // cfg.vision.merge_unit
        else:
            # text-only group: offset 0, unused by the merge — keeps
            # feat_offsets aligned (P,) when groups mix video and text
            feat_starts.append(0)
        for comp in g["completions"]:
            row = np.full((Lc,), cfg.pad_token_id, np.int64)
            cmask = np.zeros((Lc,), np.int64)
            L = len(comp)
            row[:L] = comp  # RIGHT-pad: causal masking keeps pads invisible
            eos_pos = next((i for i, t in enumerate(comp) if t == cfg.eos_token_id), None)
            span = L if eos_pos is None else eos_pos + 1
            cmask[:span] = 1
            comp_rows.append(row)
            comp_mask_rows.append(cmask)
        advs.append(np.asarray(g["advantages"], np.float32))

    pos_p, _ = get_rope_index(
        cfg,
        ids_p,
        video_grid_thw=np.array(grids, np.int64) if grids else None,
        second_per_grid_ts=spgs if spgs else None,
        attention_mask=mask_p,
    )
    pos_p = np.asarray(pos_p)
    starts = np.zeros((P_groups,), np.int64)
    for gi in range(P_groups):
        starts[gi] = pos_p[:, gi, mask_p[gi] == 1].max() + 1
    B = P_groups * G
    comp_pos = np.broadcast_to(
        (np.repeat(starts, G)[None, :, None] + np.arange(Lc)[None, None, :]),
        (3, B, Lc),
    ).astype(np.int64)

    vis, feat_offsets = None, None
    if patch_list:
        vis = _pack_vision(cfg, grids, patch_list, dtype)
        feat_offsets = jnp.asarray(np.array(feat_starts, np.int32))

    return GRPOSplitBatch(
        prompt_ids=jnp.asarray(ids_p),
        prompt_pos=jnp.asarray(pos_p),
        prompt_mask=jnp.asarray(mask_p),
        comp_ids=jnp.asarray(np.stack(comp_rows)),
        comp_pos=jnp.asarray(comp_pos),
        comp_mask=jnp.asarray(np.stack(comp_mask_rows)),
        advantages=jnp.asarray(np.concatenate(advs), jnp.float32),
        vision=vis,
        ref_logps=None,
        feat_offsets=feat_offsets,
    )
