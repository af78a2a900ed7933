"""Qwen2.5-VL vision tower in JAX (window attention + 2x2 patch merger).

TPU-native re-design of the capability provided to the reference by HF's
`Qwen2_5_VisionTransformerPretrainedModel` (N7 in SURVEY §2.2; consumed at
timer1_trainer.py:244-251). Design:

- All data-dependent indexing is precomputed on HOST from `grid_thw` metadata
  into static-shape index arrays (`VisionPrep`); the device sees only gathers
  and dense matmuls — no dynamic shapes under jit.
- The sequence is laid out in PADDED-WINDOW order: every attention window is
  padded to the fixed `window_patches²·merge_unit` size, so window attention
  is a free reshape to (n_windows, win_size, ...) batched SDPA with a
  key-side validity mask — never an O(P²) dense mask.
- The designated full-attention blocks attend within each (sample, t)-slice;
  slices are contiguous runs of whole windows in this layout, gathered to
  (n_slices, max_slice, ...) blocks and scattered back by a precomputed
  inverse permutation. Slice blocks run under `lax.map` to bound the softmax
  working set.
- Layers are stacked and scanned (`lax.scan`) for O(1) compile time.

The dead (padding) slots flow through embeddings/MLP as garbage but are
excluded as attention KEYS and dropped by the final original-order gather, so
valid outputs are bit-identical to the unpadded computation (tested).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import NEG_INF
from .config import VisionConfig


@dataclass(frozen=True)
class VisionPrep:
    """Host-precomputed static-shape plan for one batch of videos/images.

    Layout arrays are in PADDED-WINDOW order (the order blocks run in):
    consecutive `win_patches` entries form one attention window; windows of a
    (sample, t)-slice are consecutive.
    """

    perm: np.ndarray  # (P_pad,) gather index into the caller's patch rows
    pos_hw: np.ndarray  # (P_pad, 2) rope h/w ids (0 at dead slots)
    key_valid: np.ndarray  # (P_pad,) bool — real patch?
    full_gather: np.ndarray  # (n_slices, max_slice) index into P_pad layout
    full_inverse: np.ndarray  # (P_pad,) index into flattened (n_slices·max_slice)
    reverse: np.ndarray  # (U_pad,) layout-unit index of each ORIGINAL unit
    unit_valid: np.ndarray  # (U_pad,) bool
    n_patches: int  # real patches
    n_units: int  # real merge units


def prepare_vision_inputs(
    grid_thw: list[tuple[int, int, int]],
    cfg: VisionConfig,
    pad_patches_to: int | None = None,  # pad the OUTPUT unit list (see below)
) -> VisionPrep:
    """Build the padded-window layout + slice blocks for (t, h, w) patch grids.

    Window/full segmentation semantics match HF `get_window_index` +
    per-t-slice cu_seqlens: ragged edge windows are padded (not merged), and
    full attention never crosses (sample, t)-slice boundaries.

    `pad_patches_to` pads the ORIGINAL-ORDER output units (U_pad =
    pad_patches_to / merge_unit) so downstream token counts can be bucketed;
    the internal layout is always padded to whole windows regardless.
    """
    m = cfg.spatial_merge_size
    unit = cfg.merge_unit
    wm = cfg.window_patches
    win_units = wm * wm
    win_patches = win_units * unit

    layout_unit_src: list[np.ndarray] = []  # per-layout-unit: original unit idx or -1
    slice_sizes: list[int] = []  # padded patches per (sample, t)-slice
    pos_orig_list = []
    unit_base = 0

    for t, h, w in grid_thw:
        lh, lw = h // m, w // m
        # rope ids in original patch order (merge-unit grouped, HF rot_pos_emb)
        hh = np.arange(h, dtype=np.int32).reshape(lh, m, 1, 1)
        hh = np.broadcast_to(hh, (lh, m, lw, m)).transpose(0, 2, 1, 3).reshape(-1)
        ww = np.arange(w, dtype=np.int32).reshape(1, 1, lw, m)
        ww = np.broadcast_to(ww, (lh, m, lw, m)).transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hh, ww], axis=-1)
        pos_orig_list.append(np.tile(pos, (t, 1)))

        idx = np.arange(t * lh * lw, dtype=np.int64).reshape(t, lh, lw) + unit_base
        pad_h = (-lh) % wm
        pad_w = (-lw) % wm
        idxp = np.pad(idx, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-1)
        nwh, nww = (lh + pad_h) // wm, (lw + pad_w) // wm
        idxp = idxp.reshape(t, nwh, wm, nww, wm).transpose(0, 1, 3, 2, 4).reshape(-1)
        layout_unit_src.append(idxp)
        slice_sizes.extend([nwh * nww * win_patches] * t)
        unit_base += t * lh * lw

    layout_units = np.concatenate(layout_unit_src)  # (-1 for dead units)
    n_units = unit_base
    n_patches = n_units * unit
    pos_orig = np.concatenate(pos_orig_list, axis=0)

    P_pad = layout_units.shape[0] * unit
    # patch-granularity gather into the caller's (n_patches-row) buffer
    slot = np.arange(unit, dtype=np.int64)[None, :]
    perm = np.where(
        layout_units[:, None] >= 0, layout_units[:, None] * unit + slot, 0
    ).reshape(-1)
    key_valid = np.repeat(layout_units >= 0, unit)
    pos_hw = np.where(key_valid[:, None], pos_orig[np.clip(perm, 0, max(n_patches - 1, 0))], 0)

    # (sample, t)-slice blocks: contiguous runs of `slice_sizes` patches
    max_slice = max(slice_sizes)
    n_slices = len(slice_sizes)
    full_gather = np.zeros((n_slices, max_slice), np.int64)
    full_inverse = np.zeros((P_pad,), np.int64)
    off = 0
    for si, sz in enumerate(slice_sizes):
        full_gather[si, :sz] = np.arange(off, off + sz)
        full_gather[si, sz:] = -1  # pad sentinel; masked as keys in the bias
        full_inverse[off : off + sz] = si * max_slice + np.arange(sz)
        off += sz
    assert off == P_pad

    # original-order unit positions in the layout
    layout_pos = np.zeros((n_units,), np.int64)
    real = layout_units >= 0
    layout_pos[layout_units[real]] = np.nonzero(real)[0]

    u_pad = (pad_patches_to // unit) if pad_patches_to else n_units
    assert u_pad >= n_units, (u_pad, n_units)
    reverse = np.zeros((u_pad,), np.int64)
    reverse[:n_units] = layout_pos
    unit_valid = np.arange(u_pad) < n_units

    return VisionPrep(
        perm=perm.astype(np.int32),
        pos_hw=pos_hw.astype(np.int32),
        key_valid=key_valid,
        full_gather=full_gather.astype(np.int32),
        full_inverse=full_inverse.astype(np.int32),
        reverse=reverse.astype(np.int32),
        unit_valid=unit_valid,
        n_patches=n_patches,
        n_units=n_units,
    )


def _rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale.astype(jnp.float32)).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _block_attention(q, k, v, key_bias, scale):
    """Batched SDPA over (..., S, H, D) blocks with additive key bias
    (..., 1, 1, S); fp32 softmax."""
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale + key_bias
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...hqk,...khd->...qhd", probs.astype(v.dtype), v)


def init_vision_params(cfg: VisionConfig, key, dtype=jnp.float32) -> dict:
    """Random init (for tests); real weights come from the converter."""
    ks = jax.random.split(key, 8)
    d, hid, inter = cfg.depth, cfg.hidden_size, cfg.intermediate_size
    merged = hid * cfg.merge_unit

    def nrm(k, shape, s=0.02):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    return {
        "patch_embed": {"kernel": nrm(ks[0], (cfg.patch_input_dim, hid))},
        "blocks": {
            "norm1": {"scale": jnp.ones((d, hid), dtype)},
            "norm2": {"scale": jnp.ones((d, hid), dtype)},
            "attn": {
                "qkv_w": nrm(ks[1], (d, hid, 3 * hid)),
                "qkv_b": jnp.zeros((d, 3 * hid), dtype),
                "proj_w": nrm(ks[2], (d, hid, hid)),
                "proj_b": jnp.zeros((d, hid), dtype),
            },
            "mlp": {
                "gate_w": nrm(ks[3], (d, hid, inter)),
                "gate_b": jnp.zeros((d, inter), dtype),
                "up_w": nrm(ks[4], (d, hid, inter)),
                "up_b": jnp.zeros((d, inter), dtype),
                "down_w": nrm(ks[5], (d, inter, hid)),
                "down_b": jnp.zeros((d, hid), dtype),
            },
        },
        "merger": {
            "ln_q": {"scale": jnp.ones((hid,), dtype)},
            "fc1": {"kernel": nrm(ks[6], (merged, merged)), "bias": jnp.zeros((merged,), dtype)},
            "fc2": {
                "kernel": nrm(ks[7], (merged, cfg.out_hidden_size)),
                "bias": jnp.zeros((cfg.out_hidden_size,), dtype),
            },
        },
    }


def vision_forward(
    params: dict,
    cfg: VisionConfig,
    patches: jnp.ndarray,  # (n_patches_buf, patch_input_dim)
    prep_perm: jnp.ndarray,
    prep_pos_hw: jnp.ndarray,
    prep_key_valid: jnp.ndarray,
    prep_full_gather: jnp.ndarray,
    prep_full_inverse: jnp.ndarray,
    prep_reverse: jnp.ndarray,
    freeze_blocks: bool = False,
    use_window_kernel: bool = False,
    segment_scan: bool = False,
) -> jnp.ndarray:
    """Run the vision tower; returns merged features (U_pad, out_hidden_size)
    in ORIGINAL merge-unit order.

    Composition of `vision_blocks_forward` (patch embed + 32 blocks) and
    `vision_merge_forward` (merger MLP + reverse gather) — split so the
    trainer can run the FROZEN blocks as their own jit program under fix_vit
    (rl/grpo.precompute_frozen_vision) while the trainable merger stays
    inside the loss.

    freeze_blocks (the trainer's fix_vit semantics, timer1_trainer.py:272-288):
    stop_gradient after the block scan, so the backward pass SKIPS the 32
    ViT blocks entirely instead of computing gradients the optimizer would
    zero anyway — the merger stays trainable either way.

    use_window_kernel: route the attention layers through the fused Pallas
    rope+SDPA kernels (ops/vision_attention.py — window kernel for the 28
    window layers, full-slice kernel for the fullatt layers when max_slice
    fits VMEM) — serving path only (no custom VJP; the GRPO loss keeps the
    jnp path).

    segment_scan: scan (g-1)-layer window segments with the full-attention
    layer unrolled between (the fullatt pattern is periodic in all Qwen2.5-VL
    configs) instead of a per-layer lax.cond. Measured SLOWER on v5e (123.7
    vs 116.7 ms/video at the bench shape — the uniform cond-scan body
    pipelines better than the two-body segment nest), so the cond is the
    default; kept for A/B (scripts/profile_vision.py)."""
    x = vision_blocks_forward(
        params, cfg, patches, prep_perm, prep_pos_hw, prep_key_valid,
        prep_full_gather, prep_full_inverse,
        use_window_kernel=use_window_kernel, segment_scan=segment_scan,
    )
    if freeze_blocks:
        x = jax.lax.stop_gradient(x)
    return vision_merge_forward(params, cfg, x, prep_reverse)


def vision_blocks_forward(
    params: dict,
    cfg: VisionConfig,
    patches: jnp.ndarray,
    prep_perm: jnp.ndarray,
    prep_pos_hw: jnp.ndarray,
    prep_key_valid: jnp.ndarray,
    prep_full_gather: jnp.ndarray,
    prep_full_inverse: jnp.ndarray,
    use_window_kernel: bool = False,
    segment_scan: bool = False,
) -> jnp.ndarray:
    """Patch embed + 2D rope + the ViT block scan, in WINDOW-LAYOUT order;
    returns pre-merger hidden states (P_pad, hidden_size). See vision_forward
    for the flag semantics."""
    nh, hd = cfg.num_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    scale = hd**-0.5
    win_patches = cfg.window_patches * cfg.window_patches * cfg.merge_unit

    perm = jnp.clip(prep_perm, 0, patches.shape[0] - 1)
    x = jnp.take(patches, perm, axis=0)
    P = x.shape[0]
    n_win = P // win_patches

    # patch embedding: conv3d with kernel==stride ≡ one matmul (MXU)
    x = x.astype(params["patch_embed"]["kernel"].dtype) @ params["patch_embed"]["kernel"]

    # 2D rope over (h, w) grid ids: head_dim//4 freqs per axis
    dim_quarter = hd // 4
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, dim_quarter, dtype=jnp.float32) / dim_quarter))
    fh = prep_pos_hw[:, 0:1].astype(jnp.float32) * inv_freq[None, :]
    fw = prep_pos_hw[:, 1:2].astype(jnp.float32) * inv_freq[None, :]
    rot = jnp.concatenate([fh, fw], axis=-1)
    emb = jnp.concatenate([rot, rot], axis=-1)
    cos = jnp.cos(emb)[:, None, :]  # (P, 1, hd)
    sin = jnp.sin(emb)[:, None, :]

    key_bias_flat = jnp.where(prep_key_valid, 0.0, NEG_INF).astype(jnp.float32)
    # pack windows so the attention block covers ≥128 rows: the per-window
    # (64, hd, 64) matmuls occupy a quarter of an MXU tile each, so a
    # block-diagonal 2-window pack halves the matmul pass count for the same
    # math (cross-window logits are masked to -inf → exact zeros).
    # Tried and rejected (round 3): a 4-window pack — the 4× bigger f32
    # softmax buffers cost more than the halved dot-pipeline fills
    # (194 → 208 ms/video measured on v5e).
    win_pack = max(1, 128 // win_patches)
    while n_win % win_pack != 0:
        win_pack //= 2
    packed = win_pack * win_patches
    win_key_bias = key_bias_flat.reshape(n_win // win_pack, 1, 1, packed)
    if win_pack > 1:
        row_win = jnp.arange(packed)[:, None] // win_patches
        col_win = jnp.arange(packed)[None, :] // win_patches
        cross = jnp.where(row_win == col_win, 0.0, NEG_INF).astype(jnp.float32)
        win_key_bias = win_key_bias + cross[None, None]
    n_slices, max_slice = prep_full_gather.shape
    # pad entries are -1 sentinels: clamp for the gather, mask as KEYS in the
    # bias (a duplicate-pad pointing at a real row would otherwise receive
    # attention mass whenever slices have unequal sizes — mixed-resolution
    # batches)
    full_pad = prep_full_gather < 0
    full_gather_safe = jnp.where(full_pad, 0, prep_full_gather)
    full_key_bias2d = jnp.take(key_bias_flat, full_gather_safe, axis=0) + jnp.where(
        full_pad, NEG_INF, 0.0
    )  # (n_slices, max_slice)
    full_key_bias = full_key_bias2d.reshape(n_slices, 1, 1, max_slice)
    def rope(x):
        xf = x.astype(jnp.float32)
        return (xf * cos + _rotate_half(xf) * sin).astype(x.dtype)

    def attn_window(q, k, v):
        """q/k/v: (P, nh, hd) in layout order, PRE-rope → (P, nh, hd).
        Rope happens inside (the fused kernel applies it in-register; the
        jnp path applies it explicitly)."""
        if use_window_kernel:
            from ...ops.vision_attention import window_attention_rope

            return window_attention_rope(
                q, k, v, cos[:, 0, :], sin[:, 0, :], key_bias_flat,
                win_patches, win_pack,
            )
        qr, kr = rope(q), rope(k)
        qw = qr.reshape(n_win // win_pack, packed, nh, hd)
        kw = kr.reshape(n_win // win_pack, packed, nh, hd)
        vw = v.reshape(n_win // win_pack, packed, nh, hd)
        return _block_attention(qw, kw, vw, win_key_bias, scale).reshape(P, nh, hd)

    def attn_full(q, k, v):
        fg = full_gather_safe.reshape(-1)
        if use_window_kernel:
            from ...ops.vision_attention import (
                FULL_KERNEL_MAX_SLICE,
                full_attention_rope,
            )

            if max_slice <= FULL_KERNEL_MAX_SLICE:
                qf = jnp.take(q, fg, axis=0).reshape(n_slices, max_slice, nh, hd)
                kf = jnp.take(k, fg, axis=0).reshape(n_slices, max_slice, nh, hd)
                vf = jnp.take(v, fg, axis=0).reshape(n_slices, max_slice, nh, hd)
                cosg = jnp.take(cos[:, 0, :], fg, axis=0).reshape(n_slices, max_slice, hd)
                sing = jnp.take(sin[:, 0, :], fg, axis=0).reshape(n_slices, max_slice, hd)
                out = full_attention_rope(qf, kf, vf, cosg, sing, full_key_bias2d)
                return jnp.take(out.reshape(-1, nh, hd), prep_full_inverse, axis=0)
        qr, kr = rope(q), rope(k)
        qf = jnp.take(qr, fg, axis=0).reshape(n_slices, max_slice, nh, hd)
        kf = jnp.take(kr, fg, axis=0).reshape(n_slices, max_slice, nh, hd)
        vf = jnp.take(v, fg, axis=0).reshape(n_slices, max_slice, nh, hd)
        # process slice blocks in groups: full batching would materialize
        # (n_slices, heads, S, S) softmax buffers; one-by-one serializes.
        group = 1
        for c in (8, 4, 2):
            if n_slices % c == 0:
                group = c
                break
        qg = qf.reshape(n_slices // group, group, max_slice, nh, hd)
        kg = kf.reshape(n_slices // group, group, max_slice, nh, hd)
        vg = vf.reshape(n_slices // group, group, max_slice, nh, hd)
        bg = full_key_bias.reshape(n_slices // group, group, 1, 1, max_slice)
        out = jax.lax.map(
            lambda args: _block_attention(args[0], args[1], args[2], args[3], scale),
            (qg, kg, vg, bg),
        )
        return jnp.take(out.reshape(-1, nh, hd), prep_full_inverse, axis=0)

    blocks = params["blocks"]
    # profiling-only ablation knob (scripts/profile_vision.py): baked at trace
    # time, never set in production paths
    ablate = os.environ.get("TIMER1_VISION_ABLATE", "")

    def make_layer(attn_fn):
        def layer(x, lp):
            h = _rms_norm(x, lp["norm1"]["scale"], eps)
            qkv = h @ lp["attn"]["qkv_w"] + lp["attn"]["qkv_b"]
            # qkv columns are ordered [q | k | v] (each nh·hd wide): slice on
            # the last axis — the reshape(-1, 3, nh, hd).swapaxes(0, 1)
            # equivalent materialized a full-tensor transpose per layer
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(-1, nh, hd)
            k = k.reshape(-1, nh, hd)
            v = v.reshape(-1, nh, hd)
            if ablate == "no_attn":
                attn = v
            else:
                attn = attn_fn(q, k, v)  # rope applied inside
            attn = attn.reshape(-1, nh * hd) @ lp["attn"]["proj_w"] + lp["attn"]["proj_b"]
            x = x + attn
            if ablate != "no_mlp":
                h = _rms_norm(x, lp["norm2"]["scale"], eps)
                g = h @ lp["mlp"]["gate_w"] + lp["mlp"]["gate_b"]
                u = h @ lp["mlp"]["up_w"] + lp["mlp"]["up_b"]
                x = x + (jax.nn.silu(g) * u) @ lp["mlp"]["down_w"] + lp["mlp"]["down_b"]
            return x, None

        return layer

    # The fullatt pattern is periodic in every Qwen2.5-VL config (every g-th
    # layer, g = 8): scan (g-1)-layer window SEGMENTS with the full layer
    # unrolled between, instead of a per-layer lax.cond whose untaken branch
    # still costs scheduling. Non-periodic patterns fall back to the cond.
    idxs = tuple(cfg.fullatt_block_indexes)
    g_period = idxs[0] + 1 if idxs else 0
    periodic = (
        segment_scan
        and g_period >= 2
        and cfg.depth % g_period == 0
        and idxs == tuple(range(g_period - 1, cfg.depth, g_period))
    )
    if periodic:
        grouped = jax.tree.map(
            lambda a: a.reshape((cfg.depth // g_period, g_period) + a.shape[1:]),
            blocks,
        )
        win_layer = make_layer(attn_window)
        full_layer = make_layer(attn_full)

        def group_body(x, gp):
            lw = jax.tree.map(lambda a: a[: g_period - 1], gp)
            lf = jax.tree.map(lambda a: a[g_period - 1], gp)
            x, _ = jax.lax.scan(win_layer, x, lw)
            x, _ = full_layer(x, lf)
            return x, None

        x, _ = jax.lax.scan(group_body, x, grouped)
    else:
        fullatt = (
            jnp.zeros((cfg.depth,), jnp.bool_)
            .at[jnp.array(cfg.fullatt_block_indexes)]
            .set(True)
        )

        def layer_cond(x, scanned):
            lp, is_full = scanned

            def attn_both(q, k, v):
                return jax.lax.cond(
                    is_full, lambda: attn_full(q, k, v), lambda: attn_window(q, k, v)
                )

            return make_layer(attn_both)(x, lp)

        x, _ = jax.lax.scan(layer_cond, x, (blocks, fullatt))
    return x


def vision_merge_forward(
    params: dict, cfg: VisionConfig, x: jnp.ndarray, prep_reverse: jnp.ndarray
) -> jnp.ndarray:
    """Merger on pre-merger hidden states (vision_blocks_forward output):
    RMSNorm → group 2x2 units → MLP (GELU exact) → reverse gather back to
    ORIGINAL merge-unit order. The only trainable vision piece under fix_vit."""
    mparams = params["merger"]
    h = _rms_norm(x, mparams["ln_q"]["scale"], cfg.rms_norm_eps).reshape(
        -1, cfg.hidden_size * cfg.merge_unit
    )
    h = h @ mparams["fc1"]["kernel"] + mparams["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ mparams["fc2"]["kernel"] + mparams["fc2"]["bias"]

    # gather the real units back into original order
    return jnp.take(h, prep_reverse, axis=0)


# Canonical jitted entry points for the split tower — ONE wrapper each so
# every caller (sampler prefill, rl.grpo.precompute_frozen_vision) shares the
# same compiled-program cache entry. Under fix_vit the blocks output is the
# cross-phase currency: the rollout prefill captures it and the GRPO loss
# reuses it, so the 32-block tower runs ONCE per step per unique video
# (the reference reruns the full ViT in generate AND in each logps forward,
# timer1_trainer.py:568-607).
vision_blocks_forward_jit = jax.jit(
    vision_blocks_forward, static_argnames=("cfg", "use_window_kernel", "segment_scan")
)
vision_merge_forward_jit = jax.jit(vision_merge_forward, static_argnames=("cfg",))
