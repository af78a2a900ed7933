"""Qwen2.5-VL vision tower in JAX (window attention + 2x2 patch merger).

TPU-native re-design of the capability provided to the reference by
`Qwen2_5_VisionTransformerPretrainedModel` (N7 in SURVEY §2.2; consumed at
timer1_trainer.py:244-251). Key differences from the torch implementation:

- All data-dependent indexing (window permutation, attention segmentation) is
  precomputed on HOST from `grid_thw` metadata into static-shape index/segment
  arrays (`VisionPrep`). On device everything is gathers + dense matmuls —
  no dynamic shapes under jit.
- The varlen cu_seqlens attention pattern becomes segment-id masking, the
  static-shape TPU form (window segments for windowed blocks, per-frame-slice
  segments for the designated full-attention blocks).
- Layers are stacked and scanned (`lax.scan`) for O(1) compile time.

Weights layout (converter-facing, transposed to (in, out)):
  patch_embed/kernel                       (C*tp*ps*ps, hidden)
  blocks/{norm1,norm2}/scale               (depth, hidden)
  blocks/attn/{qkv_w (d,h,3h)… see code}
  merger/ln_q/scale, merger/fc1, merger/fc2
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import mha_reference, segment_mask_bias
from .config import VisionConfig


@dataclass(frozen=True)
class VisionPrep:
    """Host-precomputed static-shape plan for one batch of videos/images.

    All arrays are in WINDOW ORDER (the permuted order in which blocks run).
    `perm` maps window order → original patch row; `reverse` maps original
    merge-unit order → window-unit order (for un-permuting the merger output).
    """

    perm: np.ndarray  # (P_pad,) int32, gather indices into padded patch rows
    pos_hw: np.ndarray  # (P_pad, 2) int32 rope h/w position ids
    window_seg: np.ndarray  # (P_pad,) int32, -1 for padding
    full_seg: np.ndarray  # (P_pad,) int32, -1 for padding
    reverse: np.ndarray  # (U_pad,) int32 gather indices into window-unit rows
    unit_valid: np.ndarray  # (U_pad,) bool, validity of output units
    n_patches: int
    n_units: int


def prepare_vision_inputs(
    grid_thw: list[tuple[int, int, int]],
    cfg: VisionConfig,
    pad_patches_to: int | None = None,
) -> VisionPrep:
    """Compute the window permutation, rope position ids and attention
    segments for a list of (t, h, w) patch grids.

    Reproduces the semantics of HF's `rot_pos_emb` + `get_window_index`
    (windows of `window_size` px ⇒ `window_patches` merge units per side,
    ragged edge windows allowed) with everything expressed as permutations
    and segment ids instead of cu_seqlens.
    """
    m = cfg.spatial_merge_size
    unit = cfg.merge_unit
    wm = cfg.window_patches  # window side in merge units

    pos_list = []
    unit_perm_list = []  # permutation at merge-unit granularity
    window_seg_list = []
    full_seg_list = []
    unit_base = 0
    patch_base = 0
    window_seg_id = 0
    full_seg_id = 0

    for t, h, w in grid_thw:
        lh, lw = h // m, w // m
        # --- rope position ids, in the model's native (pre-window) order:
        # rows grouped by merge unit: (lh, lw, m, m) block layout
        hh = np.arange(h, dtype=np.int32).reshape(lh, m, 1, 1)
        hh = np.broadcast_to(hh, (lh, m, lw, m)).transpose(0, 2, 1, 3).reshape(-1)
        ww = np.arange(w, dtype=np.int32).reshape(1, 1, lw, m)
        ww = np.broadcast_to(ww, (lh, m, lw, m)).transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hh, ww], axis=-1)  # (h*w, 2)
        pos = np.tile(pos, (t, 1))  # (t*h*w, 2)

        # --- window permutation at merge-unit granularity
        idx = np.arange(t * lh * lw, dtype=np.int32).reshape(t, lh, lw)
        pad_h = (-lh) % wm
        pad_w = (-lw) % wm
        idxp = np.pad(idx, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-1)
        nwh, nww = (lh + pad_h) // wm, (lw + pad_w) // wm
        idxp = idxp.reshape(t, nwh, wm, nww, wm).transpose(0, 1, 3, 2, 4)
        idxp = idxp.reshape(t * nwh * nww, wm * wm)
        seqlens = (idxp != -1).sum(axis=1)  # units per window
        flat = idxp.reshape(-1)
        unit_order = flat[flat != -1]  # (t*lh*lw,) unit indices in window order

        # window segment ids per unit (skip empty windows to mirror
        # torch.unique_consecutive on cu_window_seqlens)
        seg_per_window = []
        for s in seqlens:
            if s > 0:
                seg_per_window.append(np.full(s, window_seg_id, dtype=np.int32))
                window_seg_id += 1
        wseg_units = np.concatenate(seg_per_window) if seg_per_window else np.zeros(0, np.int32)

        # full-attention segments: one per temporal slice (cu_seqlens =
        # cumsum(repeat_interleave(h*w, t)) in HF) — evaluated in WINDOW order
        full_seg_units_orig = np.repeat(
            np.arange(t, dtype=np.int32) + full_seg_id, lh * lw
        )  # (t*lh*lw,) in original unit order
        fseg_units = full_seg_units_orig[unit_order]
        full_seg_id += t

        unit_perm_list.append(unit_order + unit_base)
        # pos ids permuted into window order (expand unit order to patch rows)
        patch_order = (unit_order[:, None] * unit + np.arange(unit, dtype=np.int32)[None, :]).reshape(-1)
        pos_list.append(pos[patch_order])
        window_seg_list.append(np.repeat(wseg_units, unit))
        full_seg_list.append(np.repeat(fseg_units, unit))
        unit_base += t * lh * lw
        patch_base += t * h * w

    unit_order_all = np.concatenate(unit_perm_list)
    n_units = unit_order_all.shape[0]
    n_patches = n_units * unit
    assert n_patches == patch_base

    perm = (unit_order_all[:, None] * unit + np.arange(unit, dtype=np.int32)[None, :]).reshape(-1)
    pos_hw = np.concatenate(pos_list, axis=0)
    window_seg = np.concatenate(window_seg_list)
    full_seg = np.concatenate(full_seg_list)
    reverse = np.argsort(unit_order_all).astype(np.int32)

    p_pad = pad_patches_to or n_patches
    assert p_pad % unit == 0 and p_pad >= n_patches
    u_pad = p_pad // unit
    if p_pad > n_patches:
        fill = p_pad - n_patches
        perm = np.concatenate([perm, np.full(fill, n_patches, np.int32)])  # safe: clipped gather
        pos_hw = np.concatenate([pos_hw, np.zeros((fill, 2), np.int32)])
        window_seg = np.concatenate([window_seg, np.full(fill, -1, np.int32)])
        full_seg = np.concatenate([full_seg, np.full(fill, -1, np.int32)])
        reverse = np.concatenate([reverse, np.full(u_pad - n_units, n_units, np.int32)])
    unit_valid = np.arange(u_pad) < n_units

    return VisionPrep(
        perm=perm.astype(np.int32),
        pos_hw=pos_hw.astype(np.int32),
        window_seg=window_seg.astype(np.int32),
        full_seg=full_seg.astype(np.int32),
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
    patches: jnp.ndarray,  # (P, patch_input_dim); P = padded patch count
    prep_perm: jnp.ndarray,
    prep_pos_hw: jnp.ndarray,
    prep_window_seg: jnp.ndarray,
    prep_full_seg: jnp.ndarray,
    prep_reverse: jnp.ndarray,
) -> jnp.ndarray:
    """Run the vision tower; returns merged features (U_pad, out_hidden_size)
    in ORIGINAL merge-unit order (window permutation undone)."""
    nh, hd = cfg.num_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    # window permutation (pad row index == P-1 is harmless: segment is -1)
    perm = jnp.clip(prep_perm, 0, patches.shape[0] - 1)
    x = jnp.take(patches, perm, axis=0)

    # patch embedding: conv3d with kernel==stride ≡ a single matmul (MXU)
    x = x.astype(params["patch_embed"]["kernel"].dtype) @ params["patch_embed"]["kernel"]

    # 2D rope over (h, w) grid ids: head_dim//4 freqs per axis
    dim_quarter = hd // 4
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, dim_quarter, dtype=jnp.float32) / dim_quarter))
    fh = prep_pos_hw[:, 0:1].astype(jnp.float32) * inv_freq[None, :]
    fw = prep_pos_hw[:, 1:2].astype(jnp.float32) * inv_freq[None, :]
    rot = jnp.concatenate([fh, fw], axis=-1)  # (P, hd/2)
    emb = jnp.concatenate([rot, rot], axis=-1)  # (P, hd)
    cos = jnp.cos(emb)[:, None, :]  # (P, 1, hd) broadcast over heads
    sin = jnp.sin(emb)[:, None, :]

    window_bias = segment_mask_bias(prep_window_seg, prep_window_seg)  # (1, P, P)
    full_bias = segment_mask_bias(prep_full_seg, prep_full_seg)
    fullatt = jnp.zeros((cfg.depth,), jnp.bool_).at[jnp.array(cfg.fullatt_block_indexes)].set(True)

    blocks = params["blocks"]

    def layer(x, scanned):
        lp, is_full = scanned
        h = _rms_norm(x, lp["norm1"]["scale"], eps)
        qkv = h @ lp["attn"]["qkv_w"] + lp["attn"]["qkv_b"]
        q, k, v = jnp.split(qkv.reshape(-1, 3, nh, hd).swapaxes(0, 1), 3, axis=0)
        q, k, v = q[0], k[0], v[0]  # (P, nh, hd)
        # rope in fp32 (HF applies rope in float32 then casts back)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos + _rotate_half(qf) * sin).astype(x.dtype)
        k = (kf * cos + _rotate_half(kf) * sin).astype(x.dtype)
        bias = jnp.where(is_full, full_bias, window_bias)
        attn = mha_reference(q[None], k[None], v[None], bias=bias[None])[0]
        attn = attn.reshape(-1, nh * hd) @ lp["attn"]["proj_w"] + lp["attn"]["proj_b"]
        x = x + attn
        h = _rms_norm(x, lp["norm2"]["scale"], eps)
        g = h @ lp["mlp"]["gate_w"] + lp["mlp"]["gate_b"]
        u = h @ lp["mlp"]["up_w"] + lp["mlp"]["up_b"]
        x = x + (jax.nn.silu(g) * u) @ lp["mlp"]["down_w"] + lp["mlp"]["down_b"]
        return x, None

    x, _ = jax.lax.scan(layer, x, (blocks, fullatt))

    # merger: RMSNorm → group 2x2 units → MLP (GELU exact)
    m = params["merger"]
    h = _rms_norm(x, m["ln_q"]["scale"], eps).reshape(-1, cfg.hidden_size * cfg.merge_unit)
    h = h @ m["fc1"]["kernel"] + m["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ m["fc2"]["kernel"] + m["fc2"]["bias"]

    # undo window permutation (pad index == U is clipped; unit_valid masks it)
    rev = jnp.clip(prep_reverse, 0, h.shape[0] - 1)
    return jnp.take(h, rev, axis=0)
