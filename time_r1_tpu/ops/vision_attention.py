"""Pallas fused window-attention (+2D rope) for the Qwen2.5-VL vision tower.

The ViT's window attention is many tiny (64-row, hd=80) SDPAs. The XLA path
pays three separate costs per layer (profiled on v5e, docs/ROADMAP.md §5):
the f32 logits/probs round-trip through HBM, the rope rotate_half relayouts
(hd=80 splits at 40 lanes), and pipeline fills on ~1k tiny dots. This kernel
runs one grid step per (2-window block, head) and keeps EVERYTHING in VMEM:
rope is applied in-register to the block's q/k, the per-head (128, 128)
logits, mask-add and softmax never touch HBM, and the only HBM traffic is
the pre-rope q/k/v in and the attention output out — the roofline for this
op.

Layout note: q/k/v are carried HEAD-MAJOR (nh, P, hd) into the kernel so a
block is (1, blk, hd) — the unit dim leads and Mosaic tiles the trailing
(blk, hd). Slicing the head out of (P, nh, hd) blocks instead puts the unit
dim in the sublane position, an unsupported shape cast (verified on v5e:
"tpu.reshape vector<128x80xbf16> -> vector<128x1x80xbf16>").

Serving-path only (no custom VJP): the GRPO loss keeps the jnp path, which
is also what `fix_vit` freezes anyway.
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


def _kernel(
    q_ref,  # (1, sub·blk, hd) pre-rope, one head
    k_ref,  # (1, sub·blk, hd) pre-rope
    v_ref,  # (1, sub·blk, hd)
    cos_ref,  # (sub·blk, hd) f32
    sin_ref,  # (sub·blk, hd) f32
    bias_ref,  # (n_cells, sub·blk) f32 key-validity bias (whole array in VMEM)
    o_ref,  # (1, sub·blk, hd)
    *,
    win_patches: int,
    scale: float,
    blk: int,
):
    _, rows, hd = q_ref.shape
    sub = rows // blk
    half = hd // 2
    # block-diagonal window mask, identical for every sub-block (windows are
    # uniform and blk is a whole number of windows); key bias varies per sub
    row_w = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0) // win_patches
    col_w = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1) // win_patches
    win_mask = jnp.where(row_w == col_w, 0.0, NEG_INF)
    cell_bias = bias_ref[pl.program_id(0)]  # (sub·blk,)

    # rotate_half via a LANE ROLL (hd=80 splits at 40 lanes — a concat there
    # is an unsupported shape cast for Mosaic; roll is a native lane rotate):
    # roll(x, half)[i] = x[(i − half) mod hd] = [x2 | x1]; the sign mask
    # restores concat(−x2, x1).
    sign = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (blk, hd), 1) < half, -1.0, 1.0
    )

    # statically unrolled loop over blk-row sub-blocks: one grid cell does
    # `sub` independent window attentions, amortizing the per-cell fixed cost
    # (grid iteration + DMA turnaround) that dominates at 64-patch windows
    # while keeping each softmax at (blk, blk) VMEM
    for s in range(sub):
        rows_s = pl.ds(s * blk, blk)
        cos = cos_ref[rows_s, :]
        sin = sin_ref[rows_s, :]

        def rope(x):  # (blk, hd) f32
            rot = pltpu.roll(x, half, 1) * sign
            return x * cos + rot * sin

        qh = rope(q_ref[0, rows_s, :].astype(jnp.float32)) * scale
        kh = rope(k_ref[0, rows_s, :].astype(jnp.float32))
        logits = (
            jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            + win_mask
            + cell_bias[s * blk : (s + 1) * blk][None, :]
        )
        p = jax.nn.softmax(logits, axis=-1)
        vh = v_ref[0, rows_s, :].astype(jnp.float32)
        o_ref[0, rows_s, :] = jax.lax.dot(
            p, vh, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("win_patches", "block_windows", "sub_blocks", "interpret")
)
def window_attention_rope(
    q: jnp.ndarray,  # (P, nh, hd) PRE-rope
    k: jnp.ndarray,  # (P, nh, hd) PRE-rope
    v: jnp.ndarray,  # (P, nh, hd)
    cos: jnp.ndarray,  # (P, hd) f32 rope cos
    sin: jnp.ndarray,  # (P, hd) f32
    key_bias: jnp.ndarray,  # (P,) f32 — 0 for valid keys, -inf for pad slots
    win_patches: int,
    block_windows: int = 2,
    sub_blocks: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused rope + window attention over fixed-size windows. P must be a
    multiple of block_windows·win_patches (the padded-window layout
    guarantees whole windows). Each grid cell processes up to `sub_blocks`
    consecutive (block_windows·win_patches)-row blocks in an unrolled loop —
    fewer, fatter cells amortize the per-cell fixed cost."""
    if interpret is None:
        interpret = _interpret()
    P, nh, hd = q.shape
    blk = block_windows * win_patches
    assert P % blk == 0, (P, blk)
    n_blocks = P // blk
    sub = sub_blocks
    while n_blocks % sub != 0:
        sub //= 2
    n_cells = n_blocks // sub
    scale = hd**-0.5

    bias2d = key_bias.astype(jnp.float32).reshape(n_cells, sub * blk)
    cosf = cos.astype(jnp.float32)
    sinf = sin.astype(jnp.float32)
    # head-major so each kernel block is (1, sub·blk, hd) — see module docstring
    qT, kT, vT = (x.swapaxes(0, 1) for x in (q, k, v))

    kernel = functools.partial(_kernel, win_patches=win_patches, scale=scale, blk=blk)
    qkv_spec = pl.BlockSpec((1, sub * blk, hd), lambda b, h: (h, b, 0))
    trig_spec = pl.BlockSpec((sub * blk, hd), lambda b, h: (b, 0))
    out = pl.pallas_call(
        kernel,
        grid=(n_cells, nh),
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            trig_spec,
            trig_spec,
            # whole bias array resident (n_blocks·blk f32 = a few KB): a
            # (1, blk) block would violate the (8, 128)-divisibility rule
            pl.BlockSpec((n_cells, sub * blk), lambda b, h: (0, 0)),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((nh, P, hd), v.dtype),
        interpret=interpret,
    )(qT, kT, vT, cosf, sinf, bias2d)
    return out.swapaxes(0, 1)


def _full_kernel(
    q_ref,  # (1, 1, S, hd) pre-rope, one (slice, head)
    k_ref,  # (1, 1, S, hd)
    v_ref,  # (1, 1, S, hd)
    cos_ref,  # (1, S, hd) f32 — slice-gathered rope cos
    sin_ref,  # (1, S, hd) f32
    bias_ref,  # (n_slices, S) f32 key bias (whole array in VMEM)
    o_ref,  # (1, 1, S, hd)
    *,
    scale: float,
):
    _, _, S, hd = q_ref.shape
    half = hd // 2
    cos = cos_ref[0]
    sin = sin_ref[0]
    sign = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (S, hd), 1) < half, -1.0, 1.0
    )

    def rope(x):  # (S, hd) f32 — same lane-roll rotate_half as _kernel
        rot = pltpu.roll(x, half, 1) * sign
        return x * cos + rot * sin

    qh = rope(q_ref[0, 0].astype(jnp.float32)) * scale
    kh = rope(k_ref[0, 0].astype(jnp.float32))
    logits = (
        jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        + bias_ref[pl.program_id(0)][None, :]
    )
    p = jax.nn.softmax(logits, axis=-1)
    vh = v_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = jax.lax.dot(p, vh, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


# per-(slice, head) VMEM budget: the (S, S) f32 logits dominate; 1536² f32
# ≈ 9.4 MB still fits v5e's 16 MB VMEM alongside the (S, hd) operands.
FULL_KERNEL_MAX_SLICE = 1536


@functools.partial(jax.jit, static_argnames=("interpret",))
def full_attention_rope(
    q: jnp.ndarray,  # (n_slices, S, nh, hd) slice-gathered, PRE-rope
    k: jnp.ndarray,  # (n_slices, S, nh, hd) PRE-rope
    v: jnp.ndarray,  # (n_slices, S, nh, hd)
    cos: jnp.ndarray,  # (n_slices, S, hd) f32 slice-gathered rope cos
    sin: jnp.ndarray,  # (n_slices, S, hd) f32
    key_bias: jnp.ndarray,  # (n_slices, S) f32 — 0 valid, -inf pad/dead keys
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused rope + full attention over (sample, t)-slice blocks — the 4
    `fullatt_block_indexes` layers of the ViT. One grid step per
    (slice, head) keeps the (S, S) f32 logits+softmax VMEM-resident (the
    jnp path materializes them in HBM and serializes slice groups under
    lax.map). Returns (n_slices, S, nh, hd)."""
    if interpret is None:
        interpret = _interpret()
    n_slices, S, nh, hd = q.shape
    scale = hd**-0.5
    assert S <= FULL_KERNEL_MAX_SLICE, (S, FULL_KERNEL_MAX_SLICE)

    cosf = cos.astype(jnp.float32)
    sinf = sin.astype(jnp.float32)
    bias = key_bias.astype(jnp.float32)
    # head-major so each kernel block is (1, 1, S, hd) — see module docstring
    qT, kT, vT = (x.transpose(2, 0, 1, 3) for x in (q, k, v))

    kernel = functools.partial(_full_kernel, scale=scale)
    qkv_spec = pl.BlockSpec((1, 1, S, hd), lambda s, h: (h, s, 0, 0))
    trig_spec = pl.BlockSpec((1, S, hd), lambda s, h: (s, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(n_slices, nh),
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            trig_spec,
            trig_spec,
            pl.BlockSpec((n_slices, S), lambda s, h: (0, 0)),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((nh, n_slices, S, hd), v.dtype),
        interpret=interpret,
    )(qT, kT, vT, cosf, sinf, bias)
    return out.transpose(1, 2, 0, 3)
