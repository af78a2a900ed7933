"""Fused int8 SwiGLU MLP kernel for the decode path.

One Pallas kernel streams the layer's gate/up/down int8 weights once and
computes y = (silu(x@Wg)·s_g · (x@Wu)·s_u) @ Wd · s_d without writing the
(B, inter) intermediates to HBM or paying three separate kernel dispatches.
The grid walks `inter` in blocks; gate/up blocks come from the FUSED
(hid, 2·inter) quantized weight (ops/quant.quantize_text_params layout) via
block index maps, and the down contribution accumulates in a VMEM scratch.

Decode at small batch is HBM-bound on these weights (gu 45 MB + down
22.5 MB per 3B layer — 88% of the layer's stream), so the kernel's job is
simply to keep the DMA pipeline full while the MXU does the small dots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, g_ref, u_ref, gs_ref, us_ref, d_ref, ds_ref, o_ref, acc):
    j = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...].astype(jnp.bfloat16)  # (B, hid)
    g = jax.lax.dot_general(
        x, g_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * gs_ref[...]
    u = jax.lax.dot_general(
        x, u_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * us_ref[...]
    a = (jax.nn.silu(g) * u).astype(jnp.bfloat16)  # (B, NB)
    acc[...] += jax.lax.dot_general(
        a, d_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nb - 1)
    def _():
        o_ref[...] = (acc[...] * ds_ref[...]).astype(o_ref.dtype)


def _pick_block(inter: int) -> int:
    for nb in (512, 384, 256, 128):
        if inter % nb == 0:
            return nb
    return 0


def fused_mlp_eligible(mlp: dict, hid: int) -> bool:
    """Fused-quantized layout on MXU-aligned shapes."""
    if not (isinstance(mlp.get("gu"), dict) and "q8" in mlp["gu"]):
        return False
    if not (isinstance(mlp.get("down_w"), dict) and "q8" in mlp["down_w"]):
        return False
    inter = mlp["down_w"]["q8"].shape[-2]
    return hid % 128 == 0 and _pick_block(inter) > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mlp_int8(
    x: jnp.ndarray,  # (B, hid)
    gu_q8: jnp.ndarray,  # (hid, 2·inter) int8
    gu_s: jnp.ndarray,  # (1, 2·inter) f32
    down_q8: jnp.ndarray,  # (inter, hid) int8
    down_s: jnp.ndarray,  # (1, hid) f32
    interpret: bool | None = None,
) -> jnp.ndarray:
    B, hid = x.shape
    inter = down_q8.shape[0]
    NB = _pick_block(inter)
    n_blk = inter // NB
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((B, hid), lambda j: (0, 0)),
            pl.BlockSpec((hid, NB), lambda j: (0, j)),           # gate block
            pl.BlockSpec((hid, NB), lambda j: (0, j + n_blk)),   # up block
            pl.BlockSpec((1, NB), lambda j: (0, j)),
            pl.BlockSpec((1, NB), lambda j: (0, j + n_blk)),
            pl.BlockSpec((NB, hid), lambda j: (j, 0)),           # down block
            pl.BlockSpec((1, hid), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, hid), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, hid), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, hid), jnp.float32)],
        interpret=interpret,
    )(x, gu_q8, gu_q8, gu_s, gu_s, down_q8, down_s)
