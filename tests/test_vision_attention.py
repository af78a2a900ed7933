"""Fused Pallas window-attention+rope (ops/vision_attention.py) vs the jnp
vision path: the serving-path kernel must reproduce vision_forward exactly
(same rope, same block-diagonal window masking, same padded-slot handling)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG


def _vis_inputs(grids, seed=0):
    from time_r1_tpu.models.qwen25vl import prepare_vision_inputs

    rng = np.random.default_rng(seed)
    n_patches = sum(t * h * w for t, h, w in grids)
    patches = rng.normal(size=(n_patches, CFG.vision.patch_input_dim)).astype(np.float32)
    prep = prepare_vision_inputs(grids, CFG.vision)
    return prep, patches


@pytest.mark.parametrize("grids", [[(2, 4, 4)], [(2, 4, 4), (2, 6, 2)]])
def test_window_kernel_matches_jnp_path(grids):
    """vision_forward(use_window_kernel=True) == the jnp path bit-for-float
    on tiny grids (includes padded dead slots and multi-video layouts)."""
    from time_r1_tpu.models.qwen25vl.vision import init_vision_params, vision_forward

    prep, patches = _vis_inputs(grids)
    params = init_vision_params(CFG.vision, jax.random.PRNGKey(0), dtype=jnp.float32)

    def run(kernel):
        return vision_forward(
            params, CFG.vision, jnp.asarray(patches),
            jnp.asarray(prep.perm), jnp.asarray(prep.pos_hw),
            jnp.asarray(prep.key_valid), jnp.asarray(prep.full_gather),
            jnp.asarray(prep.full_inverse), jnp.asarray(prep.reverse),
            use_window_kernel=kernel,
        )

    want = np.asarray(run(False))
    got = np.asarray(run(True))  # interpret mode on CPU
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_kernel_unit_matches_block_attention():
    """window_attention_rope vs rope + masked dense SDPA on one packed block
    with an invalid (padded) tail window."""
    from time_r1_tpu.models.qwen25vl.vision import _block_attention, _rotate_half
    from time_r1_tpu.ops.vision_attention import window_attention_rope

    rng = np.random.default_rng(1)
    win, pack, nh, hd = 16, 2, 3, 8
    P = win * pack * 2  # 2 blocks
    q, k, v = (jnp.asarray(rng.normal(size=(P, nh, hd)).astype(np.float32)) for _ in range(3))
    cos = jnp.asarray(rng.normal(size=(P, hd)).astype(np.float32))
    sin = jnp.asarray(rng.normal(size=(P, hd)).astype(np.float32))
    key_valid = np.ones((P,), bool)
    key_valid[-win:] = False  # last window entirely pad
    key_bias = jnp.asarray(np.where(key_valid, 0.0, -1e30).astype(np.float32))

    got = window_attention_rope(q, k, v, cos, sin, key_bias, win, pack, interpret=True)

    def rope(x):
        xf = x.astype(jnp.float32)
        return xf * cos[:, None, :] + _rotate_half(xf) * sin[:, None, :]

    qr, kr = rope(q), rope(k)
    packed = win * pack
    row_w = np.arange(packed)[:, None] // win
    col_w = np.arange(packed)[None, :] // win
    cross = np.where(row_w == col_w, 0.0, -1e30).astype(np.float32)
    bias = key_bias.reshape(-1, packed)[:, None, None, :] + cross[None, None]
    want = _block_attention(
        qr.reshape(-1, packed, nh, hd),
        kr.reshape(-1, packed, nh, hd),
        v.reshape(-1, packed, nh, hd),
        bias,
        hd**-0.5,
    ).reshape(P, nh, hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
