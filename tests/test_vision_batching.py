"""Mixed-resolution vision batching: a batched prep over videos with
UNEQUAL (sample, t)-slice sizes must reproduce the per-video forward.

Regression for the full-attention duplicate-pad bug: `full_gather` pads
short slices, and the pad entries used to point at a REAL row (the slice
start), so full-attention layers leaked attention mass onto duplicated keys
whenever slices had unequal sizes — exactly the engine multi-request pack
and the dedup'd GRPO loss forward with different videos. Pads are now -1
sentinels masked as keys (vision.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from time_r1_tpu.models.qwen25vl.config import VisionConfig
from time_r1_tpu.models.qwen25vl.vision import (
    init_vision_params,
    prepare_vision_inputs,
    vision_forward,
)

CFG = VisionConfig(
    depth=3,
    hidden_size=64,
    intermediate_size=128,
    num_heads=4,
    fullatt_block_indexes=(1,),
    out_hidden_size=32,
)


def _run(params, grids, patches, **kw):
    prep = prepare_vision_inputs(grids, CFG)
    out = vision_forward(
        params,
        CFG,
        jnp.asarray(patches),
        jnp.asarray(prep.perm),
        jnp.asarray(prep.pos_hw),
        jnp.asarray(prep.key_valid),
        jnp.asarray(prep.full_gather),
        jnp.asarray(prep.full_inverse),
        jnp.asarray(prep.reverse),
        **kw,
    )
    return np.asarray(out[: prep.n_units]), prep


def test_heterogeneous_batch_matches_per_video():
    params = init_vision_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    # (2,4,4) pads its 2x2-unit slice into one 4x4 window (sz=64);
    # (2,16,16) fills four windows (sz=256) — unequal slice sizes.
    g_a, g_b = (2, 4, 4), (2, 16, 16)
    p_a = rng.normal(size=(2 * 4 * 4, CFG.patch_input_dim)).astype(np.float32)
    p_b = rng.normal(size=(2 * 16 * 16, CFG.patch_input_dim)).astype(np.float32)

    joint, prep = _run(params, [g_a, g_b], np.concatenate([p_a, p_b]))
    # the batch genuinely exercises unequal slices (pad sentinels present)
    assert (prep.full_gather < 0).any()

    sep_a, _ = _run(params, [g_a], p_a)
    sep_b, _ = _run(params, [g_b], p_b)
    sep = np.concatenate([sep_a, sep_b])
    np.testing.assert_allclose(joint, sep, atol=2e-5, rtol=2e-5)

    # fused-kernel serving path handles the pad sentinels identically
    joint_k, _ = _run(params, [g_a, g_b], np.concatenate([p_a, p_b]), use_window_kernel=True)
    np.testing.assert_allclose(joint_k, sep, atol=2e-5, rtol=2e-5)


def test_full_attention_kernel_matches_oracle():
    """full_attention_rope vs rope + masked dense SDPA over slice blocks,
    with a slice whose tail is pad (-inf key bias)."""
    from time_r1_tpu.models.qwen25vl.vision import _block_attention, _rotate_half
    from time_r1_tpu.ops.vision_attention import full_attention_rope

    rng = np.random.default_rng(2)
    n_slices, S, nh, hd = 3, 24, 2, 16
    q, k, v = (
        jnp.asarray(rng.normal(size=(n_slices, S, nh, hd)).astype(np.float32))
        for _ in range(3)
    )
    cos = jnp.asarray(rng.normal(size=(n_slices, S, hd)).astype(np.float32))
    sin = jnp.asarray(rng.normal(size=(n_slices, S, hd)).astype(np.float32))
    bias = np.zeros((n_slices, S), np.float32)
    bias[1, 16:] = -1e30  # padded tail keys in slice 1
    bias_j = jnp.asarray(bias)

    got = full_attention_rope(q, k, v, cos, sin, bias_j, interpret=True)

    def rope(x, c, s):
        return x * c[:, :, None, :] + _rotate_half(x) * s[:, :, None, :]

    want = _block_attention(
        rope(q, cos, sin), rope(k, cos, sin), v, bias_j[:, None, None, :], hd**-0.5
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_segment_scan_matches_cond_scan():
    """Periodic-pattern segment scan == per-layer cond scan (tiny_test cfg,
    depth 2 with fullatt at layer 1 is periodic with g=2)."""
    from time_r1_tpu.models.qwen25vl.config import Qwen25VLConfig

    vcfg = Qwen25VLConfig.tiny_test().vision
    params = init_vision_params(vcfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    grids = [(2, 4, 4), (2, 8, 8)]
    patches = rng.normal(
        size=(sum(t * h * w for t, h, w in grids), vcfg.patch_input_dim)
    ).astype(np.float32)
    prep = prepare_vision_inputs(grids, vcfg)
    args = (
        params,
        vcfg,
        jnp.asarray(patches),
        jnp.asarray(prep.perm),
        jnp.asarray(prep.pos_hw),
        jnp.asarray(prep.key_valid),
        jnp.asarray(prep.full_gather),
        jnp.asarray(prep.full_inverse),
        jnp.asarray(prep.reverse),
    )
    seg = vision_forward(*args, segment_scan=True)
    cond = vision_forward(*args, segment_scan=False)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(cond), rtol=1e-6, atol=1e-6)
