"""Headline benchmark: GRPO-rollout decode throughput on one TPU chip.

Shape mirrors the reference's hot loop #1 (timer1_trainer.py:568-573): G=8
grouped rollouts from a ~1k-token video prompt (≈896 video tokens + text,
the recipes' 3584·28² pixel budget), Qwen2.5-VL-3B architecture, bf16.

The reference publishes no throughput numbers (BASELINE.md) — `vs_baseline`
is measured against A100_VLLM_3B_DECODE_TOKS_PER_S, a conservative public
ballpark for vLLM 0.8.x Qwen2.5-VL-3B batched decode on one A100 at this
batch size. Driver target: ≥2× (BASELINE.md north star).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

A100_VLLM_3B_DECODE_TOKS_PER_S = 700.0

BATCH = 8  # G in the GRPO recipes
PROMPT_TEXT_TOKENS = 128
VIDEO_GRID = (8, 28, 28)  # 6272 patches → 1568 video tokens ≈ 3584·28²/4 budget /4
DECODE_STEPS = 128


def main():
    import jax
    import jax.numpy as jnp

    from time_r1_tpu.models.qwen25vl import (
        KVCache,
        Qwen25VLConfig,
        Qwen25VLConfig as _C,
        VisionInputs,
        forward,
        get_rope_index,
        init_params,
        prepare_vision_inputs,
    )
    from time_r1_tpu.sampler import SamplingParams
    from time_r1_tpu.sampler.engine import prefill_and_decode

    cfg = Qwen25VLConfig.qwen25vl_3b()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    t, h, w = VIDEO_GRID
    n_patches = t * h * w
    n_vis = n_patches // 4
    rng = np.random.default_rng(0)
    row = np.concatenate(
        [
            rng.integers(2, 100000, PROMPT_TEXT_TOKENS - 2),
            [cfg.vision_start_token_id],
            np.full(n_vis, cfg.video_token_id, np.int64),
            [cfg.vision_end_token_id],
        ]
    )
    ids = np.tile(row[None, :], (BATCH, 1))
    S = ids.shape[1]
    max_len = S + DECODE_STEPS
    mask = np.ones((BATCH, max_len), np.int64)

    pos_ids, _ = get_rope_index(
        cfg,
        ids,
        video_grid_thw=np.tile(np.array([VIDEO_GRID]), (BATCH, 1)),
        second_per_grid_ts=[1.0] * BATCH,
        attention_mask=mask[:, :S],
    )
    start_pos = pos_ids.max(axis=(0, 2)) + 1

    prep = prepare_vision_inputs([VIDEO_GRID] * BATCH, cfg.vision)
    patches = rng.normal(size=(n_patches * BATCH, cfg.vision.patch_input_dim)).astype(np.float32)
    vis = VisionInputs.build(prep, jnp.asarray(patches, jnp.bfloat16))

    sp = SamplingParams(
        temperature=1.0,
        max_new_tokens=DECODE_STEPS,
        stop_token_ids=(999_999,),  # unreachable: force full-length decode
        num_return_sequences=1,
    )

    args = (
        params,
        cfg,
        jnp.asarray(ids),
        jnp.asarray(pos_ids),
        jnp.asarray(mask),
        vis,
        jnp.asarray(start_pos),
        S,
        sp,
        jax.random.PRNGKey(0),
    )

    # warmup (compile)
    tokens = prefill_and_decode(*args)
    jax.block_until_ready(tokens)

    t0 = time.perf_counter()
    tokens = prefill_and_decode(*args)
    jax.block_until_ready(tokens)
    total = time.perf_counter() - t0

    # isolate prefill cost to report decode-only throughput
    sp1 = SamplingParams(
        temperature=1.0, max_new_tokens=1, stop_token_ids=(999_999,), num_return_sequences=1
    )
    args1 = args[:8] + (sp1, jax.random.PRNGKey(0))
    tk = prefill_and_decode(*args1)
    jax.block_until_ready(tk)
    t0 = time.perf_counter()
    tk = prefill_and_decode(*args1)
    jax.block_until_ready(tk)
    prefill_time = time.perf_counter() - t0

    decode_time = max(total - prefill_time, 1e-6)
    toks_per_s = BATCH * (DECODE_STEPS - 1) / decode_time
    print(
        json.dumps(
            {
                "metric": "grpo_rollout_decode_throughput_3b_bs8",
                "value": round(toks_per_s, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(toks_per_s / A100_VLLM_3B_DECODE_TOKS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
