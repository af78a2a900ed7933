"""System test: one full GRPO train step on a REAL video with the tiny model —
decode → prompt → G rollouts → rewards → advantages → update (SURVEY §3.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from tiny_tokenizer import TinyTokenizer

VIDEO = "/root/reference/assets/OHOFG.mp4"


def test_grpo_trainer_step_real_video(tmp_path):
    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.rl import GRPOTrainer, TrainConfig
    from time_r1_tpu.utils.rewards import REWARD_FUNCS_REGISTRY
    from time_r1_tpu.video.pipeline import video_loader

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
    )
    config = TrainConfig(
        output_dir=str(tmp_path),
        num_generations=4,
        max_completion_length=6,
        temperature=1.0,
        beta=0.0,
        gradient_accumulation_steps=1,
        total_pixels=8 * 28 * 28,
        min_pixels=4 * 28 * 28,
        fix_vit=True,
    )
    def spread_reward(completions, **kwargs):
        # deterministic nonzero advantage spread: steps of 10 dominate the
        # [0, 1]-bounded iou/format rewards, so the group std is always > 0
        # and the policy update is deterministically nonzero
        return [10.0 * i for i in range(len(completions))]

    trainer = GRPOTrainer(
        params,
        CFG,
        processor,
        reward_funcs=[
            REWARD_FUNCS_REGISTRY["iou_v2"],
            REWARD_FUNCS_REGISTRY["format"],
            spread_reward,
        ],
        metric_funcs=(),
        config=config,
        video_loader=video_loader,
        dtype=jnp.float32,
    )
    example = {
        "task_type": "tg",
        "problem": "person sitting down in a chair",
        "solution": (1.0, 7.5),
        "video_path": VIDEO,
        "durations": 35.04,
        "video_start": 0.0,
        "video_end": 3.0,
    }
    before = trainer.params["text"]["layers"]["mlp"]["gate_w"]
    info = trainer.step(example)
    assert np.isfinite(info["loss"])
    metrics = trainer.pop_metrics()
    assert "rewards/iou_timestamp_reward_v2" in metrics
    assert "rewards/format_reward" in metrics
    assert "reward" in metrics and "reward_std" in metrics
    assert "completion_length" in metrics and metrics["completion_length"] <= 6
    after = trainer.params["text"]["layers"]["mlp"]["gate_w"]
    # spread_reward guarantees a nonzero advantage spread → the update MUST
    # move the trainable decoder weights
    assert float(jnp.abs(after - before).max()) > 0.0

    # checkpointing round-trip
    trainer.save_checkpoint(str(tmp_path / "ck"))
    from time_r1_tpu.utils.checkpoint import load_params

    restored = load_params(str(tmp_path / "ck"), like=trainer.params)
    np.testing.assert_array_equal(
        np.asarray(restored["text"]["norm"]["scale"]),
        np.asarray(trainer.params["text"]["norm"]["scale"]),
    )


def test_vision_hidden_capture_matches_precompute(tmp_path):
    """fix_vit vision reuse: the rollout prefill's captured pre-merger hidden
    states must equal grpo.precompute_frozen_vision's output for the same
    videos (same frozen blocks, same padded layout), and a trainer step must
    actually USE the capture (the precompute fallback never fires)."""
    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.rl import GRPOTrainer, TrainConfig
    from time_r1_tpu.rl import grpo as grpo_mod
    from time_r1_tpu.rl.rollout import _pack_vision
    from time_r1_tpu.sampler.params import SamplingParams
    from time_r1_tpu.utils.rewards import REWARD_FUNCS_REGISTRY
    from time_r1_tpu.video.pipeline import video_loader

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
    )
    config = TrainConfig(
        output_dir=str(tmp_path),
        num_generations=2,
        max_completion_length=4,
        temperature=1.0,
        beta=0.0,
        total_pixels=8 * 28 * 28,
        min_pixels=4 * 28 * 28,
        fix_vit=True,
    )
    trainer = GRPOTrainer(
        params,
        CFG,
        processor,
        reward_funcs=[REWARD_FUNCS_REGISTRY["format"]],
        config=config,
        video_loader=video_loader,
        dtype=jnp.float32,
    )
    assert trainer.engine.capture_vision_hidden  # fix_vit + single chip → on
    example = {
        "task_type": "tg",
        "problem": "person sitting down in a chair",
        "solution": (1.0, 7.5),
        "video_path": VIDEO,
        "durations": 35.04,
        "video_start": 0.0,
        "video_end": 3.0,
    }
    reqs = trainer.prepare_requests([example])
    sp = SamplingParams(temperature=1.0, max_new_tokens=4, num_return_sequences=2, seed=0)
    trainer.engine.generate(reqs, sp)
    cap = trainer.engine.captured_vision
    assert cap is not None

    # oracle: the frozen-precompute path on the identical batch layout
    r = reqs[0]
    vis = _pack_vision(CFG, [r.grid_thw], [r.patches], jnp.float32)
    want = grpo_mod._frozen_vision_jit(
        trainer.params["visual"], CFG.vision, vis.patches, vis.perm, vis.pos_hw,
        vis.key_valid, vis.full_gather, vis.full_inverse,
        use_window_kernel=False,
    )
    sig, got = cap
    assert sig == ((tuple(int(x) for x in r.grid_thw),), int(vis.perm.shape[0]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    # a full step must ride the capture: make the fallback loud
    import time_r1_tpu.rl.trainer as trainer_mod

    orig = trainer_mod.precompute_frozen_vision

    def boom(*a, **k):
        raise AssertionError("precompute_frozen_vision fallback fired under capture")

    trainer_mod.precompute_frozen_vision = boom
    try:
        info = trainer.step(dict(example))
    finally:
        trainer_mod.precompute_frozen_vision = orig
    assert np.isfinite(info["loss"])


@pytest.mark.parametrize("fuse", [True, False], ids=["fused", "unfused"])
def test_grpo_trainer_step_quantized_base(tmp_path, fuse):
    """The single-chip 7B training configuration at tiny scale (VERDICT r4
    #1): int8 base shared between the loss (per-layer dequant-merge
    in-scan) and the rollout engine (side-path adapters, zero-copy weight
    sync), int8 KV rollouts, base-as-ref KL. One real-video step must train
    the adapters and round-trip a checkpoint.

    Runs in BOTH base layouts: decode-FUSED qkv/gu (the round-5 default —
    rollouts stream serving-shape dots; adapters merge as concatenated
    column-block deltas) and unfused per-projection (fuse=False)."""
    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.ops.quant import quantize_params
    from time_r1_tpu.rl import GRPOTrainer, TrainConfig
    from time_r1_tpu.utils.rewards import REWARD_FUNCS_REGISTRY
    from time_r1_tpu.video.pipeline import video_loader

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    q_base = quantize_params(params, bits=8, fuse=fuse)
    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
    )
    config = TrainConfig(
        output_dir=str(tmp_path),
        num_generations=4,
        max_completion_length=6,
        temperature=1.0,
        beta=0.04,  # ref logps over the quantized base (adapter-disable trick)
        use_peft=True,
        lora_r=4,
        rollout_quantization="int8",
        gradient_checkpointing=True,
        gradient_accumulation_steps=1,  # default 2 would make step 1 a no-op
        total_pixels=8 * 28 * 28,
        min_pixels=4 * 28 * 28,
        fix_vit=True,
    )

    def spread_reward(completions, **kwargs):
        return [10.0 * i for i in range(len(completions))]

    trainer = GRPOTrainer(
        q_base,
        CFG,
        processor,
        reward_funcs=[REWARD_FUNCS_REGISTRY["format"], spread_reward],
        config=config,
        video_loader=video_loader,
        dtype=jnp.float32,
    )
    # ONE weight tree: the engine holds the trainer's base, not a copy
    assert trainer.engine.params is trainer.params
    before = jax.tree.map(lambda x: np.asarray(x), trainer.lora)

    example = {
        "task_type": "tg",
        "problem": "person sitting down in a chair",
        "solution": (1.0, 7.5),
        "video_path": VIDEO,
        "durations": 35.04,
        "video_start": 0.0,
        "video_end": 3.0,
    }
    info = trainer.step(example)
    assert np.isfinite(info["loss"])
    # the rollout ran with the side-path adapters installed
    assert trainer.engine.lora_side is not None
    # the update moved the adapters (spread_reward guarantees advantage std)
    moved = max(
        float(np.abs(np.asarray(v) - before[p][n]).max())
        for p, ab in trainer.lora.items()
        for n, v in ab.items()
    )
    assert moved > 0.0
    # the base never moved (frozen, still quantized, layout preserved)
    attn = trainer.params["text"]["layers"]["self_attn"]
    assert attn["qkv" if fuse else "q_w"]["q8"].dtype == jnp.int8

    # checkpoint round-trip: quantized base + adapters, resume restores both
    trainer.save_checkpoint(str(tmp_path / "ck"))
    lora_snapshot = jax.tree.map(lambda x: np.asarray(x), trainer.lora)
    trainer.lora = jax.tree.map(lambda x: jnp.zeros_like(x), trainer.lora)
    trainer.load_checkpoint_state(str(tmp_path / "ck"))
    for p, ab in trainer.lora.items():
        for n, v in ab.items():
            np.testing.assert_array_equal(np.asarray(v), lora_snapshot[p][n])
