"""Example-level data-parallel training (N4): P prompt groups × G rollouts
per optimizer step, advantages normalized within each group — the reference's
torchrun-N-ranks effective batch (scripts/posttrain/train_rl.sh:12-17),
realized through the mesh `data` axis instead of processes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from tiny_tokenizer import TinyTokenizer

VIDEO = "/root/reference/assets/OHOFG.mp4"


def _group(rng, G=4, with_video=False):
    g = {
        "prompt_ids": list(rng.integers(2, 200, int(rng.integers(4, 9)))),
        "completions": [
            list(rng.integers(2, 200, int(rng.integers(2, 6)))) + [CFG.eos_token_id]
            for _ in range(G)
        ],
        "advantages": rng.normal(size=G).astype(np.float32),
        "patches": None,
        "grid_thw": None,
        "second_per_grid_t": 1.0,
    }
    if with_video:
        g["grid_thw"] = (2, 4, 4)
        g["patches"] = rng.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(np.float32)
    return g


def test_groups_batch_matches_single_group():
    from time_r1_tpu.rl import build_grpo_batch, build_grpo_batch_groups

    rng = np.random.default_rng(0)
    g = _group(rng, with_video=True)
    single = build_grpo_batch(
        CFG, g["prompt_ids"], g["completions"], g["advantages"],
        patches=g["patches"], grid_thw=g["grid_thw"], dtype=jnp.float32,
    )
    multi = build_grpo_batch_groups(CFG, [g], dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(single.input_ids), np.asarray(multi.input_ids))
    np.testing.assert_array_equal(
        np.asarray(single.completion_mask), np.asarray(multi.completion_mask)
    )
    np.testing.assert_array_equal(np.asarray(single.position_ids), np.asarray(multi.position_ids))
    np.testing.assert_array_equal(np.asarray(single.advantages), np.asarray(multi.advantages))


def test_vanilla_grpo_loss_of_combined_batch_is_mean_of_groups():
    """use_grpo=True reduces per-sequence then batch-mean, so a 2-group batch
    must equal the mean of the two single-group losses (same T bucket)."""
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.rl import GRPOHyperParams, build_grpo_batch_groups
    from time_r1_tpu.rl.grpo import grpo_loss

    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    hp = GRPOHyperParams(num_generations=4, beta=0.0, use_grpo=True)
    rng = np.random.default_rng(1)
    g1, g2 = _group(rng), _group(rng)
    pad_to = 128
    l1, _ = grpo_loss(params, CFG, hp, build_grpo_batch_groups(CFG, [g1], pad_to=pad_to, dtype=jnp.float32))
    l2, _ = grpo_loss(params, CFG, hp, build_grpo_batch_groups(CFG, [g2], pad_to=pad_to, dtype=jnp.float32))
    l12, _ = grpo_loss(
        params, CFG, hp, build_grpo_batch_groups(CFG, [g1, g2], pad_to=pad_to, dtype=jnp.float32)
    )
    assert float(l12) == pytest.approx((float(l1) + float(l2)) / 2, rel=1e-5, abs=1e-6)


def test_trainer_step_batch_two_examples(tmp_path):
    """E2E: one optimizer step on TWO real-video examples (P=2 × G=4 rows),
    per-example advantage groups."""
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
        per_device_train_batch_size=2,
        max_completion_length=5,
        temperature=1.0,
        beta=0.0,
        gradient_accumulation_steps=1,
        total_pixels=8 * 28 * 28,
        min_pixels=4 * 28 * 28,
        report_to="none",
    )
    trainer = GRPOTrainer(
        params, CFG, processor,
        reward_funcs=[REWARD_FUNCS_REGISTRY["iou_v2"], REWARD_FUNCS_REGISTRY["format"]],
        config=config, video_loader=video_loader, dtype=jnp.float32,
    )
    ex1 = {
        "task_type": "tg", "problem": "person sitting down in a chair",
        "solution": (1.0, 7.5), "video_path": VIDEO, "durations": 35.04,
        "video_start": 0.0, "video_end": 3.0,
    }
    ex2 = dict(ex1, problem="person stands up", video_start=1.0, video_end=4.0)
    info = trainer.step_batch([ex1, ex2])
    assert np.isfinite(info["loss"])
    assert trainer.global_step == 1
    m = trainer.pop_metrics()
    assert "reward" in m and "reward_std" in m


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
def test_example_dp_step_on_mesh():
    """2 prompts × G=4 = 8 rows sharded over the 8-device data axis — the
    multichip example-DP shape (matches __graft_entry__.dryrun_multichip)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.parallel import make_mesh, shard_params
    from time_r1_tpu.parallel.mesh import DATA_AXIS
    from time_r1_tpu.rl import GRPOHyperParams, build_grpo_batch_groups, make_train_step

    mesh = make_mesh(model_parallel=1)
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = shard_params(jax.tree.map(np.asarray, params), mesh)
    hp = GRPOHyperParams(num_generations=4, beta=0.0, use_grpo=False, fix_vit=True)
    opt = optax.adamw(1e-6)
    step = make_train_step(CFG, hp, opt)
    opt_state = opt.init(params)

    rng = np.random.default_rng(2)
    batch = build_grpo_batch_groups(
        CFG, [_group(rng, with_video=True), _group(rng, with_video=True)], dtype=jnp.float32
    )
    rows = NamedSharding(mesh, P(DATA_AXIS))
    batch = batch._replace(
        input_ids=jax.device_put(np.asarray(batch.input_ids), rows),
        attention_mask=jax.device_put(np.asarray(batch.attention_mask), rows),
        completion_mask=jax.device_put(np.asarray(batch.completion_mask), rows),
        advantages=jax.device_put(np.asarray(batch.advantages), rows),
        position_ids=jax.device_put(
            np.asarray(batch.position_ids), NamedSharding(mesh, P(None, DATA_AXIS))
        ),
    )
    with jax.set_mesh(mesh):
        new_params, opt_state, loss, metrics = step(params, opt_state, batch)
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))
