"""Sharded GRPO trainer on the virtual 8-device CPU mesh: the full trainer
step (rollout + rewards + sharded update) must run with FSDP/TP params and
dp-sharded rollout rows (SURVEY §7 distributed test strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from tiny_tokenizer import TinyTokenizer

VIDEO = "/root/reference/assets/OHOFG.mp4"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
def test_trainer_step_on_mesh(tmp_path):
    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.parallel import make_mesh
    from time_r1_tpu.rl import GRPOTrainer, TrainConfig
    from time_r1_tpu.utils.rewards import REWARD_FUNCS_REGISTRY
    from time_r1_tpu.video.pipeline import video_loader

    # dp/fsdp-only mesh: XLA's in-process CPU collectives can deadlock on
    # mixed TP|DP subgroup programs when 8 virtual devices share one core
    # (see __graft_entry__.dryrun_multichip); TP is covered by running the
    # dryrun with TIMER1_DRYRUN_TP=2 on multi-core hosts / real chips.
    mesh = make_mesh(model_parallel=1)
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
    )
    config = TrainConfig(
        output_dir=str(tmp_path),
        num_generations=8,  # divisible by data axis (4)
        max_completion_length=4,
        temperature=1.0,
        beta=0.0,
        gradient_accumulation_steps=1,
        total_pixels=8 * 28 * 28,
        min_pixels=4 * 28 * 28,
        report_to="none",
    )
    with jax.set_mesh(mesh):
        trainer = GRPOTrainer(
            params,
            CFG,
            processor,
            reward_funcs=[REWARD_FUNCS_REGISTRY["format"]],
            config=config,
            video_loader=video_loader,
            dtype=jnp.float32,
            mesh=mesh,
        )
        # params actually sharded over the mesh
        qw = trainer.params["text"]["layers"]["self_attn"]["q_w"]
        assert len(qw.sharding.device_set) == 8
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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
def test_trainer_step_with_optimizer_offload(tmp_path):
    """ZeRO-offload capability (scripts/zero3_offload.json parity): AdamW
    moments FSDP-sharded in pinned host memory between steps; the update
    streams them through device memory (make_train_step's offload notes).
    Runs a REAL sharded step and checks the state stays host-resident and
    the update actually happened."""
    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.parallel import make_mesh
    from time_r1_tpu.rl import GRPOTrainer, TrainConfig
    from time_r1_tpu.utils.rewards import REWARD_FUNCS_REGISTRY
    from time_r1_tpu.video.pipeline import video_loader

    mesh = make_mesh(model_parallel=1)
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
    )
    config = TrainConfig(
        output_dir=str(tmp_path),
        num_generations=8,
        max_completion_length=4,
        temperature=1.0,
        beta=0.0,
        gradient_accumulation_steps=1,
        total_pixels=8 * 28 * 28,
        min_pixels=4 * 28 * 28,
        report_to="none",
        offload_optimizer=True,
    )
    with jax.set_mesh(mesh):
        trainer = GRPOTrainer(
            params,
            CFG,
            processor,
            reward_funcs=[REWARD_FUNCS_REGISTRY["format"]],
            config=config,
            video_loader=video_loader,
            dtype=jnp.float32,
            mesh=mesh,
        )
        from time_r1_tpu.rl.grpo import _offloadable

        kinds = {
            getattr(x.sharding, "memory_kind", None)
            for x in jax.tree.leaves(trainer.opt_state)
            if _offloadable(x)
        }
        if kinds != {"pinned_host"}:
            pytest.skip(f"backend without host memory kinds: {kinds}")
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
    # out_shardings put the updated state BACK in host memory (the moment
    # tensors; scalar counters intentionally stay in device memory)…
    kinds = {
        getattr(x.sharding, "memory_kind", None)
        for x in jax.tree.leaves(trainer.opt_state)
        if _offloadable(x)
    }
    assert kinds == {"pinned_host"}, kinds
    # …and the update actually ran end-to-end on the streamed state: the
    # adamw step counter (a scalar that intentionally stays in HBM)
    # incremented. (The moments can legitimately stay zero here: the format
    # reward scores all G rollouts equally → zero advantages → zero grads.)
    counts = [
        int(x)
        for x in jax.tree.leaves(trainer.opt_state)
        if hasattr(x, "dtype") and x.ndim == 0 and np.issubdtype(x.dtype, np.integer)
    ]
    assert counts and all(c == 1 for c in counts), counts
