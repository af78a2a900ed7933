"""Worker for the two-process distributed-DP test (test_multiprocess_dp.py).

Each process: jax.distributed over localhost, 2 virtual CPU devices → a
4-device global mesh; builds its LOCAL 4-row rollout batch (1 prompt × G=4,
text-only), assembles the 8-row GLOBAL batch via GRPOTrainer's multi-process
_shard_batch path, and runs ONE SPMD train step. Writes its loss to a file
for the parent to compare against the single-process oracle."""

import os
import sys


def main():
    pid = int(sys.argv[1])
    out_path = sys.argv[2]
    port = sys.argv[3] if len(sys.argv) > 3 else "29877"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2 and jax.device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    import optax

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))  # repo root for time_r1_tpu
    from test_model_parity import CFG
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.parallel import make_mesh, shard_params
    from time_r1_tpu.rl import GRPOHyperParams, build_grpo_batch_groups, make_train_step
    from time_r1_tpu.rl.trainer import GRPOTrainer

    mesh = make_mesh(model_parallel=1)  # global (data=4, model=1)
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = shard_params(jax.tree.map(np.asarray, params), mesh)
    hp = GRPOHyperParams(num_generations=4, beta=0.0, use_grpo=False, fix_vit=True)
    opt = optax.adamw(1e-6)
    step = make_train_step(CFG, hp, opt)
    opt_state = opt.init(params)

    # this process's local group (seeded per process; text-only rows)
    rng = np.random.default_rng(100 + pid)
    group = {
        "prompt_ids": list(rng.integers(2, 200, 6)),
        "completions": [
            list(rng.integers(2, 200, int(rng.integers(2, 5)))) + [CFG.eos_token_id]
            for _ in range(4)
        ],
        "advantages": rng.normal(size=4).astype(np.float32),
        "patches": None,
        "grid_thw": None,
        "second_per_grid_t": 1.0,
    }
    local_batch = build_grpo_batch_groups(CFG, [group], pad_to=64, dtype=jnp.float32)

    # borrow the trainer's multi-process batch assembly without building a
    # full trainer (no video/processor needed here)
    shim = object.__new__(GRPOTrainer)
    shim.mesh = mesh
    global_batch = GRPOTrainer._shard_batch(shim, local_batch)
    assert global_batch.input_ids.shape[0] == 8  # 2 processes × 4 rows

    with jax.set_mesh(mesh):
        _, _, loss, _ = step(params, opt_state, global_batch)
        jax.block_until_ready(loss)

    # vision-carrying multi-process step (VERDICT r2 #7): each process decodes
    # its OWN video (different patches/grids per rank); _shard_batch assembles
    # the union of videos + rebased feature offsets into one SPMD loss
    from time_r1_tpu.rl.grpo import grpo_loss

    grid = (2, 4, 4)
    n_vis = (2 * 4 * 4) // CFG.vision.merge_unit
    rv = np.random.default_rng(200 + pid)
    vgroup = {
        "prompt_ids": (
            [5, 6]
            + [CFG.vision_start_token_id]
            + [CFG.video_token_id] * n_vis
            + [CFG.vision_end_token_id]
            + [7]
        ),
        "completions": [
            list(rv.integers(2, 200, 3)) + [CFG.eos_token_id] for _ in range(4)
        ],
        "advantages": rv.normal(size=4).astype(np.float32),
        "patches": rv.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(np.float32),
        "grid_thw": grid,
        "second_per_grid_t": 1.0,
    }
    vbatch = build_grpo_batch_groups(CFG, [vgroup], pad_to=64, dtype=jnp.float32)
    shim.cfg = CFG
    shim.dtype = jnp.float32
    gv = GRPOTrainer._shard_batch(shim, vbatch, [grid])
    with jax.set_mesh(mesh):
        vloss, _ = jax.jit(lambda p, b: grpo_loss(p, CFG, hp, b))(params, gv)
        jax.block_until_ready(vloss)
    vision_loss = float(vloss)

    # shared-prefix (split) layout across processes: comp rows assemble
    # globally, prompt rows host-allgather + replicate; loss must match the
    # same union's full-row loss (the parent compares against its oracle)
    from time_r1_tpu.rl import build_grpo_split_batch

    sbatch = build_grpo_split_batch(CFG, [vgroup], dtype=jnp.float32)
    gs = GRPOTrainer._shard_batch(shim, sbatch, [grid])
    assert gs.comp_ids.shape[0] == 8 and gs.prompt_ids.shape[0] == 2
    with jax.set_mesh(mesh):
        sloss, _ = jax.jit(lambda p, b: grpo_loss(p, CFG, hp, b))(params, gs)
        jax.block_until_ready(sloss)
    split_vision_loss = float(sloss)

    # RANK-ASYMMETRIC vision: pid 0 contributes a VIDEO group, pid 1 a
    # text-only group. The has-vision decision must be COLLECTIVE (the
    # text-only rank still joins _global_vision's allgathers with zero
    # videos) or the video rank hangs; the text rank's offsets stay
    # row-aligned zeros.
    asym_group = vgroup if pid == 0 else {
        "prompt_ids": list(np.random.default_rng(300).integers(2, 200, 7)),
        "completions": [
            list(np.random.default_rng(301 + i).integers(2, 200, 3)) + [CFG.eos_token_id]
            for i in range(4)
        ],
        "advantages": np.random.default_rng(302).normal(size=4).astype(np.float32),
        "patches": None,
        "grid_thw": None,
        "second_per_grid_t": 1.0,
    }
    abatch = build_grpo_batch_groups(CFG, [asym_group], pad_to=64, dtype=jnp.float32)
    ga = GRPOTrainer._shard_batch(shim, abatch, [grid] if pid == 0 else [])
    with jax.set_mesh(mesh):
        aloss, _ = jax.jit(lambda p, b: grpo_loss(p, CFG, hp, b))(params, ga)
        jax.block_until_ready(aloss)
    asym_vision_loss = float(aloss)

    # metrics gather with RANK-ASYMMETRIC populated keys (VERDICT r2 weak#4):
    # only pid 0's completions parse — its timestep metric is populated,
    # pid 1's is absent. The registry gather must neither hang nor mix keys.
    from time_r1_tpu.rl.trainer import TrainConfig
    from time_r1_tpu.utils.rewards import METRIC_FUNCS_REGISTRY, REWARD_FUNCS_REGISTRY

    shim.reward_funcs = [REWARD_FUNCS_REGISTRY["format"]]
    shim.metric_funcs = list(METRIC_FUNCS_REGISTRY.values())
    shim.c = TrainConfig(beta=0.0, use_grpo=False)
    shim._metrics = {}
    GRPOTrainer._log_metric(shim, "reward", 1.0 + pid)
    GRPOTrainer._log_metric(shim, "rewards/format_reward", 0.5)
    if pid == 0:
        GRPOTrainer._log_metric(shim, "metrics/reward_timestep_pair", 0.25)
    gathered = GRPOTrainer.pop_metrics(shim)

    import json

    with open(out_path, "w") as f:
        json.dump(
            {
                "loss": float(loss),
                "vision_loss": vision_loss,
                "split_vision_loss": split_vision_loss,
                "asym_vision_loss": asym_vision_loss,
                "metrics": gathered,
            },
            f,
        )
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
