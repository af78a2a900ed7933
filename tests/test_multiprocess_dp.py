"""Multi-process data-parallel training (SURVEY §5.8): two REAL processes
bridged by jax.distributed (Gloo over localhost), each contributing its local
rollout rows to one global SPMD train step over a 4-device mesh.

This validates the multi-host story the reference gets from torchrun+NCCL:
per-process batch assembly (`make_array_from_process_local_data`), GSPMD
gradient reduction across process boundaries, and loss agreement with a
single-process oracle computing the same global batch."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs ≥4 virtual devices")
def test_two_process_dp_step_matches_single_process(tmp_path):
    # launch the two workers (each sees 2 virtual CPU devices)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_COORDINATOR_ADDRESS")
    }
    # fresh rendezvous port per run: concurrent pytest invocations (or a
    # stale coordinator from a previous run) must not cross-connect
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"loss_{pid}.txt")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(HERE, "mp_worker.py"), str(pid), out, port],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    for p in procs:
        try:
            p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    for p in procs:
        assert p.returncode == 0, p.stderr.read()[-2000:]

    import json

    results = [json.load(open(o)) for o in outs]
    losses = [r["loss"] for r in results]
    assert np.isfinite(losses).all()
    # SPMD: every process computes the same global loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # rank-asymmetric metric keys: the registry-keyed gather converges to the
    # same dict on both ranks; per-key mean ignores the absent (NaN) ranks
    m0, m1 = results[0]["metrics"], results[1]["metrics"]
    assert m0 == m1
    assert m0["reward"] == pytest.approx(1.5)  # mean(1.0, 2.0)
    assert m0["rewards/format_reward"] == pytest.approx(0.5)
    assert m0["metrics/reward_timestep_pair"] == pytest.approx(0.25)  # pid 0 only

    # single-process oracle on the concatenation of both processes' groups
    import optax

    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.rl import GRPOHyperParams, build_grpo_batch_groups
    from time_r1_tpu.rl.grpo import grpo_loss

    groups = []
    for pid in range(2):
        rng = np.random.default_rng(100 + pid)
        groups.append(
            {
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
        )
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    batch = build_grpo_batch_groups(CFG, groups, pad_to=64, dtype=jnp.float32)
    hp = GRPOHyperParams(num_generations=4, beta=0.0, use_grpo=False, fix_vit=True)
    want, _ = grpo_loss(params, CFG, hp, batch)
    assert losses[0] == pytest.approx(float(want), rel=1e-4)

    # vision-carrying step (VERDICT r2 #7): each process contributed its OWN
    # video; both must agree with the single-process oracle over the union
    vlosses = [r["vision_loss"] for r in results]
    assert vlosses[0] == pytest.approx(vlosses[1], rel=1e-6)
    vgroups = []
    for pid in range(2):
        grid = (2, 4, 4)
        n_vis = (2 * 4 * 4) // CFG.vision.merge_unit
        rv = np.random.default_rng(200 + pid)
        vgroups.append(
            {
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
                "patches": rv.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(
                    np.float32
                ),
                "grid_thw": grid,
                "second_per_grid_t": 1.0,
            }
        )
    vbatch = build_grpo_batch_groups(CFG, vgroups, pad_to=64, dtype=jnp.float32)
    vwant, _ = grpo_loss(params, CFG, hp, vbatch)
    assert vlosses[0] == pytest.approx(float(vwant), rel=1e-4)

    # shared-prefix (split) layout across processes agrees with the same
    # single-process full-row oracle (the split loss == full loss is pinned
    # separately in test_grpo.py)
    slosses = [r["split_vision_loss"] for r in results]
    assert slosses[0] == pytest.approx(slosses[1], rel=1e-6)
    assert slosses[0] == pytest.approx(float(vwant), rel=1e-4)

    # RANK-ASYMMETRIC vision (pid 0 video, pid 1 text-only): the collective
    # has-vision decision keeps both ranks in _global_vision; loss matches
    # the single-process oracle over the mixed groups
    alosses = [r["asym_vision_loss"] for r in results]
    assert alosses[0] == pytest.approx(alosses[1], rel=1e-6)
    tgroup = {
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
    abatch = build_grpo_batch_groups(CFG, [vgroups[0], tgroup], pad_to=64, dtype=jnp.float32)
    awant, _ = grpo_loss(params, CFG, hp, abatch)
    assert alosses[0] == pytest.approx(float(awant), rel=1e-4)
