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
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"loss_{pid}.txt")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(HERE, "mp_worker.py"), str(pid), out],
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

    losses = [float(open(o).read()) for o in outs]
    assert np.isfinite(losses).all()
    # SPMD: every process computes the same global loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

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
