"""Tensor-parallel inference on the virtual mesh (SURVEY §2.3 TP row; vLLM
tensor_parallel_size parity, vllm_infer.py:50).

Pure-TP meshes keep one process group per collective, so they are safe on the
1-core CI host (the known XLA in-process CPU deadlock needs mixed TP|DP
subgroup programs). This pins the TP rule table with exact greedy
equivalence instead of leaving it on faith."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from time_r1_tpu.sampler import Engine, Request, SamplingParams


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs ≥2 virtual devices")
def test_tp2_engine_greedy_matches_unsharded():
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.parallel import make_mesh, shard_params

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    grid = (2, 4, 4)
    reqs = [
        Request(input_ids=list(rng.integers(2, 200, 11))),
        Request(
            input_ids=(
                list(rng.integers(2, 200, 4))
                + [CFG.vision_start_token_id]
                + [CFG.video_token_id] * 8
                + [CFG.vision_end_token_id]
                + list(rng.integers(2, 200, 3))
            ),
            patches=rng.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(np.float32),
            grid_thw=grid,
            second_per_grid_t=1.0,
        ),
    ]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids)
    want = Engine(params, CFG, dtype=jnp.float32).generate(reqs, sp)

    mesh = make_mesh(model_parallel=2, devices=jax.devices()[:2])
    assert dict(mesh.shape) == {"data": 1, "model": 2}
    sharded = shard_params(jax.tree.map(np.asarray, params), mesh)
    # at least one big weight actually TP-sharded across both devices
    qw = sharded["text"]["layers"]["self_attn"]["q_w"]
    assert len(qw.sharding.device_set) == 2
    got = Engine(sharded, CFG, dtype=jnp.float32).generate(reqs, sp)
    assert got == want

    # G-way grouped rollout under TP: the shared-prefix decode reshapes the
    # head axis (H → Hkv×G) with heads TP-sharded — must match unsharded
    spg = SamplingParams(
        temperature=0.0, max_new_tokens=6, stop_token_ids=CFG.stop_token_ids,
        num_return_sequences=3,
    )
    want_g = Engine(params, CFG, dtype=jnp.float32).generate([reqs[1]], spg)
    got_g = Engine(sharded, CFG, dtype=jnp.float32).generate([reqs[1]], spg)
    assert got_g == want_g


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs ≥2 virtual devices")
def test_tp2_train_step_runs():
    """One sharded GRPO train step on a pure-TP mesh — the attention/MLP
    sharding rules run a real fwd/bwd with GSPMD collectives."""
    import optax

    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.parallel import make_mesh, shard_params
    from time_r1_tpu.rl import GRPOHyperParams, build_grpo_batch, make_train_step

    mesh = make_mesh(model_parallel=2, devices=jax.devices()[:2])
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    params = shard_params(jax.tree.map(np.asarray, params), mesh)
    hp = GRPOHyperParams(num_generations=4, beta=0.0, fix_vit=True)
    opt = optax.adamw(1e-6)
    step = make_train_step(CFG, hp, opt)
    opt_state = opt.init(params)

    rng = np.random.default_rng(1)
    prompt = list(rng.integers(2, 200, 6))
    comps = [list(rng.integers(2, 200, n)) + [CFG.eos_token_id] for n in (3, 5, 2, 4)]
    batch = build_grpo_batch(
        CFG, prompt, comps, rng.normal(size=4).astype(np.float32), dtype=jnp.float32
    )
    with jax.set_mesh(mesh):
        new_params, opt_state, loss, _ = step(params, opt_state, batch)
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs ≥2 virtual devices")
def test_tp2_with_quantized_serving():
    """TP sharding composes with weight-only int8 + int8 KV cache (the
    --tensor_parallel_size + --quantization + --kv_cache_dtype combination):
    quantization runs on the sharded tree under GSPMD."""
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.parallel import make_mesh, shard_params

    params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    mesh = make_mesh(model_parallel=2, devices=jax.devices()[:2])
    sharded = shard_params(jax.tree.map(np.asarray, params), mesh)
    eng = Engine(sharded, CFG, dtype=jnp.float32, quantization="int8", kv_cache_quant=True)
    rng = np.random.default_rng(4)
    out = eng.generate(
        [Request(input_ids=list(rng.integers(2, 200, 11)))],
        SamplingParams(temperature=0.0, max_new_tokens=5, stop_token_ids=CFG.stop_token_ids),
    )
    assert len(out) == 1 and 0 < len(out[0]) <= 5


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 virtual devices")
def test_tp_group_index_uses_disjoint_devices():
    """--tp_group_index: N/TP eval processes can each claim their own TP
    device group so no chip idles (VERDICT r2 weak#7 — TP × shard-by-index
    composition). Group 1's mesh must live on devices [2, 4) and produce the
    same greedy outputs as group 0."""
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.parallel import make_mesh, shard_params

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(7)
    reqs = [Request(input_ids=list(rng.integers(2, 200, 11)))]
    sp = SamplingParams(temperature=0.0, max_new_tokens=5, stop_token_ids=CFG.stop_token_ids)

    outs, meshes = [], []
    for gi in (0, 1):
        devs = jax.devices()[2 * gi : 2 * (gi + 1)]
        mesh = make_mesh(model_parallel=2, devices=devs)
        sharded = shard_params(params, mesh)
        meshes.append({d.id for d in mesh.devices.flat})
        outs.append(Engine(sharded, CFG, dtype=jnp.float32).generate(reqs, sp))
    assert meshes[0].isdisjoint(meshes[1])
    assert outs[0] == outs[1]
