"""LoRA-integrated GRPO trainer (N9), gradient checkpointing, and resume
max_steps enforcement.

Reference parity targets:
- peft_config construction surface + adapter-only training
  (timer1_trainer.py:184-206, 264-265);
- ref logps from the UNMERGED base — adapter-disable trick, zero extra model
  memory (timer1_trainer.py:624-631);
- --gradient_checkpointing recipe flag (HF Trainer capability);
- resume max_steps recompute-and-enforce (main.py:589-618).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from tiny_tokenizer import TinyTokenizer

VIDEO = "/root/reference/assets/OHOFG.mp4"

EXAMPLE = {
    "task_type": "tg",
    "problem": "person sitting down in a chair",
    "solution": (1.0, 7.5),
    "video_path": VIDEO,
    "durations": 35.04,
    "video_start": 0.0,
    "video_end": 3.0,
}


def _trainer(tmp_path, **cfg_overrides):
    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.rl import GRPOTrainer, TrainConfig
    from time_r1_tpu.utils.rewards import REWARD_FUNCS_REGISTRY
    from time_r1_tpu.video.pipeline import video_loader

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=CFG.pad_token_id, eos_token_id=CFG.eos_token_id
    )
    base = dict(
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
    base.update(cfg_overrides)
    config = TrainConfig(**base)
    return GRPOTrainer(
        params,
        CFG,
        processor,
        reward_funcs=[REWARD_FUNCS_REGISTRY["iou_v2"], REWARD_FUNCS_REGISTRY["format"]],
        metric_funcs=(),
        config=config,
        video_loader=video_loader,
        dtype=jnp.float32,
    )


def test_lora_step_updates_adapters_only(tmp_path):
    trainer = _trainer(tmp_path, use_peft=True, lora_r=4, lora_alpha=8.0, beta=0.04)

    # adapter-disable ref trick: the base IS the ref model, no second copy
    assert trainer.ref_params is trainer.params
    assert trainer.lora is not None and len(trainer.lora) > 0
    # fix_vit: no adapters on the vision tower
    assert not any(k.startswith("visual") for k in trainer.lora)

    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.params)
    b_before = {k: np.asarray(v["lora_b"]).copy() for k, v in trainer.lora.items()}

    info = trainer.step(dict(EXAMPLE))
    assert np.isfinite(info["loss"])

    # base weights bit-identical; at least one adapter B moved (B starts at 0,
    # so any gradient flow shows up there) — rerun once if the advantage
    # happened to be all-zero
    moved = any(
        float(np.abs(np.asarray(trainer.lora[k]["lora_b"]) - b_before[k]).max()) > 0
        for k in trainer.lora
    )
    if not moved:
        trainer.step(dict(EXAMPLE))
        moved = any(
            float(np.abs(np.asarray(trainer.lora[k]["lora_b"]) - b_before[k]).max()) > 0
            for k in trainer.lora
        )
    for path in (("text", "layers", "mlp", "gate_w"), ("text", "embed_tokens", "embedding")):
        node_now, node_before = trainer.params, base_before
        for p in path:
            node_now, node_before = node_now[p], node_before[p]
        np.testing.assert_array_equal(np.asarray(node_now), node_before)

    # checkpoint carries the merged model + raw adapters
    trainer.save_checkpoint(str(tmp_path / "ck"))
    import os

    assert os.path.exists(str(tmp_path / "ck" / "lora_adapters.npz"))
    from time_r1_tpu.utils.checkpoint import load_params

    restored = load_params(str(tmp_path / "ck"), like=trainer.params)
    merged = trainer._policy_params()
    np.testing.assert_allclose(
        np.asarray(restored["text"]["layers"]["mlp"]["gate_w"]),
        np.asarray(merged["text"]["layers"]["mlp"]["gate_w"]),
        rtol=1e-6,
    )


def test_gradient_checkpointing_same_loss_and_grads():
    """remat must be a pure memory/time trade: identical loss and gradients."""
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.rl import GRPOHyperParams, build_grpo_batch
    from time_r1_tpu.rl.grpo import grpo_loss

    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(2, 200, 6))
    comps = [list(rng.integers(2, 200, n)) + [CFG.eos_token_id] for n in (3, 5, 2, 4)]
    batch = build_grpo_batch(
        CFG, prompt, comps, rng.normal(size=4).astype(np.float32), dtype=jnp.float32
    )

    outs = {}
    for remat in (False, True):
        hp = GRPOHyperParams(num_generations=4, beta=0.0, gradient_checkpointing=remat)
        (loss, _), grads = jax.value_and_grad(
            lambda p: grpo_loss(p, CFG, hp, batch), has_aux=True
        )(params)
        outs[remat] = (float(loss), grads)
    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-6)
    flat_f = jax.tree.leaves(outs[False][1])
    flat_t = jax.tree.leaves(outs[True][1])
    for a, b in zip(flat_f, flat_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_resume_max_steps_enforced(tmp_path):
    """Kill/resume: a resumed run must stop at the recomputed max_steps."""
    trainer = _trainer(tmp_path, num_train_epochs=3, save_strategy="epoch")
    dataset = [dict(EXAMPLE), dict(EXAMPLE)]

    # simulate a killed run that completed 3 of its steps
    trainer.train(dataset, max_steps=3)
    assert trainer.global_step == 3
    trainer.save_checkpoint(str(tmp_path / "ck"))

    # resume: quota = 1 epoch × 2 examples more → stops at 3 + 2 = 5
    resumed = _trainer(tmp_path, num_train_epochs=1)
    from time_r1_tpu.utils.checkpoint import load_params

    resumed.params = load_params(str(tmp_path / "ck"), like=resumed.params)
    resumed.global_step = 3
    resumed.train(dataset * 5, max_steps=3 + 2)  # oversized dataset: cap must bind
    assert resumed.global_step == 5


def test_optimizer_state_checkpointed_when_not_save_only_model(tmp_path):
    """--save_only_model false parity: resume restores Adam moments instead
    of silently restarting them."""
    trainer = _trainer(tmp_path, save_only_model=False)
    trainer.step(dict(EXAMPLE))
    trainer.save_checkpoint(str(tmp_path / "full"))
    import os

    assert os.path.isdir(str(tmp_path / "full" / "opt_state"))

    fresh = _trainer(tmp_path, save_only_model=False)
    fresh.load_checkpoint_state(str(tmp_path / "full"))
    assert fresh.global_step == trainer.global_step
    # restored optimizer state is bit-identical to what was saved (incl. the
    # adam step counter, which IS non-zero after one update)
    want = jax.tree.leaves(trainer.opt_state)
    got = jax.tree.leaves(fresh.opt_state)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    counters = [np.asarray(w) for w in want if np.asarray(w).ndim == 0]
    assert any(c > 0 for c in counters)  # adam count advanced past init

    # save_only_model=True (default) writes no optimizer state
    t2 = _trainer(tmp_path)
    t2.step(dict(EXAMPLE))
    t2.save_checkpoint(str(tmp_path / "slim"))
    assert not os.path.isdir(str(tmp_path / "slim" / "opt_state"))


def test_rollout_quantization_step_runs(tmp_path):
    """int8-quantized rollout sampling: the step completes and the loss path
    still recomputes logps in full precision (finite loss, metrics present)."""
    trainer = _trainer(tmp_path, rollout_quantization="int8")
    assert trainer.engine.quantization == "int8"
    info = trainer.step(dict(EXAMPLE))
    assert np.isfinite(info["loss"])


def test_lora_quantized_rollouts_example_dp_compose(tmp_path):
    """The three round-2 trainer features compose: LoRA adapters (merged
    rollout weights), int8-quantized rollout sampling, and a 2-example
    step_batch with per-group advantages."""
    trainer = _trainer(
        tmp_path,
        use_peft=True,
        lora_r=4,
        lora_alpha=8.0,
        rollout_quantization="int8",
        per_device_train_batch_size=2,
        beta=0.04,
    )
    assert trainer.ref_params is trainer.params  # base-as-ref, no copy
    ex2 = dict(EXAMPLE, problem="person stands up", video_start=1.0, video_end=4.0)
    info = trainer.step_batch([dict(EXAMPLE), ex2])
    assert np.isfinite(info["loss"])
    m = trainer.pop_metrics()
    assert "kl" in m and "reward" in m


def test_fused_merge_quantize_matches_two_step(tmp_path):
    """The fused LoRA merge→quantize program (one jit, no full merged tree in
    HBM — what lets LoRA + int8 rollouts fit one 16 GB chip) must bit-match
    what the engine previously installed: merge_jit followed by
    quantize_params_jit. (The oracle must be the JIT pipeline — XLA CPU's
    eager max-reduction rounds differently from the compiled one, so eager
    quantize_params is NOT bit-identical to either jit path.)"""
    from time_r1_tpu.ops.quant import quantize_params_jit

    trainer = _trainer(
        tmp_path, use_peft=True, lora_r=4, lora_alpha=8.0, rollout_quantization="int8"
    )
    assert trainer._merge_quant_jit is not None
    got = trainer._merge_quant_jit(trainer.params, trainer.lora)
    want = quantize_params_jit(trainer._merge_jit(trainer.params, trainer.lora), bits=8)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(got)[0],
        jax.tree_util.tree_flatten_with_path(want)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(kp))


def test_lora_resume_restores_adapters_and_opt_state(tmp_path):
    """LoRA resume consistency (ADVICE r2): the checkpoint's adapters are
    reloaded into self.lora (base stays the original frozen checkpoint) so
    the restored Adam moments line up with the restored adapter values —
    NOT merged-params-over-base with freshly re-initialized adapters."""
    trainer = _trainer(
        tmp_path, use_peft=True, lora_r=4, lora_alpha=8.0, save_only_model=False
    )
    trainer.step(dict(EXAMPLE))
    trainer.save_checkpoint(str(tmp_path / "ck"))
    base_snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.params)

    fresh = _trainer(
        tmp_path, use_peft=True, lora_r=4, lora_alpha=8.0, save_only_model=False
    )
    fresh.load_checkpoint_state(str(tmp_path / "ck"))
    # adapters reloaded bit-exact; base untouched (still the original ckpt)
    for p, ab in trainer.lora.items():
        for n, v in ab.items():
            np.testing.assert_array_equal(np.asarray(v), np.asarray(fresh.lora[p][n]))
    for a, b in zip(jax.tree.leaves(base_snapshot), jax.tree.leaves(fresh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Adam moments restored to match the adapters
    for w, g in zip(jax.tree.leaves(trainer.opt_state), jax.tree.leaves(fresh.opt_state)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    # the effective policy (merged) matches too
    for a, b in zip(
        jax.tree.leaves(trainer._policy_params()), jax.tree.leaves(fresh._policy_params())
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # merged-only checkpoint (no adapters file): merged loads as the new base,
    # stale opt_state is NOT restored
    import os

    os.remove(str(tmp_path / "ck" / "lora_adapters.npz"))
    fresh2 = _trainer(
        tmp_path, use_peft=True, lora_r=4, lora_alpha=8.0, save_only_model=False
    )
    opt_before = jax.tree.map(lambda x: np.asarray(x).copy(), fresh2.opt_state)
    fresh2.load_checkpoint_state(str(tmp_path / "ck"))
    for w, g in zip(jax.tree.leaves(opt_before), jax.tree.leaves(fresh2.opt_state)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    # policy still equals the saved merged model (B=0 at re-init → merged==base)
    for a, b in zip(
        jax.tree.leaves(trainer._policy_params()), jax.tree.leaves(fresh2._policy_params())
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
