"""7B (north-star model) checks: config parity and sharded train-step lowering.

BASELINE.json's target is GRPO post-training of the **7B** model; every
reference result table is a 7B comparison (/root/reference/README.md:91-137).
Real 7B weights are environment-blocked, so these tests pin what can be pinned
today: the architecture constants (vs the public Qwen2.5-VL-7B config) and
that the FULL 7B GRPO train step — shared-prefix split loss, fix_vit, KL,
AdamW, FSDP rule-table shardings — lowers over a multi-device mesh at the
recipe shape with a sane per-device HBM budget.
"""

from time_r1_tpu.models.qwen25vl import Qwen25VLConfig


def test_7b_config_matches_public_checkpoint():
    """Constants of Qwen/Qwen2.5-VL-7B-Instruct config.json (the base model
    the reference trains, README.md + timer1_trainer.py:244)."""
    cfg = Qwen25VLConfig.qwen25vl_7b()
    t = cfg.text
    assert t.hidden_size == 3584
    assert t.intermediate_size == 18944
    assert t.num_hidden_layers == 28
    assert t.num_attention_heads == 28
    assert t.num_key_value_heads == 4
    assert t.head_dim == 128
    assert t.vocab_size == 152064
    assert not t.tie_word_embeddings  # 7B unties lm_head (3B ties it)
    v = cfg.vision
    assert v.out_hidden_size == 3584  # merger projects into the 7B width
    assert (v.depth, v.hidden_size, v.num_heads) == (32, 1280, 16)


def test_7b_param_count():
    """eval_shape the real init: ~8.3B params total (6.5B decoder + 0.68B
    vision + 2×0.54B untied embed/head) — the '7B' family size."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from time_r1_tpu.models.qwen25vl import init_params

    cfg = Qwen25VLConfig.qwen25vl_7b()
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 8.0e9 < n < 8.8e9, n


def test_7b_train_step_compiles_sharded_with_budget():
    """AOT-COMPILE (not just lower — round 4's no-remat 3B grad program
    lowered fine and failed remote compile on allocation) the full 7B GRPO
    train step over the 8-device CI mesh at the recipe shape (1792-token
    video prompt × G=8 × 200-token completions, shared-prefix, fix_vit,
    beta=0.04 KL, remat). Asserts the XLA pipeline produces an executable
    and that its memory_analysis() temp footprint leaves headroom on a
    16 GB chip next to the FSDP steady state. The committed v5p-16 artifact
    (docs/artifacts/plan_7b_16dev.json, scripts/lower_7b.py --compile)
    records the 16-device deployment: args 2.94 GB + temps 6.58 GB."""
    from time_r1_tpu.parallel.plan import format_budget, plan_7b_train_step

    b = plan_7b_train_step(n_devices=8, offload_optimizer=True, do_compile=True)
    print(format_budget(b))
    assert b["lowered"]
    assert b["compiled"]
    # bf16 params ~15.5 GB total; FSDP/8 → ~2 GB/device (replicated scalars
    # like norm scales keep it slightly above total/8)
    assert 14.0 < b["params_total_gb"] < 17.0
    assert b["params_per_device_gb"] < b["params_total_gb"] / 8 * 1.15
    # steady-state (params+grads, optimizer off-device) must fit a v5e chip
    # at 8-way FSDP, with room for activations
    assert b["steady_state_per_device_gb"] < 8.0
    # XLA's own accounting: per-device args (params+grads+batch shards) plus
    # scratch must fit 16 GB HBM. memory_analysis may be unavailable on some
    # backends; when present, enforce the bound.
    if "xla_temp_gb" in b:
        assert b["xla_argument_gb"] + b["xla_temp_gb"] < 14.0, b
