"""7B deployment plan: sharded AOT lowering + per-device HBM budget.

The north star (BASELINE.json) is GRPO post-training of the **7B** model on a
v5p-16 slice; every reference result table is a 7B comparison
(/root/reference/README.md:91-137). Real 7B weights are environment-blocked
(no egress), but the SHAPES are not: this module AOT-lowers the full 7B GRPO
train step — shared-prefix split loss, fix_vit, KL term, AdamW, optional
optimizer host-offload — over an n-device mesh with the production FSDP
rule-table shardings, and prints the per-device HBM budget the step implies.

This is the multi-chip go/no-go check that can run today: if the 7B program
lowers with these shardings and the parameter+grad+optimizer bytes fit the
target chip's HBM, the day weights exist the same code trains.

Driven by scripts/lower_7b.py (16 virtual devices) and tests/test_7b.py
(8-device CI mesh).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _sharded_bytes(leaf_nbytes: int, spec, mesh) -> int:
    """Per-device bytes of a leaf under a PartitionSpec."""
    denom = 1
    for ax in spec:
        if ax is not None:
            denom *= mesh.shape[ax]
    return -(-leaf_nbytes // denom)


def plan_7b_train_step(
    n_devices: Optional[int] = None,
    prompt_text_tokens: int = 224,
    video_grid=(8, 28, 28),
    completion_len: int = 200,
    num_generations: int = 8,
    beta: float = 0.04,
    offload_optimizer: bool = True,
    do_compile: bool = False,
    cfg=None,
) -> dict:
    """Lower the full 7B GRPO train step over an n-device data mesh.

    Returns a dict with the per-device budget (params/grads/optimizer, bytes)
    and lowering stats. Shapes mirror the posttrain recipe: one ~1.8k-token
    video prompt (3584·28² pixel budget → 1568 video tokens) × G rollouts ×
    ~200-token completions (train_rl.sh: max_prompt_length 8192,
    max_completion_length 200), shared-prefix split loss (the production
    default), fix_vit, remat, KL vs precomputed ref logps (beta=0.04 like the
    posttrain recipe; ref logps enter the step as batch data — the ref
    forward is its own program, rl/grpo.compute_ref_logps).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.qwen25vl import Qwen25VLConfig, init_params
    from ..rl import GRPOHyperParams, build_grpo_split_batch
    from ..rl.grpo import make_train_step
    from .mesh import DATA_AXIS, make_mesh
    from .sharding import param_shardings, spec_for_path, _path_str, _divisible
    from jax.sharding import NamedSharding, PartitionSpec as P

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert len(devices) >= n_devices, (len(devices), n_devices)
    mesh = make_mesh(model_parallel=1, devices=devices[:n_devices])

    cfg = cfg or Qwen25VLConfig.qwen25vl_7b()
    param_sds = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    shardings = param_shardings(param_sds, mesh)
    param_sds = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        param_sds,
        shardings,
    )

    # ---- per-device HBM budget (FSDP rule table over the data axis) ----
    def tally(tree, dtype_bytes=None):
        total = 0
        per_dev = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            nbytes = int(np.prod(leaf.shape)) * (dtype_bytes or leaf.dtype.itemsize)
            spec = _divisible(leaf.shape, spec_for_path(_path_str(path)), mesh)
            total += nbytes
            per_dev += _sharded_bytes(nbytes, spec, mesh)
        return total, per_dev

    p_total, p_dev = tally(param_sds)
    # grads mirror params (bf16); AdamW mu+nu mirror params (optax default:
    # same dtype as params)
    budget = {
        "n_devices": n_devices,
        "params_total_gb": p_total / 2**30,
        "params_per_device_gb": p_dev / 2**30,
        "grads_per_device_gb": p_dev / 2**30,
        "opt_state_per_device_gb": 2 * p_dev / 2**30,
        "opt_state_location": "pinned_host" if offload_optimizer else "hbm",
    }
    hbm = budget["params_per_device_gb"] + budget["grads_per_device_gb"]
    if not offload_optimizer:
        hbm += budget["opt_state_per_device_gb"]
    budget["steady_state_per_device_gb"] = hbm

    # ---- recipe-shape batch (real host arrays; tens of MB) ----
    t, h, w = video_grid
    n_patches = t * h * w
    n_vis = n_patches // 4
    rng = np.random.default_rng(0)
    # example-level DP: P prompt groups × G rollouts, P scaled so the rollout
    # rows cover the data axis (the trainer's step_batch packs P examples the
    # same way; at v5p-16 that is P=2 videos per optimizer step)
    n_prompts = max(1, -(-n_devices // num_generations))
    groups = []
    for _ in range(n_prompts):
        prompt = (
            list(rng.integers(2, 100000, prompt_text_tokens - 2))
            + [cfg.vision_start_token_id]
            + [cfg.video_token_id] * n_vis
            + [cfg.vision_end_token_id]
        )
        comps = [
            list(rng.integers(2, 100000, completion_len - 1)) + [cfg.eos_token_id]
            for _ in range(num_generations)
        ]
        groups.append(
            {
                "prompt_ids": prompt,
                "completions": comps,
                "advantages": rng.normal(size=num_generations).astype(np.float32),
                "patches": rng.normal(size=(n_patches, cfg.vision.patch_input_dim)).astype(
                    np.float32
                ),
                "grid_thw": video_grid,
                "second_per_grid_t": 1.0,
            }
        )
    batch = build_grpo_split_batch(cfg, groups, dtype=jnp.bfloat16)
    if beta != 0.0:
        batch = batch._replace(
            ref_logps=np.zeros(batch.comp_ids.shape, np.float32)
        )

    # comp rows shard over data; prompt/vision replicate (the trainer's
    # _shard_split_batch layout)
    row = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())

    def to_sds(x, sharding):
        a = np.asarray(x)
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding)

    comp_rows = batch.comp_ids.shape[0]
    batch_sds = batch._replace(
        prompt_ids=to_sds(batch.prompt_ids, rep),
        prompt_mask=to_sds(batch.prompt_mask, rep),
        prompt_pos=to_sds(batch.prompt_pos, rep),
        comp_ids=to_sds(batch.comp_ids, row),
        comp_mask=to_sds(batch.comp_mask, row),
        comp_pos=to_sds(batch.comp_pos, NamedSharding(mesh, P(None, DATA_AXIS))),
        advantages=to_sds(batch.advantages, row),
        feat_offsets=to_sds(batch.feat_offsets, rep),
        ref_logps=to_sds(batch.ref_logps, row) if batch.ref_logps is not None else None,
        vision=jax.tree.map(lambda x: to_sds(x, rep), batch.vision),
    )

    hp = GRPOHyperParams(
        num_generations=num_generations,
        beta=beta,
        use_grpo=False,
        fix_vit=True,
        gradient_checkpointing=True,
    )
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-6))
    opt_sds = jax.eval_shape(opt.init, param_sds)

    opt_sharding = None
    if offload_optimizer:
        try:
            # FSDP-sharded host residency: mu/nu paths end in the param path,
            # so the same rule table shards them; per-device update transient
            # = opt_bytes/n_devices (trainer._setup_optimizer does the same).
            # Scalars stay in HBM (see grpo._offloadable).
            from ..rl.grpo import _offloadable

            dev_sh = param_shardings(opt_sds, mesh)
            opt_sharding = jax.tree.map(
                lambda x, s: s.with_memory_kind("pinned_host")
                if _offloadable(x)
                else s,
                opt_sds,
                dev_sh,
            )
            opt_sds = jax.tree.map(
                lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
                opt_sds,
                opt_sharding,
            )
        except Exception as e:  # backend without pinned_host memory kinds
            budget["opt_state_location"] = f"hbm (offload unavailable: {e})"
            opt_sharding = None

    step = make_train_step(cfg, hp, opt, opt_state_sharding=opt_sharding)
    with jax.set_mesh(mesh):
        lowered = step.lower(param_sds, opt_sds, batch_sds)
        if do_compile:
            compiled = lowered.compile()
            budget["compiled"] = True
            try:
                mem = compiled.memory_analysis()
                if mem is not None:
                    budget["xla_argument_gb"] = mem.argument_size_in_bytes / 2**30
                    budget["xla_temp_gb"] = mem.temp_size_in_bytes / 2**30
            except Exception:
                pass

    budget["lowered"] = True
    budget["comp_rows"] = comp_rows
    budget["prompt_len"] = len(prompt)
    return budget


def format_budget(b: dict) -> str:
    lines = [
        f"7B GRPO train step lowered over {b['n_devices']}-device data mesh "
        f"(prompt {b['prompt_len']} tokens, {b['comp_rows']} completion rows):",
        f"  params  {b['params_total_gb']:.2f} GB total → {b['params_per_device_gb']:.2f} GB/device (bf16, FSDP)",
        f"  grads   {b['grads_per_device_gb']:.2f} GB/device (bf16)",
        f"  adamw   {b['opt_state_per_device_gb']:.2f} GB/device ({b['opt_state_location']})",
        f"  steady-state HBM {b['steady_state_per_device_gb']:.2f} GB/device "
        f"(+ activations bounded by remat)",
    ]
    if "xla_temp_gb" in b:
        lines.append(
            f"  xla: args {b['xla_argument_gb']:.2f} GB, temps {b['xla_temp_gb']:.2f} GB"
        )
    return "\n".join(lines)
