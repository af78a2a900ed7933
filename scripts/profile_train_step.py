"""Profile the GRPO loss fwd+bwd at the recipe shape: full-row layout vs the
shared-prefix (split) layout — the TrainConfig.shared_prefix_loss default.

Shape mirrors the reference hot loop (timer1_trainer.py:568-607): one video
prompt (~1.8k tokens incl. 1568 video tokens) × G=8 rollouts × ~200-token
completions, 3B model, bf16, fix_vit, remat. Run on one TPU chip:

    python scripts/profile_train_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
    from time_r1_tpu.rl import GRPOHyperParams, build_grpo_batch_groups, build_grpo_split_batch
    from time_r1_tpu.rl.grpo import grpo_loss

    cfg = Qwen25VLConfig.qwen25vl_3b()
    n_layers = int(os.environ.get("TIMER1_PROFILE_LAYERS", "0"))
    if n_layers:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, num_hidden_layers=n_layers)
        )
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    jax.block_until_ready(params)

    G = 8
    grid = (8, 28, 28)
    n_patches = grid[0] * grid[1] * grid[2]
    n_vis = n_patches // 4
    rng = np.random.default_rng(0)
    prompt = (
        list(rng.integers(2, 100000, 222))
        + [cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_vis
        + [cfg.vision_end_token_id]
    )
    comps = [list(rng.integers(2, 100000, 199)) + [cfg.eos_token_id] for _ in range(G)]
    groups = [
        {
            "prompt_ids": prompt,
            "completions": comps,
            "advantages": rng.normal(size=G).astype(np.float32),
            "patches": rng.normal(size=(n_patches, cfg.vision.patch_input_dim)).astype(
                np.float32
            ),
            "grid_thw": grid,
            "second_per_grid_t": 1.0,
        }
    ]
    if os.environ.get("TIMER1_PROFILE_NOVISION", "0") == "1":
        groups[0]["prompt_ids"] = list(rng.integers(2, 100000, len(prompt)))
        for key in ("patches", "grid_thw", "second_per_grid_t"):
            del groups[0][key]
    # TIMER1_PROFILE_REMAT: "1"/full (save layer inputs only), "0" (no remat —
    # fails remote compile on 16 GB at 3B, kept for the record), or a
    # language.REMAT_POLICIES key ("dots", "dots_small") — selective residual
    # saving, the round-5 middle ground between full remat and no-remat
    remat_env = os.environ.get("TIMER1_PROFILE_REMAT", "1")
    hp = GRPOHyperParams(
        num_generations=G, beta=0.0, use_grpo=False, fix_vit=True,
        gradient_checkpointing={"0": False, "1": True}.get(remat_env, remat_env),
    )

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    # full-tree 3B fwd+bwd needs params+grads = 12.4 GB and does not fit one
    # 16 GB v5e (production 3B runs are LoRA or multi-chip FSDP). Forward is
    # the comparable hot piece; the LoRA bwd re-runs it with adapter grads.
    def bench(name, batch, grad_leaf=None):
        if grad_leaf is None:
            fn = jax.jit(lambda p, b: grpo_loss(p, cfg, hp, b)[0])

            def run():
                return sync(fn(params, batch))
        else:
            from time_r1_tpu.rl.lora import LoRAConfig, init_lora, lora_layers_tree

            lcfg = LoRAConfig(rank=16, alpha=32.0)
            lora = init_lora(params, lcfg, jax.random.PRNGKey(1), dtype=jnp.float32)
            lora = {k: v for k, v in lora.items() if not k.startswith("visual")}

            # in-scan per-layer merge (make_lora_train_step's path): no full
            # merged tree in the grad program — the merged 3B copy OOMs 16 GB
            def lora_loss(base, ad, b):
                tree, _rest = lora_layers_tree(ad)
                return grpo_loss(base, cfg, hp, b, lora=(tree, lcfg.scaling))[0]

            gfn = jax.jit(
                lambda base, ad, b: jax.value_and_grad(
                    lambda a: lora_loss(base, a, b)
                )(ad)
            )

            def run():
                loss, grads = gfn(params, lora, batch)
                sync(loss)
                return sync(jax.tree.leaves(grads)[0])

        t0 = time.perf_counter()
        run()
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        what = "loss fwd" if grad_leaf is None else "LoRA fwd+bwd"
        print(f"[{name}] {what} = {best*1e3:.0f} ms (compile {compile_s:.0f} s)")
        return best

    which = os.environ.get("TIMER1_PROFILE_WHICH", "both")  # split | full | both
    from time_r1_tpu.rl.grpo import precompute_frozen_vision

    def maybe_precompute(b):
        # mirrors GRPOTrainer.step_batch: fix_vit → frozen ViT blocks run as
        # their own program, the loss program gets pre-merger hidden states
        if hp.fix_vit and os.environ.get("TIMER1_PROFILE_NO_PRECOMPUTE", "0") != "1":
            b = precompute_frozen_vision(params, cfg, b)
            jax.block_until_ready(b.vision_hidden) if b.vision_hidden is not None else None
        return b

    split = maybe_precompute(build_grpo_split_batch(cfg, groups, dtype=jnp.bfloat16))
    sname = (
        f"split  P=1 Lp={split.prompt_ids.shape[1]} B={split.comp_ids.shape[0]} "
        f"Lc={split.comp_ids.shape[1]}"
    )
    full = maybe_precompute(build_grpo_batch_groups(cfg, groups, dtype=jnp.bfloat16))
    fname = f"full   B={full.input_ids.shape[0]} T={full.input_ids.shape[1]}"
    if os.environ.get("TIMER1_PROFILE_FWD", "1") == "1":
        t_split = bench(sname, split) if which in ("split", "both") else None
        t_full = bench(fname, full) if which in ("full", "both") else None
        if t_split and t_full:
            print(f"forward speedup: {t_full / t_split:.2f}x")
    if os.environ.get("TIMER1_PROFILE_LORA", "1") == "1":
        try:
            ts = bench(sname, split, grad_leaf=True) if which in ("split", "both") else None
            tf = bench(fname, full, grad_leaf=True) if which in ("full", "both") else None
            if ts and tf:
                print(f"LoRA fwd+bwd speedup: {tf / ts:.2f}x")
        except Exception as e:  # 16 GB chip: the full-row bwd may not fit
            print(f"LoRA fwd+bwd: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
