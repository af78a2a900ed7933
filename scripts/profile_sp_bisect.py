"""Bisect the split-loss LoRA backward's Mosaic/XLA compile time: compile the
grad of each program piece separately (prefill, shared-prefix chunk, logp
head) at TIMER1_PROFILE_LAYERS layers. Identifies which kernel's VJP blows the
remote compile helper at 36 layers.

    TIMER1_PROFILE_LAYERS=8 python scripts/profile_sp_bisect.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
    from time_r1_tpu.models.qwen25vl.language import (
        NEG_INF, KVCache, decoder_forward, shared_decode_forward,
    )
    from time_r1_tpu.rl import build_grpo_split_batch
    from time_r1_tpu.rl.grpo import per_token_logps_entropy

    cfg = Qwen25VLConfig.qwen25vl_3b()
    n_layers = int(os.environ.get("TIMER1_PROFILE_LAYERS", "8"))
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, num_hidden_layers=n_layers)
    )
    remat = os.environ.get("TIMER1_BISECT_REMAT", "1") == "1"

    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    text = params["text"]

    G = 8
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(2, 100000, 1792))
    comps = [list(rng.integers(2, 100000, 199)) + [cfg.eos_token_id] for _ in range(G)]
    groups = [
        {"prompt_ids": prompt, "completions": comps,
         "advantages": rng.normal(size=G).astype(np.float32)}
    ]
    batch = build_grpo_split_batch(cfg, groups, dtype=jnp.bfloat16)
    P, Lp = batch.prompt_ids.shape
    B, Lc = batch.comp_ids.shape
    H = cfg.text.hidden_size

    embeds = jnp.zeros((P, Lp, H), jnp.bfloat16)
    embeds_c = jnp.zeros((B, Lc, H), jnp.bfloat16)
    prefix_bias = jnp.where(batch.prompt_mask > 0, 0.0, NEG_INF).astype(jnp.float32)

    def compile_grad(name, fn, *args):
        try:
            t0 = time.perf_counter()
            g = jax.jit(jax.grad(fn)).lower(*args).compile()
            dt = time.perf_counter() - t0
            print(f"[{name}] compile {dt:.1f} s", flush=True)
            return g
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
            return None

    def prefill_loss(text_p):
        cache = KVCache.zeros(cfg.text, P, Lp, dtype=jnp.bfloat16)
        hidden_p, _ = decoder_forward(
            text_p, cfg.text, embeds, batch.prompt_pos,
            attention_mask=batch.prompt_mask, cache=cache, flash_q_offset=0,
            remat=remat,
        )
        return jnp.sum(hidden_p.astype(jnp.float32))

    compile_grad("prefill fwd+bwd", prefill_loss, text)

    # chunk over a fixed prefix (prefix from a non-diff forward)
    cache0 = KVCache.zeros(cfg.text, P, Lp, dtype=jnp.bfloat16)
    _, prefix = decoder_forward(
        text, cfg.text, embeds, batch.prompt_pos,
        attention_mask=batch.prompt_mask, cache=cache0, flash_q_offset=0,
    )
    prefix = jax.tree.map(jax.lax.stop_gradient, prefix)

    def chunk_loss(text_p):
        hidden_c, _ = shared_decode_forward(
            text_p, cfg.text, embeds_c, batch.comp_pos, prefix, None, prefix_bias,
            remat=remat,
        )
        return jnp.sum(hidden_c.astype(jnp.float32))

    compile_grad("sp chunk fwd+bwd", chunk_loss, text)

    def head_loss(params_p):
        hidden = jnp.zeros((B, Lc, H), jnp.bfloat16)
        logps, ent = per_token_logps_entropy(params_p, cfg, hidden, batch.comp_ids, 64)
        return jnp.sum(logps)

    compile_grad("logp head fwd+bwd", head_loss, params)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
