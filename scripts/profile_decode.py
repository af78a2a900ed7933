"""Per-phase ablation of the shared-prefix decode step (bench headline shape:
3B int8 weights, int8 KV, G=8 rows, 1792-token shared prompt prefix).

Times N steps of: (a) the full step, (b) no-attention (matmuls+norms only),
(c) no-lm-head (decoder only), (d) lm-head+sampling only. The deltas locate
the remaining distance to the int8 weight-stream floor. Run on one TPU chip:

    python scripts/profile_decode.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 128
BATCH = 8
LP = 1792


def main():
    import functools

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
    from time_r1_tpu.models.qwen25vl.language import (
        KVCache,
        lm_logits,
        shared_decode_forward,
        suffix_cache_zeros,
    )
    from time_r1_tpu.ops.quant import quantize_kv_cache, quantize_params
    from time_r1_tpu.sampler.engine import sample_tokens
    from time_r1_tpu.sampler.params import SamplingParams

    cfg = Qwen25VLConfig.qwen25vl_3b()
    tcfg = cfg.text
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    p8 = quantize_params(params, bits=8)
    del params
    jax.block_until_ready(p8)

    prefix = quantize_kv_cache(
        KVCache.zeros(tcfg, 1, LP, dtype=jnp.bfloat16)
    )
    suffix0 = suffix_cache_zeros(tcfg, BATCH, STEPS, quant=True)
    prefix_bias = jnp.zeros((1, LP), jnp.float32)
    sp = SamplingParams(temperature=1.0, max_new_tokens=STEPS)
    start = jnp.full((BATCH,), LP, jnp.int32)
    embeds0 = jnp.zeros((BATCH, 1, tcfg.hidden_size), jnp.bfloat16)

    def dec(x, suffix):
        return shared_decode_forward(
            p8["text"], tcfg, x, jnp.broadcast_to(
                (start + suffix.length)[None, :, None], (3, BATCH, 1)
            ), prefix, suffix, prefix_bias,
        )

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run(last, suffix, mode: str):
        def body(i, carry):
            suffix, last, rng = carry
            from time_r1_tpu.ops.quant import embed_lookup

            x = embed_lookup(p8["text"]["embed_tokens"]["embedding"], last[:, None],
                             dtype=jnp.bfloat16)
            if mode in ("full", "no_head"):
                h, suffix = dec(x, suffix)
            else:  # head_only: skip the decoder entirely
                h = x + 0.0 * last[:, None, None].astype(jnp.bfloat16)
                h = jnp.broadcast_to(h, (BATCH, 1, tcfg.hidden_size))
                suffix = suffix._replace(length=suffix.length + 1)
            if mode in ("full", "head_only"):
                logits = lm_logits(p8["text"], tcfg, h)[:, -1]
            else:
                logits = jnp.zeros((BATCH, 8), jnp.float32) + jnp.sum(h, axis=(1, 2))[:, None]
            rng, sub = jax.random.split(rng)
            nxt = sample_tokens(logits, sub, sp)
            return suffix, nxt, rng

        suffix, last, _ = jax.lax.fori_loop(
            0, STEPS, body, (suffix, last, jax.random.PRNGKey(0))
        )
        return last

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    last0 = jnp.zeros((BATCH,), jnp.int32)
    for mode in ("full", "no_head", "head_only"):
        out = run(last0, suffix0, mode)
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(last0, suffix0, mode)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"[{mode}] {STEPS} steps = {best*1e3:.0f} ms ({best/STEPS*1e3:.3f} ms/step)")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
