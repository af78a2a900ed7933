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
    from time_r1_tpu.ops.quant import quantize_kv_cache
    from time_r1_tpu.sampler.engine import sample_tokens
    from time_r1_tpu.sampler.params import SamplingParams

    cfg = Qwen25VLConfig.qwen25vl_3b()
    tcfg = cfg.text
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    from time_r1_tpu.sampler import Engine

    # Engine quantizes and drops the bf16 tree immediately (same init as
    # bench.py — quantize_params on the full tree peaks too high on 16 GB)
    engine = Engine(params, cfg, quantization="int8", kv_cache_quant=True)
    p8 = engine.params
    del params
    jax.block_until_ready(p8)

    prefix = quantize_kv_cache(
        KVCache.zeros(tcfg, 1, LP, dtype=jnp.bfloat16)
    )
    suffix0 = suffix_cache_zeros(tcfg, BATCH, STEPS, quant=True)
    prefix_bias = jnp.zeros((1, LP), jnp.float32)
    sp = SamplingParams(temperature=1.0, max_new_tokens=STEPS)
    start = np.full((BATCH,), LP, np.int32)  # host constant — no device read at trace

    def _hm(cache):
        return cache._replace(
            k=cache.k.transpose(0, 1, 3, 2, 4),
            v=cache.v.transpose(0, 1, 3, 2, 4),
            k_scale=None if cache.k_scale is None else cache.k_scale.transpose(0, 1, 3, 2),
            v_scale=None if cache.v_scale is None else cache.v_scale.transpose(0, 1, 3, 2),
        )

    HEAD_MAJOR = os.environ.get("TIMER1_DECODE_ATTN_KERNEL", "0") == "1"

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run(p8, prefix, prefix_bias, last, suffix, mode: str):
        hm = HEAD_MAJOR and mode != "no_attn"  # the stub replaces the jnp path
        if hm:
            prefix, suffix = _hm(prefix), _hm(suffix)

        def dec(p8, x, suffix):
            return shared_decode_forward(
                p8["text"], tcfg, x, jnp.broadcast_to(
                    (start + suffix.length)[None, :, None], (3, BATCH, 1)
                ), prefix, suffix, prefix_bias, prefix_head_major=hm,
            )

        def body(i, carry):
            suffix, last, rng = carry
            from time_r1_tpu.ops.quant import embed_lookup

            x = embed_lookup(p8["text"]["embed_tokens"]["embedding"], last[:, None],
                             dtype=jnp.bfloat16)
            if mode in ("full", "no_head", "no_attn"):
                h, suffix = dec(p8, x, suffix)
            else:  # head_only: skip the decoder entirely
                h = x + 0.0 * last[:, None, None].astype(jnp.bfloat16)
                h = jnp.broadcast_to(h, (BATCH, 1, tcfg.hidden_size))
                suffix = suffix._replace(length=suffix.length + 1)
            if mode in ("full", "head_only"):
                logits = lm_logits(p8["text"], tcfg, h)[:, -1]  # noqa: B023 — p8 is a run() arg
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
    modes = ("full", "no_head", "head_only", "no_attn")

    import contextlib

    @contextlib.contextmanager
    def maybe_stub_attention(mode):
        """no_attn: replace mha_shared_prefix with a broadcast of v_new —
        isolates the attention phase (dots+softmax+scale folds) from the
        weight-stream matmuls, keeping every other op in place."""
        if mode != "no_attn":
            yield
            return
        from time_r1_tpu.ops import attention as A

        real = A.mha_shared_prefix

        def stub(q, kp, vp, kps, vps, ko, vo, kos, vos, kn, vn, *b, **kw):
            B, S, Hkv, D = vn.shape
            H = q.shape[2]
            out = jnp.broadcast_to(
                vn[:, :, :, None, :], (B, S, Hkv, H // Hkv, D)
            ).reshape(B, S, H, D)
            return out.astype(q.dtype)

        A.mha_shared_prefix = stub
        try:
            yield
        finally:
            A.mha_shared_prefix = real

    for mode in modes:
        with maybe_stub_attention(mode):
            out = run(p8, prefix, prefix_bias, last0, suffix0, mode)
            sync(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(p8, prefix, prefix_bias, last0, suffix0, mode)
                sync(out)
                best = min(best, time.perf_counter() - t0)
        print(f"[{mode}] {STEPS} steps = {best*1e3:.0f} ms ({best/STEPS*1e3:.3f} ms/step)")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
