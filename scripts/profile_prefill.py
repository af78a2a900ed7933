"""Per-phase ablation of the engine PREFILL at the bench headline shape
(3B int8 weights, B=1, S=1792 text tokens, bf16 cache of max_len 1920).

The engine e2e number (bench decode3b) spends ~150 ms in text prefill where
the analytic matmul floor is ~45 ms — this script attributes the gap:
  full      — prefill_chunk exactly as Engine._prefill runs it
  no_attn   — flash_attention stubbed to a broadcast of v (matmuls + rope +
              norms + cache writes only)
  no_head   — skip the last-position lm_logits
Run on one TPU chip: python scripts/profile_prefill.py
"""

import contextlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S = 1792
MAX_NEW = 128


def main():
    import functools

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, get_rope_index, init_params
    from time_r1_tpu.models.qwen25vl.language import KVCache, lm_logits
    from time_r1_tpu.sampler import Engine
    from time_r1_tpu.sampler.engine import prefill_chunk

    cfg = Qwen25VLConfig.qwen25vl_3b()
    tcfg = cfg.text
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    engine = Engine(params, cfg, quantization="int8", kv_cache_quant=True)
    p8 = engine.params
    del params
    jax.block_until_ready(p8)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 100000, (1, S))
    pos, _ = get_rope_index(cfg, ids, attention_mask=np.ones_like(ids))
    ids = jnp.asarray(ids)
    pos = jnp.asarray(pos)
    max_len = S + MAX_NEW
    mask = jnp.ones((1, max_len), jnp.int32).at[:, S:].set(0)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run(p8, ids, pos, mask, mode: str):
        cache = KVCache.zeros(tcfg, 1, max_len, dtype=jnp.bfloat16)
        logits, cache = prefill_chunk(
            p8, cfg, cache, ids, pos, mask, None, None, 0
        )
        if mode == "no_head":
            return cache.k.sum(dtype=jnp.float32) + cache.v.sum(dtype=jnp.float32)
        return logits.sum(dtype=jnp.float32) + cache.k.sum(dtype=jnp.float32)

    @contextlib.contextmanager
    def maybe_stub_attention(mode):
        if mode != "no_attn":
            yield
            return
        import importlib

        # ops/__init__ re-exports the custom_vjp FUNCTION under the same
        # name — import the submodule explicitly to patch its attribute
        F = importlib.import_module("time_r1_tpu.ops.flash_attention")

        real = F.flash_attention

        def stub(q, k, v, bias, causal, scale, q_offset, *a, **kw):
            B, Sk, Hkv, D = v.shape
            H = q.shape[2]
            Sq = q.shape[1]
            out = jnp.broadcast_to(
                v[:, :Sq, :, None, :], (B, Sq, Hkv, H // Hkv, D)
            ).reshape(B, Sq, H, D)
            return out.astype(q.dtype)

        F.flash_attention = stub
        try:
            yield
        finally:
            F.flash_attention = real

    for mode in ("full", "no_attn", "no_head"):
        with maybe_stub_attention(mode):
            out = run(p8, ids, pos, mask, mode)
            float(out)
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                out = run(p8, ids, pos, mask, mode)
                float(out)
                best = min(best, time.perf_counter() - t0)
        print(f"[prefill:{mode}] {best*1e3:.1f} ms for {S} tokens", flush=True)

    # analytic floors for the attribution (same accounting as bench's MFU lines)
    from bench import _decoder_matmul_params

    n_dec = _decoder_matmul_params(p8)
    flops = 2 * n_dec * S
    peak = 197e12
    print(
        f"[prefill:analytic] decoder matmul FLOPs {flops/1e12:.2f} TF → "
        f"{flops/peak*1e3:.1f} ms at bf16 peak; weight stream "
        f"{n_dec/1e9:.2f} GB int8 → {n_dec/819e9*1e3:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
    os._exit(0)  # tunnel plugin may abort in a background thread at exit
