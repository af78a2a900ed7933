"""Static cost analysis of ONE shared-prefix decode step (bench shape).

Compiles the single-step program (decoder + head + sample) on the TPU and
prints XLA's bytes-accessed / flop estimates next to the int8 weight-stream
floor — quantifies how much non-weight HBM traffic (softmax materialization,
rope casts, cache copies) the step pays. No timing; one compile.

    python scripts/profile_decode_bytes.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
LP = 1792
MAX_NEW = 128


def main():
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
    from time_r1_tpu.ops.quant import embed_lookup, quantize_kv_cache
    from time_r1_tpu.sampler import Engine
    from time_r1_tpu.sampler.engine import sample_tokens
    from time_r1_tpu.sampler.params import SamplingParams

    cfg = Qwen25VLConfig.qwen25vl_3b()
    tcfg = cfg.text
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    engine = Engine(params, cfg, quantization="int8", kv_cache_quant=True)
    p8 = engine.params
    del params

    prefix = quantize_kv_cache(KVCache.zeros(tcfg, 1, LP, dtype=jnp.bfloat16))
    suffix0 = suffix_cache_zeros(tcfg, BATCH, MAX_NEW, quant=True)
    prefix_bias = jnp.zeros((1, LP), jnp.float32)
    sp = SamplingParams(temperature=1.0, max_new_tokens=MAX_NEW)
    start = np.full((BATCH,), LP, np.int32)

    def step(p8, prefix, prefix_bias, suffix, last, rng):
        x = embed_lookup(p8["text"]["embed_tokens"]["embedding"], last[:, None],
                         dtype=jnp.bfloat16)
        pos = jnp.broadcast_to((start + suffix.length)[None, :, None], (3, BATCH, 1))
        h, suffix = shared_decode_forward(
            p8["text"], tcfg, x, pos, prefix, suffix, prefix_bias
        )
        logits = lm_logits(p8["text"], tcfg, h)[:, -1]
        rng, sub = jax.random.split(rng)
        nxt = sample_tokens(logits, sub, sp)
        return suffix, nxt, rng

    lowered = jax.jit(step, donate_argnums=(3,)).lower(
        p8, prefix, prefix_bias, suffix0, jnp.zeros((BATCH,), jnp.int32),
        jax.random.PRNGKey(0),
    )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ba = ca.get("bytes accessed", float("nan"))
    flops = ca.get("flops", float("nan"))
    # int8 stream floor: decoder weights + head (tied embed) + prefix KV
    dec_w = 36 * (2048 * 2560 + 2048 * 2048 + 2 * 2048 * 11008 + 11008 * 2048)
    head = 151936 * 2048
    kv = (
        prefix.k.size + prefix.v.size
        + prefix.k_scale.size * 4 + prefix.v_scale.size * 4
        + suffix0.k.size + suffix0.v.size
        + suffix0.k_scale.size * 4 + suffix0.v_scale.size * 4
    )
    floor = dec_w + head + kv
    print(f"bytes accessed (XLA estimate): {ba/1e9:.3f} GB")
    print(f"flops: {flops/1e9:.2f} G")
    print(f"int8 stream floor (weights+head+KV): {floor/1e9:.3f} GB")
    print(f"overhead traffic: {(ba-floor)/1e6:.0f} MB ({(ba/floor-1)*100:.1f}%)")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"peak memory: argument {mem.argument_size_in_bytes/1e9:.2f} GB, "
              f"output {mem.output_size_in_bytes/1e9:.2f} GB, "
              f"temp {mem.temp_size_in_bytes/1e6:.0f} MB")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
