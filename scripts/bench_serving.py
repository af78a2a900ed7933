"""Serving-throughput benchmark: continuous batching over a mixed-length
request stream (the vLLM capability class, vllm_infer.py:40-58).

The headline bench (bench.py) measures the GRPO rollout hot loop; this one
measures the EVAL/SERVING regime: many independent requests of heterogeneous
prompt lengths arriving together, scheduled iteration-level onto a bounded
slot/page pool — what `evaluate.py --use_continuous_batching` runs per shard.

Engines compared on the SAME stream:
- paged: PagedEngine (paged-KV pool, chunked-prefill/decode interleave,
  optional int8 weights + int8 KV pages) — the production default.
- slot:  ContinuousEngine (contiguous per-slot caches) — the r2 scheduler,
  kept behind `--kv_block_size 0`.

Text-only on purpose: prompt-length heterogeneity is what differentiates the
schedulers, and skipping the vision tower keeps first-run compiles bounded
(prompt lengths are power-of-two bucketed by Engine._pack, so the stream
below compiles 4 prefill shapes per engine).

Usage (one TPU chip, ~minutes; tiny CPU mode is CI-tested):
    python scripts/bench_serving.py                 # 3B, int8 w + int8 KV
    python scripts/bench_serving.py --engines slot  # slot scheduler only

Prints one JSON line per engine to stdout; human summary to stderr.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# prompt-length mix: pads to 256/512/1024/2048 buckets (4 prefill compiles)
LENGTH_MIX = (200, 450, 900, 1800)


def build_requests(n_requests: int, vocab: int, seed: int = 0):
    from time_r1_tpu.sampler import Request

    rng = np.random.default_rng(seed)
    lens = [LENGTH_MIX[i % len(LENGTH_MIX)] for i in range(n_requests)]
    rng.shuffle(lens)
    return [Request(input_ids=list(rng.integers(2, vocab, int(n)))) for n in lens]


def run(cfg, params, requests, sp, engine_kind: str, *, max_slots: int,
        max_len: int, page_size: int, quantization, kv_cache_quant: bool,
        dtype, warmup: bool = True):
    """Time one engine over the request stream. Returns (tok/s, gen_tokens,
    wall_s). Warmup runs the identical stream once so every prompt-bucket
    prefill and the decode program are compiled outside the timed window."""
    if engine_kind == "paged":
        from time_r1_tpu.sampler.paged import PagedEngine

        eng = PagedEngine(
            params, cfg, max_slots=max_slots, max_len=max_len,
            page_size=page_size, dtype=dtype, quantization=quantization,
            kv_cache_quant=kv_cache_quant,
        )
    elif engine_kind == "slot":
        from time_r1_tpu.sampler.continuous import ContinuousEngine

        eng = ContinuousEngine(
            params, cfg, max_slots=max_slots, max_len=max_len, dtype=dtype,
            quantization=quantization,
        )
    else:
        raise ValueError(engine_kind)

    if warmup:
        eng.generate(requests, sp)
    t0 = time.perf_counter()
    outs = eng.generate(requests, sp)
    wall = time.perf_counter() - t0
    gen = sum(len(o) for o in outs)
    return gen / wall, gen, wall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--engines", default="paged,slot")
    p.add_argument("--n_requests", type=int, default=32)
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--max_slots", type=int, default=8)
    p.add_argument("--max_len", type=int, default=4096)
    p.add_argument("--kv_block_size", type=int, default=128)
    p.add_argument("--quantization", default="int8", choices=["none", "int8", "int4"])
    p.add_argument("--kv_cache_dtype", default="int8", choices=["auto", "int8"])
    args = p.parse_args(argv)

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
    from time_r1_tpu.sampler.params import SamplingParams

    cfg = Qwen25VLConfig.qwen25vl_3b()
    # throughput is weight-value-independent; zeros-init skips on-device RNG
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    requests = build_requests(args.n_requests, vocab=100000)
    # fixed-length generation (no stops): the standard serving-bench protocol
    sp = SamplingParams(
        temperature=1.0, max_new_tokens=args.max_new_tokens, stop_token_ids=(), seed=0
    )
    quant = None if args.quantization == "none" else args.quantization
    kvq = args.kv_cache_dtype == "int8"

    for kind in args.engines.split(","):
        tps, gen, wall = run(
            cfg, params, requests, sp, kind, max_slots=args.max_slots,
            max_len=args.max_len, page_size=args.kv_block_size,
            quantization=quant, kv_cache_quant=kvq and kind == "paged",
            dtype=jnp.bfloat16,
        )
        print(
            f"[serving:{kind}] {args.n_requests} reqs (len mix {LENGTH_MIX}), "
            f"{gen} tokens in {wall:.2f}s — {tps:.0f} tok/s",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": f"serving_throughput_3b_{kind}_mixedlen",
                    "value": round(tps, 1),
                    "unit": "tokens/s/chip",
                    "engine": kind,
                    "quantization": args.quantization,
                    "kv_cache_dtype": args.kv_cache_dtype if kind == "paged" else "auto",
                }
            )
        )


if __name__ == "__main__":
    main()
