"""A/B the side-path LoRA layouts on the 7B fused int8 decode path.

Measures 128-step G=8 decode (the GRPO rollout shape) with:
  none    — no side adapters (the pure serving floor)
  raw     — per-projection deltas (14 side ops/layer)
  grouped — A_cat/B_blockdiag groups (8 side ops/layer, group_side_adapters)

Each mode compiles its own decode program (the side tree structure is part
of the jit signature). Usage: python scripts/profile_side_delta.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench import DECODE_STEPS, _zeros_like_shapes
from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
from time_r1_tpu.ops.quant import group_side_adapters, quantize_params
from time_r1_tpu.rl.lora import LoRAConfig, init_lora, lora_layers_tree
from time_r1_tpu.sampler import Engine, Request
from time_r1_tpu.sampler.params import SamplingParams


def main():
    cfg = Qwen25VLConfig.qwen25vl_7b()
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    qshapes = jax.eval_shape(lambda t: quantize_params(t, bits=8, fuse=True), shapes)
    base = _zeros_like_shapes(qshapes)
    jax.block_until_ready(base)

    lcfg = LoRAConfig(rank=16, alpha=32.0)
    lora = init_lora(shapes, lcfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    lora = {k: v for k, v in lora.items() if not k.startswith("visual")}
    tree, _ = lora_layers_tree(lora)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    grouped = jax.jit(lambda t: group_side_adapters(t, dtype=jnp.bfloat16))(tree)

    engine = Engine(base, cfg, kv_cache_quant=True)
    rng = np.random.default_rng(0)
    req = Request(input_ids=rng.integers(2, 100000, 1792).tolist())
    sp = SamplingParams(
        temperature=1.0, max_new_tokens=DECODE_STEPS, num_return_sequences=8, seed=0
    )

    for name, side in [
        ("none", None),
        ("raw", (cast(tree), lcfg.scaling)),
        ("grouped", (grouped, lcfg.scaling)),
    ]:
        engine.lora_side = side  # bypass set_lora_side's auto-grouping
        engine.generate([req], sp)  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = engine.generate([req], sp)
            dt = time.perf_counter() - t0
            best = min(best, dt)
        toks = sum(len(o) for o in outs)
        print(
            f"[side:{name}] {best*1e3:.0f} ms for {toks} tokens "
            f"({toks/best:.0f} tok/s, {best*1e3/DECODE_STEPS:.2f} ms/step incl. prefill share)",
            flush=True,
        )


if __name__ == "__main__":
    main()
    os._exit(0)  # tunnel plugin may abort in a background thread at exit
