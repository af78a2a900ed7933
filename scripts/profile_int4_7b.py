"""7B int4 decode experiment: does the Pallas on-chip dequant-matmul
(ops/int4_matmul.py, M<=256 decode fast path) beat int8 at 7B?

At 3B, int4 via XLA's unpack was measured SLOWER (the unpacked tree
materializes in HBM); the Pallas kernel keeps nibbles on-chip and halves
the weight stream (7B text: ~6.9 GB bf16 → 3.5 int8 → 1.7 int4), so the
stream floor argument says ~6 ms/step against int8's 10.1 — IF the kernel's
dequant doesn't stall the MXU. Measures the same shared-prefix decode as
bench section_decode7b, int8 vs int4 weights, int8 KV both.

Run: python scripts/profile_int4_7b.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _decode_bench, _setup_jax, _zeros_like_shapes

    _setup_jax()
    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
    from time_r1_tpu.ops.quant import quantize_params

    cfg = Qwen25VLConfig.qwen25vl_7b()
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    for bits in (8, 4):
        qshapes = jax.eval_shape(lambda t: quantize_params(t, bits=bits), shapes)
        p = _zeros_like_shapes(qshapes)
        jax.block_until_ready(p)
        tps = _decode_bench(cfg, p, quant_kv=True, tag=f"7b-int{bits}")
        print(f"[int4exp] int{bits}: {tps:.1f} tok/s", flush=True)
        del p


if __name__ == "__main__":
    main()
    os._exit(0)  # tunnel plugin may abort in a background thread at exit
