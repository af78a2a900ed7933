"""Isolate + time the shared-prefix flash kernels (fwd / bwd) at the GRPO
split-loss shape, sweeping kv-panel block sizes and grouped-vs-ungrouped dkv
layouts. Mosaic compile time is part of the verdict: >100 s kernels crash the
remote compile helper when several appear in one program.

    python scripts/profile_sp_kernel.py
"""

import functools
import importlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    # ops/__init__ re-exports the flash_attention FUNCTION, shadowing the
    # submodule on attribute access — resolve the module explicitly
    fa = importlib.import_module("time_r1_tpu.ops.flash_attention")
    orig_pick = fa._pick_block

    def cap_blocks(cap):
        if cap:
            fa._pick_block = lambda size, cands: orig_pick(
                size, tuple(c for c in cands if c <= cap)
            )
        else:
            fa._pick_block = orig_pick

    P, R, Lp, Sc, H, Hkv, D = 1, 8, 1792, 256, 16, 2, 128
    B = P * R
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Sc, H, D)), jnp.bfloat16)
    kp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.normal(size=(P, Lp, Hkv, D)), jnp.bfloat16)
    ko = jnp.asarray(rng.normal(size=(B, Sc, Hkv, D)), jnp.bfloat16)
    vo = jnp.asarray(rng.normal(size=(B, Sc, Hkv, D)), jnp.bfloat16)
    pbias = jnp.zeros((P, Lp), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, Sc, H, D)), jnp.bfloat16)

    def timeit(name, fn, *args):
        # force a scalar device->host transfer per call: through the axon
        # tunnel block_until_ready alone does not reflect compute completion
        synced = jax.jit(
            lambda *a: sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a)))
        )
        try:
            t0 = time.perf_counter()
            float(synced(*args))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(synced(*args))
                best = min(best, time.perf_counter() - t0)
            print(f"[{name}] {best*1e3:.2f} ms (compile {compile_s:.1f} s)", flush=True)
            return best
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
            return None

    def sp_loss(q, kp, vp, ko, vo):
        return jnp.sum(fa.flash_attention_shared_prefix(q, kp, vp, ko, vo, pbias) * g)

    # old path: repeat/concat the prefix, one plain flash call (XLA sums the
    # prefix grad over rows in the repeat VJP)
    def old_loss(q, kp, vp, ko, vo):
        k_all = jnp.concatenate([jnp.repeat(kp, R, axis=0), ko], axis=1)
        v_all = jnp.concatenate([jnp.repeat(vp, R, axis=0), vo], axis=1)
        bias = jnp.concatenate(
            [jnp.repeat(pbias, R, axis=0), jnp.zeros((B, Sc), jnp.float32)], axis=1
        )
        return jnp.sum(fa.flash_attention(q, k_all, v_all, bias, True, None, Lp) * g)

    grad_sp = jax.jit(jax.grad(sp_loss, argnums=(0, 1, 2, 3, 4)))
    grad_old = jax.jit(jax.grad(old_loss, argnums=(0, 1, 2, 3, 4)))

    for cap in (896, 512, 1792, 0):
        cap_blocks(cap)
        label = cap or "none"
        timeit(f"sp fwd        cap={label}", jax.jit(functools.partial(
            fa.flash_attention_shared_prefix)), q, kp, vp, ko, vo, pbias)
        timeit(f"sp fwd+bwd    cap={label}", grad_sp, q, kp, vp, ko, vo)
        jax.clear_caches()

    cap_blocks(896)
    timeit("old fwd+bwd (repeat/concat, grouped dkv) cap=896", grad_old, q, kp, vp, ko, vo)
    jax.clear_caches()

    # committed round-3 baseline: repeat/concat + UNGROUPED dkv kernel
    os.environ["TIMER1_UNGROUPED_DKV"] = "1"
    timeit("old fwd+bwd (repeat/concat, ungrouped dkv)", grad_old, q, kp, vp, ko, vo)
    os.environ["TIMER1_UNGROUPED_DKV"] = "0"


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
