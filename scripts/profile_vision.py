"""Profile the vision tower variants on real TPU at the bench shape.

Usage: python scripts/profile_vision.py [n_videos]

Measures vision_forward (3B ViT, random bf16 weights, 6272-patch video like
bench.py) across the serving-path variants so kernel/scan changes can be
attributed:
  A  window kernel only, per-layer cond   (round-3 shipped state)
  B  + fused full-attention kernel, cond
  C  + segment scan (current default)
Each variant is jit-compiled once (cached in .jax_cache) and timed warm.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from time_r1_tpu.models.qwen25vl.config import Qwen25VLConfig
from time_r1_tpu.models.qwen25vl.vision import (
    init_vision_params,
    prepare_vision_inputs,
    vision_forward,
)

GRID = (8, 28, 28)  # 6272 patches → 1568 video tokens (bench.py shape)


def main() -> None:
    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = Qwen25VLConfig().vision
    rng = np.random.default_rng(0)
    grids = [GRID] * n_videos
    n_patches = sum(t * h * w for t, h, w in grids)
    patches = jnp.asarray(
        rng.normal(size=(n_patches, cfg.patch_input_dim)), jnp.bfloat16
    )
    prep = prepare_vision_inputs(grids, cfg)
    params = init_vision_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prep_args = tuple(
        jnp.asarray(a)
        for a in (
            prep.perm,
            prep.pos_hw,
            prep.key_valid,
            prep.full_gather,
            prep.full_inverse,
            prep.reverse,
        )
    )
    print(
        f"videos={n_videos} patches={n_patches} slices={prep.full_gather.shape}",
        file=sys.stderr,
    )

    import time_r1_tpu.ops.vision_attention as va

    real_cap = va.FULL_KERNEL_MAX_SLICE

    def run(tag, full_cap, segment, ablate=""):
        va.FULL_KERNEL_MAX_SLICE = full_cap
        os.environ["TIMER1_VISION_ABLATE"] = ablate

        fn = jax.jit(
            lambda p, pa: vision_forward(
                p, cfg, pa, *prep_args, use_window_kernel=True, segment_scan=segment
            )
        )
        out = fn(params, patches)
        out.block_until_ready()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(params, patches)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{tag}: {dt:.1f} ms ({dt / n_videos:.1f} ms/video)", file=sys.stderr)
        va.FULL_KERNEL_MAX_SLICE = real_cap
        os.environ["TIMER1_VISION_ABLATE"] = ""
        return dt

    a = run("A window-kernel + cond      ", 0, False)
    b = run("B + full-attention kernel   ", real_cap, False)
    run("C + segment scan            ", real_cap, True)
    d = run("D ablate: attention = v     ", real_cap, False, "no_attn")
    e = run("E ablate: no MLP            ", real_cap, False, "no_mlp")
    print(
        f"decomposition: attention≈{(b - d) / n_videos:.1f} ms/video, "
        f"mlp≈{(b - e) / n_videos:.1f} ms/video, "
        f"rest≈{(d + e - b) / n_videos:.1f} ms/video",
        file=sys.stderr,
    )

    os._exit(0)  # tunnel plugin can abort in a background thread at shutdown


if __name__ == "__main__":
    main()
