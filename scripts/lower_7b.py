"""Lower — and optionally COMPILE — the full 7B GRPO train step over a
16-device virtual mesh, print the per-device HBM budget (the v5p-16
north-star deployment, BASELINE.json), and record the result as a committed
artifact (docs/artifacts/plan_7b_<n>dev.json).

Lowering alone is not a go/no-go signal (round 4's no-remat 3B grad program
lowered fine and failed remote compile on allocation); `--compile` runs the
XLA pipeline to an executable and records memory_analysis() args/temps.

Self-bootstrapping like __graft_entry__.dryrun_multichip: re-execs itself in a
subprocess with a forced 16-virtual-CPU-device backend so it works even when
jax already initialized against the one real TPU chip.

    python scripts/lower_7b.py [n_devices] [--compile]
"""

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_devices: int, do_compile: bool) -> None:
    if os.environ.get("TIMER1_LOWER7B_INNER") != "1":
        env = dict(os.environ)
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\S+", "", env.get("XLA_FLAGS", "")
        )
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env["TIMER1_LOWER7B_INNER"] = "1"
        argv = [sys.executable, os.path.abspath(__file__), str(n_devices)]
        if do_compile:
            argv.append("--compile")
        proc = subprocess.run(argv, env=env, timeout=7200)
        sys.exit(proc.returncode)

    import json
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")

    from time_r1_tpu.parallel.plan import format_budget, plan_7b_train_step

    t0 = time.time()
    b = plan_7b_train_step(n_devices=n_devices, offload_optimizer=True, do_compile=do_compile)
    b["wall_seconds"] = round(time.time() - t0, 1)
    print(format_budget(b))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art_dir = os.path.join(repo, "docs", "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    path = os.path.join(art_dir, f"plan_7b_{n_devices}dev.json")
    with open(path, "w") as f:
        json.dump(b, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"[lower_7b] wrote {path}")
    sys.stdout.flush()
    os._exit(0)  # TPU-tunnel plugin may abort in a background thread at exit


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]) if args else 16, do_compile="--compile" in sys.argv)
