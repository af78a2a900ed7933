"""Lower the full 7B GRPO train step over a 16-device virtual mesh and print
the per-device HBM budget (the v5p-16 north-star deployment, BASELINE.json).

Self-bootstrapping like __graft_entry__.dryrun_multichip: re-execs itself in a
subprocess with a forced 16-virtual-CPU-device backend so it works even when
jax already initialized against the one real TPU chip.

    python scripts/lower_7b.py [n_devices]
"""

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_devices: int) -> None:
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
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n_devices)],
            env=env,
            timeout=3600,
        )
        sys.exit(proc.returncode)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from time_r1_tpu.parallel.plan import format_budget, plan_7b_train_step

    b = plan_7b_train_step(n_devices=n_devices, offload_optimizer=True)
    print(format_budget(b))
    sys.stdout.flush()
    os._exit(0)  # TPU-tunnel plugin may abort in a background thread at exit


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
