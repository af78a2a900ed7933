"""Tracing / profiling (§5.1 TPU equivalent).

The reference only wall-clocks whole runs (evaluate.py:287-299). Here,
per-phase timers (decode / prefill / rollout / train-step) are first-class
and a `jax.profiler` trace can wrap any region for XLA-level analysis.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimers:
    """Accumulating wall-clock timers keyed by phase name.

    By default a phase measures DISPATCH time only — jax calls return as soon
    as the work is enqueued, so an async train step reads as ~1 ms while its
    real cost lands wherever the host next blocks. Set `sync=True` (or env
    TIMER1_SYNC_TIMERS=1) to drain the device queue at each phase boundary:
    per-phase numbers become true device costs, at the price of breaking
    host/device overlap — profiling mode, not production mode."""

    def __init__(self, sync: Optional[bool] = None):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        if sync is None:
            sync = os.environ.get("TIMER1_SYNC_TIMERS", "") == "1"
        self.sync = sync

    @staticmethod
    def _drain():
        import jax

        # block until every enqueued PROGRAM on the default device retires.
        # Must be a computation, not a transfer: TPU host→device copies ride
        # their own stream and complete out of order w.r.t. enqueued programs
        # (measured: a device_put marker read a 1.5 s train step as 29 ms),
        # while executions retire in enqueue order — so a jitted no-op output
        # becoming ready proves everything enqueued before it has finished.
        if not hasattr(PhaseTimers, "_noop"):
            import jax.numpy as jnp

            PhaseTimers._noop = jax.jit(lambda: jnp.zeros(()))
        jax.block_until_ready(PhaseTimers._noop())

    @contextlib.contextmanager
    def phase(self, name: str):
        if self.sync:
            self._drain()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                self._drain()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(self.totals[k] / max(self.counts[k], 1) * 1e3, 3),
            }
            for k in self.totals
        }

    def write(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto) for
    the wrapped region; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


GLOBAL_TIMERS = PhaseTimers()
