"""Device mesh bootstrap for the TPU build.

Replaces the reference's torchrun+NCCL+DeepSpeed process topology (SURVEY §5.8)
with a single jax mesh of axes ("data", "model"):

- "data":  data parallelism + FSDP-style parameter/optimizer sharding
           (ZeRO-3 capability parity, scripts/zero3*.json)
- "model": tensor parallelism for attention heads / MLP
           (vLLM TP capability parity, vllm_infer.py:50)

Within a pod slice the collectives ride ICI; across slices DCN — XLA picks
per the device assignment from `jax.distributed.initialize`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """Initialize multi-host jax.distributed from env when configured
    (no-op on single host / single process)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )


def make_mesh(
    model_parallel: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Mesh over all devices: (data = n/model_parallel, model = model_parallel)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
