"""GSPMD parameter sharding rules (FSDP over "data", TP over "model").

Capability parity with the reference's DeepSpeed ZeRO-2/3 (N3, SURVEY §2.2):
parameters, gradients and optimizer state are sharded over the "data" axis;
attention heads and MLP hidden dims are additionally sharded over "model"
(the TP the reference only had at inference time via vLLM — GSPMD makes it
uniform across train and inference, SURVEY §2.3).

Rules are path-keyed PartitionSpecs over the stacked-layer param pytree
(leading L/D axis is never sharded — it is scanned).
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS as D, MODEL_AXIS as M

# (regex over 'a/b/c' param path) → PartitionSpec. First match wins.
PARAM_RULES: list[tuple[str, P]] = [
    # --- text decoder (stacked (L, in, out)) ---
    (r"text/layers/self_attn/(q_w|k_w|v_w)$", P(None, D, M)),
    (r"text/layers/self_attn/(q_b|k_b|v_b)$", P(None, M)),
    (r"text/layers/self_attn/o_w$", P(None, M, D)),
    (r"text/layers/mlp/(gate_w|up_w)$", P(None, D, M)),
    (r"text/layers/mlp/down_w$", P(None, M, D)),
    (r"text/layers/.*layernorm/scale$", P()),
    (r"text/embed_tokens/embedding$", P(D, M)),
    (r"text/lm_head/kernel$", P(D, M)),
    (r"text/norm/scale$", P()),
    # --- vision tower (stacked (depth, in, out)) ---
    (r"visual/patch_embed/kernel$", P(None, M)),
    (r"visual/blocks/attn/qkv_w$", P(None, D, M)),
    (r"visual/blocks/attn/qkv_b$", P(None, M)),
    (r"visual/blocks/attn/proj_w$", P(None, M, D)),
    (r"visual/blocks/attn/proj_b$", P()),
    (r"visual/blocks/mlp/(gate_w|up_w)$", P(None, D, M)),
    (r"visual/blocks/mlp/(gate_b|up_b)$", P(None, M)),
    (r"visual/blocks/mlp/down_w$", P(None, M, D)),
    (r"visual/blocks/mlp/down_b$", P()),
    (r"visual/blocks/norm\d/scale$", P()),
    (r"visual/merger/ln_q/scale$", P()),
    (r"visual/merger/fc1/kernel$", P(D, M)),
    (r"visual/merger/fc1/bias$", P(M)),
    (r"visual/merger/fc2/kernel$", P(M, D)),
    (r"visual/merger/fc2/bias$", P()),
    # LoRA adapters (rl/lora.py): shard the hidden dim like their base weight
    (r".*lora_a$", P(None, D, None)),
    (r".*lora_b$", P(None, None, M)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_str: str) -> P:
    for pattern, spec in PARAM_RULES:
        if re.search(pattern, path_str):
            return spec
    return P()  # replicate by default (small tensors)


def _divisible(shape, spec: P, mesh: Mesh) -> P:
    """Drop axis shardings that don't divide the dim (tiny test models)."""
    new = []
    for dim, ax in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if ax is None:
            new.append(None)
        else:
            size = mesh.shape[ax]
            new.append(ax if dim % size == 0 and dim >= size else None)
    return P(*new)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching `params` by rule table."""

    def f(path, leaf):
        spec = spec_for_path(_path_str(path))
        return NamedSharding(mesh, _divisible(leaf.shape, spec, mesh))

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put params with the rule-table shardings."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
