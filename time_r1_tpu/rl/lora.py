"""LoRA adapters (N9 parity: the reference's peft wrapping + adapter-disable
ref-model trick, timer1_trainer.py:264-265, 624-631).

Design: adapters are a SEPARATE pytree (lora_a: (L, in, r), lora_b: (L, r, out)
per target) merged functionally into the base weights before the forward:
`W_eff = W + (alpha/r)·A@B`. Training differentiates the loss w.r.t. the
adapter pytree only; reference logps come from the UNMERGED base weights —
exactly the peft disable_adapter() semantics, without a second model copy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")

# component order of the decode-fused projections (ops/quant.quantize_text_params)
_FUSED_ORDERS = {"qkv": ("q_w", "k_w", "v_w"), "gu": ("gate_w", "up_w")}


def fused_splits_for(text_cfg) -> dict:
    """Component widths of the decode-fused projections, keyed by fused name.

    Per-output-channel quant scales make a fused int8 base bit-identical to
    quantizing each projection separately (ops/quant.quantize_weight), so the
    TRAINING base can use the fused decode layout — the rollout engine then
    streams the same fewer-but-wider dots as the pure serving config (the
    round-4 unfused base cost ~27% of rollout decode) — while adapters keep
    per-projection q_w/... names via these widths."""
    hd = text_cfg.head_dim
    return {
        "qkv": (
            ("q_w", text_cfg.num_attention_heads * hd),
            ("k_w", text_cfg.num_key_value_heads * hd),
            ("v_w", text_cfg.num_key_value_heads * hd),
        ),
        "gu": (
            ("gate_w", text_cfg.intermediate_size),
            ("up_w", text_cfg.intermediate_size),
        ),
    }


@dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 32.0
    targets: Sequence[str] = DEFAULT_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def _target_paths(params: dict, targets, fused_splits=None) -> list[tuple[tuple, tuple]]:
    """(path, stacked (L, in, out) shape) for each adaptable weight. Works on
    bf16 trees, eval_shape'd ShapeDtypeStruct trees, AND quantized bases
    (ops/quant {q8/q4, s} dicts are treated as leaves with the q8 shape —
    init_lora over the int8 training base needs the fan dims, not values).

    fused_splits (fused_splits_for): over a decode-fused base ("qkv"/"gu"
    tensors) each fused weight yields its COMPONENT projections, so the
    adapter tree keeps per-projection names either way."""
    from ..ops.quant import is_quantized

    paths = []

    def visit(path, shape):
        if not path or len(shape) != 3:
            return
        name = path[-1]
        if fused_splits and name in fused_splits:
            L, fan_in, total = shape
            comps = fused_splits[name]
            assert sum(w for _, w in comps) == total, (name, shape, comps)
            for comp, width in comps:
                if comp in targets:
                    paths.append((tuple(path[:-1]) + (comp,), (L, fan_in, width)))
        elif name in targets:
            paths.append((tuple(path), tuple(shape)))

    def walk(node, path):
        if is_quantized(node):
            if "q8" in node:
                visit(path, node["q8"].shape)
            # int4-packed bases have no side-path/merge training layout
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
        elif hasattr(node, "ndim"):
            visit(path, node.shape)

    walk(params, [])
    return paths


def init_lora(params: dict, cfg: LoRAConfig, key, dtype=jnp.float32, fused_splits=None) -> dict:
    """Adapter pytree {path_str: {lora_a, lora_b}} over stacked (L, in, out)
    decoder/vision weights named in cfg.targets. A ~ N(0, 0.02), B = 0
    (standard LoRA init → adapters start as identity).

    fused_splits: pass fused_splits_for(text_cfg) when `params` is a
    decode-fused base so the adapters still get q_w/... names (both the
    in-scan merge and the engine side path are name-keyed)."""
    out = {}
    paths = _target_paths(params, set(cfg.targets), fused_splits=fused_splits)
    keys = jax.random.split(key, max(len(paths), 1))
    for k, (path, shape) in zip(keys, paths):
        L, fan_in, fan_out = shape
        out["/".join(path)] = {
            "lora_a": (jax.random.normal(k, (L, fan_in, cfg.rank)) * 0.02).astype(dtype),
            "lora_b": jnp.zeros((L, cfg.rank, fan_out), dtype),
        }
    return out


def merge_lora(params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    """Functionally merged weights: W + scaling·A@B at each adapted path.

    Decode-fused bases: component adapters (q_w/... from init_lora over a
    fused tree) whose tensor lives fused ("qkv"/"gu") merge as ONE
    concatenated delta — fused bf16 trees only (a fused QUANTIZED base
    merges per layer in-scan via apply_layer_lora; dequantizing the whole
    stacked tree here would defeat its memory design)."""

    def set_in(tree, path, value):
        if len(path) == 1:
            return {**tree, path[0]: value}
        return {**tree, path[0]: set_in(tree[path[0]], path[1:], value)}

    merged = params
    fused_groups: dict = {}  # (parent path…, fused key) → {component: ab}
    for path_str, ab in lora.items():
        path = tuple(path_str.split("/"))
        parent = merged
        for p in path[:-1]:
            parent = parent[p]
        name = path[-1]
        if name not in parent:
            for fk, comps in _FUSED_ORDERS.items():
                if name in comps and fk in parent:
                    fused_groups.setdefault(path[:-1] + (fk,), {})[name] = ab
                    break
            else:
                raise KeyError(path_str)
            continue
        node = parent[name]
        delta = jnp.einsum("lir,lro->lio", ab["lora_a"], ab["lora_b"]) * cfg.scaling
        merged = set_in(merged, path, node + delta.astype(node.dtype))
    for fpath, group in fused_groups.items():
        comps = _FUSED_ORDERS[fpath[-1]]
        missing = [c for c in comps if c not in group]
        assert not missing, (
            f"fused tensor '{fpath[-1]}' needs adapters on all of {comps} "
            f"(missing {missing})"
        )
        node = merged
        for p in fpath:
            node = node[p]
        if isinstance(node, dict):
            raise ValueError(
                "merge_lora over a fused QUANTIZED base — use the in-scan "
                "apply_layer_lora path (lora_layers_tree) instead"
            )
        delta = jnp.concatenate(
            [
                jnp.einsum("lir,lro->lio", group[c]["lora_a"], group[c]["lora_b"])
                for c in comps
            ],
            axis=-1,
        ) * cfg.scaling
        merged = set_in(merged, fpath, node + delta.astype(node.dtype))
    return merged


def lora_layers_tree(lora: dict, prefix: str = "text/layers/"):
    """Split a flat adapter dict into (stacked nested tree re-rooted at the
    decoder-layers subtree, rest).

    The tree scans WITH the layers so the merge happens per layer INSIDE the
    scan body (language.decoder_forward / shared_decode_forward `lora=` arg):
    one (in, out) merged weight exists per scan step instead of a full
    merged copy of the stacked tree — at 3B the merged tree is another
    6.2 GB next to the base, which OOMs a 16 GB v5e in the LoRA backward
    (measured RESOURCE_EXHAUSTED at 24+ layers; the in-scan merge is the
    memory-correct LoRA training design). `rest` holds adapters outside the
    decoder layers (none with DEFAULT_TARGETS) for a conventional merge."""
    tree: dict = {}
    rest: dict = {}
    for path_str, ab in lora.items():
        if not path_str.startswith(prefix):
            rest[path_str] = ab
            continue
        sub = path_str[len(prefix):].split("/")
        node = tree
        for p in sub[:-1]:
            node = node.setdefault(p, {})
        node[sub[-1]] = ab
    return (tree or None), rest


def apply_layer_lora(lp: dict, lora_slice: dict, scaling: float) -> dict:
    """One layer's functional merge W + scaling·A@B — identical math to
    merge_lora one layer at a time (the delta is a transient of the scan
    step, recomputed in the backward under remat).

    Quantized base leaves ({"q8"/"q4", "s"}, ops/quant) are dequantized to
    bf16 before the merge — one layer's bf16 weights at a time (a 7B layer is
    ~0.47 GB, vs 15.5 GB for the whole tree), which is what lets the 7B LoRA
    GRPO step train on a 16 GB chip over an int8 base.

    DECODE-FUSED bases ("qkv"/"gu" tensors, quantize_params(fuse=True) or the
    bf16 fused layout): the per-projection adapter deltas are concatenated
    along the output axis — concat(A_q@B_q, A_k@B_k, A_v@B_v) — and added to
    the fused weight; matmul distributivity over column blocks makes this the
    same math as merging each projection separately. The fused training base
    is the single-chip 7B default: the ROLLOUT engine then streams the same
    fewer-but-wider dots as the pure decode config (the unfused layout cost
    ~27% of rollout throughput, docs/ROADMAP.md round 5)."""
    from ..ops.quant import dequantize_weight, is_quantized

    merged = {}
    for k, v in lp.items():
        sl = lora_slice.get(k) if isinstance(lora_slice, dict) else None
        comps = _FUSED_ORDERS.get(k)
        if (
            comps is not None
            and isinstance(lora_slice, dict)
            and any(c in lora_slice for c in comps)
        ):
            missing = [c for c in comps if c not in lora_slice]
            assert not missing, (
                f"fused base '{k}' needs adapters on all of {comps} "
                f"(missing {missing}) — adapt all components or none"
            )
            base = dequantize_weight(v, dtype=jnp.bfloat16) if is_quantized(v) else v
            delta = jnp.concatenate(
                [lora_slice[c]["lora_a"] @ lora_slice[c]["lora_b"] for c in comps],
                axis=-1,
            ) * scaling
            merged[k] = base + delta.astype(base.dtype)
        elif isinstance(sl, dict) and "lora_a" in sl:
            delta = (sl["lora_a"] @ sl["lora_b"]) * scaling
            if is_quantized(v):
                base = dequantize_weight(v, dtype=jnp.bfloat16)
                merged[k] = base + delta.astype(base.dtype)
            else:
                merged[k] = v + delta.astype(v.dtype)
        elif isinstance(v, dict) and not is_quantized(v):
            merged[k] = apply_layer_lora(v, sl or {}, scaling)
        else:
            merged[k] = v
    return merged
