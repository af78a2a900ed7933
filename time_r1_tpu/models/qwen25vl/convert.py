"""HF checkpoint → JAX pytree weight converter for Qwen2.5-VL.

Consumes either a directory of .safetensors shards (the published
Qwen2.5-VL-3B/7B / Time-R1 checkpoints the reference loads at
timer1_trainer.py:244-251) or an in-memory torch state_dict (used by the
parity tests against a randomly-initialized tiny HF model).

Linear weights are transposed to (in, out) for `x @ W` style matmuls; per-layer
tensors are stacked along a leading layer axis for `lax.scan`.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .config import Qwen25VLConfig


def _np(t) -> np.ndarray:
    """torch tensor / numpy array → float32 numpy (bf16-safe)."""
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    t = t.detach().to("cpu")
    import torch

    if t.dtype == torch.bfloat16:
        t = t.float()
    return t.numpy()


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Read all tensors from {path}/*.safetensors (with or without an index)."""
    from safetensors import safe_open

    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    out: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(os.path.join(path, f), framework="numpy") as sf:
            for key in sf.keys():
                out[key] = sf.get_tensor(key)
    return out


def _strip_prefixes(sd: Dict) -> Dict:
    """Normalize the two HF naming eras:
    old: visual.* / model.* / lm_head.*
    new (>=4.52): model.visual.* / model.language_model.* / lm_head.*
    → canonical: visual.* / model.* / lm_head.*"""
    out = {}
    for k, v in sd.items():
        nk = k
        if nk.startswith("model.visual."):
            nk = nk[len("model.") :]
        elif nk.startswith("model.language_model."):
            nk = "model." + nk[len("model.language_model.") :]
        elif nk.startswith("language_model.model."):
            nk = "model." + nk[len("language_model.model.") :]
        out[nk] = v
    return out


def convert_state_dict(sd: Dict, cfg: Qwen25VLConfig, dtype=jnp.bfloat16) -> dict:
    """Build the model params pytree from an HF state dict."""
    sd = _strip_prefixes(sd)
    g = lambda k: _np(sd[k])  # noqa: E731

    def J(x):
        return jnp.asarray(x, dtype=dtype)

    v = cfg.vision
    t = cfg.text
    D = v.depth
    L = t.num_hidden_layers

    def stack(fmt: str, n: int, f: Callable[[np.ndarray], np.ndarray] = lambda x: x):
        return J(np.stack([f(g(fmt.format(i))) for i in range(n)]))

    tT = lambda x: x.T  # torch Linear stores (out, in) → transpose  # noqa: E731

    visual = {
        "patch_embed": {
            # Conv3d weight (embed, C, tp, ps, ps) → (C*tp*ps*ps, embed)
            "kernel": J(g("visual.patch_embed.proj.weight").reshape(v.hidden_size, -1).T)
        },
        "blocks": {
            "norm1": {"scale": stack("visual.blocks.{}.norm1.weight", D)},
            "norm2": {"scale": stack("visual.blocks.{}.norm2.weight", D)},
            "attn": {
                "qkv_w": stack("visual.blocks.{}.attn.qkv.weight", D, tT),
                "qkv_b": stack("visual.blocks.{}.attn.qkv.bias", D),
                "proj_w": stack("visual.blocks.{}.attn.proj.weight", D, tT),
                "proj_b": stack("visual.blocks.{}.attn.proj.bias", D),
            },
            "mlp": {
                "gate_w": stack("visual.blocks.{}.mlp.gate_proj.weight", D, tT),
                "gate_b": stack("visual.blocks.{}.mlp.gate_proj.bias", D),
                "up_w": stack("visual.blocks.{}.mlp.up_proj.weight", D, tT),
                "up_b": stack("visual.blocks.{}.mlp.up_proj.bias", D),
                "down_w": stack("visual.blocks.{}.mlp.down_proj.weight", D, tT),
                "down_b": stack("visual.blocks.{}.mlp.down_proj.bias", D),
            },
        },
        "merger": {
            "ln_q": {"scale": J(g("visual.merger.ln_q.weight"))},
            "fc1": {
                "kernel": J(g("visual.merger.mlp.0.weight").T),
                "bias": J(g("visual.merger.mlp.0.bias")),
            },
            "fc2": {
                "kernel": J(g("visual.merger.mlp.2.weight").T),
                "bias": J(g("visual.merger.mlp.2.bias")),
            },
        },
    }

    text = {
        "embed_tokens": {"embedding": J(g("model.embed_tokens.weight"))},
        "layers": {
            "input_layernorm": {"scale": stack("model.layers.{}.input_layernorm.weight", L)},
            "post_attention_layernorm": {
                "scale": stack("model.layers.{}.post_attention_layernorm.weight", L)
            },
            "self_attn": {
                "q_w": stack("model.layers.{}.self_attn.q_proj.weight", L, tT),
                "q_b": stack("model.layers.{}.self_attn.q_proj.bias", L),
                "k_w": stack("model.layers.{}.self_attn.k_proj.weight", L, tT),
                "k_b": stack("model.layers.{}.self_attn.k_proj.bias", L),
                "v_w": stack("model.layers.{}.self_attn.v_proj.weight", L, tT),
                "v_b": stack("model.layers.{}.self_attn.v_proj.bias", L),
                "o_w": stack("model.layers.{}.self_attn.o_proj.weight", L, tT),
            },
            "mlp": {
                "gate_w": stack("model.layers.{}.mlp.gate_proj.weight", L, tT),
                "up_w": stack("model.layers.{}.mlp.up_proj.weight", L, tT),
                "down_w": stack("model.layers.{}.mlp.down_proj.weight", L, tT),
            },
        },
        "norm": {"scale": J(g("model.norm.weight"))},
    }
    if not t.tie_word_embeddings:
        if "lm_head.weight" in sd:
            text["lm_head"] = {"kernel": J(g("lm_head.weight").T)}
        else:
            text["lm_head"] = {"kernel": J(g("model.embed_tokens.weight").T)}
    return {"visual": visual, "text": text}


def load_checkpoint(path: str, dtype=jnp.bfloat16) -> tuple[dict, Qwen25VLConfig]:
    """Load a Qwen2.5-VL checkpoint directory → (params, config).

    Accepts either format:
    - HF: config.json + *.safetensors (the published checkpoints);
    - native: params/ (orbax) + timer1_config.json (what the trainer writes —
      the SF loop reloads these between rounds, train_rl_SF.sh:77-85 parity).
    """
    native_cfg = os.path.join(path, "timer1_config.json")
    if os.path.exists(native_cfg) and os.path.isdir(os.path.join(path, "params")):
        from ...utils.checkpoint import load_params  # circular-safe: lazy

        with open(native_cfg) as f:
            cfg = config_from_plain_dict(json.load(f))
        params = load_params(path)
        from ...ops.quant import is_quantized

        def _cast(node):
            # preserve quantized {q8/q4, s} dicts exactly: a quantized-base
            # run saves them (cli/train --train_base_quantization) and a
            # blind cast would turn q8 int8 into bf16 (corrupting the layout
            # every int8 kernel expects) and f32 scales into bf16 (changing
            # the dequant numerics)
            if is_quantized(node):
                return {k: jnp.asarray(v) for k, v in node.items()}
            return jnp.asarray(node, dtype)

        params = jax.tree.map(_cast, params, is_leaf=is_quantized)
        return params, cfg
    with open(os.path.join(path, "config.json")) as f:
        cfg = Qwen25VLConfig.from_hf_dict(json.load(f))
    sd = load_safetensors_dir(path)
    return convert_state_dict(sd, cfg, dtype), cfg


def config_to_plain_dict(cfg: Qwen25VLConfig) -> dict:
    import dataclasses

    return dataclasses.asdict(cfg)


def config_from_plain_dict(d: dict) -> Qwen25VLConfig:
    from .config import TextConfig, VisionConfig

    d = dict(d)
    vd = dict(d.pop("vision"))
    vd["fullatt_block_indexes"] = tuple(vd["fullatt_block_indexes"])
    td = dict(d.pop("text"))
    td["mrope_section"] = tuple(td["mrope_section"])
    d["stop_token_ids"] = tuple(d.get("stop_token_ids", (151645, 151643)))
    return Qwen25VLConfig(vision=VisionConfig(**vd), text=TextConfig(**td), **d)


def export_state_dict(params: dict, cfg: Qwen25VLConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_state_dict: params pytree → HF state dict (old-era
    names: visual.* / model.* / lm_head.*), weights transposed back to
    torch (out, in) layout. Capability parity with ZeRO-3
    gather_16bit_weights_on_model_save (scripts/zero3.json:32) — checkpoints
    written here load in HF transformers / vLLM unchanged."""
    import numpy as np

    v, t = cfg.vision, cfg.text
    out: Dict[str, np.ndarray] = {}

    def A(x):
        return np.asarray(jnp.asarray(x, jnp.float32))

    vis = params["visual"]
    out["visual.patch_embed.proj.weight"] = A(vis["patch_embed"]["kernel"]).T.reshape(
        v.hidden_size, v.in_channels, v.temporal_patch_size, v.patch_size, v.patch_size
    )
    b = vis["blocks"]
    for i in range(v.depth):
        p = f"visual.blocks.{i}"
        out[f"{p}.norm1.weight"] = A(b["norm1"]["scale"][i])
        out[f"{p}.norm2.weight"] = A(b["norm2"]["scale"][i])
        out[f"{p}.attn.qkv.weight"] = A(b["attn"]["qkv_w"][i]).T
        out[f"{p}.attn.qkv.bias"] = A(b["attn"]["qkv_b"][i])
        out[f"{p}.attn.proj.weight"] = A(b["attn"]["proj_w"][i]).T
        out[f"{p}.attn.proj.bias"] = A(b["attn"]["proj_b"][i])
        for nm in ("gate", "up", "down"):
            out[f"{p}.mlp.{nm}_proj.weight"] = A(b["mlp"][f"{nm}_w"][i]).T
            out[f"{p}.mlp.{nm}_proj.bias"] = A(b["mlp"][f"{nm}_b"][i])
    m = vis["merger"]
    out["visual.merger.ln_q.weight"] = A(m["ln_q"]["scale"])
    out["visual.merger.mlp.0.weight"] = A(m["fc1"]["kernel"]).T
    out["visual.merger.mlp.0.bias"] = A(m["fc1"]["bias"])
    out["visual.merger.mlp.2.weight"] = A(m["fc2"]["kernel"]).T
    out["visual.merger.mlp.2.bias"] = A(m["fc2"]["bias"])

    txt = params["text"]
    out["model.embed_tokens.weight"] = A(txt["embed_tokens"]["embedding"])
    lay = txt["layers"]
    for i in range(t.num_hidden_layers):
        p = f"model.layers.{i}"
        out[f"{p}.input_layernorm.weight"] = A(lay["input_layernorm"]["scale"][i])
        out[f"{p}.post_attention_layernorm.weight"] = A(
            lay["post_attention_layernorm"]["scale"][i]
        )
        sa = lay["self_attn"]
        for nm in ("q", "k", "v"):
            out[f"{p}.self_attn.{nm}_proj.weight"] = A(sa[f"{nm}_w"][i]).T
            out[f"{p}.self_attn.{nm}_proj.bias"] = A(sa[f"{nm}_b"][i])
        out[f"{p}.self_attn.o_proj.weight"] = A(sa["o_w"][i]).T
        for nm in ("gate", "up", "down"):
            out[f"{p}.mlp.{nm}_proj.weight"] = A(lay["mlp"][f"{nm}_w"][i]).T
    out["model.norm.weight"] = A(txt["norm"]["scale"])
    if not t.tie_word_embeddings and "lm_head" in txt:
        out["lm_head.weight"] = A(txt["lm_head"]["kernel"]).T
    return out


def save_hf_checkpoint(path: str, params: dict, cfg: Qwen25VLConfig) -> None:
    """Write an HF-compatible safetensors checkpoint (bf16)."""
    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    sd = export_state_dict(params, cfg)
    # bf16 via ml_dtypes (numpy-native safetensors support)
    import ml_dtypes

    sd = {k: v.astype(ml_dtypes.bfloat16) for k, v in sd.items()}
    save_file(sd, os.path.join(path, "model.safetensors"))
