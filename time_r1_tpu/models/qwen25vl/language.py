"""Qwen2.5-VL language model (decoder with M-RoPE) in JAX.

TPU-native re-design of the decoder the reference consumes from transformers
(N7 in SURVEY §2.2). Layers are stacked + scanned; attention dispatches to the
Pallas flash kernel on TPU or the jnp reference on CPU. Supports:

- full-sequence forward (training / prefill) with causal+padding mask and
  optional per-layer sliding window (the reference's `slide_window` knobs,
  main.py:51-60, disabled by default in every recipe);
- incremental decode with a preallocated static-shape KV cache
  (B, L, max_len, Hkv, hd) updated via dynamic_update_slice — the building
  block for the continuous-batching sampler (N2).

Weights layout (converter-facing, transposed to (in, out)):
  embed_tokens/embedding (V, hidden)
  layers/{input_layernorm,post_attention_layernorm}/scale (L, hidden)
  layers/self_attn/{q_w,q_b,k_w,k_b,v_w,v_b,o_w}
  layers/mlp/{gate_w,up_w,down_w}
  norm/scale (hidden,)
  lm_head/kernel (hidden, V)  [tied to embed for 3B]
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...ops.attention import NEG_INF, mha_cached, mha_cached_q8, mha_reference
from ...ops.quant import attn_qkv_proj, mlp_proj, qmatmul, tied_head_logits
from .config import TextConfig

# Selective gradient checkpointing (VERDICT r4 #2): per-layer jax.checkpoint
# with a residual-save policy over the checkpoint_name tags planted in
# attn_qkv_proj / mlp_proj ("qkv_proj", "mlp_gu", "mlp_down") and the o-proj
# ("attn_proj"). "full" saves only layer inputs (max recompute, min HBM — the
# only mode that fit round 4); "dots" saves every projection output so the
# backward recomputes just rope/norm/silu elementwise + the flash-attention
# forward; "dots_small" drops the wide (B, S, 2·inter) gate/up residual —
# ~3/4 of "dots"' residual bytes — and recomputes the two MLP up-projections.
REMAT_POLICIES = {
    "dots": ("qkv_proj", "attn_proj", "mlp_gu", "mlp_down"),
    "dots_small": ("qkv_proj", "attn_proj", "mlp_down"),
}


def _layer_remat(layer, remat):
    """remat: False → plain layer; True/'full' → jax.checkpoint;
    a REMAT_POLICIES key → jax.checkpoint with save_only_these_names."""
    if not remat:
        return layer
    if remat is True or remat == "full":
        return jax.checkpoint(layer)
    names = REMAT_POLICIES[remat]
    return jax.checkpoint(
        layer, policy=jax.checkpoint_policies.save_only_these_names(*names)
    )


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, max_len, Hkv, hd) — bf16, or int8 in decode-quant form
    v: jnp.ndarray  # (L, B, max_len, Hkv, hd)
    length: jnp.ndarray  # () int32 — filled prefix length (uniform across batch)
    # int8 decode form only (ops/quant.quantize_kv_cache): per-(token, head)
    # scales, (L, B, max_len, Hkv) f32
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @staticmethod
    def zeros(cfg: TextConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))


def _rms_norm(x, scale, eps):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale.astype(jnp.float32)).astype(dtype)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def mrope_cos_sin(cfg: TextConfig, position_ids: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin (B, S, head_dim) from 3D position ids (3, B, S).

    Channel j of the half-dim uses the (t|h|w) axis given by mrope_section —
    equivalent to HF's split/interleave in apply_multimodal_rotary_pos_emb.
    """
    hd = cfg.head_dim
    half = hd // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    sec = []
    for axis, n in enumerate(cfg.mrope_section):
        sec.extend([axis] * n)
    axis_map = jnp.array(sec, jnp.int32)  # (half,)
    # pos_sel[b, s, j] = position_ids[axis_map[j], b, s]
    pos = position_ids.astype(jnp.float32)  # (3, B, S)
    pos_sel = jnp.take(pos, axis_map, axis=0)  # (half, B, S)
    freqs = jnp.moveaxis(pos_sel, 0, -1) * inv_freq[None, None, :]  # (B, S, half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def init_text_params(cfg: TextConfig, key, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 10)
    L, hid, inter = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def nrm(k, shape, s=0.02):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    params = {
        "embed_tokens": {"embedding": nrm(ks[0], (cfg.vocab_size, hid))},
        "layers": {
            "input_layernorm": {"scale": jnp.ones((L, hid), dtype)},
            "post_attention_layernorm": {"scale": jnp.ones((L, hid), dtype)},
            "self_attn": {
                "q_w": nrm(ks[1], (L, hid, nh * hd)),
                "q_b": jnp.zeros((L, nh * hd), dtype),
                "k_w": nrm(ks[2], (L, hid, nkv * hd)),
                "k_b": jnp.zeros((L, nkv * hd), dtype),
                "v_w": nrm(ks[3], (L, hid, nkv * hd)),
                "v_b": jnp.zeros((L, nkv * hd), dtype),
                "o_w": nrm(ks[4], (L, nh * hd, hid)),
            },
            "mlp": {
                "gate_w": nrm(ks[5], (L, hid, inter)),
                "up_w": nrm(ks[6], (L, hid, inter)),
                "down_w": nrm(ks[7], (L, inter, hid)),
            },
        },
        "norm": {"scale": jnp.ones((hid,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": nrm(ks[8], (hid, cfg.vocab_size))}
    return params


def _sliding_flags(cfg: TextConfig) -> jnp.ndarray:
    """Per-layer bool: True when the layer uses sliding-window attention.

    HF layer_types: sliding for layer_idx >= max_window_layers when
    use_sliding_window is set (Qwen2 convention: the BOTTOM max_window_layers
    layers keep full attention)."""
    import numpy as np

    flags = np.zeros((cfg.num_hidden_layers,), bool)
    if cfg.use_sliding_window and cfg.sliding_window is not None:
        flags[cfg.max_window_layers :] = True
    return jnp.array(flags)


def _flash_eligible(cfg: TextConfig, seq_len: int) -> bool:
    """Use the Pallas flash kernel when on TPU with MXU-aligned shapes and no
    sliding window (the recipes disable sliding everywhere)."""
    import jax as _jax

    return (
        _jax.default_backend() == "tpu"
        and cfg.head_dim == 128
        and seq_len % 128 == 0
        and not (cfg.use_sliding_window and cfg.sliding_window is not None)
    )


def decoder_forward(
    params: dict,
    cfg: TextConfig,
    hidden: jnp.ndarray,  # (B, S, hidden) — embeddings (vision already merged)
    position_ids: jnp.ndarray,  # (3, B, S)
    attention_mask: Optional[jnp.ndarray] = None,  # (B, S) 1/0 padding mask
    cache: Optional[KVCache] = None,
    use_flash: Optional[bool] = None,
    flash_q_offset: Optional[int] = None,  # STATIC offset enabling flash in the cached prefill
    remat: bool = False,  # jax.checkpoint per layer (reference --gradient_checkpointing)
    collect_hiddens: bool = False,  # ALSO return per-layer outputs (parity harness)
    cp: Optional[tuple[str, int]] = None,  # (axis_name, axis_size) context parallelism
    lora: Optional[tuple[dict, float]] = None,  # (stacked layer-adapter tree, scaling)
    lora_side: Optional[tuple[dict, float]] = None,  # UNMERGED side-path adapters
) -> tuple[jnp.ndarray, Optional[KVCache]]:
    """Run all decoder layers; returns (hidden (B,S,hid), updated cache).

    lora=(tree, scaling): stacked LoRA adapters mirroring the layers subtree
    (rl/lora.lora_layers_tree). The functional merge W + scaling·A@B happens
    per layer INSIDE the scan — one merged weight is live at a time, so the
    3B LoRA backward holds base + one layer instead of base + a full merged
    copy (the full copy OOMs a 16 GB chip). Not supported with an int8 KV
    cache (rollouts run on pre-merged weights).

    lora_side=(tree, scaling): the same adapter tree applied as SIDE products
    scaling·(h@A)@B at each projection (ops/quant.lora_delta) — the base is
    never dequantized or merged, so rollout decode runs LoRA-adapted sampling
    over the SAME (possibly int8) tree the trainer holds: zero per-step
    weight sync, zero duplicate weights. Identical math to the merge up to
    float rounding (pinned by tests/test_lora_side.py). Works with the int8
    KV cache (unlike `lora`).

    cp=(axis_name, n): context parallelism — the call runs INSIDE shard_map
    with the sequence dim of hidden/position_ids/attention_mask sharded over
    `axis_name`; attention goes through the ring kernel
    (parallel/ring_attention.py) so each device holds O(S/n) activations.
    No-cache path only; see `sequence_parallel_decoder` for the wrapper.

    collect_hiddens=True (no-cache path only) changes the return to
    (hidden, cache, per_layer (L, B, S, hid)) — each layer's output before
    the final norm, matching HF `output_hidden_states` layer slots 1..L.
    Used by cli/parity.py for layerwise activation diffing vs HF torch.

    Without cache: causal attention over the S tokens.
    With cache: the S tokens are appended at positions [length, length+S) of
    the cache; attention covers cached prefix + self (still causal inside S).
    """
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    B, S, _ = hidden.shape
    cos, sin = mrope_cos_sin(cfg, position_ids)  # (B, S, hd)
    cos_b = cos[:, :, None, :]  # broadcast over heads: (B, S, 1, hd)
    sin_b = sin[:, :, None, :]

    if cache is not None:
        # Split attention: cache prefix [0, length) via bias_old; the current
        # S-token chunk via bias_new (causal within the chunk). mha_cached
        # combines the softmax across both — so the cache is never copied
        # through the attention input and gets ONE in-place update per call.
        kv_len = cache.k.shape[2]
        kv_pos = jnp.arange(kv_len)[None, :]
        old_allowed = kv_pos < cache.length  # (1, kv_len) — same for every chunk row
        bias_old = jnp.where(old_allowed, 0.0, NEG_INF).astype(jnp.float32)[None, None]
        if attention_mask is not None:
            pad = jnp.where(attention_mask > 0, 0.0, NEG_INF).astype(jnp.float32)
            bias_old = bias_old + pad[:, None, None, :]
        i_pos = jnp.arange(S)[:, None]
        j_pos = jnp.arange(S)[None, :]
        bias_new = jnp.where(j_pos <= i_pos, 0.0, NEG_INF).astype(jnp.float32)[None, None]
        if attention_mask is not None:
            chunk_pad = jax.lax.dynamic_slice(
                attention_mask, (0, cache.length), (B, S)
            )
            bias_new = bias_new + jnp.where(chunk_pad > 0, 0.0, NEG_INF).astype(jnp.float32)[
                :, None, None, :
            ]
        bias = window_bias = None  # unused in the cached path
    else:
        kv_pos = jnp.arange(S)[None, :]
        q_pos = jnp.arange(S)[:, None]
        allowed = kv_pos <= q_pos
        bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[None, None]
        if cfg.use_sliding_window and cfg.sliding_window is not None:
            wallowed = allowed & (kv_pos > q_pos - cfg.sliding_window)
            window_bias = jnp.where(wallowed, 0.0, NEG_INF).astype(jnp.float32)[None, None]
        else:
            window_bias = bias
        if attention_mask is not None:
            pad = jnp.where(attention_mask > 0, 0.0, NEG_INF).astype(jnp.float32)
            bias = bias + pad[:, None, None, :]
            window_bias = window_bias + pad[:, None, None, :]

    sliding = _sliding_flags(cfg)
    layers = params["layers"]
    quant_kv = cache is not None and cache.k.dtype == jnp.int8

    # Pallas flash kernel on TPU for the MXU-aligned no-cache path
    # (training / logp recompute); the cached-decode and sliding-window paths
    # use the grouped-einsum reference. The int8-quantized cache has its own
    # attention (mha_cached_q8) — never the flash path.
    flash = use_flash if use_flash is not None else (cache is None and _flash_eligible(cfg, S))
    if cp is not None:
        assert cache is None, "context parallelism covers the no-cache (training) path only"
        assert not (cfg.use_sliding_window and cfg.sliding_window is not None)
        flash = True  # ring attention rides the flash kernel
    flash_cached = (
        cache is not None
        and not quant_kv
        and flash_q_offset is not None
        and _flash_eligible(cfg, S)
        and cache.k.shape[2] % 128 == 0
        and flash_q_offset % 128 == 0
    )
    if flash or flash_cached:
        kv_len = S if cache is None else cache.k.shape[2]
        if attention_mask is not None:
            kv_bias = jnp.where(attention_mask[:, :kv_len] > 0, 0.0, NEG_INF).astype(jnp.float32)
        else:
            kv_bias = jnp.zeros((B, kv_len), jnp.float32)

    if lora is not None:
        assert not quant_kv, "in-scan LoRA merge is a loss-path feature (bf16 KV)"
        assert lora_side is None, "pass adapters as lora= OR lora_side=, not both"
        from ...rl.lora import apply_layer_lora
    adapters = lora if lora is not None else lora_side

    def layer(x, scanned):
        lslice = None
        if adapters is not None:
            scanned, lslice = scanned
        if quant_kv:
            lp, is_sliding, layer_k, layer_v, layer_ks, layer_vs = scanned
        else:
            lp, is_sliding, layer_k, layer_v = scanned
        if lora is not None:
            lp = apply_layer_lora(lp, lslice, lora[1])
        side_attn = side_mlp = None
        if lora_side is not None:
            side_attn = (lslice.get("self_attn", {}), lora_side[1])
            side_mlp = (lslice.get("mlp", {}), lora_side[1])
        h = _rms_norm(x, lp["input_layernorm"]["scale"], eps)
        q, k, v = attn_qkv_proj(h, lp["self_attn"], nh, nkv, hd, lora=side_attn)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos_b + _rotate_half(qf) * sin_b).astype(x.dtype)
        k = (kf * cos_b + _rotate_half(kf) * sin_b).astype(x.dtype)

        def tail(x, attn):
            from jax.ad_checkpoint import checkpoint_name

            attn_flat = attn.reshape(B, S, nh * hd).astype(x.dtype)
            a = qmatmul(attn_flat, lp["self_attn"]["o_w"])
            if side_attn is not None and "o_w" in side_attn[0]:
                from ...ops.quant import lora_delta

                a = a + lora_delta(attn_flat, side_attn[0]["o_w"], lora_side[1])
            a = checkpoint_name(a, "attn_proj")
            x = x + a
            h2 = _rms_norm(x, lp["post_attention_layernorm"]["scale"], eps)
            return x + mlp_proj(h2, lp["mlp"], lora=side_mlp)

        if cache is not None:
            if quant_kv:
                from ...ops.quant import quantize_kv

                attn = mha_cached_q8(
                    q, layer_k, layer_v, layer_ks, layer_vs, k, v, bias_old, bias_new
                )
                k8, ks = quantize_kv(k)
                v8, vs = quantize_kv(v)
                return tail(x, attn), (k8, ks, v8, vs)
            if flash_cached:
                from ...ops.flash_attention import flash_attention

                k_all = jax.lax.dynamic_update_slice(
                    layer_k, k.astype(layer_k.dtype), (0, cache.length, 0, 0)
                )
                v_all = jax.lax.dynamic_update_slice(
                    layer_v, v.astype(layer_v.dtype), (0, cache.length, 0, 0)
                )
                attn = flash_attention(
                    q, k_all.astype(q.dtype), v_all.astype(q.dtype), kv_bias,
                    True, None, flash_q_offset,
                )
            else:
                attn = mha_cached(
                    q, layer_k.astype(q.dtype), layer_v.astype(q.dtype), k, v,
                    bias_old, bias_new,
                )
            new_k, new_v = k, v  # ys: the chunk only — written into the cache once, post-scan
        elif flash:
            if cp is not None:
                if len(cp) > 2 and cp[2] == "zigzag":
                    from ...parallel.ring_attention import ring_flash_attention_zigzag

                    attn = ring_flash_attention_zigzag(q, k, v, kv_bias, cp[0], cp[1])
                else:
                    from ...parallel.ring_attention import ring_flash_attention

                    attn = ring_flash_attention(q, k, v, kv_bias, cp[0], cp[1], True, None)
            else:
                from ...ops.flash_attention import flash_attention

                attn = flash_attention(q, k, v, kv_bias, True, None, 0)
            new_k, new_v = layer_k, layer_v
        else:
            b = jnp.where(is_sliding, window_bias, bias)
            attn = mha_reference(q, k, v, bias=b)
            new_k, new_v = layer_k, layer_v
        return tail(x, attn), (new_k, new_v)

    # gradient checkpointing: "full" saves each layer's input and recomputes
    # attention/MLP activations in the backward pass — the reference recipes
    # rely on HF's gradient_checkpointing for the 7B × 8k × G=8 fwd/bwd to
    # fit; the selective policies trade HBM for less recompute (_layer_remat)
    layer_fn = _layer_remat(layer, remat)

    def _xs(t):
        # the adapter tree scans alongside the layers (leading dim L)
        return (t, adapters[0]) if adapters is not None else t

    if cache is not None and quant_kv:
        hidden, (k8s, kss, v8s, vss) = jax.lax.scan(
            layer_fn, hidden,
            _xs((layers, sliding, cache.k, cache.v, cache.k_scale, cache.v_scale)),
        )
        at = (0, 0, cache.length, 0, 0)
        new_cache = KVCache(
            k=jax.lax.dynamic_update_slice(cache.k, k8s, at),
            v=jax.lax.dynamic_update_slice(cache.v, v8s, at),
            length=cache.length + S,
            k_scale=jax.lax.dynamic_update_slice(cache.k_scale, kss, at[:-1]),
            v_scale=jax.lax.dynamic_update_slice(cache.v_scale, vss, at[:-1]),
        )
    elif cache is not None:
        hidden, (ks, vs) = jax.lax.scan(layer_fn, hidden, _xs((layers, sliding, cache.k, cache.v)))
        # ks/vs: (L, B, S, Hkv, hd) — just the chunk. One dynamic_update_slice
        # into the (donated) cache buffer: in-place under jit/while-loop.
        new_k = jax.lax.dynamic_update_slice(
            cache.k, ks.astype(cache.k.dtype), (0, 0, cache.length, 0, 0)
        )
        new_v = jax.lax.dynamic_update_slice(
            cache.v, vs.astype(cache.v.dtype), (0, 0, cache.length, 0, 0)
        )
        new_cache = KVCache(k=new_k, v=new_v, length=cache.length + S)
    else:
        dummy = jnp.zeros((cfg.num_hidden_layers, 0), hidden.dtype)
        if collect_hiddens:
            def collect(x, sc):
                y, _ = layer_fn(x, sc)
                return y, y

            hidden, per_layer = jax.lax.scan(collect, hidden, _xs((layers, sliding, dummy, dummy)))
            hidden = _rms_norm(hidden, params["norm"]["scale"], eps)
            return hidden, None, per_layer
        hidden, _ = jax.lax.scan(layer_fn, hidden, _xs((layers, sliding, dummy, dummy)))
        new_cache = None

    hidden = _rms_norm(hidden, params["norm"]["scale"], eps)
    return hidden, new_cache


def suffix_cache_zeros(
    cfg: TextConfig, batch: int, max_new: int, quant: bool, dtype=jnp.bfloat16
) -> KVCache:
    """Empty per-row generated-suffix cache for shared-prefix decode."""
    shape = (cfg.num_hidden_layers, batch, max_new, cfg.num_key_value_heads, cfg.head_dim)
    if quant:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            length=jnp.zeros((), jnp.int32),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
        )
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))


def shared_decode_forward(
    params: dict,
    cfg: TextConfig,
    hidden: jnp.ndarray,  # (B, S, hidden) — B = P·R rollout rows, row-major by prompt
    position_ids: jnp.ndarray,  # (3, B, S)
    prefix: KVCache,  # (L, P, Lp, Hkv, hd) — ONE prompt-prefix copy per prompt
    suffix: Optional[KVCache],  # (L, B, max_new, Hkv, hd) per-row generated tokens
    prefix_bias: jnp.ndarray,  # (P, Lp) f32 additive (0 valid / NEG_INF pad)
    remat: bool = False,  # jax.checkpoint per layer (GRPO loss-forward path)
    use_flash: Optional[bool] = None,  # force/deny the flash chunk path (tests)
    lora: Optional[tuple[dict, float]] = None,  # in-scan merge (decoder_forward docs)
    lora_side: Optional[tuple[dict, float]] = None,  # side-path (decoder_forward docs)
    prefix_head_major: bool = False,  # prefix pre-transposed (L, P, Hkv, Lp, hd):
    # the S=1 decode step routes the prefix pass through the Pallas
    # online-softmax kernel (ops/decode_attention.py) — one launch/layer
    # instead of the dot→fusion→dot→dot jnp chain
) -> tuple[jnp.ndarray, Optional[KVCache]]:
    """Decode step with the prompt KV shared across rollout rows (GRPO G-way
    decode / grouped serving). Attention per layer covers [shared prefix |
    own suffix | current chunk] with one combined softmax
    (ops/attention.mha_shared_prefix); the new K/V append to the suffix with
    one in-place update per call. Versus replicating the prefix per row
    (vLLM replicates pages logically, not physically — vllm_infer.py:48-57),
    this streams the prefix cache once per prompt instead of once per row:
    at the GRPO bench shape (G=8 × 1.8k prompt) that is ~230 MB less HBM
    traffic per decode step and ~8× less cache memory.

    prefix.length is unused (prefix_bias masks pad slots); suffix.length
    counts generated tokens and must be uniform across rows.

    suffix=None: the GRPO loss-forward shape — the whole completion is one
    causal S-token chunk attending [shared prefix | itself]; no suffix cache
    exists and none is returned. Differentiable end-to-end: the backward
    accumulates each prompt's prefix gradient across its R rows (the whole
    point — the prompt forward runs once per prompt, not once per row).
    On TPU with 128-aligned Lp/S this path rides the shared-prefix Pallas
    flash kernel (ops/flash_attention.flash_attention_shared_prefix): the
    prefix K/V are kernel operands once per prompt (BlockSpec b → b//R), so
    no per-layer repeat/concat materializes, the (B, H, S, Lp) logits never
    hit HBM, and the backward sums the prefix gradient over the R rows
    inside the kernel."""
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    B, S, _ = hidden.shape
    quant = suffix is not None and suffix.k.dtype == jnp.int8
    if prefix_head_major:
        assert suffix is not None and S == 1, "kernel path: decode step only"
    cos, sin = mrope_cos_sin(cfg, position_ids)
    cos_b = cos[:, :, None, :]
    sin_b = sin[:, :, None, :]

    bias_pref = prefix_bias[:, None, None, :]  # (P, 1, 1, Lp) → broadcasts over S
    if suffix is not None:
        Lo = suffix.k.shape[3 if prefix_head_major else 2]
        own_valid = jnp.arange(Lo)[None, :] < suffix.length
        bias_own = jnp.where(own_valid, 0.0, NEG_INF).astype(jnp.float32)[None, None]
    else:
        bias_own = None
    i_pos = jnp.arange(S)[:, None]
    j_pos = jnp.arange(S)[None, :]
    bias_new = jnp.where(j_pos <= i_pos, 0.0, NEG_INF).astype(jnp.float32)[None, None]

    from ...ops.attention import mha_shared_prefix
    from ...ops.quant import quantize_kv

    Lp = prefix.k.shape[3 if prefix_head_major else 2]
    flash_chunk = (
        suffix is None
        and prefix.k.dtype != jnp.int8
        and _flash_eligible(cfg, S)
        and Lp % 128 == 0
    ) if use_flash is None else use_flash

    if lora is not None:
        assert suffix is None and not quant, "in-scan LoRA merge: loss path only"
        assert lora_side is None, "pass adapters as lora= OR lora_side=, not both"
        from ...rl.lora import apply_layer_lora
    adapters = lora if lora is not None else lora_side

    def layer(x, scanned):
        lslice = None
        if adapters is not None:
            scanned, lslice = scanned
        if quant:
            lp, kp, vp, kps, vps, ko, vo, kos, vos = scanned
        elif suffix is not None:
            lp, kp, vp, ko, vo = scanned
            kps = vps = kos = vos = None
        else:
            lp, kp, vp = scanned
            ko = vo = kps = vps = kos = vos = None
        if lora is not None:
            lp = apply_layer_lora(lp, lslice, lora[1])
        side_attn = side_mlp = None
        if lora_side is not None:
            side_attn = (lslice.get("self_attn", {}), lora_side[1])
            side_mlp = (lslice.get("mlp", {}), lora_side[1])
        h = _rms_norm(x, lp["input_layernorm"]["scale"], eps)
        q, k, v = attn_qkv_proj(h, lp["self_attn"], nh, nkv, hd, lora=side_attn)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos_b + _rotate_half(qf) * sin_b).astype(x.dtype)
        k = (kf * cos_b + _rotate_half(kf) * sin_b).astype(x.dtype)
        if flash_chunk:
            from ...ops.flash_attention import flash_attention_shared_prefix

            # prefix K/V enter ONCE PER PROMPT — the kernel routes them to the
            # R rows of each group via its index maps and sums the prefix
            # gradient over the rows in-kernel (no jnp.repeat/concat per layer)
            attn = flash_attention_shared_prefix(
                q, kp.astype(q.dtype), vp.astype(q.dtype), k, v, prefix_bias
            )
        elif prefix_head_major:
            # ONE kernel launch for the whole [prefix | own suffix | new
            # token] softmax (ops/decode_attention.shared_prefix_decode_full);
            # caches enter HEAD-MAJOR — (P, Hkv, Lp, hd) / (B, Hkv, Lo, hd)
            from ...ops.decode_attention import shared_prefix_decode_full

            P = kp.shape[0]
            R = B // P
            G = nh // nkv
            q_kern = (
                q.reshape(P, R, nkv, G, hd)
                .transpose(0, 2, 1, 3, 4)
                .reshape(P, nkv, R * G, hd)
            )
            Lo = ko.shape[2]
            bias_own_1d = jnp.where(
                jnp.arange(Lo) < suffix.length, 0.0, NEG_INF
            ).astype(jnp.float32)
            ctx = shared_prefix_decode_full(
                q_kern, kp, vp, kps, vps, prefix_bias,
                ko, vo, kos, vos, bias_own_1d, k[:, 0], v[:, 0],
            )
            attn = (
                ctx.reshape(P, nkv, R, G, hd)
                .transpose(0, 2, 1, 3, 4)
                .reshape(B, S, nh, hd)
            )
        else:
            attn = mha_shared_prefix(
                q, kp, vp, kps, vps, ko, vo, kos, vos, k, v, bias_pref, bias_own, bias_new
            )
        from jax.ad_checkpoint import checkpoint_name

        attn_flat = attn.reshape(B, S, nh * hd).astype(x.dtype)
        a = qmatmul(attn_flat, lp["self_attn"]["o_w"])
        if side_attn is not None and "o_w" in side_attn[0]:
            from ...ops.quant import lora_delta

            a = a + lora_delta(attn_flat, side_attn[0]["o_w"], lora_side[1])
        a = checkpoint_name(a, "attn_proj")
        x = x + a
        h2 = _rms_norm(x, lp["post_attention_layernorm"]["scale"], eps)
        x = x + mlp_proj(h2, lp["mlp"], lora=side_mlp)
        if quant:
            k8, ks = quantize_kv(k)
            v8, vs = quantize_kv(v)
            return x, (k8, ks, v8, vs)
        if suffix is None:
            return x, None
        return x, (k, v)

    layer_fn = _layer_remat(layer, remat)
    layers = params["layers"]
    if suffix is None:
        xs = (layers, prefix.k, prefix.v)
        if adapters is not None:
            xs = (xs, adapters[0])
        hidden, _ = jax.lax.scan(layer_fn, hidden, xs)
        new_suffix = None
    elif quant:
        xs = (
            layers, prefix.k, prefix.v, prefix.k_scale, prefix.v_scale,
            suffix.k, suffix.v, suffix.k_scale, suffix.v_scale,
        )
        if adapters is not None:
            xs = (xs, adapters[0])
        hidden, (k8s, kss, v8s, vss) = jax.lax.scan(layer_fn, hidden, xs)
        if prefix_head_major:
            # head-major suffix (L, B, Hkv, Lo, hd): append on the Lo axis
            k8s, v8s = k8s.swapaxes(2, 3), v8s.swapaxes(2, 3)
            kss, vss = kss.swapaxes(2, 3), vss.swapaxes(2, 3)
            at = (0, 0, 0, suffix.length, 0)
        else:
            at = (0, 0, suffix.length, 0, 0)
        new_suffix = KVCache(
            k=jax.lax.dynamic_update_slice(suffix.k, k8s, at),
            v=jax.lax.dynamic_update_slice(suffix.v, v8s, at),
            length=suffix.length + S,
            k_scale=jax.lax.dynamic_update_slice(suffix.k_scale, kss, at[:-1]),
            v_scale=jax.lax.dynamic_update_slice(suffix.v_scale, vss, at[:-1]),
        )
    else:
        xs = (layers, prefix.k, prefix.v, suffix.k, suffix.v)
        if adapters is not None:
            xs = (xs, adapters[0])
        hidden, (ks, vs) = jax.lax.scan(layer_fn, hidden, xs)
        if prefix_head_major:
            ks, vs = ks.swapaxes(2, 3), vs.swapaxes(2, 3)
            at = (0, 0, 0, suffix.length, 0)
        else:
            at = (0, 0, suffix.length, 0, 0)
        new_suffix = KVCache(
            k=jax.lax.dynamic_update_slice(suffix.k, ks.astype(suffix.k.dtype), at),
            v=jax.lax.dynamic_update_slice(suffix.v, vs.astype(suffix.v.dtype), at),
            length=suffix.length + S,
        )
    hidden = _rms_norm(hidden, params["norm"]["scale"], eps)
    return hidden, new_suffix


def lm_logits(params: dict, cfg: TextConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project final hidden states to vocab logits (fp32).

    Tied embeddings contract directly against the (V, hidden) table — no
    622MB transpose materialized per decode step. Row-quantized tables
    (ops/quant.py) stream int8/int4 from HBM instead of bf16."""
    from ...ops.quant import is_quantized

    if cfg.tie_word_embeddings:
        return tied_head_logits(hidden, params["embed_tokens"]["embedding"])
    kernel = params["lm_head"]["kernel"]
    if is_quantized(kernel):
        from ...ops.quant import _unpack_q4

        q = kernel["q8"] if "q8" in kernel else _unpack_q4(kernel["q4"])
        y = jnp.einsum(
            "bsh,hv->bsv", hidden, q.astype(hidden.dtype), preferred_element_type=jnp.float32
        )
        return y * kernel["s"][0][None, None, :]
    return jnp.einsum("bsh,hv->bsv", hidden, kernel, preferred_element_type=jnp.float32)
