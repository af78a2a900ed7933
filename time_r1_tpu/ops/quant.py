"""Weight-only quantization for the HBM-bound decode path.

TPU decode at small batch is memory-bandwidth-bound: every step streams all
decoder weights from HBM once (3B bf16 ≈ 6.2 GB → ~7.5 ms/step floor on a
v5e's ~819 GB/s). Weight-only int8 halves the stream (int4 quarters it);
XLA fuses the int→bf16 convert into the dot's operand read, so HBM traffic
is the quantized size while the MXU still computes in bf16.

This matches the capability class of the reference's inference engine
(vLLM supports weight-only quantized serving; the repo's recipes run bf16 —
quantized decode is opt-in here too). GRPO rollouts may sample through the
quantized policy: the importance-weighted loss still recomputes logps in
bf16, and the reference's own rollouts (vLLM CUDA kernels) never bit-match
its DeepSpeed trainer forward either.

Representation: a plain dict {"q8": int8 (..., K, N), "s": f32 (..., 1, N)}
(or {"q4": packed-int8 (..., K/2, N), "s": ...}) so the quantized tree flows
through jit/scan/pjit/orbax like any pytree. Symmetric per-output-channel
scales; the embedding table is quantized per-row (one scale per token id)
so the same buffer serves both lookup and the tied lm_head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def is_quantized(w) -> bool:
    return isinstance(w, dict) and ("q8" in w or "q4" in w)


def quantize_weight(w: jnp.ndarray, bits: int = 8, contract_axis: int = -2) -> dict:
    """Symmetric per-output-channel quantization of a (..., K, N) matmul weight.

    contract_axis is the K axis; one f32 scale per output column N (and per
    leading/scan axis)."""
    assert bits in (8, 4), bits
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=contract_axis, keepdims=True)
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.maximum(amax, 1e-8) / qmax
    q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 8:
        return {"q8": q, "s": scale}
    # int4: two consecutive K rows per byte, OFFSET-8 UNSIGNED nibbles
    # (u = q + 8 ∈ [1, 15], low nibble = even row). The unsigned layout lets
    # the Pallas dequant-matmul (ops/int4_matmul.py) recover both planes with
    # 3 VPU ops (convert, mul, floor) and fold the -8 offset into a per-row
    # correction — no sign-extension select on the hot path.
    K = q.shape[contract_axis]
    assert K % 2 == 0, K
    u = (q + 8).astype(jnp.uint8)
    lo = jax.lax.slice_in_dim(u, 0, K, 2, axis=u.ndim + contract_axis)
    hi = jax.lax.slice_in_dim(u, 1, K, 2, axis=u.ndim + contract_axis)
    packed = lo | (hi << 4)
    return {"q4": packed.astype(jnp.uint8), "s": scale}


def _unpack_q4(packed: jnp.ndarray, contract_axis: int = -2) -> jnp.ndarray:
    """Inverse of the int4 packing: (..., K/2, N) uint8 → (..., K, N) int8
    (offset-8 unsigned nibbles → signed values)."""
    u = packed.astype(jnp.uint8)
    lo = (u & 0x0F).astype(jnp.int8) - 8
    hi = (u >> 4).astype(jnp.int8) - 8
    stacked = jnp.stack([lo, hi], axis=packed.ndim + contract_axis + 1)
    shape = list(packed.shape)
    shape[contract_axis] = shape[contract_axis] * 2
    return stacked.reshape(shape)


def dequantize_weight(w: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    q = w["q8"] if "q8" in w else _unpack_q4(w["q4"])
    return (q.astype(jnp.float32) * w["s"]).astype(dtype)


def qmatmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w for plain or quantized w. int8: the int→x.dtype convert fuses
    into the dot operand read (HBM streams the int8 bytes). int4: the Pallas
    dequant-matmul keeps the nibble unpack ON-CHIP (XLA materializes the
    unpacked tree in HBM — measured 76 ms/step in round 2)."""
    if not is_quantized(w):
        return x @ w
    if "q4" in w and w["q4"].ndim == 2 and jax.default_backend() == "tpu":
        from .int4_matmul import int4_matmul

        lead = x.shape[:-1]
        M = 1
        for d in lead:
            M *= d
        if M <= 256:  # decode-shape fast path (half the HBM stream of int8)
            y = int4_matmul(x.reshape(M, x.shape[-1]), w["q4"], w["s"])
            return y.reshape(*lead, -1)
    q = w["q8"] if "q8" in w else _unpack_q4(w["q4"])
    y = x @ q.astype(x.dtype)
    return y * w["s"].astype(x.dtype)


def embed_lookup(emb, ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Row lookup from a plain or row-quantized (V, H) embedding table."""
    if not is_quantized(emb):
        out = jnp.take(emb, ids, axis=0)
        return out if dtype is None else out.astype(dtype)
    # row-quantized: q (V, H) int8, s (V, 1)
    q = emb["q8"] if "q8" in emb else _unpack_q4(emb["q4"], contract_axis=-1)
    rows = jnp.take(q, ids, axis=0)
    scales = jnp.take(emb["s"], ids, axis=0)
    out = rows.astype(jnp.float32) * scales
    return out.astype(dtype if dtype is not None else jnp.bfloat16)


def quantize_embedding(emb: jnp.ndarray, bits: int = 8) -> dict:
    """Per-row quantization of the (V, H) embedding (H is the tied-lm-head
    contract axis, so per-row == per-output-channel for the head too)."""
    if bits == 8:
        return quantize_weight(emb, bits=8, contract_axis=-1)
    ef = emb.astype(jnp.float32)
    amax = jnp.max(jnp.abs(ef), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(ef / scale), -7, 7).astype(jnp.int8)
    u = (q + 8).astype(jnp.uint8)  # offset-8 unsigned nibbles (see quantize_weight)
    lo = u[:, 0::2]
    hi = u[:, 1::2]
    packed = lo | (hi << 4)
    return {"q4": packed.astype(jnp.uint8), "s": scale, "_row4": jnp.ones((), jnp.int8)}


def tied_head_logits(hidden: jnp.ndarray, emb) -> jnp.ndarray:
    """logits = hidden @ emb.T (fp32 out) for plain or row-quantized emb."""
    if not is_quantized(emb):
        return jnp.einsum("bsh,vh->bsv", hidden, emb, preferred_element_type=jnp.float32)
    q = emb["q8"] if "q8" in emb else _unpack_q4(emb["q4"], contract_axis=-1)
    y = jnp.einsum("bsh,vh->bsv", hidden, q.astype(hidden.dtype), preferred_element_type=jnp.float32)
    return y * emb["s"][:, 0][None, None, :]


_TEXT_MATMUL_KEYS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")


def lora_delta(h: jnp.ndarray, sl, scaling: float) -> jnp.ndarray:
    """scaling·(h@A)@B — the LoRA SIDE product for one adapter slice.

    Exact same math as multiplying h by the merged W + scaling·A@B (matmul
    distributivity), but the base weight is untouched: rollout decode can run
    LoRA-adapted sampling over a shared (possibly int8) base tree with zero
    per-step weight sync and zero duplicate weights in HBM — the rank-r
    factors stream ~2·hid·r bytes per projection (rank 16 at 7B: ~0.2% of
    the weight bytes). This is how multi-adapter LoRA serving works (the
    S-LoRA/punica design), applied here to GRPO rollouts."""
    a = sl["lora_a"].astype(h.dtype)
    b = sl["lora_b"].astype(h.dtype)
    return ((h @ a) @ b) * jnp.asarray(scaling, h.dtype)


def _side(y, h, name, lora):
    """y + the side delta for `name`, if an adapter slice exists for it."""
    if lora is None:
        return y
    sl = lora[0].get(name) if isinstance(lora[0], dict) else None
    if sl is None:
        return y
    return y + lora_delta(h, sl, lora[1])


def grouped_side_delta(h: jnp.ndarray, sl: dict, scaling: float) -> jnp.ndarray:
    """scaling·(h@A_cat)@B_bd — ONE side product for a whole projection group
    (q/k/v or gate/up share the same input h).

    A_cat column-concatenates the group's A factors; B_bd is their
    BLOCK-DIAGONAL embedding, so the product is exactly
    concat(h@A_q@B_q, h@A_k@B_k, h@A_v@B_v) along the output axis — 2 device
    ops per group per layer instead of 2 per projection. At decode batch
    sizes the per-projection side matmuls are dispatch-bound (392 skinny ops
    per 7B step, measured ~2 ms/step of the rollout tax — docs/ROADMAP.md
    round 5); the zero blocks of B_bd cost only FLOPs/bytes that are noise
    at rank 16 (built once per weight sync, group_side_adapters)."""
    a = sl["a_cat"].astype(h.dtype)
    b = sl["b_bd"].astype(h.dtype)
    return ((h @ a) @ b) * jnp.asarray(scaling, h.dtype)


def _block_diag_stacked(bs: list) -> jnp.ndarray:
    """[(L, r_i, d_i)] → (L, Σr, Σd) with each input on the diagonal."""
    L = bs[0].shape[0]
    rs = [b.shape[1] for b in bs]
    ds = [b.shape[2] for b in bs]
    out = jnp.zeros((L, sum(rs), sum(ds)), bs[0].dtype)
    r0 = d0 = 0
    for b, r, d in zip(bs, rs, ds):
        out = jax.lax.dynamic_update_slice(out, b, (0, r0, d0))
        r0 += r
        d0 += d
    return out


_SIDE_GROUPS = {
    "self_attn": ("qkv_side", ("q_w", "k_w", "v_w")),
    "mlp": ("gu_side", ("gate_w", "up_w")),
}


def group_side_adapters(tree: dict, dtype=None) -> dict:
    """Rewrite a stacked decoder-adapter tree (rl/lora.lora_layers_tree form)
    into the GROUPED side-path layout: q/k/v collapse to one
    {"a_cat", "b_bd"} entry ("qkv_side"), gate/up to "gu_side"; o_w/down_w
    (their own inputs) stay per-projection. Applied by Engine.set_lora_side
    at weight sync — tiny tensors, one concat + zero-scatter per group.

    dtype: pre-cast the factors (the decode path casts to the activation
    dtype per step anyway; pre-casting to the engine dtype halves the
    per-step stream bytes with identical math)."""
    out = {}
    for mod, sub in tree.items():
        grouped = dict(sub)
        spec = _SIDE_GROUPS.get(mod)
        if spec is not None:
            gname, comps = spec
            if all(c in grouped and "lora_a" in grouped[c] for c in comps):
                a_cat = jnp.concatenate(
                    [grouped.pop(c)["lora_a"] for c in comps], axis=-1
                )
                # NB: comps were popped above from `grouped`, read from `sub`
                b_bd = _block_diag_stacked([sub[c]["lora_b"] for c in comps])
                if dtype is not None:
                    a_cat = a_cat.astype(dtype)
                    b_bd = b_bd.astype(dtype)
                grouped[gname] = {"a_cat": a_cat, "b_bd": b_bd}
        out[mod] = grouped
    return out


def attn_qkv_proj(
    h: jnp.ndarray, attn: dict, nh: int, nkv: int, hd: int, lora=None
):
    """q/k/v projections from fused ("qkv") or separate layer params.
    h: (B, S, hid) → ((B,S,nh,hd), (B,S,nkv,hd), (B,S,nkv,hd)).

    lora=(slice, scaling): UNMERGED side-path adapters (q_w/k_w/v_w keys of
    one layer's adapter slice) — see lora_delta. Works with either base
    layout because the deltas are computed from h, not from the base.

    Outputs carry the checkpoint_name "qkv_proj" so the selective remat
    policies (language._layer_remat) can save them as backward residuals —
    a no-op identity outside jax.checkpoint."""
    from jax.ad_checkpoint import checkpoint_name

    B, S = h.shape[:2]
    grouped = (
        lora[0].get("qkv_side")
        if lora is not None and isinstance(lora[0], dict)
        else None
    )
    if "qkv" in attn:
        qkv = qmatmul(h, attn["qkv"]) + attn["qkv_b"]
        if grouped is not None:
            # ONE grouped side product on the still-fused projection
            qkv = qkv + grouped_side_delta(h, grouped, lora[1])
        qkv = checkpoint_name(qkv, "qkv_proj")
        q, k, v = jnp.split(qkv, [nh * hd, nh * hd + nkv * hd], axis=-1)
    else:
        q = checkpoint_name(qmatmul(h, attn["q_w"]) + attn["q_b"], "qkv_proj")
        k = checkpoint_name(qmatmul(h, attn["k_w"]) + attn["k_b"], "qkv_proj")
        v = checkpoint_name(qmatmul(h, attn["v_w"]) + attn["v_b"], "qkv_proj")
        if grouped is not None:
            d = grouped_side_delta(h, grouped, lora[1])
            dq, dk, dv = jnp.split(d, [nh * hd, nh * hd + nkv * hd], axis=-1)
            q, k, v = q + dq, k + dk, v + dv
    if grouped is None:
        q = _side(q, h, "q_w", lora)
        k = _side(k, h, "k_w", lora)
        v = _side(v, h, "v_w", lora)
    return (
        q.reshape(B, S, nh, hd),
        k.reshape(B, S, nkv, hd),
        v.reshape(B, S, nkv, hd),
    )


def mlp_proj(h: jnp.ndarray, mlp: dict, lora=None) -> jnp.ndarray:
    """SwiGLU MLP from fused ("gu") or separate layer params.

    lora=(slice, scaling): UNMERGED side-path adapters (gate_w/up_w/down_w
    keys) — the gate/up deltas add BEFORE the silu nonlinearity, exactly
    where the merged weights would put them (see lora_delta).

    Small-batch (decode) calls with the fused-int8 layout run the single
    Pallas kernel (ops/fused_mlp.py) that streams gate/up/down once and
    never writes the (B, inter) intermediates to HBM."""
    import os

    import jax as _jax

    # opt-in: measured SLOWER in-model than the XLA path on v5e (7.1 vs
    # 5.3 ms/step full-decode) — XLA's weight-stream pipelining wins for
    # these shapes; kept for layout/block-size tuning (docs/ROADMAP.md)
    if (
        lora is None
        and "gu" in mlp
        and h.ndim == 3
        and h.shape[0] * h.shape[1] <= 128
        and _jax.default_backend() == "tpu"
        and os.environ.get("TIMER1_FUSED_MLP", "0") == "1"
    ):
        from .fused_mlp import fused_mlp_eligible, fused_mlp_int8

        if fused_mlp_eligible(mlp, h.shape[-1]):
            B, S, hid = h.shape
            out = fused_mlp_int8(
                h.reshape(B * S, hid),
                mlp["gu"]["q8"],
                mlp["gu"]["s"],
                mlp["down_w"]["q8"],
                mlp["down_w"]["s"],
            )
            return out.reshape(B, S, hid)
    from jax.ad_checkpoint import checkpoint_name

    grouped = (
        lora[0].get("gu_side")
        if lora is not None and isinstance(lora[0], dict)
        else None
    )
    if "gu" in mlp:
        gu = qmatmul(h, mlp["gu"])
        if grouped is not None:
            gu = gu + grouped_side_delta(h, grouped, lora[1])
        gu = checkpoint_name(gu, "mlp_gu")
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = checkpoint_name(qmatmul(h, mlp["gate_w"]), "mlp_gu")
        up = checkpoint_name(qmatmul(h, mlp["up_w"]), "mlp_gu")
        if grouped is not None:
            d = grouped_side_delta(h, grouped, lora[1])
            dg, du = jnp.split(d, 2, axis=-1)
            gate, up = gate + dg, up + du
    if grouped is None:
        gate = _side(gate, h, "gate_w", lora)
        up = _side(up, h, "up_w", lora)
    act = _jax.nn.silu(gate) * up
    return checkpoint_name(
        _side(qmatmul(act, mlp["down_w"]), act, "down_w", lora), "mlp_down"
    )


def quantize_text_params(text_params: dict, bits: int = 8, fuse: bool = True) -> dict:
    """Quantize the decode-path HBM heavyweights of a text param tree:
    attention/MLP matmuls (per-layer scales under the scan axis), the
    embedding table, and the lm head. Norm scales and qkv biases stay bf16
    (tiny). Idempotent on already-quantized trees.

    fuse=True (decode): the q/k/v and gate/up projections are FUSED along the
    output axis before quantization ("qkv"/"gu" entries): at decode batch
    sizes the per-layer matmuls are tiny, so fewer-but-wider dots cut fixed
    per-kernel cost (7 → 4 matmuls per layer). Per-output-channel scales make
    the fusion numerically identical to quantizing separately.

    fuse=False (training base): weights keep their q_w/k_w/... names so LoRA
    adapter paths still line up — the quantized-base LoRA train path
    (rl/lora.apply_layer_lora) dequant-merges one layer at a time inside the
    scan. This is what lets the 7B GRPO step fit ONE 16 GB chip: the int8
    base is ~8.3 GB where bf16 is 15.5 GB."""
    out = dict(text_params)
    layers = dict(text_params["layers"])
    attn = dict(layers["self_attn"])
    mlp = dict(layers["mlp"])
    if not fuse:
        assert "qkv" not in attn and "gu" not in mlp, (
            "unfused quantization needs an unfused tree (got decode-fused params)"
        )
        for key in ("q_w", "k_w", "v_w", "o_w"):
            if not is_quantized(attn[key]):
                attn[key] = quantize_weight(attn[key], bits=bits)
        for key in ("gate_w", "up_w", "down_w"):
            if not is_quantized(mlp[key]):
                mlp[key] = quantize_weight(mlp[key], bits=bits)
    else:
        if "qkv" not in attn:
            qkv_w = jnp.concatenate(
                [attn.pop("q_w"), attn.pop("k_w"), attn.pop("v_w")], axis=-1
            )
            attn["qkv"] = quantize_weight(qkv_w, bits=bits)
            attn["qkv_b"] = jnp.concatenate(
                [attn.pop("q_b"), attn.pop("k_b"), attn.pop("v_b")], axis=-1
            )
        elif not is_quantized(attn["qkv"]):
            # already fused but bf16 (e.g. a dequantized+merged fused tree)
            attn["qkv"] = quantize_weight(attn["qkv"], bits=bits)
        if not is_quantized(attn["o_w"]):
            attn["o_w"] = quantize_weight(attn["o_w"], bits=bits)
        if "gu" not in mlp:
            gu_w = jnp.concatenate([mlp.pop("gate_w"), mlp.pop("up_w")], axis=-1)
            mlp["gu"] = quantize_weight(gu_w, bits=bits)
        elif not is_quantized(mlp["gu"]):
            mlp["gu"] = quantize_weight(mlp["gu"], bits=bits)
        if not is_quantized(mlp["down_w"]):
            mlp["down_w"] = quantize_weight(mlp["down_w"], bits=bits)
    layers["self_attn"] = attn
    layers["mlp"] = mlp
    out["layers"] = layers
    # embedding + lm_head stay int8 even at bits=4: the row-lookup and the
    # (V, hidden) head dot have no int4 kernel layout, and the XLA unpack
    # path would dominate the step (docs/ROADMAP.md int4 notes)
    emb = text_params["embed_tokens"]["embedding"]
    if not is_quantized(emb):
        out["embed_tokens"] = {"embedding": quantize_embedding(emb, bits=8)}
    if "lm_head" in text_params and not is_quantized(text_params["lm_head"]["kernel"]):
        out["lm_head"] = {"kernel": quantize_weight(text_params["lm_head"]["kernel"], bits=8)}
    return out


def quantize_params(params: dict, bits: int = 8, fuse: bool = True) -> dict:
    """Quantize a full {visual, text} tree for decode (fuse=True) or as a
    LoRA training base (fuse=False — see quantize_text_params). The vision
    tower runs once per prompt (prefill-side) and stays bf16 for accuracy."""
    return {
        "visual": params["visual"],
        "text": quantize_text_params(params["text"], bits=bits, fuse=fuse),
    }


@functools.partial(jax.jit, static_argnames=("bits",))
def quantize_params_jit(params: dict, bits: int = 8) -> dict:
    """Jit-cached quantize — safe to call once per train step on live rollout
    weights (one read+write pass over the tree, no recompiles)."""
    return quantize_params(params, bits=bits)


# ---------------------------------------------------------------------------
# KV-cache quantization (decode phase): per (token, head) symmetric int8 over
# head_dim. Exactness trick: scores = q·(s·k8) = s·(q·k8) and
# out = p·(s·v8) = (p·s)·v8 — the scale folds into the score/probability
# axis, so the dequantized K/V never materialize in HBM.
# ---------------------------------------------------------------------------


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(…, hd) → ((…, hd) int8, (…,) f32 per-vector scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


@jax.jit
def quantize_kv_cache(cache):
    """Convert a bf16 KVCache (post-prefill) to the int8 decode form: one
    pass over the buffers; scales shaped (L, B, max_len, Hkv) f32."""
    k8, ks = quantize_kv(cache.k)
    v8, vs = quantize_kv(cache.v)
    return cache._replace(k=k8, v=v8, k_scale=ks, v_scale=vs)
