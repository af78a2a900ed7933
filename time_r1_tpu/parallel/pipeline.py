"""Pipeline parallelism (PP): GPipe-style microbatched decoder forward over a
`stage` mesh axis (SURVEY §2.3 — the reference exposes PP through vLLM's
--pipeline_parallel_size, vllm_infer.py:42-51, default 1 in every recipe).

TPU-native design: the stacked decoder layers (L, …) are split into
contiguous stage groups sharded over the `stage` axis with `shard_map`;
hidden states rotate stage→stage+1 with `jax.lax.ppermute` on the classic
GPipe schedule (tick t: stage s runs microbatch t−s). Every stage executes
the same program every tick (bubble ticks compute on garbage and are masked),
so the loop jits to one XLA program with ICI-neighbor transfers only.

Two entry points:

- `pp_decoder_layers` — full-sequence (no-KV-cache) forward on the GPipe
  microbatch schedule (training / logp-recompute shapes);
- `pp_generate` — GENERATION over the stage axis (vLLM --pipeline_parallel_size
  serving capability): each stage owns its layer group's KV cache; prefill and
  each decode step relay the hidden through the stages with ppermute, the last
  hidden wraps to stage 0 where logits/sampling happen, and the sampled token
  is rebroadcast with one psum. Every stage executes the same program every
  phase (inactive stages compute masked garbage) so the whole generation jits
  to ONE XLA program with ICI-neighbor transfers. Like vLLM, PP decode adds
  latency per token; it buys HBM capacity (each chip holds L/P layers + cache).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.qwen25vl.config import TextConfig
from ..models.qwen25vl.language import _rms_norm, _rotate_half, mrope_cos_sin
from ..ops.attention import NEG_INF, mha_reference
from ..ops.quant import qmatmul

STAGE_AXIS = "stage"
MODEL_AXIS = "model"  # TP axis inside each stage (TP×PP composition)


def make_pp_mesh(n_stages: int, tp: int = 1, devices=None) -> Mesh:
    """(stage, model) mesh: n_stages × tp devices. tp=1 → pure PP (the model
    axis is size 1; psums over it are identities XLA elides)."""
    devices = list(devices if devices is not None else jax.devices())[: n_stages * tp]
    return Mesh(np.array(devices).reshape(n_stages, tp), (STAGE_AXIS, MODEL_AXIS))


def _stage_tp_specs(staged: dict, tp: int, mesh: Mesh = None) -> dict:
    """PartitionSpec tree for the stacked (n_stages, Lp, …) layer params:
    stage on dim 0; when tp > 1, Megatron-style column/row splits over the
    model axis — q/k/v/gate/up COLUMN-split (output features), o/down
    ROW-split (input features). int8 leaves ({'q8','s'}) split q8 like the
    bf16 weight; the per-output-column scales split only for column-split
    weights."""
    col_w = ("q_w", "k_w", "v_w", "gate_w", "up_w")
    col_b = ("q_b", "k_b", "v_b")
    row_w = ("o_w", "down_w")

    def spec(path, x):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf = names[-1] if names else ""
        s = P(STAGE_AXIS)
        if tp > 1:
            wname = names[-2] if leaf in ("q8", "s", "q4") and len(names) >= 2 else leaf
            if leaf in col_b:
                s = P(STAGE_AXIS, None, MODEL_AXIS)
            elif wname in col_w:
                # per-output-column int8 scales follow the column split
                s = (
                    P(STAGE_AXIS, None, MODEL_AXIS)
                    if leaf == "s"
                    else P(STAGE_AXIS, None, None, MODEL_AXIS)
                )
            elif wname in row_w:
                # per-output scales: the output dim is NOT split
                s = P(STAGE_AXIS) if leaf == "s" else P(STAGE_AXIS, None, MODEL_AXIS, None)
        if mesh is not None:
            from jax.sharding import NamedSharding

            return NamedSharding(mesh, s)
        return s

    from jax.tree_util import tree_map_with_path

    return tree_map_with_path(spec, staged)


def _stack_stages(layers: dict, n_stages: int) -> dict:
    """(L, …) stacked layer params → (n_stages, L/n_stages, …)."""

    def f(x):
        L = x.shape[0]
        assert L % n_stages == 0, (L, n_stages)
        return x.reshape(n_stages, L // n_stages, *x.shape[1:])

    return jax.tree.map(f, layers)


def _run_stage_layers(layers_stage, cfg: TextConfig, hidden, cos_b, sin_b, bias, tp_axis=None):
    """Run one stage's layer group on one microbatch (no cache). tp_axis:
    Megatron TP inside the stage — local column/row weight slices, o-/down-
    proj partials psum over the axis (see _run_stage_layers_cached)."""
    nh, nkv = _local_heads(layers_stage, cfg)
    hd = cfg.head_dim
    eps = cfg.rms_norm_eps
    B, S, _ = hidden.shape

    def maybe_psum(x):
        return jax.lax.psum(x, tp_axis) if tp_axis is not None else x

    def layer(x, lp):
        h = _rms_norm(x, lp["input_layernorm"]["scale"], eps)
        q = (qmatmul(h, lp["self_attn"]["q_w"]) + lp["self_attn"]["q_b"]).reshape(B, S, nh, hd)
        k = (qmatmul(h, lp["self_attn"]["k_w"]) + lp["self_attn"]["k_b"]).reshape(B, S, nkv, hd)
        v = (qmatmul(h, lp["self_attn"]["v_w"]) + lp["self_attn"]["v_b"]).reshape(B, S, nkv, hd)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos_b + _rotate_half(qf) * sin_b).astype(x.dtype)
        k = (kf * cos_b + _rotate_half(kf) * sin_b).astype(x.dtype)
        attn = mha_reference(q, k, v, bias=bias)
        x = x + maybe_psum(qmatmul(attn.reshape(B, S, nh * hd), lp["self_attn"]["o_w"]))
        h = _rms_norm(x, lp["post_attention_layernorm"]["scale"], eps)
        x = x + maybe_psum(
            qmatmul(
                jax.nn.silu(qmatmul(h, lp["mlp"]["gate_w"])) * qmatmul(h, lp["mlp"]["up_w"]),
                lp["mlp"]["down_w"],
            )
        )
        return x, None

    hidden, _ = jax.lax.scan(layer, hidden, layers_stage)
    return hidden


def pp_decoder_layers(
    layers: dict,
    cfg: TextConfig,
    embeds: jnp.ndarray,  # (B, S, H) — embeddings (vision already merged)
    position_ids: jnp.ndarray,  # (3, B, S)
    attention_mask: jnp.ndarray,  # (B, S)
    mesh: Mesh,
    n_micro: int,
) -> jnp.ndarray:
    """All decoder layers, pipelined over mesh's `stage` axis. Returns hidden
    (B, S, H) BEFORE the final norm (caller applies norm + lm head).

    B must divide into n_micro microbatches; L into mesh.shape['stage']
    stage groups."""
    n_stages = mesh.shape[STAGE_AXIS]
    tp_axis = MODEL_AXIS if dict(mesh.shape).get(MODEL_AXIS, 1) > 1 else None
    B, S, H = embeds.shape
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    staged = _stack_stages(layers, n_stages)

    def stage_fn(staged_layers, embeds, position_ids, attention_mask):
        # staged_layers leaves: (1, L/stages, …) — this stage's group
        layers_stage = jax.tree.map(lambda x: x[0], staged_layers)
        sid = jax.lax.axis_index(STAGE_AXIS)
        T = n_micro + n_stages - 1

        # microbatch views (n_micro, mb, S, …)
        emb_mb = embeds.reshape(n_micro, mb, S, H)
        pos_mb = position_ids.reshape(3, n_micro, mb, S)
        mask_mb = attention_mask.reshape(n_micro, mb, S)

        def tick(t, carry):
            h_in, outputs = carry
            m = jnp.clip(t - sid, 0, n_micro - 1)
            active = (t - sid >= 0) & (t - sid < n_micro)
            # stage 0 reads the fresh microbatch; later stages use the
            # hidden received from their predecessor last tick
            feed = jax.lax.dynamic_index_in_dim(emb_mb, m, 0, keepdims=False)
            h_my = jnp.where(sid == 0, feed, h_in)
            pos = jax.lax.dynamic_index_in_dim(pos_mb, m, 1, keepdims=False)
            msk = jax.lax.dynamic_index_in_dim(mask_mb, m, 0, keepdims=False)
            cos, sin = mrope_cos_sin(cfg, pos)
            cos_b, sin_b = cos[:, :, None, :], sin[:, :, None, :]
            kv_pos = jnp.arange(S)[None, :]
            q_pos = jnp.arange(S)[:, None]
            bias = jnp.where(kv_pos <= q_pos, 0.0, NEG_INF).astype(jnp.float32)[None, None]
            bias = bias + jnp.where(msk > 0, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
            h_out = _run_stage_layers(layers_stage, cfg, h_my, cos_b, sin_b, bias, tp_axis)
            h_out = jnp.where(active, h_out, h_my)
            # last stage banks its finished microbatch
            m_done = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
            bank = (sid == n_stages - 1) & active
            cur = jax.lax.dynamic_index_in_dim(outputs, m_done, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(bank, h_out, cur), m_done, 0
            )
            # rotate hidden to the next stage (ring permute; the wraparound
            # edge feeds stage 0, which ignores it)
            h_next = jax.lax.ppermute(
                h_out, STAGE_AXIS, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return h_next, outputs

        h0 = jnp.zeros((mb, S, H), embeds.dtype)
        out0 = jnp.zeros((n_micro, mb, S, H), embeds.dtype)
        _, outputs = jax.lax.fori_loop(0, T, tick, (h0, out0))
        return outputs[None]  # (1, n_micro, mb, S, H) per stage

    spec_layers = _stage_tp_specs(staged, dict(mesh.shape).get(MODEL_AXIS, 1))
    fn = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(spec_layers, P(), P(), P()),
        out_specs=P(STAGE_AXIS),
        check_vma=False,
    )
    outputs = fn(staged, embeds, position_ids, attention_mask)
    # only the LAST stage's bank holds real results
    return outputs[-1].reshape(B, S, H)


# ---------------------------------------------------------------------------
# PP generation (vLLM --pipeline_parallel_size serving capability)
# ---------------------------------------------------------------------------


def _local_heads(layers_stage: dict, cfg: TextConfig) -> tuple[int, int]:
    """LOCAL (nh, nkv) from the (possibly TP-sliced) weight shapes. Fused
    quantized trees ('qkv' entry) are never TP-split → cfg head counts."""
    attn = layers_stage["self_attn"]
    if "qkv" in attn:
        return cfg.num_attention_heads, cfg.num_key_value_heads
    qw, kw = attn["q_w"], attn["k_w"]
    q_out = qw["q8"].shape[-1] if isinstance(qw, dict) else qw.shape[-1]
    k_out = kw["q8"].shape[-1] if isinstance(kw, dict) else kw.shape[-1]
    return q_out // cfg.head_dim, k_out // cfg.head_dim


def _run_stage_layers_cached(
    layers_stage, cfg: TextConfig, hidden, cos_b, sin_b, ck, cv, bias_old, bias_new,
    write_pos, tp_axis=None,
):
    """One stage's layer group over an S-token chunk WITH its per-layer KV
    caches. ck/cv: (Lp, B, max_len, nkv_loc, hd). Returns (hidden, ck, cv)
    with the chunk's KV written at [write_pos, write_pos+S).

    tp_axis: Megatron TP inside the stage — the layer weights are the LOCAL
    column/row slices (heads and MLP features split over `tp_axis`), the
    o-proj and down-proj partial sums psum over it. Head counts derive from
    the local weight shapes, not cfg."""
    from ..ops.quant import attn_qkv_proj, mlp_proj

    hd = cfg.head_dim
    eps = cfg.rms_norm_eps
    B, S, _ = hidden.shape
    nh, nkv = _local_heads(layers_stage, cfg)

    def maybe_psum(x):
        return jax.lax.psum(x, tp_axis) if tp_axis is not None else x

    def layer(x, scanned):
        lp, layer_k, layer_v = scanned
        h = _rms_norm(x, lp["input_layernorm"]["scale"], eps)
        q, k, v = attn_qkv_proj(h, lp["self_attn"], nh, nkv, hd)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos_b + _rotate_half(qf) * sin_b).astype(x.dtype)
        k = (kf * cos_b + _rotate_half(kf) * sin_b).astype(x.dtype)
        from ..ops.attention import mha_cached

        attn = mha_cached(
            q, layer_k.astype(q.dtype), layer_v.astype(q.dtype), k, v, bias_old, bias_new
        )
        x = x + maybe_psum(
            qmatmul(attn.reshape(B, S, nh * hd).astype(x.dtype), lp["self_attn"]["o_w"])
        )
        h = _rms_norm(x, lp["post_attention_layernorm"]["scale"], eps)
        x = x + maybe_psum(mlp_proj(h, lp["mlp"]))
        return x, (k, v)

    hidden, (ks, vs) = jax.lax.scan(layer, hidden, (layers_stage, ck, cv))
    ck = jax.lax.dynamic_update_slice(ck, ks.astype(ck.dtype), (0, 0, write_pos, 0, 0))
    cv = jax.lax.dynamic_update_slice(cv, vs.astype(cv.dtype), (0, 0, write_pos, 0, 0))
    return hidden, ck, cv


def pp_generate(
    staged: dict,  # layers stacked (n_stages, L/n_stages, …), stage-sharded
    other: dict,  # text params minus layers (embed/norm/head), replicated
    cfg,  # Qwen25VLConfig
    embeds: jnp.ndarray,  # (B, S, H) — embeddings, vision already merged
    pos_ids: jnp.ndarray,  # (3, B, S)
    mask: jnp.ndarray,  # (B, max_len) — 1 for prompt tokens AND decode slots
    start_pos: jnp.ndarray,  # (B,) rope position of the first generated token
    sp,  # SamplingParams (static)
    rng: jnp.ndarray,
    mesh: Mesh,
    max_len: int,
):
    """Generate sp.max_new_tokens over the `stage` axis. Returns (B, max_new)
    token ids (pad after stop). One jitted SPMD program: prefill relays the
    prompt chunk through the stages, each decode step relays the token hidden
    (n_stages ppermute hops), the final hidden wraps to stage 0 for
    logits/sampling, and the token rebroadcasts with one psum."""
    from ..models.qwen25vl.language import lm_logits
    from ..ops.quant import embed_lookup
    from ..sampler.engine import sample_tokens

    tcfg = cfg.text
    n_stages = mesh.shape[STAGE_AXIS]
    tp_axis = MODEL_AXIS if MODEL_AXIS in dict(mesh.shape) else None
    B, S, H = embeds.shape
    hd = tcfg.head_dim
    eps = tcfg.rms_norm_eps
    max_new = sp.max_new_tokens
    stop_ids_arr = np.array(sp.stop_token_ids, np.int32)

    def stage_fn(staged_layers, other, embeds, pos_ids, mask, start_pos, rng):
        layers_stage = jax.tree.map(lambda x: x[0], staged_layers)
        sid = jax.lax.axis_index(STAGE_AXIS)
        Lp = jax.tree.leaves(layers_stage)[0].shape[0]
        dtype = embeds.dtype
        # LOCAL kv head count: under TP×PP the k/v columns are model-sliced,
        # so each device caches only its own kv heads
        _, nkv_loc = _local_heads(layers_stage, tcfg)
        ck = jnp.zeros((Lp, B, max_len, nkv_loc, hd), dtype)
        cv = jnp.zeros((Lp, B, max_len, nkv_loc, hd), dtype)
        kv_pos = jnp.arange(max_len)[None, :]
        pad_bias = jnp.where(mask > 0, 0.0, NEG_INF).astype(jnp.float32)  # (B, max_len)
        stop_ids = jnp.asarray(stop_ids_arr)

        def relay(h0, ck, cv, cos_b, sin_b, bias_old, bias_new, write_pos):
            """Relay an S'-token chunk through all stages; stage p runs at
            phase p, inactive stages compute masked garbage. Returns stage 0's
            final hidden (wrapped around) + updated caches."""

            def phase(p, carry):
                h, ck_c, cv_c = carry
                h_out, ck2, cv2 = _run_stage_layers_cached(
                    layers_stage, tcfg, h, cos_b, sin_b, ck_c, cv_c,
                    bias_old, bias_new, write_pos, tp_axis=tp_axis,
                )
                active = sid == p
                ck_c = jnp.where(active, ck2, ck_c)
                cv_c = jnp.where(active, cv2, cv_c)
                h = jax.lax.ppermute(
                    jnp.where(active, h_out, h),
                    STAGE_AXIS,
                    [(i, (i + 1) % n_stages) for i in range(n_stages)],
                )
                return h, ck_c, cv_c

            return jax.lax.fori_loop(0, n_stages, phase, (h0, ck, cv))

        # ---- prefill: the whole prompt chunk, cache written at [0, S) ----
        cos, sin = mrope_cos_sin(tcfg, pos_ids)
        cos_b, sin_b = cos[:, :, None, :], sin[:, :, None, :]
        bias_old = jnp.full((1, 1, 1, max_len), NEG_INF, jnp.float32)  # empty prefix
        i_pos = jnp.arange(S)[:, None]
        j_pos = jnp.arange(S)[None, :]
        bias_new = jnp.where(j_pos <= i_pos, 0.0, NEG_INF).astype(jnp.float32)[None, None]
        bias_new = bias_new + pad_bias[:, :S][:, None, None, :]
        h, ck, cv = relay(embeds, ck, cv, cos_b, sin_b, bias_old, bias_new, 0)

        hidden = _rms_norm(h[:, -1:], other["norm"]["scale"], eps)
        logits = lm_logits(other, tcfg, hidden)[:, 0]
        rng, sub = jax.random.split(rng)
        first = sample_tokens(logits, sub, sp)
        first = jax.lax.psum(jnp.where(sid == 0, first, 0), STAGE_AXIS)
        tokens0 = jnp.full((B, max_new), cfg.pad_token_id, jnp.int32).at[:, 0].set(first)
        done0 = jnp.isin(first, stop_ids)
        # repetition-penalty bookkeeping (engine._run_decode_loop semantics);
        # counts update from the psum'ed token, so every stage stays in sync
        track_counts = sp.repetition_penalty != 1.0
        V = logits.shape[-1]
        counts0 = jnp.zeros((B, V if track_counts else 1), jnp.int32)
        if track_counts:
            counts0 = counts0.at[jnp.arange(B), first].add(1)

        # ---- decode: one relay per token ----
        def cond(state):
            step, *_ = state
            return (step < max_new) & ~jnp.all(state[4])

        def body(state):
            step, ck, cv, tokens, done, last, rng, counts = state
            # `last` is generated token step-1 (0-based) at rope position
            # start_pos + step - 1 (decode_loop's convention)
            pos = start_pos + step - 1
            pos3 = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
            cos, sin = mrope_cos_sin(tcfg, pos3)
            cos_b, sin_b = cos[:, :, None, :], sin[:, :, None, :]
            prefix_len = S + step - 1
            b_old = jnp.where(kv_pos < prefix_len, 0.0, NEG_INF).astype(jnp.float32)
            b_old = (b_old + pad_bias)[:, None, None, :]
            b_new = jnp.zeros((B, 1, 1, 1), jnp.float32)
            x = embed_lookup(
                other["embed_tokens"]["embedding"], last[:, None],
                dtype=other["norm"]["scale"].dtype,
            )
            h, ck, cv = relay(x, ck, cv, cos_b, sin_b, b_old, b_new, prefix_len)
            hidden = _rms_norm(h, other["norm"]["scale"], eps)
            logits = lm_logits(other, tcfg, hidden)[:, 0]
            rng, sub = jax.random.split(rng)
            nxt = sample_tokens(logits, sub, sp, counts if track_counts else None)
            nxt = jax.lax.psum(jnp.where(sid == 0, nxt, 0), STAGE_AXIS)
            nxt = jnp.where(done, cfg.pad_token_id, nxt)
            if track_counts:
                counts = counts.at[jnp.arange(B), nxt].add(jnp.where(done, 0, 1))
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step))
            done = done | jnp.isin(nxt, stop_ids)
            return step + 1, ck, cv, tokens, done, nxt, rng, counts

        state = (jnp.ones((), jnp.int32), ck, cv, tokens0, done0, first, rng, counts0)
        state = jax.lax.while_loop(cond, body, state)
        return state[3][None]  # (1, B, max_new), identical on every stage

    tp = dict(mesh.shape).get(MODEL_AXIS, 1)
    spec_layers = _stage_tp_specs(staged, tp)
    fn = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(spec_layers, P(), P(), P(), P(), P(), P()),
        out_specs=P(STAGE_AXIS),
        check_vma=False,
    )
    out = fn(staged, other, embeds, pos_ids, mask, start_pos, rng)
    return out[0]


class PPEngine:
    """Generation over a pure-stage mesh (vLLM PP serving capability: each
    chip holds L/n_stages DECODER layers + their KV cache — the decoder is
    ~85% of the weights, so PP=4 cuts per-chip layer HBM 4×). The embedding,
    final norm, lm head and the vision tower stay replicated (stage-sharding
    the ViT is future work). Request semantics match sampler.Engine.generate;
    G-way groups expand to G rows (no shared-prefix cache trick across
    stages)."""

    def __init__(
        self, params, cfg, n_stages: int, dtype=jnp.bfloat16, devices=None, tp: int = 1,
        quantization: str = "",
    ):
        import functools

        from jax.sharding import NamedSharding

        from ..sampler.engine import Engine

        assert cfg.text.num_hidden_layers % n_stages == 0, (
            cfg.text.num_hidden_layers, n_stages,
        )
        if quantization:
            if tp > 1:
                raise ValueError(
                    "TP×PP with --quantization is unsupported: the quantized "
                    "decode tree fuses qkv/gate-up columns, which cannot be "
                    "contiguously column-split over the model axis"
                )
            from ..ops.quant import quantize_params

            params = quantize_params(params, bits=4 if quantization == "int4" else 8)
        if tp > 1:
            # Megatron TP inside each stage: contiguous head splits keep each
            # GQA group on one device iff tp divides the kv head count
            assert cfg.text.num_key_value_heads % tp == 0, (
                cfg.text.num_key_value_heads, tp,
            )
            assert cfg.text.num_attention_heads % tp == 0
        self.mesh = make_pp_mesh(n_stages, tp, devices)
        self.cfg = cfg
        self.dtype = dtype
        # decoder layers: ONE (stage, model)-sharded resident copy
        staged = _stack_stages(params["text"]["layers"], n_stages)
        self.staged = jax.device_put(staged, _stage_tp_specs(staged, tp, mesh=self.mesh))
        rep = NamedSharding(self.mesh, P())
        self.rest = jax.device_put(
            {
                "visual": params["visual"],
                "text": {k: v for k, v in params["text"].items() if k != "layers"},
            },
            rep,
        )
        self._packer = Engine(self.rest, cfg, dtype)  # _pack/vision never touch layers
        self.params = self.rest

        @functools.partial(jax.jit, static_argnames=("sp", "max_len"))
        def _gen(staged, other, embeds, pos_ids, mask, start_pos, sp, rng, max_len):
            return pp_generate(
                staged, other, cfg, embeds, pos_ids, mask, start_pos, sp, rng,
                self.mesh, max_len,
            )

        self._gen = _gen

    def generate(self, requests, sp) -> list[list[int]]:
        from ..models.qwen25vl.model import merge_vision_embeddings
        from ..ops.quant import embed_lookup
        from ..sampler.engine import compute_vision_features

        G = sp.num_return_sequences
        reqs = [r for r in requests for _ in range(G)]
        ids, mask, pos_ids, start_pos, vis, S, max_len = self._packer._pack(
            reqs, extra_len=sp.max_new_tokens
        )
        embeds = embed_lookup(
            self.params["text"]["embed_tokens"]["embedding"], jnp.asarray(ids),
            dtype=self.dtype,
        )
        if vis is not None:
            feats = compute_vision_features(self.params, self.cfg, vis)
            embeds = merge_vision_embeddings(
                embeds, jnp.asarray(ids), feats,
                (self.cfg.video_token_id, self.cfg.image_token_id),
            )
        rng = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        tokens = self._gen(
            self.staged, self.params["text"], embeds, jnp.asarray(pos_ids),
            jnp.asarray(mask), jnp.asarray(start_pos), sp, rng, max_len,
        )
        return self._packer._postprocess(np.asarray(tokens), len(reqs), sp)
