"""Pipeline parallelism (PP): GPipe-style microbatched decoder forward over a
`stage` mesh axis (SURVEY §2.3 — the reference exposes PP through vLLM's
--pipeline_parallel_size, vllm_infer.py:42-51, default 1 in every recipe).

TPU-native design: the stacked decoder layers (L, …) are split into
contiguous stage groups sharded over the `stage` axis with `shard_map`;
hidden states rotate stage→stage+1 with `jax.lax.ppermute` on the classic
GPipe schedule (tick t: stage s runs microbatch t−s). Every stage executes
the same program every tick (bubble ticks compute on garbage and are masked),
so the loop jits to one XLA program with ICI-neighbor transfers only.

Scope: the full-sequence (no-KV-cache) forward — the training / logp-recompute
hot path. Sampling PP would pipeline the KV cache too; the recipes never
enable PP, so parity only requires the capability + flag plumbing.
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


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())[:n_stages]
    return Mesh(np.array(devices), (STAGE_AXIS,))


def _stack_stages(layers: dict, n_stages: int) -> dict:
    """(L, …) stacked layer params → (n_stages, L/n_stages, …)."""

    def f(x):
        L = x.shape[0]
        assert L % n_stages == 0, (L, n_stages)
        return x.reshape(n_stages, L // n_stages, *x.shape[1:])

    return jax.tree.map(f, layers)


def _run_stage_layers(layers_stage, cfg: TextConfig, hidden, cos_b, sin_b, bias):
    """Run one stage's layer group on one microbatch (no cache)."""
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    B, S, _ = hidden.shape

    def layer(x, lp):
        h = _rms_norm(x, lp["input_layernorm"]["scale"], eps)
        q = (qmatmul(h, lp["self_attn"]["q_w"]) + lp["self_attn"]["q_b"]).reshape(B, S, nh, hd)
        k = (qmatmul(h, lp["self_attn"]["k_w"]) + lp["self_attn"]["k_b"]).reshape(B, S, nkv, hd)
        v = (qmatmul(h, lp["self_attn"]["v_w"]) + lp["self_attn"]["v_b"]).reshape(B, S, nkv, hd)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos_b + _rotate_half(qf) * sin_b).astype(x.dtype)
        k = (kf * cos_b + _rotate_half(kf) * sin_b).astype(x.dtype)
        attn = mha_reference(q, k, v, bias=bias)
        x = x + qmatmul(attn.reshape(B, S, nh * hd), lp["self_attn"]["o_w"])
        h = _rms_norm(x, lp["post_attention_layernorm"]["scale"], eps)
        x = x + qmatmul(
            jax.nn.silu(qmatmul(h, lp["mlp"]["gate_w"])) * qmatmul(h, lp["mlp"]["up_w"]),
            lp["mlp"]["down_w"],
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
            h_out = _run_stage_layers(layers_stage, cfg, h_my, cos_b, sin_b, bias)
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

    spec_layers = jax.tree.map(lambda _: P(STAGE_AXIS), staged)
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
