"""Driver benchmark suite — the BASELINE.json metric triplet, measured on one
TPU chip: GRPO rollout+train tokens/sec/chip (3B today, 7B decode included;
real 7B training is a v5p-16 deployment — see scripts/lower_7b.py), and video
preproc frames/sec. R1@0.5 parity is accuracy, driven by cli/parity.py the day
real checkpoints exist.

Prints MULTIPLE json lines {"metric", "value", "unit", "vs_baseline"}, the
headline (3B int8 rollout decode, the series tracked since round 1) LAST.
Sections run in their own subprocesses so each starts with the whole HBM and
one section's failure cannot block the others. Side measurements (prefill,
engine end-to-end, per-phase splits) go to stderr.

Baselines (`vs_baseline`): the reference publishes NO throughput numbers
(BASELINE.md) —
- decode 3B: A100_VLLM_3B_DECODE_TOKS_PER_S, a conservative public ballpark
  for vLLM 0.8.x Qwen2.5-VL-3B batched decode on one A100 at this batch size.
- decode 7B: the 3B ballpark scaled by the decode weight-stream ratio
  (decode at bs=8 is HBM-bound; 7B streams ~2.2× the 3B decoder bytes).
- train step: a derived A100 estimate (documented at the constant) — rollout
  at the vLLM ballpark + full-row torch fwd/bwd at 40% MFU + update.
- video preproc: MEASURED on this host — the same decode feeding the
  reference's torch bicubic-antialias resize + torch CLIP patchify
  (vision_process.py's stack, minus decord which cannot run here).

Shapes mirror the reference's hot loop #1 (timer1_trainer.py:568-607): G=8
grouped rollouts from a ~1.8k-token video prompt (1568 video tokens + text,
the recipes' 3584·28² pixel budget), ~200-token completions.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

A100_VLLM_3B_DECODE_TOKS_PER_S = 700.0
# 7B decode at bs=8 is weight-stream-bound like 3B; scale the 3B ballpark by
# the decoder bytes ratio (3B text ≈ 3.1 GB bf16 vs 7B text ≈ 6.9 GB → ×0.45)
A100_VLLM_7B_DECODE_TOKS_PER_S = 320.0
# Derived A100 3B GRPO step estimate (per chip, LoRA, G=8×200-token rollouts
# from a 1.8k-token video prompt): vLLM rollout 1600 tokens at the 700 tok/s
# ballpark ≈ 2.3 s + prefill/vision ≈ 0.4 s; torch full-row fwd+bwd over
# 8×(1792+200) tokens at 3B ≈ 2.9e14 FLOPs → ≈ 2.3 s at 40% MFU of 312
# TFLOPs bf16; rewards+update ≈ 0.2 s → ≈ 5.2 s / 1600 completion tokens.
A100_GRPO_3B_E2E_STEP_TOKS_PER_S = 310.0
# Derived A100 3B engine END-TO-END rollout estimate (prefill+vision+decode
# for one G=8 group): 1600 tokens / (decode 1600/700 ≈ 2.3 s + prefill/vision
# ≈ 0.4 s) ≈ 590 tok/s. Companion to the decode-only ballpark above.
A100_VLLM_3B_E2E_TOKS_PER_S = 590.0
# Derived A100 7B GRPO e2e step estimate (per chip, LoRA, G=8×200-token
# rollouts from the 1.8k-token video prompt): vLLM 7B rollout 1600 tokens at
# the 320 tok/s ballpark ≈ 5.0 s + prefill/vision ≈ 0.5 s + the train phase
# ≈ 7.2 s (see A100_GRPO_7B_TRAIN_PHASE_TOKS_PER_S) + rewards/update ≈ 0.2 s
# → ≈ 12.9 s / 1600 completion tokens.
A100_GRPO_7B_E2E_STEP_TOKS_PER_S = 125.0
# Derived A100 7B GRPO TRAIN-PHASE estimate (everything after the rollout:
# frozen-ViT forward + ref logps + LoRA fwd/bwd + adamw, per chip, G=8×200
# completion tokens over a 1992-token full row). torch full-row layout:
# policy fwd 2·6.5e9·(8·1992) ≈ 2.25e14 FLOPs; LoRA bwd under gradient
# checkpointing ≈ recompute (1 fwd) + dL/dx chain (≈1 fwd of matmuls) → 3×
# fwd; ref forward (beta=0.04, adapter-disable trick) +1 fwd → ≈ 9.0e14
# FLOPs at 40% MFU of 312 TFLOPs bf16 ≈ 7.2 s → 1600/7.2 ≈ 220 tok/s.
A100_GRPO_7B_TRAIN_PHASE_TOKS_PER_S = 220.0

def _timed_steps(trainer, examples, gen_tokens, n=3):
    """Best-of-n PIPELINED train steps exactly as trainer.train() runs them:
    batch k+1's host preproc (video decode+resize+tokenize) overlaps step
    k's device work on a prefetch thread. Returns (best_seconds,
    completion_tokens_of_best). Joins the in-flight prepare_requests before
    returning — it can't be cancelled and would otherwise steal the single
    host core from whatever runs next (a sync-timed step, the next P)."""
    from concurrent.futures import ThreadPoolExecutor

    import jax

    best = float("inf")
    toks = 0
    pool = ThreadPoolExecutor(max_workers=1)
    fut = pool.submit(trainer.prepare_requests, [dict(e) for e in examples])
    for _ in range(n):
        t0 = time.perf_counter()
        reqs = fut.result()
        fut = pool.submit(trainer.prepare_requests, [dict(e) for e in examples])
        trainer.step_batch([dict(e) for e in examples], requests=reqs)
        jax.block_until_ready(jax.tree.leaves(trainer.lora)[0])
        dt = time.perf_counter() - t0
        if dt < best:
            best, toks = dt, gen_tokens["n"]
    fut.result()
    pool.shutdown(wait=False, cancel_futures=True)
    return best, toks


BATCH = 8  # G in the GRPO recipes
PROMPT_TEXT_TOKENS = 224  # total prompt = 224-2+1568+2 = 1792 (14×128, flash-aligned)
VIDEO_GRID = (8, 28, 28)  # 6272 patches → 1568 video tokens (3584·28² budget)
DECODE_STEPS = 128
REF_VIDEO = "/root/reference/assets/OHOFG.mp4"

# Chip peaks (TPU v5e / "v5 lite"): utilization lines are measured-time /
# analytic bytes-or-FLOPs against these, so the driver can judge efficiency
# per round instead of reading prose estimates in docs/ROADMAP.md.
V5E_PEAK_HBM_BPS = 819e9
V5E_PEAK_BF16_FLOPS = 197e12


def _emit(metric: str, value: float, unit: str, vs_baseline: float):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 4),
                "unit": unit,
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


def _tree_bytes(tree) -> int:
    import jax

    return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree))


def _decoder_matmul_params(params) -> int:
    """Element count of the stacked decoder matmuls (the 2·N·D FLOPs term).
    Quantized {q8, s} leaves count the q8 elements (the s scales are not
    contraction operands). Norm scales/biases are counted too — noise."""
    import jax

    n = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(
        params["text"]["layers"]
    )[0]:
        keys = [getattr(p, "key", None) for p in path]
        if "s" in keys:
            continue  # quantization scales
        n += leaf.size
    return n


def _head_params(cfg) -> int:
    return cfg.text.hidden_size * cfg.text.vocab_size


def _setup_jax():
    import jax

    # persistent compilation cache: the driver re-runs bench every round on
    # the same machine; first-round compiles (~minutes through the TPU
    # tunnel) are amortized away afterwards
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _sync(x):
    # timing syncs use a host transfer — jax.block_until_ready has been
    # observed to return before remote completion on the tunneled TPU backend
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _build_prompt(cfg, rng):
    """One recipe-shaped video prompt row + raw patches."""
    t, h, w = VIDEO_GRID
    n_patches = t * h * w
    n_vis = n_patches // 4
    row = np.concatenate(
        [
            rng.integers(2, 100000, PROMPT_TEXT_TOKENS - 2),
            [cfg.vision_start_token_id],
            np.full(n_vis, cfg.video_token_id, np.int64),
            [cfg.vision_end_token_id],
        ]
    )
    patches = rng.normal(size=(n_patches, cfg.vision.patch_input_dim)).astype(np.float32)
    return row, patches


def _decode_bench(cfg, params, quant_kv: bool, tag: str, emit_util: bool = False):
    """Prefill 1×S (shared by G rows) + 128-step shared-prefix decode on the
    given (possibly weight-quantized) params. Returns decode tokens/s.

    emit_util: also print parsed utilization lines —
    - decode_hbm_utilization_<tag>: (text weight stream + shared prefix KV +
      avg per-row suffix KV) bytes per step / measured step time, as a
      fraction of the 819 GB/s v5e PEAK. Decode at this batch is
      stream-bound, so this is the tracked efficiency series. NB it is a
      stricter ratio than ROADMAP §10's "94% of the stream floor": §10
      divides the matmul-stream PHASE (~3.6 of 4.96 ms) by the ~770 GB/s
      achievable rate, while this line divides the whole step (incl.
      attention math, sampling, elementwise) by the nameplate peak — the
      same 3B int8 step scores ~0.75 here and ~94%-of-floor there.
    - prefill_mfu_<tag>: analytic matmul FLOPs (decoder 2·N·S + ViT 2·Nv·P)
      / measured prefill time vs the 197 TF/s bf16 peak."""
    import functools

    import jax
    import jax.numpy as jnp

    from time_r1_tpu.models.qwen25vl import (
        KVCache,
        VisionInputs,
        forward,
        forward_shared_decode,
        get_rope_index,
        prepare_vision_inputs,
        suffix_cache_zeros,
    )
    from time_r1_tpu.ops.quant import quantize_kv_cache
    from time_r1_tpu.sampler.engine import sample_tokens
    from time_r1_tpu.sampler.params import SamplingParams

    rng = np.random.default_rng(0)
    row, patches = _build_prompt(cfg, rng)
    S = row.shape[0]
    sp = SamplingParams(temperature=1.0, max_new_tokens=DECODE_STEPS)

    ids1 = row[None, :]
    mask1 = np.ones((1, S), np.int64)
    pos_ids1, _ = get_rope_index(
        cfg,
        ids1,
        video_grid_thw=np.array([VIDEO_GRID]),
        second_per_grid_ts=[1.0],
        attention_mask=mask1,
    )
    start_pos = jnp.asarray(pos_ids1.max(axis=(0, 2)) + 1)  # (1,)
    prep1 = prepare_vision_inputs([VIDEO_GRID], cfg.vision)
    mask1j = jnp.asarray(mask1)

    @jax.jit
    def prefill(params, ids, pos_ids, vis):
        # one row per UNIQUE prompt, prompt-length cache only (the shared
        # prefix never grows); flash_q_offset=0 rides the Pallas flash kernel
        cache = KVCache.zeros(cfg.text, 1, S, dtype=jnp.bfloat16)
        logits, cache = forward(
            params, cfg, ids, pos_ids, attention_mask=mask1j, vision=vis, cache=cache,
            flash_q_offset=0,
        )
        first = sample_tokens(logits[:, -1], jax.random.PRNGKey(1), sp)
        return cache, first

    start_pos_g = jnp.broadcast_to(start_pos[:1], (BATCH,))
    prefix_bias = jnp.zeros((1, S), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("steps",))
    def decode(params, prefix, suffix, last, steps: int):
        def body(i, carry):
            suffix, last, rng = carry
            pos = start_pos_g + suffix.length
            pos3 = jnp.broadcast_to(pos[None, :, None], (3, BATCH, 1))
            logits, suffix = forward_shared_decode(
                params, cfg, last[:, None], pos3, prefix, suffix, prefix_bias
            )
            rng, sub = jax.random.split(rng)
            nxt = sample_tokens(logits[:, -1], sub, sp)
            return suffix, nxt, rng

        suffix, last, _ = jax.lax.fori_loop(
            0, steps, body, (suffix, last, jax.random.PRNGKey(2))
        )
        return suffix, last

    def make_prefix(cache):
        return quantize_kv_cache(cache) if quant_kv else cache

    vis1 = VisionInputs.build(prep1, jnp.asarray(patches, jnp.bfloat16))
    ids1j, pos1j = jnp.asarray(ids1), jnp.asarray(pos_ids1)
    cache, first = prefill(params, ids1j, pos1j, vis1)
    _sync(first)
    t0 = time.perf_counter()
    cache2, f2 = prefill(params, ids1j, pos1j, vis1)
    _sync(f2)
    prefill_time = time.perf_counter() - t0
    del cache2

    suffix0 = suffix_cache_zeros(cfg.text, BATCH, DECODE_STEPS, quant=quant_kv)
    prefix = make_prefix(cache)
    first_g = jnp.broadcast_to(first, (BATCH,))
    s3, l3 = decode(params, prefix, suffix0, first_g, DECODE_STEPS)  # compile
    _sync(l3)
    del s3
    # steady-state throughput: best of 3 timed runs (each from a fresh
    # prefilled cache; host jitter through the TPU tunnel is the noise)
    decode_time = float("inf")
    for _ in range(3):
        cache, first = prefill(params, ids1j, pos1j, vis1)
        prefix = make_prefix(cache)
        first_g = jnp.broadcast_to(first, (BATCH,))
        # timing must not absorb the async prefill OR the cache quantize
        _sync(first)
        _sync((prefix.k_scale if quant_kv else prefix.k)[0, 0, 0])
        t0 = time.perf_counter()
        s4, l4 = decode(params, prefix, suffix0, first_g, DECODE_STEPS)
        _sync(l4)  # host transfer — forces real completion
        decode_time = min(decode_time, time.perf_counter() - t0)
        del s4, cache, prefix

    n_vis = (VIDEO_GRID[0] * VIDEO_GRID[1] * VIDEO_GRID[2]) // 4
    print(
        f"[bench:{tag}] prefill(1x{S} tokens incl. {n_vis} video, shared by G={BATCH}) "
        f"= {prefill_time*1e3:.0f} ms; decode {DECODE_STEPS} steps = {decode_time*1e3:.0f} ms "
        f"({decode_time/DECODE_STEPS*1e3:.2f} ms/step)",
        file=sys.stderr,
    )
    if emit_util:
        text = params["text"]
        wbytes = _tree_bytes(text)
        if not cfg.text.tie_word_embeddings:
            # untied head: the embed table is row-looked-up, not streamed
            wbytes -= _tree_bytes(text["embed_tokens"])
        kv_item = 1 if quant_kv else 2
        L, hkv, hd = (
            cfg.text.num_hidden_layers,
            cfg.text.num_key_value_heads,
            cfg.text.head_dim,
        )
        prefix_bytes = L * 1 * S * hkv * hd * 2 * kv_item
        if quant_kv:
            prefix_bytes += L * 1 * S * hkv * 2 * 4  # f32 scales
        # per-row suffix averages half-filled over the 128 timed steps
        suffix_bytes = L * BATCH * (DECODE_STEPS // 2) * hkv * hd * 2 * kv_item
        if quant_kv:
            suffix_bytes += L * BATCH * (DECODE_STEPS // 2) * hkv * 2 * 4
        step_s = decode_time / DECODE_STEPS
        hbm_util = (wbytes + prefix_bytes + suffix_bytes) / step_s / V5E_PEAK_HBM_BPS
        mtag = tag.replace("-", "_")
        _emit(f"decode_hbm_utilization_{mtag}", hbm_util, "fraction_of_hbm_peak", hbm_util)

        n_dec = _decoder_matmul_params(params)
        n_vit = sum(l.size for l in jax.tree.leaves(params["visual"]))
        flops = 2 * n_dec * S + 2 * n_vit * (VIDEO_GRID[0] * VIDEO_GRID[1] * VIDEO_GRID[2])
        mfu = flops / prefill_time / V5E_PEAK_BF16_FLOPS
        _emit(f"prefill_mfu_{mtag}", mfu, "fraction_of_bf16_peak", mfu)
    return BATCH * DECODE_STEPS / decode_time


def _zeros_like_shapes(shapes):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def section_decode3b():
    """bf16 AND int8w+int8kv 3B shared-prefix rollout decode + the real
    engine end-to-end (stderr). The int8 line is the series headline."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
    from time_r1_tpu.sampler import Engine, Request
    from time_r1_tpu.sampler.params import SamplingParams

    cfg = Qwen25VLConfig.qwen25vl_3b()
    # throughput is weight-value-independent on TPU; zeros-init skips ~2 min
    # of on-device RNG for 3B params
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = _zeros_like_shapes(shapes)

    # bf16 policy decode (what the recipe runs with ROLLOUT_QUANT="")
    bf16_tps = _decode_bench(cfg, params, quant_kv=False, tag="3b-bf16")
    print(
        json.dumps(
            {
                "metric": "grpo_rollout_decode_throughput_3b_bs8_bf16",
                "value": round(bf16_tps, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(bf16_tps / A100_VLLM_3B_DECODE_TOKS_PER_S, 3),
            }
        )
    )

    # int8 weight-only + int8 KV (the train_rl.sh default rollout config);
    # the bf16 tree is dropped immediately — 6.2 GB of HBM back
    engine = Engine(params, cfg, quantization="int8", kv_cache_quant=True)
    p8 = engine.params
    del params
    jax.block_until_ready(p8)
    int8_tps = _decode_bench(cfg, p8, quant_kv=True, tag="3b-int8", emit_util=True)

    # the REAL engine path (shared-prefix G-way rollout incl. admission,
    # chunked prefill, while_loop decode with stop handling + host sync);
    # patches pre-staged on device: measures the ENGINE, not the host link
    # (a real TPU host feeds patches over PCIe; the axon tunnel would charge
    # ~15 MB of host→device transfer to the vision phase otherwise)
    rng = np.random.default_rng(0)
    row, patches = _build_prompt(cfg, rng)
    req = Request(
        input_ids=row.tolist(),
        patches=jnp.asarray(patches, jnp.bfloat16),
        grid_thw=VIDEO_GRID,
        second_per_grid_t=1.0,
    )
    esp = SamplingParams(
        temperature=1.0, max_new_tokens=DECODE_STEPS, num_return_sequences=BATCH, seed=0
    )
    engine.generate([req], esp)  # compile
    t0 = time.perf_counter()
    outs = engine.generate([req], esp)
    engine_time = time.perf_counter() - t0
    engine_toks = sum(len(o) for o in outs)
    print(
        f"[bench:3b-engine] end-to-end G={BATCH} = {engine_time*1e3:.0f} ms for "
        f"{engine_toks} tokens ({engine_toks/engine_time:.0f} tok/s incl. prefill+vision)",
        file=sys.stderr,
    )
    # parsed (round-5: side metrics must be visible to the driver's
    # round-over-round tracking, not stderr-only)
    etps = engine_toks / engine_time
    _emit(
        "engine_e2e_rollout_throughput_3b_int8", etps, "tokens/s/chip",
        etps / A100_VLLM_3B_E2E_TOKS_PER_S,
    )

    print(
        json.dumps(
            {
                "metric": "grpo_rollout_decode_throughput_3b_bs8_int8w_int8kv",
                "value": round(int8_tps, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(int8_tps / A100_VLLM_3B_DECODE_TOKS_PER_S, 3),
            }
        )
    )


def section_decode7b():
    """7B (the north-star model) int8w+int8kv rollout decode on ONE chip.
    bf16 7B (15.5 GB) exceeds one 16 GB chip — int8 weight-only (~7 GB text
    + bf16 vision) is the single-chip serving configuration; the int8 tree is
    built directly from eval_shape'd quantize_params shapes so the bf16 tree
    never materializes."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
    from time_r1_tpu.ops.quant import quantize_params

    cfg = Qwen25VLConfig.qwen25vl_7b()
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    qshapes = jax.eval_shape(lambda t: quantize_params(t, bits=8), shapes)
    p8 = _zeros_like_shapes(qshapes)
    jax.block_until_ready(p8)

    tps = _decode_bench(cfg, p8, quant_kv=True, tag="7b-int8", emit_util=True)
    print(
        json.dumps(
            {
                "metric": "grpo_rollout_decode_throughput_7b_bs8_int8w_int8kv",
                "value": round(tps, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tps / A100_VLLM_7B_DECODE_TOKS_PER_S, 3),
            }
        )
    )


def section_train3b():
    """FULL GRPO train step end-to-end at the recipe shape on one chip:
    video decode+preproc → int8 rollout (G=8 × 200 tokens, shared prefix) →
    host rewards → split-loss fwd+bwd (in-scan LoRA — the single-chip 3B
    training configuration; full-tree 3B grads need params+grads = 12.4 GB
    and are a multi-chip FSDP deployment) → adamw. tokens/s = completion
    tokens generated per wall-second of the whole step.

    Fidelity note (VERDICT r4 weak#4): zeros weights sample ~uniformly so
    rollouts rarely hit EOS inside 200 steps — every row decodes the full
    length, and one repeated video means the page cache absorbs decode.
    This is deliberately the friendliest recipe-shaped step; it is a
    TRACKED SERIES for regressions, not a claim about ragged workloads
    (the eval sections cover varied-length behavior)."""
    _setup_jax()
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import jax
    import jax.numpy as jnp
    from tiny_tokenizer import TinyTokenizer

    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
    from time_r1_tpu.rl import GRPOTrainer, TrainConfig
    from time_r1_tpu.utils.rewards import REWARD_FUNCS_REGISTRY
    from time_r1_tpu.video.pipeline import video_loader

    cfg = Qwen25VLConfig.qwen25vl_3b()
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = _zeros_like_shapes(shapes)
    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=cfg.pad_token_id, eos_token_id=cfg.eos_token_id
    )
    outdir = "/tmp/bench_train3b"
    config = TrainConfig(
        output_dir=outdir,
        num_generations=BATCH,
        max_completion_length=200,
        temperature=1.0,
        beta=0.04,  # posttrain recipe KL; base doubles as ref via LoRA
        use_peft=True,
        lora_r=16,
        rollout_quantization="int8",
        gradient_checkpointing=True,  # train_rl.sh sets it; 16 GB needs remat
        gradient_accumulation_steps=1,
        report_to="none",
    )
    trainer = GRPOTrainer(
        params,
        cfg,
        processor,
        reward_funcs=[REWARD_FUNCS_REGISTRY["format"], REWARD_FUNCS_REGISTRY["iou_v2"]],
        config=config,
        video_loader=video_loader,
        mesh=None,
    )
    # count the completion tokens each step actually generated (zeros weights
    # sample ~uniformly — EOS inside 200 steps is negligible but COUNT, don't
    # assume)
    gen_tokens = {"n": 0}
    real_generate = trainer.engine.generate

    def counting_generate(reqs, sp):
        outs = real_generate(reqs, sp)
        gen_tokens["n"] = sum(len(o) for o in outs)
        return outs

    trainer.engine.generate = counting_generate

    # video_start/end 0..8 at fps 2 → 16 frames → grid (8,28,28) = 1568 video
    # tokens, the same recipe shape as the decode sections
    example = {
        "task_type": "tg",
        "problem": "person sitting down in a chair",
        "solution": (1.0, 7.5),
        "video_path": REF_VIDEO,
        "durations": 35.04,
        "video_start": 0.0,
        "video_end": 8.0,
    }
    trainer.step(dict(example))  # compile (rollout + loss fwd/bwd + update)
    trainer.timers.reset()
    best, toks = _timed_steps(trainer, [example], gen_tokens)
    tps = toks / best
    # one extra step with SYNC timers: drain the device queue at every phase
    # boundary so each number is that phase's true device+host cost (the
    # async production step above reads dispatch times — train_step "1 ms")
    from time_r1_tpu.utils.profiling import PhaseTimers

    trainer.timers = PhaseTimers(sync=True)
    trainer.step(dict(example))
    phases = "  ".join(
        f"{k}={v['mean_ms']:.0f}ms" for k, v in sorted(trainer.timers.summary().items())
    )
    print(
        f"[bench:train3b] e2e step = {best*1e3:.0f} ms for {toks} completion tokens "
        f"(decode+preproc+rollout+rewards+fwd/bwd+adamw); sync-timed phase "
        f"breakdown (1 step, overlap disabled): {phases}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "grpo_train_step_e2e_3b_lora_int8rollout",
                "value": round(tps, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tps / A100_GRPO_3B_E2E_STEP_TOKS_PER_S, 3),
            }
        )
    )

    # P=2 (per_device_train_batch_size 2): two prompts × G=8 = 16 rollout
    # rows per step — amortizes weight sync, dispatch, and the prompt-shared
    # prefill against 2× the completion tokens. The A100 baseline is
    # per-token, so the same constant applies (its rollout/fwd/bwd terms
    # scale with tokens; its fixed costs would amortize the same way).
    trainer.timers = PhaseTimers()
    ex2 = [dict(example), dict(example, problem="person closes the door")]
    trainer.step_batch([dict(e) for e in ex2])  # compile the P=2 shapes
    best2, toks2 = _timed_steps(trainer, ex2, gen_tokens)
    tps2 = toks2 / best2
    print(
        f"[bench:train3b-p2] e2e step = {best2*1e3:.0f} ms for {toks2} completion "
        f"tokens (P=2 × G=8)",
        file=sys.stderr,
    )
    _emit(
        "grpo_train_step_e2e_3b_lora_int8rollout_p2", tps2, "tokens/s/chip",
        tps2 / A100_GRPO_3B_E2E_STEP_TOKS_PER_S,
    )


def section_train7b_e2e():
    """FULL GRPO train step at 7B on ONE chip — the north-star metric
    (BASELINE.json: rollout+train tokens/s/chip at 7B), end to end: video
    decode+preproc → rollout → rewards → split-loss LoRA fwd/bwd → adamw.

    The single-chip 7B configuration: ONE int8 weight tree (~8.3 GB) in the
    decode-FUSED qkv/gu layout (round 5: per-output-channel scales make fused
    quantization bit-identical to unfused, so rollouts stream the same
    fewer-but-wider dots as pure serving — the unfused layout cost ~27% of
    rollout decode), shared by the trainer (per-layer dequant-merge in-scan,
    concatenated column-block LoRA deltas) and the rollout engine (side-path
    adapters, ops/quant.lora_delta — zero-copy weight sync); int8 KV
    rollouts; base-as-ref KL. The reference trains 7B only via ZeRO-3 +
    optimizer offload across a node
    (/root/reference/scripts/zero3_offload.json, train_rl.sh:18)."""
    _setup_jax()
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import jax
    import jax.numpy as jnp
    from tiny_tokenizer import TinyTokenizer

    from time_r1_tpu.models.processor import Qwen25VLProcessor
    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
    from time_r1_tpu.ops.quant import quantize_params
    from time_r1_tpu.rl import GRPOTrainer, TrainConfig
    from time_r1_tpu.utils.rewards import REWARD_FUNCS_REGISTRY
    from time_r1_tpu.video.pipeline import video_loader

    cfg = Qwen25VLConfig.qwen25vl_7b()
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    qshapes = jax.eval_shape(
        lambda t: quantize_params(t, bits=8, fuse=True), shapes
    )
    base = _zeros_like_shapes(qshapes)
    jax.block_until_ready(base)
    processor = Qwen25VLProcessor(
        TinyTokenizer(), pad_token_id=cfg.pad_token_id, eos_token_id=cfg.eos_token_id
    )
    config = TrainConfig(
        output_dir="/tmp/bench_train7b",
        num_generations=BATCH,
        max_completion_length=200,
        temperature=1.0,
        beta=0.04,
        use_peft=True,
        lora_r=16,
        rollout_quantization="int8",  # int8 KV (weights are the int8 base)
        gradient_checkpointing=True,
        gradient_accumulation_steps=1,
        report_to="none",
    )
    trainer = GRPOTrainer(
        base,
        cfg,
        processor,
        reward_funcs=[REWARD_FUNCS_REGISTRY["format"], REWARD_FUNCS_REGISTRY["iou_v2"]],
        config=config,
        video_loader=video_loader,
        mesh=None,
    )
    assert trainer.engine.params is trainer.params  # ONE weight tree

    gen_tokens = {"n": 0}
    real_generate = trainer.engine.generate

    def counting_generate(reqs, sp):
        outs = real_generate(reqs, sp)
        gen_tokens["n"] = sum(len(o) for o in outs)
        return outs

    trainer.engine.generate = counting_generate

    example = {
        "task_type": "tg",
        "problem": "person sitting down in a chair",
        "solution": (1.0, 7.5),
        "video_path": REF_VIDEO,
        "durations": 35.04,
        "video_start": 0.0,
        "video_end": 8.0,
    }
    trainer.step(dict(example))  # compile
    trainer.timers.reset()
    best, toks = _timed_steps(trainer, [example], gen_tokens)
    tps = toks / best
    from time_r1_tpu.utils.profiling import PhaseTimers

    trainer.timers = PhaseTimers(sync=True)
    trainer.step(dict(example))
    phases = "  ".join(
        f"{k}={v['mean_ms']:.0f}ms" for k, v in sorted(trainer.timers.summary().items())
    )
    print(
        f"[bench:train7b-e2e] e2e step = {best*1e3:.0f} ms for {toks} completion "
        f"tokens; sync-timed phase breakdown (1 step, overlap disabled): {phases}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "grpo_train_step_e2e_7b_lora_int8base",
                "value": round(tps, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tps / A100_GRPO_7B_E2E_STEP_TOKS_PER_S, 3),
            }
        )
    )

    # P>1 (per_device_train_batch_size), as in section_train3b: P prompts ×
    # G=8 rollout rows amortize weight sync, dispatch and the vision tower
    # against P× the completion tokens. Each P is guarded: if its loss
    # program doesn't fit 16 GB HBM the smaller-P lines must still reach the
    # driver (a section that exits non-zero loses its stdout).
    sentences = [
        "person sitting down in a chair",
        "person closes the door",
        "person opens a window",
        "person picks up a book",
    ]
    # P=4 (32 rollout rows, loss D=13568) FAILS remote compile on 16 GB
    # (allocation — same class as the no-remat failure, docs/ROADMAP.md);
    # measured once and excluded so the driver's run doesn't pay the
    # known-failing compile. P=2 is the single-chip sweet spot.
    for P in (2,):
        try:
            exs = [dict(example, problem=s) for s in sentences[:P]]
            trainer.timers = PhaseTimers()
            trainer.step_batch([dict(e) for e in exs])  # compile the P shapes
            bestP, toksP = _timed_steps(trainer, exs, gen_tokens)
            tpsP = toksP / bestP
            print(
                f"[bench:train7b-e2e-p{P}] e2e step = {bestP*1e3:.0f} ms for {toksP} "
                f"completion tokens (P={P} × G=8)",
                file=sys.stderr,
            )
            _emit(
                f"grpo_train_step_e2e_7b_lora_int8base_p{P}", tpsP, "tokens/s/chip",
                tpsP / A100_GRPO_7B_E2E_STEP_TOKS_PER_S,
            )
        except Exception as e:  # pragma: no cover - HBM-capacity dependent
            print(
                f"[bench:train7b-e2e-p{P}] skipped: {type(e).__name__}: {e}",
                file=sys.stderr,
            )
            break


def section_train7b_phase():
    """7B TRAIN PHASE on one chip — the north-star metric's train half
    (BASELINE.json: GRPO rollout+train tokens/s/chip at 7B; the rollout half
    is section_decode7b). Configuration: the single-chip 7B training setup —
    int8 base in the decode-FUSED qkv/gu layout (quantize_params(fuse=True),
    ~8.3 GB where bf16 is 15.5 GB; multi-chip bf16 FSDP is
    scripts/lower_7b.py), LoRA rank 16 with per-layer dequant-merge inside
    the decoder scan (concatenated column-block deltas), split
    (shared-prefix) loss, beta=0.04 with the base-as-ref adapter-disable
    trick, full remat.

    Measures the exact per-step device programs GRPOTrainer.step_batch runs
    after the rollout: frozen-ViT precompute + ref logps + LoRA fwd/bwd/adamw
    (trainer.py:604-642), timed as the trainer would with a host sync between
    phases. tokens/s = the step's 1600 completion tokens / phase seconds, so
    the line composes with the decode line into the e2e number.

    Numerics of training over the int8 base (weights round to ±0.4% of their
    per-channel amax; logp drift well under one nat) are pinned by
    tests/test_quant.py::test_quantized_base_lora_training_path."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import optax

    from time_r1_tpu.models.qwen25vl import Qwen25VLConfig, init_params
    from time_r1_tpu.ops.quant import quantize_params
    from time_r1_tpu.rl import GRPOHyperParams
    from time_r1_tpu.rl.grpo import (
        compute_ref_logps,
        make_lora_train_step,
        precompute_frozen_vision,
    )
    from time_r1_tpu.rl.lora import LoRAConfig, init_lora
    from time_r1_tpu.rl.rollout import build_grpo_split_batch

    cfg = Qwen25VLConfig.qwen25vl_7b()
    shapes = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    qshapes = jax.eval_shape(
        lambda t: quantize_params(t, bits=8, fuse=True), shapes
    )
    base = _zeros_like_shapes(qshapes)
    jax.block_until_ready(base)

    lcfg = LoRAConfig(rank=16, alpha=32.0)
    # init_lora only reads .shape — the bf16 tree never materializes
    lora = init_lora(shapes, lcfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    lora = {k: v for k, v in lora.items() if not k.startswith("visual")}

    rng = np.random.default_rng(0)
    t, h, w = VIDEO_GRID
    n_patches = t * h * w
    prompt = (
        list(rng.integers(2, 100000, PROMPT_TEXT_TOKENS - 2))
        + [cfg.vision_start_token_id]
        + [cfg.video_token_id] * (n_patches // 4)
        + [cfg.vision_end_token_id]
    )
    comps = [list(rng.integers(2, 100000, 199)) + [cfg.eos_token_id] for _ in range(BATCH)]
    groups = [
        {
            "prompt_ids": prompt,
            "completions": comps,
            "advantages": rng.normal(size=BATCH).astype(np.float32),
            "patches": rng.normal(size=(n_patches, cfg.vision.patch_input_dim)).astype(
                np.float32
            ),
            "grid_thw": VIDEO_GRID,
            "second_per_grid_t": 1.0,
        }
    ]
    hp = GRPOHyperParams(
        num_generations=BATCH, beta=0.04, use_grpo=False, fix_vit=True,
        gradient_checkpointing=True,
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(learning_rate=1e-5, weight_decay=0.01),
    )
    opt_state = optimizer.init(lora)
    train_step = make_lora_train_step(cfg, hp, optimizer, lcfg)
    ref_fn = jax.jit(lambda p, b: compute_ref_logps(p, cfg, hp, b))

    batch0 = build_grpo_split_batch(cfg, groups, dtype=jnp.bfloat16)

    def phases():
        """One step's train-phase device programs, synced at each boundary
        (mirrors trainer.step_batch's phase timers in sync mode)."""
        out = {}
        t0 = time.perf_counter()
        b = precompute_frozen_vision(base, cfg, batch0)
        _sync(b.vision_hidden)
        out["vision_frozen"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        ref = ref_fn(base, b)
        _sync(ref)
        out["ref_logps"] = time.perf_counter() - t0
        b = b._replace(ref_logps=jax.lax.stop_gradient(ref))
        t0 = time.perf_counter()
        new_lora, new_opt, loss, _metrics = train_step(base, lora, opt_state, b)
        _sync(jax.tree.leaves(new_lora)[0])
        out["train_step"] = time.perf_counter() - t0
        return out

    phases()  # compile all three programs
    best = None
    for _ in range(3):
        p = phases()
        if best is None or sum(p.values()) < sum(best.values()):
            best = p
    total = sum(best.values())
    comp_tokens = BATCH * 200
    tps = comp_tokens / total
    detail = "  ".join(f"{k}={v*1e3:.0f}ms" for k, v in best.items())
    print(
        f"[bench:train7b] train phase = {total*1e3:.0f} ms for {comp_tokens} "
        f"completion tokens ({detail}); + rollout at the decode7b rate "
        f"≈ e2e 7B step",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "grpo_train_phase_7b_lora_int8base",
                "value": round(tps, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tps / A100_GRPO_7B_TRAIN_PHASE_TOKS_PER_S, 3),
            }
        )
    )
    # MFU lines: USEFUL matmul FLOPs (remat recompute is overhead, not
    # useful work) / measured phase time vs the bf16 peak. Split layout:
    # the decoder sees D = Lp + B·Lc positions (the prompt once); the logp
    # head runs over the B·Lc completion positions. LoRA bwd = dL/dx chain
    # (≈1 fwd of matmuls; base dW is skipped, adapter dW is rank-r noise).
    n_dec = _decoder_matmul_params(base)
    hv = _head_params(cfg)
    D = batch0.prompt_ids.shape[1] + BATCH * 200
    head_D = BATCH * 200
    fwd = 2 * n_dec * D + 2 * hv * head_D
    train_mfu = (2 * fwd) / best["train_step"] / V5E_PEAK_BF16_FLOPS
    ref_mfu = fwd / best["ref_logps"] / V5E_PEAK_BF16_FLOPS
    n_vit = sum(l.size for l in jax.tree.leaves(base["visual"]))
    vis_mfu = (
        2 * n_vit * (VIDEO_GRID[0] * VIDEO_GRID[1] * VIDEO_GRID[2])
    ) / best["vision_frozen"] / V5E_PEAK_BF16_FLOPS
    _emit("loss_fwdbwd_mfu_7b_lora_int8base", train_mfu, "fraction_of_bf16_peak", train_mfu)
    _emit("ref_logps_mfu_7b_int8base", ref_mfu, "fraction_of_bf16_peak", ref_mfu)
    _emit("vision_tower_mfu_7b", vis_mfu, "fraction_of_bf16_peak", vis_mfu)


def section_preproc():
    """Host video preprocessing frames/s on the in-repo real video at the
    recipes' pixel budget: FFmpeg decode → budgeted bicubic resize
    (torchvision-float-exact einsum path) → CLIP patchify. Baseline is
    MEASURED here: the same decode feeding torch bicubic-antialias resize +
    torch CLIP-normalize/patchify — the reference's vision_process.py stack
    on this host (minus decord, which cannot run here; decode time is common
    to both)."""
    from time_r1_tpu.models.processor import patchify_video
    from time_r1_tpu.video.pipeline import fetch_video

    ele = {
        "video": REF_VIDEO,
        "total_pixels": 3584 * 28 * 28,
        "min_pixels": 16 * 28 * 28,
    }

    def ours():
        frames, fps = fetch_video(dict(ele))  # decode + resize, TCHW float
        flat, grid = patchify_video(frames)
        return frames.shape[0], flat

    # warmup (page cache for the file)
    n_frames, flat = ours()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n_frames, flat = ours()
        best = min(best, time.perf_counter() - t0)
    ours_fps = n_frames / best

    # ---- reference-stack baseline on the same host ----
    import torch
    import torch.nn.functional as F

    from time_r1_tpu.models.processor import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
    from time_r1_tpu.utils.vision_math import plan_frame_window, plan_video_shapes
    from time_r1_tpu.video.decoder import VideoReader

    mean = torch.tensor(OPENAI_CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(OPENAI_CLIP_STD).view(1, 3, 1, 1)

    def torch_stack():
        vr = VideoReader(ele["video"])
        plan = plan_frame_window(ele, total_frames=len(vr), video_fps=vr.get_avg_fps())
        raw = vr.get_batch(list(plan.indices))  # (T, H, W, C) uint8
        vr.close()
        T, H, W, C = raw.shape
        out_h, out_w = plan_video_shapes(
            H, W, nframes=T, total_pixels=ele["total_pixels"], min_pixels=ele["min_pixels"]
        )
        x = torch.from_numpy(raw).permute(0, 3, 1, 2).float()
        x = F.interpolate(x, size=(out_h, out_w), mode="bicubic", antialias=True)
        # vision_process.py resizes then .float(); the processor rescales,
        # CLIP-normalizes and patchifies (Qwen2VLImageProcessor._preprocess)
        x = (x * (1.0 / 255.0) - mean) / std
        tp, ps, ms = 2, 14, 2
        gt, gh, gw = T // tp, out_h // ps, out_w // ps
        x = x.reshape(gt, tp, 3, gh // ms, ms, ps, gw // ms, ms, ps)
        x = x.permute(0, 3, 6, 4, 7, 2, 1, 5, 8)
        flat = x.reshape(gt * gh * gw, 3 * tp * ps * ps).contiguous()
        return T, flat.numpy()

    n2, flat2 = torch_stack()  # warmup
    t_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n2, flat2 = torch_stack()
        t_best = min(t_best, time.perf_counter() - t0)
    torch_fps = n2 / t_best

    print(
        f"[bench:preproc] {n_frames} frames (decode→resize→patchify, "
        f"{flat.shape[0]} patches): ours {best*1e3:.0f} ms ({ours_fps:.1f} f/s) vs "
        f"torch-stack {t_best*1e3:.0f} ms ({torch_fps:.1f} f/s)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "video_preproc_host_throughput",
                "value": round(ours_fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(ours_fps / torch_fps, 3),
            }
        )
    )

    # ---- eval input path (cli/evaluate.py's host side): annotation row →
    # decode/resize → tokenized Request, Charades-style consecutive
    # sentences per video. Parsed so regressions in the worker-pool/LRU path
    # are driver-visible (round-5; was commit-message-only). Baseline: the
    # serial path with the reference's cross-worker cache semantics
    # (LimitedSizeSharedDict, src/vllm_inference/data/__init__.py:99-139).
    import shutil
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from tiny_tokenizer import TinyTokenizer

    from time_r1_tpu.data import EvalDataset
    from time_r1_tpu.models.processor import Qwen25VLProcessor

    processor = Qwen25VLProcessor(TinyTokenizer())
    tmp = tempfile.mkdtemp(prefix="bench_eval_input_")
    try:
        vids = []
        for i in range(4):
            dst = os.path.join(tmp, f"vid{i}.mp4")
            shutil.copy(REF_VIDEO, dst)
            vids.append(dst)
        ann = [
            {
                "video": vids[r // 3],
                "duration": 35.04,
                "timestamp": [1.0, 7.5],
                "sentence": f"person sitting down in a chair variant {r}.",
                "qid": f"q{r}",
            }
            for r in range(12)
        ]
        split = os.path.join(tmp, "ann.json")
        with open(split, "w") as f:
            json.dump(ann, f)

        def run_cfg(num_workers, cache_size):
            ds = EvalDataset(
                processor,
                datatype="tg",
                dataset_names=["tvgbench_filter"],
                split=split,
                min_pixels=16 * 28 * 28,
                total_pixels=3584 * 28 * 28,
                use_r1_thinking_prompt=True,
                num_workers=num_workers,
                cache_size=cache_size,
            )
            t0 = time.perf_counter()
            n = sum(1 for item in ds if "request" in item)
            return n / (time.perf_counter() - t0)

        # best-of-2 each, interleaved: on this 1-core host the pool/serial
        # ratio is noise-dominated (GIL-released decode still shares one
        # core), and a single cold pass per config swung vs_baseline
        # 0.78-1.38 run to run
        serial_ips = max(run_cfg(0, 8), run_cfg(0, 8))
        pool_ips = max(run_cfg(8, 8), run_cfg(8, 8))
        print(
            f"[bench:eval-input] serial+cache {serial_ips:.2f} items/s; "
            f"worker-pool {pool_ips:.2f} items/s",
            file=sys.stderr,
        )
        _emit(
            "eval_input_host_throughput", pool_ips, "items/s",
            pool_ips / serial_ips,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SECTIONS = {
    "preproc": section_preproc,
    "train3b": section_train3b,
    "train7b": section_train7b_phase,
    "train7b_e2e": section_train7b_e2e,
    "decode7b": section_decode7b,
    "decode3b": section_decode3b,
}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--section":
        SECTIONS[sys.argv[2]]()
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)  # TPU-tunnel plugin may abort in a background thread at exit

    lines = []
    for name in SECTIONS:  # decode3b (headline) runs & prints last
        t0 = time.perf_counter()
        # one retry after a drain pause: the previous section's subprocess
        # exits with os._exit, and the remote TPU server can lag freeing its
        # allocations — observed once as a spurious RESOURCE_EXHAUSTED in
        # the next section that a 30 s wait cures
        for attempt in (0, 1):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--section", name],
                capture_output=True,
                text=True,
                timeout=3600,
            )
            if proc.returncode == 0 or attempt == 1:
                break
            print(
                f"[bench] section {name} rc={proc.returncode}; retrying after "
                "a 30 s device-drain pause",
                file=sys.stderr,
            )
            time.sleep(30)
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            print(f"[bench] section {name} FAILED (rc={proc.returncode})", file=sys.stderr)
            continue
        for ln in proc.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                lines.append(ln)
        print(
            f"[bench] section {name} done in {time.perf_counter()-t0:.0f} s",
            file=sys.stderr,
        )
    for ln in lines:
        print(ln)


if __name__ == "__main__":
    main()
