"""Turnkey real-weights parity harness (VERDICT r2 #4).

The day a Qwen2.5-VL / Time-R1 checkpoint lands, parity vs the reference is
ONE command:

    python -m time_r1_tpu.cli.parity --model_base <ckpt_dir>

Three checks, each skipping gracefully when its inputs are unavailable:

1. demo      — the reference demo flow (demo.py:155-224: assets/OHOFG.mp4,
               "person sitting down in a chair.", gt [1.0, 7.5], duration
               35.04) through our engine; the output JSON is diffed against a
               committed fixture (--expected). The first run on real weights
               writes `demo_candidate.json` to commit as the fixture.
2. activations — layerwise hidden-state comparison vs HF torch on one fixed
               synthetic-video prompt, when `transformers` can load the same
               checkpoint (HF-format dir). Covers the two named risk items:
               * bf16 greedy-argmax stability (our bf16 vs fp32 argmax);
               * float `second_per_grid_ts` semantics (rope.py note: we follow
                 vLLM's float path; HF truncates to int — reported, not failed,
                 for fractional values).
3. benchmark — a capped Charades-STA (or any TG dataset) shard through the
               eval CLI + scoring (README.md:106 north star: zero-shot
               R1@0.5 ≥ 60.8).

Exit code 0 = every check that RAN passed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Real-weights parity harness (TPU)")
    p.add_argument("--model_base", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="logs/parity")
    p.add_argument("--video_path", type=str, default="/root/reference/assets/OHOFG.mp4")
    p.add_argument("--query", type=str, default="person sitting down in a chair.")
    p.add_argument(
        "--expected",
        type=str,
        default="",
        help="committed demo-output fixture (JSON with a 'pred' field); "
        "empty → demo check records a candidate fixture instead of failing",
    )
    p.add_argument("--skip_demo", action="store_true")
    p.add_argument("--skip_activations", action="store_true")
    p.add_argument("--skip_benchmark", action="store_true")
    p.add_argument("--atol", type=float, default=2e-4, help="fp32 per-layer abs tolerance")
    p.add_argument("--rtol", type=float, default=2e-3)
    p.add_argument("--datasets", nargs="+", type=str, default=["charades"])
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--charades_n", type=int, default=50, help="benchmark sample cap")
    p.add_argument("--max_new_tokens", type=int, default=1024)
    p.add_argument("--total_pixels", type=int, default=3584 * 28 * 28)
    p.add_argument("--min_pixels", type=int, default=16 * 28 * 28)
    return p.parse_args(argv)


# ---------------------------------------------------------------------------
def check_demo(args, engine=None, processor=None) -> tuple[str, str]:
    """Run the demo flow and diff against the committed fixture.
    Returns (status, detail) with status in {pass, fail, recorded, skip}."""
    from . import demo as demo_cli

    if not os.path.isfile(args.video_path):
        return "skip", f"video not found: {args.video_path}"
    out_dir = os.path.join(args.output_dir, "demo")
    demo_args = demo_cli.get_args(
        [
            "--model_base", args.model_base,
            "--video_path", args.video_path,
            "--query", args.query,
            "--output_dir", out_dir,
            "--total_pixels", str(args.total_pixels),
            "--min_pixels", str(args.min_pixels),
        ]
    )
    demo_cli.main(demo_args, engine=engine, processor=processor)
    with open(os.path.join(out_dir, "tmp_output.jsonl")) as f:
        rec = json.loads(f.readline())

    cand_path = os.path.join(args.output_dir, "demo_candidate.json")
    with open(cand_path, "w") as f:
        json.dump(rec, f, indent=1)
    if not args.expected:
        return "recorded", f"no fixture given; candidate written to {cand_path}"
    with open(args.expected) as f:
        want = json.load(f)
    if rec.get("pred") == want.get("pred"):
        return "pass", f"pred {rec.get('pred')} matches fixture"
    return "fail", f"pred {rec.get('pred')} != fixture {want.get('pred')}"


# ---------------------------------------------------------------------------
def _fixed_prompt(cfg, grid):
    """Deterministic video prompt: text + <vision_start> video tokens <vision_end>."""
    t, h, w = grid
    n_vis = (t * h * w) // cfg.vision.merge_unit
    ids = (
        [5, 11, 23]
        + [cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_vis
        + [cfg.vision_end_token_id]
        + [17, 29]
    )
    return np.array([ids], dtype=np.int64)


def check_activations(args) -> tuple[str, str]:
    """Layerwise activation diff vs HF torch at the checkpoint's real shapes."""
    if not os.path.exists(os.path.join(args.model_base, "config.json")):
        return "skip", "not an HF-format checkpoint dir (no config.json) — HF oracle unavailable"
    try:
        import torch
        from transformers import Qwen2_5_VLForConditionalGeneration
    except Exception as e:  # pragma: no cover
        return "skip", f"transformers/torch unavailable: {e}"

    import jax.numpy as jnp

    from ..models.qwen25vl import (
        VisionInputs,
        forward,
        get_rope_index,
        prepare_vision_inputs,
    )
    from ..models.qwen25vl.convert import load_checkpoint
    from ..models.qwen25vl.language import decoder_forward
    from ..models.qwen25vl.model import merge_vision_embeddings
    from ..models.qwen25vl.vision import vision_forward
    from ..ops.quant import embed_lookup

    hf = (
        Qwen2_5_VLForConditionalGeneration.from_pretrained(
            args.model_base, torch_dtype=torch.float32
        )
        .eval()
        .float()
    )
    params, cfg = load_checkpoint(args.model_base, dtype=jnp.float32)

    grid = (2, 4, 4) if cfg.vision.patch_input_dim < 1176 else (4, 6, 8)
    t, h, w = grid
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(t * h * w, cfg.vision.patch_input_dim)).astype(np.float32)
    input_ids = _fixed_prompt(cfg, grid)
    grid_thw = np.array([grid], dtype=np.int64)
    spg = 1.0  # integer-valued: the HF oracle agrees (float spg reported below)

    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(input_ids),
            pixel_values_videos=torch.tensor(patches),
            video_grid_thw=torch.tensor(grid_thw),
            second_per_grid_ts=torch.tensor([spg]),
            output_hidden_states=True,
        )
    hf_logits = out.logits.numpy()
    hf_hiddens = [hs.numpy() for hs in out.hidden_states]  # embeds + L layers

    # our side: per-layer hiddens via decoder_forward(collect_hiddens=True)
    prep = prepare_vision_inputs([grid], cfg.vision)
    pos_ids, _ = get_rope_index(
        cfg, input_ids, video_grid_thw=grid_thw, second_per_grid_ts=[spg]
    )
    vis = VisionInputs.build(prep, jnp.asarray(patches))
    embeds = embed_lookup(
        params["text"]["embed_tokens"]["embedding"], jnp.asarray(input_ids),
        dtype=jnp.float32,
    )
    feats = vision_forward(
        params["visual"], cfg.vision, vis.patches, vis.perm, vis.pos_hw,
        vis.key_valid, vis.full_gather, vis.full_inverse, vis.reverse,
    )
    embeds = merge_vision_embeddings(
        embeds, jnp.asarray(input_ids), feats, (cfg.video_token_id, cfg.image_token_id)
    )
    final_hidden, _, per_layer = decoder_forward(
        params["text"], cfg.text, embeds, jnp.asarray(pos_ids), collect_hiddens=True
    )
    logits, _ = forward(
        params, cfg, jnp.asarray(input_ids), jnp.asarray(pos_ids), vision=vis
    )

    lines, worst, ok = [], 0.0, True
    d_emb = float(np.abs(np.asarray(embeds) - hf_hiddens[0]).max())
    lines.append(f"embeddings+vision-merge  max|Δ| = {d_emb:.3e}")
    worst = max(worst, d_emb)
    # HF hidden_states convention: entries 1..L-1 are raw layer outputs; the
    # LAST entry has the final RMSNorm applied (Llama/Qwen modeling code)
    L = cfg.text.num_hidden_layers
    for l in range(L):
        ours = final_hidden if l == L - 1 else per_layer[l]
        d = float(np.abs(np.asarray(ours) - hf_hiddens[l + 1]).max())
        scale = float(np.abs(hf_hiddens[l + 1]).max())
        tag = " (post-norm)" if l == L - 1 else ""
        lines.append(f"layer {l:02d}{tag:12s}     max|Δ| = {d:.3e}  (|h|max {scale:.2f})")
        if d > args.atol + args.rtol * scale:
            ok = False
        worst = max(worst, d)
    d_logits = float(np.abs(np.asarray(logits) - hf_logits).max())
    lines.append(f"logits                   max|Δ| = {d_logits:.3e}")
    if d_logits > args.atol + args.rtol * float(np.abs(hf_logits).max()):
        ok = False

    # risk item: bf16 greedy-argmax stability vs the fp32 oracle
    params_bf16, _ = load_checkpoint(args.model_base, dtype=jnp.bfloat16)
    logits_bf16, _ = forward(
        params_bf16, cfg, jnp.asarray(input_ids), jnp.asarray(pos_ids),
        vision=VisionInputs.build(prep, jnp.asarray(patches, jnp.bfloat16)),
    )
    agree = int(
        (np.asarray(logits_bf16).argmax(-1) == hf_logits.argmax(-1)).sum()
    )
    total = hf_logits.shape[1]
    lines.append(f"bf16 greedy argmax agreement: {agree}/{total} positions")
    if agree < total:
        lines.append("  (bf16 rounding flipped argmax at some positions — inspect margins)")

    # risk item: float second_per_grid_ts — we follow vLLM float semantics,
    # HF truncates to int (rope.py). Report the divergence, never fail on it.
    pos_f, _ = get_rope_index(
        cfg, input_ids, video_grid_thw=grid_thw, second_per_grid_ts=[0.8]
    )
    pos_i, _ = get_rope_index(
        cfg, input_ids, video_grid_thw=grid_thw, second_per_grid_ts=[int(0.8)]
    )
    lines.append(
        "float second_per_grid_ts (0.8): temporal ids differ from int-truncated "
        f"at {int((pos_f != pos_i).sum())} entries (vLLM-float semantics, by design)"
    )

    detail = "\n".join(lines)
    report = os.path.join(args.output_dir, "activations_report.txt")
    os.makedirs(args.output_dir, exist_ok=True)
    with open(report, "w") as f:
        f.write(detail + "\n")
    return ("pass" if ok else "fail"), detail


# ---------------------------------------------------------------------------
def check_benchmark(args) -> tuple[str, str]:
    """Capped TG-dataset shard through the eval CLI + scoring (README.md:106)."""
    from . import evaluate as evaluate_cli
    from ..utils.metrics import calc_score, score_tg_records

    out_dir = os.path.join(args.output_dir, "bench")
    eval_args = evaluate_cli.get_args(
        [
            "--model_base", args.model_base,
            "--datasets", *args.datasets,
            "--split", args.split,
            "--output_dir", out_dir,
            "--max_new_tokens", str(args.max_new_tokens),
            "--total_pixels", str(args.total_pixels),
            "--min_pixels", str(args.min_pixels),
            "--limit", str(args.charades_n),
            "--use_r1_thinking_prompt",
        ]
    )
    synthetic = ""
    try:
        out_file = evaluate_cli.main(eval_args)
    except FileNotFoundError as e:
        # dataset files absent on this host: fall back to a SYNTHETIC 2-row
        # Charades-style shard on the demo video so the harness still drives
        # the production input path end to end (EvalDataset worker-pool
        # decode + LRU cache + native resize/patchify + scoring) — the
        # R1@0.5 bar itself stays real-data-only. ONLY missing-file errors
        # take this path: any other exception is a genuine eval failure and
        # must surface as one, not be relabeled "data unavailable"
        if not os.path.exists(args.video_path):
            return "skip", f"benchmark data unavailable: {type(e).__name__}: {e}"
        synthetic = f" (SYNTHETIC shard — real data unavailable: {type(e).__name__})"
        ann = [
            {
                "video": args.video_path,
                "duration": 35.04,
                "timestamp": [1.0, 7.5],
                "sentence": "person sitting down in a chair.",
                "qid": "parity_0",
            },
            {
                "video": args.video_path,
                "duration": 35.04,
                "timestamp": [10.0, 12.0],
                "sentence": "person stands up.",
                "qid": "parity_1",
            },
        ]
        split_path = os.path.join(out_dir, "synthetic_ann.json")
        os.makedirs(out_dir, exist_ok=True)
        with open(split_path, "w") as f:
            json.dump(ann, f)
        eval_args = evaluate_cli.get_args(
            [
                "--model_base", args.model_base,
                "--datasets", "tvgbench_filter",
                "--split", split_path,
                "--output_dir", out_dir,
                "--max_new_tokens", str(args.max_new_tokens),
                "--total_pixels", str(args.total_pixels),
                "--min_pixels", str(args.min_pixels),
                "--use_r1_thinking_prompt",
            ]
        )
        try:
            out_file = evaluate_cli.main(eval_args)
        except Exception as e2:
            return "skip", f"synthetic benchmark failed: {type(e2).__name__}: {e2}"
    records = [json.loads(l) for l in open(out_file)]
    if not records:
        return "skip", "no benchmark records produced"
    scores = calc_score(score_tg_records(records), args.datasets[0])
    detail = json.dumps({str(k): v for k, v in scores.items()})
    with open(os.path.join(out_dir, "scores.json"), "w") as f:
        f.write(detail + "\n")
    # README.md:106 zero-shot bar: Charades-STA R1@0.5 ≥ 60.8
    if not synthetic and "charades" in args.datasets and 0.5 in scores:
        verdict = "≥" if scores[0.5] >= 60.8 else "<"
        detail += f"\ncharades R1@0.5 = {scores[0.5]:.1f} {verdict} baseline 60.8"
    return "pass", detail + synthetic


# ---------------------------------------------------------------------------
def main(args) -> int:
    os.makedirs(args.output_dir, exist_ok=True)
    results = {}
    if not args.skip_demo:
        results["demo"] = check_demo(args)
    if not args.skip_activations:
        results["activations"] = check_activations(args)
    if not args.skip_benchmark:
        results["benchmark"] = check_benchmark(args)

    failed = False
    print("\n=== parity report ===")
    for name, (status, detail) in results.items():
        print(f"[{status.upper():8s}] {name}")
        for line in detail.splitlines():
            print(f"    {line}")
        failed |= status == "fail"
    with open(os.path.join(args.output_dir, "parity_report.json"), "w") as f:
        json.dump({k: {"status": s, "detail": d} for k, (s, d) in results.items()}, f, indent=1)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(get_args()))
