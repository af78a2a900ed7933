"""Sharded, resumable batch eval entry (C15 parity: reference evaluate.py).

Flag names match the reference CLI; `--datatype` is auto-set from the dataset
names exactly like evaluate.py:307-319. Writes per-line-flushed jsonl shards
`{datatype}_{curr}_{total}.jsonl` with resume-by-qid, plus a timing summary.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from ..data.eval_dataset import EvalDataset
from ..models.processor import Qwen25VLProcessor
from ..models.qwen25vl.convert import load_checkpoint
from ..sampler.engine import Engine
from ..sampler.text_engine import TextEngine
from ..utils.parsing import extract_answer


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Sharded batch eval (TPU)")
    p.add_argument("--datatype", default="tg", choices=["tg", "mcq"])
    p.add_argument("--model_base", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--output_dir", type=str, default="checkpoints")
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--curr_idx", type=int, default=0)
    p.add_argument("--total_idx", type=int, default=1)
    p.add_argument("--total_pixels", type=int, default=3584 * 28 * 28)
    p.add_argument("--min_pixels", type=int, default=16 * 28 * 28)
    p.add_argument(
        "--datasets",
        nargs="+",
        type=str,
        required=True,
        choices=[
            "charades",
            "activitynet",
            "videomme",
            "mvbench",
            "tvgbench_filter",
            "tvgbench",
            "egoschema",
            "tempcompass",
        ],
    )
    p.add_argument("--use_r1_thinking_prompt", action="store_true")
    p.add_argument("--use_vllm_inference", action="store_true", help="accepted for recipe parity")
    p.add_argument(
        "--tensor_parallel_size",
        type=int,
        default=None,
        help="shard the model over a TP mesh (vLLM TP parity, vllm_infer.py:50). "
        "Default: 1, or devices//pipeline_parallel_size under PP (the "
        "reference's vLLM wrapper always composes TP×PP that way)",
    )
    p.add_argument(
        "--tp_group_index",
        type=int,
        default=0,
        help="which TP-sized device group this process uses (devices "
        "[idx·tp, (idx+1)·tp)); combine with --curr_idx/--total_idx to run "
        "n_devices/tp data-parallel eval processes on one host — no chip idles",
    )
    p.add_argument(
        "--pipeline_parallel_size", type=int, default=1,
        help="stage-shard the decoder layers over a pipeline mesh (vLLM PP parity)"
    )
    p.add_argument("--device", type=str, default="auto", help="accepted for recipe parity")
    p.add_argument(
        "--quantization",
        type=str,
        default="",
        choices=["", "int8", "int4"],
        help="weight-only quantized serving (vLLM --quantization capability; "
        "int4 = Pallas dequant-matmul, half the weight HBM of int8)",
    )
    p.add_argument(
        "--kv_cache_dtype",
        type=str,
        default="",
        choices=["", "int8"],
        help="int8 KV cache for the decode phase (vLLM --kv-cache-dtype capability)",
    )
    p.add_argument("--prompt_type", type=str, default="r1")
    p.add_argument("--use_nothink", action="store_true")
    p.add_argument("--use_prepared_video", action="store_true")
    p.add_argument(
        "--use_continuous_batching",
        action="store_true",
        help="continuous batching over the PAGED KV pool (vLLM engine model); "
        "composes with --quantization and --kv_cache_dtype",
    )
    p.add_argument(
        "--kv_block_size",
        type=int,
        default=128,
        help="KV page size for continuous batching (vLLM --block-size); "
        "0 → legacy slot-pool scheduler (contiguous per-slot cache)",
    )
    p.add_argument("--max_model_len", type=int, default=0, help="slot length for continuous batching (0 → auto)")
    p.add_argument(
        "--limit", type=int, default=0, help="stop after N items (0 = all; parity-harness cap)"
    )
    p.add_argument(
        "--video_cache_size",
        type=int,
        default=8,
        help="in-process LRU decoded-video cache entries (LimitedSizeSharedDict "
        "parity, data/__init__.py:99-139); Charades-style repeated videos "
        "decode once. 0 disables",
    )
    p.add_argument(
        "--num_workers",
        type=int,
        default=8,
        help="parallel host video-decode workers feeding the prefetch queue "
        "(DataLoader num_workers parity, data/__init__.py:671-679)",
    )
    args = p.parse_args(argv)

    if any(d in args.datasets for d in ("mvbench", "videomme", "tempcompass", "egoschema")):
        args.datatype = "mcq"
    elif any(
        d in args.datasets for d in ("tvgbench", "tvgbench_filter", "charades", "activitynet")
    ):
        args.datatype = "tg"
    else:
        raise ValueError("Unsupported dataset type.")
    return args


def main(args, engine: Engine = None, processor: Qwen25VLProcessor = None):
    os.makedirs(args.output_dir, exist_ok=True)
    output_file = os.path.join(
        args.output_dir, f"{args.datatype}_{args.curr_idx}_{args.total_idx}.jsonl"
    )

    already_finished = set()
    try:
        with open(output_file) as g:
            for line in g:
                already_finished.add(json.loads(line)["qid"])
    except Exception:
        pass

    pp_engine = None
    if engine is None:
        params, cfg = load_checkpoint(args.model_base)
        pp = getattr(args, "pipeline_parallel_size", 1)
        if pp > 1:
            # vLLM PP parity (vllm_infer.py:42-51): stage-sharded layers +
            # per-stage KV caches; generation relays hidden states stage to
            # stage over ICI (parallel/pipeline.py:pp_generate)
            import jax

            from ..parallel.pipeline import PPEngine

            tp_in_pp = getattr(args, "tensor_parallel_size", None)
            if tp_in_pp is None:
                # reference behavior: use ALL devices — tp = devices // pp
                # (vllm_infer.py:50), clamped to a divisor of the kv heads
                # (contiguous splits keep each GQA group on one device)
                tp_in_pp = max(len(jax.devices()) // pp, 1)
                while tp_in_pp > 1 and cfg.text.num_key_value_heads % tp_in_pp != 0:
                    tp_in_pp -= 1
                if getattr(args, "quantization", ""):
                    tp_in_pp = 1  # fused int8 columns cannot TP-split
            if len(jax.devices()) < pp * tp_in_pp:
                raise ValueError(
                    f"pipeline_parallel_size={pp} × tensor_parallel_size={tp_in_pp} "
                    f"needs {pp * tp_in_pp} devices but only {len(jax.devices())} exist"
                )
            # TP×PP composes (vLLM -tp × -pp): Megatron-split layers inside
            # each stage over a (stage, model) mesh; --quantization composes
            # with pure PP (fused int8 columns cannot TP-split — explicit
            # error inside PPEngine)
            pp_engine = PPEngine(
                params, cfg, n_stages=pp, tp=tp_in_pp,
                quantization=getattr(args, "quantization", "") or "",
            )
            processor = Qwen25VLProcessor.from_pretrained(args.model_base)
            # no bucket engine in PP mode: the point of PP is that the FULL
            # tree does not fit one chip (prob-based MCQ scoring uses the
            # bucket engine and is not available under PP)
            engine = None
        tp = getattr(args, "tensor_parallel_size", None) or 1
        if pp <= 1 and tp > 1:
            # vLLM-TP parity (vllm_infer.py:50): shard attention heads / MLP
            # hidden over a pure-TP mesh; 7B eval fits by splitting weights
            # across chips. GSPMD inserts the collectives.
            import jax

            from ..parallel import make_mesh, shard_params

            gi = getattr(args, "tp_group_index", 0)
            if len(jax.devices()) < tp * (gi + 1):
                raise ValueError(
                    f"tensor_parallel_size={tp} group {gi} needs devices "
                    f"[{tp * gi}, {tp * (gi + 1)}) but only {len(jax.devices())} exist"
                )
            mesh = make_mesh(model_parallel=tp, devices=jax.devices()[tp * gi : tp * (gi + 1)])
            params = shard_params(params, mesh)
        if pp <= 1:
            engine = Engine(
                params,
                cfg,
                quantization=getattr(args, "quantization", "") or None,
                kv_cache_quant=getattr(args, "kv_cache_dtype", "") == "int8",
            )
            processor = Qwen25VLProcessor.from_pretrained(args.model_base)
    if pp_engine is not None:
        gen_engine = pp_engine
    elif getattr(args, "use_continuous_batching", False):
        # max_model_len parity: total_pixels//28//28 + 4096 + max_new_tokens
        # (vllm_infer.py:52)
        max_len = args.max_model_len or (
            args.total_pixels // 28 // 28 + 4096 + args.max_new_tokens
        )
        kv_block = getattr(args, "kv_block_size", 128)
        kv_quant = getattr(args, "kv_cache_dtype", "") == "int8"
        if kv_block > 0:
            # the production engine: paged KV pool + Pallas paged-attention
            # kernel; HBM bounded by resident tokens, int8 weights/KV compose
            # (vLLM engine composition, vllm_infer.py:40-58)
            from ..sampler.paged import PagedEngine

            max_len = -(-max_len // kv_block) * kv_block
            gen_engine = PagedEngine(
                engine.params,
                engine.cfg,
                max_slots=max(args.batch_size, 1),
                max_len=max_len,
                page_size=kv_block,
                kv_cache_quant=kv_quant,
            )
        else:
            from ..sampler.continuous import ContinuousEngine

            if kv_quant:
                raise ValueError(
                    "--kv_cache_dtype int8 requires the paged pool "
                    "(--kv_block_size > 0); the legacy slot engine is bf16-only"
                )
            gen_engine = ContinuousEngine(
                engine.params, engine.cfg, max_slots=max(args.batch_size, 1), max_len=max_len
            )
    else:
        gen_engine = engine
    text_engine = TextEngine(gen_engine, processor)

    # mcq + train split → probability-based scoring over option letters with
    # the assistant-prefix answer prompt (reference evaluate.py:88,104-122)
    prob_mode = args.datatype == "mcq" and args.split == "train"
    if prob_mode and engine is None:
        raise ValueError(
            "prob-based MCQ scoring needs the bucket engine; it is unavailable "
            "under --pipeline_parallel_size > 1"
        )
    dataset = EvalDataset(
        processor,
        datatype=args.datatype,
        dataset_names=args.datasets,
        split=args.split,
        curr_idx=args.curr_idx,
        total_idx=args.total_idx,
        already_finished=already_finished,
        min_pixels=args.min_pixels,
        total_pixels=args.total_pixels,
        use_r1_thinking_prompt=args.use_r1_thinking_prompt,
        prompt_type=args.prompt_type,
        use_nothink=args.use_nothink,
        use_prepared_video=args.use_prepared_video,
        use_answer_prompt=prob_mode,
        cache_size=getattr(args, "video_cache_size", 8),
        num_workers=getattr(args, "num_workers", 8),
    )

    t0 = time.perf_counter()
    f = open(output_file, "a+")
    answer_prompt = None
    if args.datatype == "mcq" and args.split != "train":
        from ..data.prompts import ANSWER_PROMPT

        answer_prompt = ANSWER_PROMPT

    n_done = 0
    limit = getattr(args, "limit", 0)
    for batch in dataset.iter_batches(args.batch_size):
        if limit and n_done >= limit:
            break
        # undecodable videos still produce a record: pred is unparsable →
        # scored 0.0 with the row IN the denominator (the reference emits a
        # prediction for every row via its backend fallback,
        # vision_process.py:362-368; silently dropping rows would inflate
        # calc_score). Resume then skips the row instead of re-attempting.
        failed = [b for b in batch if b.get("failed")]
        batch = [b for b in batch if not b.get("failed")]
        for b in failed:
            if args.datatype == "tg":
                rec = {
                    "qid": b["qid"],
                    "pred": [None, None],
                    "target": list(b["timestamps"]),
                    "duration": b.get("duration"),
                    "output_text": "",
                    "error": b.get("error", "video load failed"),
                }
            else:
                rec = {
                    "qid": b["qid"],
                    "pred": None,
                    "target": b["answer"],
                    "duration": b.get("duration"),
                    "output_text": "",
                    "error": b.get("error", "video load failed"),
                }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            n_done += 1
        if not batch:
            continue
        if prob_mode:
            import numpy as _np

            logits = engine.last_token_logits([b["request"] for b in batch])
            for b, lg in zip(batch, logits):
                option_ids = [processor.tokenizer.encode(l, add_special_tokens=False)[0] for l in b["options"]]
                opt = lg[option_ids]
                probs = _np.exp(opt - opt.max())
                probs = probs / probs.sum()
                rec = {
                    "qid": b["qid"],
                    "pred": int(probs.argmax()),
                    "target": b["answer"],
                    "duration": b.get("duration"),
                    "probs": [float(p) for p in probs],
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                n_done += 1
            continue
        outputs = text_engine.generate(
            [b["request"] for b in batch],
            max_new_tokens=args.max_new_tokens,
            answer_prompt=answer_prompt,
        )
        for b, text in zip(batch, outputs):
            if args.datatype == "tg":
                rec = {
                    "qid": b["qid"],
                    "pred": extract_answer(text, "tg"),
                    "target": list(b["timestamps"]),
                    "duration": b.get("duration"),
                    "output_text": text,
                }
            else:
                rec = {
                    "qid": b["qid"],
                    "pred": None,
                    "target": b["answer"],
                    "duration": b.get("duration"),
                    "output_text": text,
                }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            n_done += 1
    f.close()

    total = time.perf_counter() - t0
    print(f"\n--- Timing Summary ---\nTotal program execution time: {total:.2f} seconds")
    with open(os.path.join(args.output_dir, "timing_summary_vllm.txt"), "w") as tf:
        tf.write("\n--- Timing Summary ---\n")
        tf.write(f"Total program execution time: {total:.2f} seconds\n")
        tf.write(f"Items evaluated: {n_done}\n")
    return output_file


if __name__ == "__main__":
    main(get_args())
