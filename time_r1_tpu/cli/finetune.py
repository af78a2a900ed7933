"""Downstream GRPO fine-tune entry (C7 parity: reference finetune.py).

Differences from cli/train.py, mirroring the reference:
- dataset format: Charades/ActivityNet-style {video_id: {duration, timestamps,
  sentences}} json + a video folder + OFFLINE-preprocessed video arrays
  (finetune.py:541-632) produced by cli/preprocess_videos.py;
- recipes run with --beta 0.0 (no ref model/KL) and --use_grpo false →
  PPO-clip loss (scripts/finetune/run_charades.sh:42,47);
- prompt v1/v2/v3 selection and the mqa reward are available.
"""

from __future__ import annotations

import json
import os
import random

from ..models.processor import Qwen25VLProcessor
from ..models.qwen25vl.convert import load_checkpoint
from ..rl.trainer import GRPOTrainer, TrainConfig
from ..utils.rewards import METRIC_FUNCS_REGISTRY, REWARD_FUNCS_REGISTRY
from ..video.pipeline import video_loader



def load_json_dataset(train_data_path: str, video_folder: str, preprocessed_data_path: str = ""):
    """finetune.py:541-632: per-(video, sentence) examples with
    preprocessed_path = {preprocessed_data_path}/{video_id}."""
    with open(train_data_path) as f:
        data = json.load(f)
    examples = []
    for video_id, video_data in data.items():
        for timestamps, sentence in zip(video_data["timestamps"], video_data["sentences"]):
            sentence = sentence.strip().lower()
            if sentence.endswith("."):
                sentence = sentence[:-1]
            video_path = None
            for ext in ("mp4", "mkv", "webm"):
                cand = os.path.join(video_folder, f"{video_id}.{ext}")
                if os.path.isfile(cand):
                    video_path = cand
                    break
            example = {
                "task_type": "tg",
                "problem": sentence,
                "solution": (timestamps[0], timestamps[1]),
                "video_path": video_path,
                "durations": video_data["duration"],
                "video_start": None,
                "video_end": None,
                "preprocessed_path": (
                    os.path.join(preprocessed_data_path, video_id) if preprocessed_data_path else ""
                ),
            }
            if example["preprocessed_path"] and not os.path.exists(example["preprocessed_path"]):
                print(f"Warning: Preprocessed path not found for video_id: {video_id}")
            examples.append(example)
    random.shuffle(examples)
    return examples


def main(argv=None):
    """Finetune shares the train CLI surface plus --preprocessed_data_path."""
    import sys

    from .train import get_args as train_get_args

    argv = list(sys.argv[1:] if argv is None else argv)
    preprocessed = ""
    if "--preprocessed_data_path" in argv:
        i = argv.index("--preprocessed_data_path")
        preprocessed = argv[i + 1]
        del argv[i : i + 2]
    video_folder = "."
    if "--video_folder" in argv:
        video_folder = argv[argv.index("--video_folder") + 1]
    args = train_get_args(argv)

    random.seed(42)
    dataset = load_json_dataset(args.train_data_path, video_folder, preprocessed)

    from .train import build_train_mesh

    mesh = build_train_mesh(getattr(args, "tensor_parallel_size", 1))
    return _run(args, dataset, mesh)


def _run(args, dataset, mesh):
    from .train import _mesh_ctx

    params, cfg = load_checkpoint(args.model_name_or_path)
    processor = Qwen25VLProcessor.from_pretrained(args.model_name_or_path)
    ref_params = None
    if args.beta != 0.0:
        ref_params, _ = load_checkpoint(args.model_name_or_path)
    config = TrainConfig(
        output_dir=args.output_dir,
        learning_rate=args.learning_rate,
        num_train_epochs=args.num_train_epochs,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        max_completion_length=args.max_completion_length,
        num_generations=args.num_generations,
        temperature=args.temperature,
        beta=args.beta,
        use_grpo=args.use_grpo,
        fix_vit=args.fix_vit,
        gradient_checkpointing=args.gradient_checkpointing,
        prompt_type=args.prompt_type,
        logging_steps=args.logging_steps,
        save_steps=args.save_steps,
        save_strategy=args.save_strategy,
        is_early_stopping=args.is_early_stopping,
    )
    with _mesh_ctx(mesh):
        trainer = GRPOTrainer(
            params,
            cfg,
            processor,
            reward_funcs=[REWARD_FUNCS_REGISTRY[f] for f in args.reward_funcs],
            metric_funcs=list(METRIC_FUNCS_REGISTRY.values()),
            config=config,
            video_loader=video_loader,
            ref_params=ref_params,
            mesh=mesh,
        )
        trainer.train(dataset)
    trainer.save_checkpoint(args.output_dir)
    return trainer


if __name__ == "__main__":
    main()
