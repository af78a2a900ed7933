"""GRPO trainer: the training loop around the jitted train step (C1/C2 parity).

Reference equivalents:
- TimeR1_Trainer / TimeR1_Trainer_ft construction surface
  (timer1_trainer.py:184-206): model, reward_funcs, metric_funcs, args,
  train_dataset, max_pixels/min_pixels.
- Per-step flow (compute_loss :512-782): decode video → G rollouts with the
  LIVE policy weights (no ZeRO-3 gather needed here — the sampler shares the
  sharded params) → rewards → advantages → loss/update.
- Prompt template v1 (:63-67), conversation shape (:490-510).
- Metrics dict averaged per logging step (:407-408, 784-793).
- Epoch-end checkpointing + stop-after-N-epochs callbacks (main.py:497-539),
  resume max_steps arithmetic (main.py:589-618).
"""

from __future__ import annotations

import json
import math
import os
import dataclasses
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.processor import Qwen25VLProcessor
from ..models.qwen25vl import Qwen25VLConfig
from ..sampler import Engine, Request, SamplingParams
from .grpo import (
    GRPOHyperParams,
    _offloadable,
    compute_group_advantages,
    compute_ref_logps,
    make_lora_train_step,
    make_train_step,
    precompute_frozen_vision,
)
from .rollout import build_grpo_batch_groups, build_grpo_split_batch

SYSTEM_PROMPT = "You are a video analysis expert."

# Prompt templates v1/v2/v3 (timer1_trainer.py:63-67, timer1_trainer_ft.py:61-85)
QUESTION_TEMPLATE_TG_V1 = """To accurately pinpoint the event "[EVENT]" in the video, determine the precise time period of the event.

Output your thought process within the <think> </think> tags, including analysis with either specific time ranges (xx.xx to xx.xx) in <timestep> </timestep> tags.

Then, provide the start and end times (in seconds, precise to two decimal places) in the format "start time to end time" within the <answer> </answer> tags. For example: "12.54 to 17.83"."""

QUESTION_TEMPLATE_TG_V2 = """To accurately pinpoint the event "[EVENT]" in the video, determine the precise time period of the event.

Provide the start and end times (in seconds, precise to two decimal places) in the format "start time to end time" within the <answer> </answer> tags. For example: "12.54 to 17.83"."""

QUESTION_TEMPLATE_TG_V3 = """Carefully analyze the video content to determine the precise time period during which "[EVENT]" occurs.  Within the `<think>` tags, provide a detailed description of your thought process, following the format below:
```
<think>
Step-by-step Analysis:
<timestep>Time period 1 (start time to end time)</timestep>: Describe the video content within this time period and determine if it is related to "[EVENT]".
<timestep>Time period 2 (start time to end time)</timestep>: Describe the video content within this time period and determine if it is related to "[EVENT]".
Based on the above analysis, state the precise time period during which "[EVENT]" occurs.
</think>
```
Finally, in the `<answer>` tags, provide the start and end times of "[EVENT]" in the format "start time to end time" (in seconds, precise to two decimal places). For example: "12.54 to 17.83".
```
<answer>
start time to end time
</answer>
```"""

PROMPT_TEMPLATES = {
    "v1": QUESTION_TEMPLATE_TG_V1,
    "v2": QUESTION_TEMPLATE_TG_V2,
    "v3": QUESTION_TEMPLATE_TG_V3,
}


class _MultiSink:
    """Fan metric logs out to every configured sink (tensorboard, wandb)."""

    def __init__(self, sinks):
        self.sinks = sinks

    def log(self, metrics, step):
        for s in self.sinks:
            s.log(metrics, step)

    def close(self):
        for s in self.sinks:
            s.close()


@dataclass
class TrainConfig:
    """Flag-name parity with the reference recipes (main.py:44-119 + GRPOConfig)."""

    output_dir: str = "./logs/run"
    learning_rate: float = 1e-6
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.0
    num_train_epochs: float = 5
    gradient_accumulation_steps: int = 2
    per_device_train_batch_size: int = 1  # reference supports only 1 (SURVEY §3.1)
    max_prompt_length: int = 8192
    max_completion_length: int = 200
    num_generations: int = 8
    temperature: float = 1.0
    beta: float = 0.04
    use_grpo: bool = False
    fix_vit: bool = True
    gradient_checkpointing: bool = False  # jax.checkpoint per decoder layer
    # residual-save policy when gradient_checkpointing is on: "full" (save
    # layer inputs only — min HBM, bwd recomputes the whole layer), "dots"
    # (save every projection output — bwd recomputes only elementwise +
    # flash-attn fwd; needs ~190 MB/layer more HBM at the 3B recipe shape),
    # "dots_small" ("dots" minus the wide gate/up residual). See
    # models/qwen25vl/language.REMAT_POLICIES; measured in
    # scripts/profile_train_step.py.
    remat_policy: str = "full"
    # LoRA (N9: peft_config surface, timer1_trainer.py:184-206; trl ModelConfig names)
    use_peft: bool = False
    lora_r: int = 16
    lora_alpha: float = 32.0
    # rollout sampling through weight-only quantized policy weights ("" | "int8"):
    # ~1.7× faster decode on v5e; logps for the loss are recomputed in full
    # precision (the reference's vLLM rollouts don't bit-match its trainer either)
    rollout_quantization: str = ""
    # shared-prefix loss forward (GRPOSplitBatch): the prompt runs ONCE per
    # prompt and only the completion chunk runs per rollout row — ~(Lp+Lc)/Lc×
    # fewer loss-forward FLOPs at recipe shapes; bit-matches the full-row path
    # (tests/test_grpo.py::test_split_batch_loss_matches_full_rows)
    shared_prefix_loss: bool = True
    # context parallelism (ring attention): shard the loss-forward SEQUENCE
    # over the mesh data axis — O(T/n) activation HBM per device, for video
    # contexts past one chip (SURVEY §5.7 stretch goal, beyond the reference).
    # Uses the full-row batch layout (shared_prefix_loss is turned off).
    context_parallel_size: int = 1
    context_parallel_layout: str = "zigzag"  # or "contiguous"
    prompt_type: str = "v1"
    total_pixels: int = 3584 * 28 * 28
    min_pixels: int = 16 * 28 * 28
    logging_steps: int = 1
    save_steps: int = 50
    save_strategy: str = "steps"  # or "epoch"
    save_only_model: bool = True
    seed: int = 42
    lr_scheduler_type: str = "linear"  # HF Trainer default: linear decay to 0
    is_early_stopping: bool = False  # stop after 1 epoch (SF rounds)
    resume_from_checkpoint: Optional[str] = None
    report_to: str = "tensorboard"  # comma list: tensorboard,wandb,none
    run_name: str = ""  # wandb run name (HF --run_name)
    logging_dir: Optional[str] = None
    # ZeRO-offload capability parity (scripts/zero3_offload.json): keep Adam
    # moments in pinned host memory; XLA streams them per step
    offload_optimizer: bool = False


def make_conversation_video(example: dict, prompt_type: str, total_pixels: int, min_pixels: int):
    """timer1_trainer.py:490-510 / timer1_trainer_ft.py:511-535 parity
    (prompt v1/v2/v3 selection)."""
    prompt_text = PROMPT_TEMPLATES[prompt_type].replace("[EVENT]", example["problem"])
    return [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": prompt_text},
                {
                    "type": "video",
                    "video": example["video_path"],
                    "video_start": example.get("video_start"),
                    "video_end": example.get("video_end"),
                    "total_pixels": total_pixels,
                    "min_pixels": min_pixels,
                },
            ],
        }
    ]


class GRPOTrainer:
    """The training loop. `video_loader(ele: dict) -> (frames TCHW float, sample_fps)`
    is injected so tests can fake the decode path and production uses the
    native FFmpeg pipeline (video/)."""

    def __init__(
        self,
        params: dict,
        cfg: Qwen25VLConfig,
        processor: Qwen25VLProcessor,
        reward_funcs: Sequence[Callable],
        metric_funcs: Sequence[Callable] = (),
        config: Optional[TrainConfig] = None,
        video_loader: Optional[Callable] = None,
        ref_params: Optional[dict] = None,
        dtype=jnp.bfloat16,
        mesh=None,  # jax.sharding.Mesh → FSDP/TP sharded training (N3/N4)
    ):
        # own a private copy: the CP path below mutates shared_prefix_loss,
        # which must never leak into the caller's object (or, worse, a shared
        # default instance)
        config = dataclasses.replace(config) if config is not None else TrainConfig()
        self.cfg = cfg
        self.processor = processor
        self.reward_funcs = list(reward_funcs)
        self.metric_funcs = list(metric_funcs)
        self.c = config
        self.video_loader = video_loader
        self.dtype = dtype
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import shard_params

            params = shard_params(params, mesh)
            if ref_params is not None:
                ref_params = shard_params(ref_params, mesh)
        self.params = params
        # Quantized training base (the single-chip 7B configuration —
        # quantize_params(bits=8), int8 ~8.3 GB vs bf16 15.5 GB): the
        # loss dequant-merges per layer in-scan, ROLLOUTS run over the SAME
        # tree with side-path adapters (Engine.set_lora_side) — one weight
        # tree total, zero per-step weight sync work. Only LoRA training can
        # differentiate through a quantized base. The base may use the
        # decode-FUSED layout (qkv/gu — the default: rollouts then stream the
        # same fewer-but-wider dots as pure serving; per-output-channel scales
        # make fused quantization bit-identical to unfused) or the unfused
        # per-projection layout (fuse=False) — both merge in-scan.
        from ..ops.quant import is_quantized

        _attn = params["text"]["layers"]["self_attn"]
        self._fused_base = "qkv" in _attn
        self._quantized_base = is_quantized(
            _attn["qkv"] if self._fused_base else _attn["q_w"]
        )
        if self._quantized_base and not config.use_peft:
            raise ValueError(
                "a quantized base is trainable via LoRA only (use_peft=True); "
                "full-tree training needs bf16 params"
            )
        # LoRA: adapters as a separate pytree; base stays frozen. When beta≠0
        # the UNMERGED base doubles as the reference model — the peft
        # adapter-disable trick (timer1_trainer.py:624-631), zero extra HBM
        # (vs the non-peft path's second full checkpoint).
        self.lora = None
        self._merge_jit = None
        self._merge_quant_jit = None
        if config.use_peft:
            from .lora import LoRAConfig, fused_splits_for, init_lora, merge_lora

            self.lora_cfg = LoRAConfig(rank=config.lora_r, alpha=config.lora_alpha)
            lora = init_lora(
                params,
                self.lora_cfg,
                jax.random.PRNGKey(config.seed),
                dtype=jnp.float32,
                fused_splits=fused_splits_for(cfg.text) if self._fused_base else None,
            )
            if config.fix_vit:
                lora = {k: v for k, v in lora.items() if not k.startswith("visual")}
            if not lora:
                # e.g. an int4-packed base: _target_paths has no training
                # layout for q4 leaves, so init_lora returns {} — training
                # would "succeed" while updating nothing
                raise ValueError(
                    "use_peft=True found no adaptable weights in this base "
                    "(int4-packed bases are serving-only; train over int8 "
                    "or bf16)"
                )
            self.lora = lora
            if not self._quantized_base:
                self._merge_jit = jax.jit(
                    lambda base, ad: merge_lora(base, ad, self.lora_cfg)
                )
            if config.rollout_quantization and not self._quantized_base:
                # fused merge→quantize as ONE program: the full merged bf16
                # tree never materializes in HBM (XLA frees each merged leaf
                # as soon as its quantize consumes it). Peak per rollout-sync
                # step drops from base+merged+int8 (~16 GB at 3B) to
                # base+int8+one-leaf transients — this is what lets LoRA +
                # int8 rollouts run on one 16 GB chip.
                from ..ops.quant import quantize_params

                _bits = {"int8": 8, "int4": 4}[config.rollout_quantization]
                self._merge_quant_jit = jax.jit(
                    lambda base, ad: quantize_params(
                        merge_lora(base, ad, self.lora_cfg), bits=_bits
                    )
                )
            if config.beta != 0.0 and ref_params is None:
                ref_params = params
        self.ref_params = ref_params if config.beta != 0.0 else None
        self.engine = Engine(
            params, cfg, dtype=dtype,
            # quantized base: the tree is ALREADY in its rollout form — the
            # engine must not re-quantize (fuse=True would try to concat the
            # {q8, s} dicts); side-path adapters carry the policy delta
            quantization=(config.rollout_quantization or None)
            if not self._quantized_base
            else None,
            # int8 KV rides with int8 weights: rollout sampling tolerates the
            # quantized cache (logps for the loss are recomputed in bf16), and
            # decode at the recipe batch is KV+weight-stream-bound — bf16 KV
            # here was leaving ~1.5 ms/step on the table vs the bench config
            kv_cache_quant=bool(config.rollout_quantization),
        )

        self.hp = GRPOHyperParams(
            num_generations=config.num_generations,
            beta=config.beta,
            use_grpo=config.use_grpo,
            fix_vit=config.fix_vit,
            gradient_checkpointing=(config.remat_policy or "full")
            if config.gradient_checkpointing
            else False,
        )
        self._cp = None
        if config.context_parallel_size > 1:
            from ..parallel.mesh import DATA_AXIS

            if mesh is None:
                raise ValueError("context_parallel_size > 1 needs a device mesh")
            if mesh.shape[DATA_AXIS] != config.context_parallel_size:
                raise ValueError(
                    f"context_parallel_size={config.context_parallel_size} must equal "
                    f"the mesh data axis ({mesh.shape[DATA_AXIS]})"
                )
            # CP shards the SEQUENCE; the loss runs on full concatenated rows
            config.shared_prefix_loss = False
            self._cp = (mesh, DATA_AXIS, config.context_parallel_layout)
        # fix_vit single-chip path: the rollout prefill captures its pre-merger
        # ViT hidden states and the loss/ref forwards reuse them — one frozen
        # ViT-blocks pass per step instead of two (engine + precompute). Mesh
        # and multi-process paths keep the precompute (their loss batch is
        # sharded differently from the engine's replicated rollout inputs).
        self.engine.capture_vision_hidden = (
            config.fix_vit and mesh is None and jax.process_count() == 1
        )
        # ref logps as ONE compiled program (closure over cfg/hp/cp — all
        # fixed for the trainer's lifetime): the ref forward is no-grad, so
        # nothing else jits it — unjitted, every op of the 36-layer decoder
        # dispatches eagerly, measured 3.2 s vs ~0.3 s compiled at the 3B
        # recipe shape (the single biggest train-step cost found in round 4)
        _cp_fixed = self._cp
        self._ref_logps_jit = jax.jit(
            lambda p, batch: compute_ref_logps(p, self.cfg, self.hp, batch, cp=_cp_fixed)
        )
        self._setup_optimizer(config.learning_rate)
        self._metrics: dict[str, list] = {}
        self.global_step = 0
        self._rng = np.random.default_rng(config.seed)
        self.timers = None  # set lazily (utils.profiling.PhaseTimers)
        self._tb = None
        # report_to accepts a comma list like HF ("tensorboard,wandb"); each
        # sink is optional and a missing backend degrades with a notice
        sinks = [s.strip() for s in (config.report_to or "none").split(",")]
        _sink_objs = []
        logdir = config.logging_dir or os.path.join(config.output_dir, "tb")
        if "tensorboard" in sinks:
            try:
                from ..utils.logging_sinks import TensorBoardSink

                _sink_objs.append(TensorBoardSink(logdir))
            except Exception as e:  # tensorboard optional
                print(f"[trainer] tensorboard sink unavailable: {e}")
        if "wandb" in sinks:
            try:
                from ..utils.logging_sinks import WandbSink

                _sink_objs.append(WandbSink(logdir, run_name=config.run_name))
            except Exception as e:
                print(f"[trainer] wandb sink unavailable: {e}")
        if _sink_objs:
            self._tb = _MultiSink(_sink_objs)
        from ..utils.logging_sinks import DebugRewardLog
        from ..utils.profiling import PhaseTimers

        self._debug_log = DebugRewardLog()
        self.timers = PhaseTimers()

    # ------------------------------------------------------------------
    def _setup_optimizer(self, learning_rate) -> None:
        """(Re)build adamw (+clip, +accumulation, +offload) with a fixed lr or
        an optax schedule. train() rebuilds with the linear-decay schedule once
        the total step count is known (HF Trainer default lr_scheduler)."""
        config = self.c
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adamw(
                learning_rate=learning_rate,
                b1=config.adam_beta1,
                b2=config.adam_beta2,
                eps=config.adam_epsilon,
                weight_decay=config.weight_decay,
            ),
        )
        # gradient accumulation à la reference (gradient_accumulation_steps)
        if config.gradient_accumulation_steps > 1:
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=config.gradient_accumulation_steps
            )
        trainable = self.lora if self.lora is not None else self.params
        self.opt_state = self.optimizer.init(trainable)
        opt_sharding = None
        if config.offload_optimizer:
            # ZeRO-offload parity: AdamW moments live in pinned host memory
            # between steps; the train step streams them through HBM for the
            # update (make_train_step's offload notes). With a mesh, the
            # state is FSDP-sharded by the same rule table as the params
            # (mu/nu paths end in the param path, so the regex rules apply),
            # bounding the per-device transient at opt_bytes/n_devices.
            # Scalars/small leaves (the adamw step count etc.) stay in HBM:
            # their bytes are nil and XLA's SPMD partitioner rejects
            # host-placement custom-calls on scalar side-effect HLOs.
            try:
                if self.mesh is not None:
                    from ..parallel.sharding import param_shardings

                    dev_sh = param_shardings(self.opt_state, self.mesh)
                    opt_sharding = jax.tree.map(
                        lambda x, s: s.with_memory_kind("pinned_host")
                        if _offloadable(x)
                        else s,
                        self.opt_state,
                        dev_sh,
                    )
                else:
                    dev0 = jax.devices()[0]
                    host = jax.sharding.SingleDeviceSharding(
                        dev0, memory_kind="pinned_host"
                    )
                    dev = jax.sharding.SingleDeviceSharding(dev0)
                    opt_sharding = jax.tree.map(
                        lambda x: host if _offloadable(x) else dev, self.opt_state
                    )
                self.opt_state = jax.tree.map(
                    lambda x, s: jax.device_put(x, s), self.opt_state, opt_sharding
                )
            except Exception as e:
                opt_sharding = None
                print(f"[trainer] optimizer host-offload unavailable on this backend: {e}")
        self._opt_sharding = opt_sharding
        cp = getattr(self, "_cp", None)
        if self.lora is not None:
            self._train_step = make_lora_train_step(
                self.cfg, self.hp, self.optimizer, self.lora_cfg,
                opt_state_sharding=opt_sharding, cp=cp,
            )
        else:
            self._train_step = make_train_step(
                self.cfg, self.hp, self.optimizer, opt_state_sharding=opt_sharding, cp=cp
            )

    # ------------------------------------------------------------------
    def _log_metric(self, key: str, value: float):
        self._metrics.setdefault(key, []).append(float(value))

    def pop_metrics(self) -> dict:
        out = {k: sum(v) / len(v) for k, v in self._metrics.items() if v}
        self._metrics.clear()
        if jax.process_count() > 1:
            out = self._gather_metrics(out)
        return out

    def _registry_keys(self) -> list[str]:
        """The full, deterministic metric-key universe for this trainer
        configuration. Cross-process gathers iterate THIS list (identical on
        every rank by construction) — never the locally-populated dict, whose
        keys are data-dependent (metric funcs returning all-None on a rank's
        shard are skipped, e.g. mqa_answer_reward with no MCQ rows)."""
        keys = (
            [f"rewards/{fn.__name__}" for fn in self.reward_funcs]
            + [f"metrics/{fn.__name__}" for fn in self.metric_funcs]
            + ["reward", "reward_std", "completion_length", "generation_entropy",
               "grad_norm", "loss"]
        )
        if self.c.beta != 0.0:
            keys.append("kl")
        if not self.c.use_grpo:
            keys += ["clip_ratio/low_mean", "clip_ratio/high_mean", "clip_ratio/region_mean"]
        return sorted(set(keys))

    def _gather_metrics(self, metrics: dict) -> dict:
        """Cross-process metric mean — `accelerator.gather_for_metrics` parity
        (timer1_trainer.py:741-777). Gathers a FIXED-order [values | presence]
        vector over the registry keys, so ranks with different populated keys
        still exchange same-shaped arrays; per-key mean runs over the PRESENT
        ranks. Presence is an explicit 0/1 mask, not a NaN sentinel: a rank
        whose metric genuinely went NaN (diverged loss) must poison the mean,
        not silently drop out of it."""
        from jax.experimental import multihost_utils

        keys = self._registry_keys()
        vals = np.asarray([metrics.get(k, 0.0) for k in keys], np.float32)
        present = np.asarray([float(k in metrics) for k in keys], np.float32)
        gathered = np.asarray(
            multihost_utils.process_allgather(np.concatenate([vals, present]))
        )  # (procs, 2K)
        K = len(keys)
        gv, gp = gathered[:, :K], gathered[:, K:]
        out = {}
        for i, k in enumerate(keys):
            n = gp[:, i].sum()
            if n == 0:
                continue
            out[k] = float((gv[:, i] * gp[:, i]).sum() / n)
        # keys outside the registry stay process-local (none today; belt and
        # braces for injected custom metrics)
        for k, v in metrics.items():
            out.setdefault(k, v)
        return out

    # ------------------------------------------------------------------
    def _load_frames(self, example: dict):
        """Video frames: offline-preprocessed arrays when available
        (finetune.py:588-623 path), else live decode + budgeted resize."""
        c = self.c
        pp = example.get("preprocessed_path") or ""
        if pp and os.path.exists(os.path.join(pp, "video.npz")):
            z = np.load(os.path.join(pp, "video.npz"))
            return z["video"].astype(np.float32), float(z["fps"])
        ele = {
            "video": example["video_path"],
            "total_pixels": c.total_pixels,
            "min_pixels": c.min_pixels,
        }
        if example.get("video_start") is not None:
            ele["video_start"] = example["video_start"]
        if example.get("video_end") is not None:
            ele["video_end"] = example["video_end"]
        return self.video_loader(ele)

    def step(self, example: dict) -> dict:
        """One optimizer micro-step on one dataset example (bs=1 × G rollouts,
        the reference's per-rank shape)."""
        return self.step_batch([example])

    def prepare_requests(self, examples: Sequence[dict]) -> list:
        """Host preprocessing for a batch of examples: video decode + budgeted
        resize + chat template + tokenize + patchify → engine Requests.

        Pure host work with no trainer state writes — safe to run on a
        prefetch thread while the device computes the PREVIOUS step (the
        reference overlaps the same work via DataLoader workers,
        timer1_trainer.py's dataloader_num_workers). train() pipelines it
        one batch ahead; callers driving step_batch directly can do the same
        and pass the result as `requests`."""
        c = self.c
        requests = []
        for example in examples:
            frames, sample_fps = self._load_frames(example)
            conv = make_conversation_video(
                example, c.prompt_type, c.total_pixels, c.min_pixels
            )
            prompt_text = self.processor.apply_chat_template(
                conv, add_generation_prompt=True
            )
            proc = self.processor(
                text=[prompt_text], videos=[np.asarray(frames)], fps=[sample_fps]
            )
            prompt_ids = proc.input_ids[0][proc.attention_mask[0] == 1].tolist()
            grid = tuple(int(x) for x in proc.video_grid_thw[0])
            patches = proc.pixel_values_videos
            if self.mesh is None and jax.process_count() == 1:
                # stage patches on device NOW (async, and on the prefetch
                # thread when train() drives this): the ~30 MB fp32 host
                # buffer becomes a 15 MB bf16 device array before the step
                # starts, instead of crossing host→device inside the timed
                # rollout AND again in the loss batch. Mesh/multi-process
                # paths keep numpy — their batch assembly shards host data
                # across processes (_shard_split_batch/_global_vision).
                patches = jax.device_put(jnp.asarray(patches, self.dtype))
            requests.append(
                Request(prompt_ids, patches, grid, proc.second_per_grid_ts[0])
            )
        return requests

    def step_batch(self, examples: Sequence[dict], requests: Optional[list] = None) -> dict:
        """One optimizer micro-step on P examples (example-level DP: batch =
        P×G rows, advantages normalized within each example's G-group — the
        reference's torchrun-N-ranks effective batch, scaled by the mesh
        `data` axis instead of processes).

        requests: pre-built engine Requests for `examples` (prepare_requests
        output, usually from a prefetch thread); None → build them here."""
        c = self.c
        G = c.num_generations
        # live weights once per optimizer step (LoRA merge / re-quantization
        # are full passes over the tree — not per example). LoRA + quantized
        # rollouts ride the fused merge+quantize program (see __init__).
        with self.timers.phase("weight_sync"):
            if self.lora is not None and self._quantized_base:
                # quantized base: the engine already shares the trainer's
                # tree — "sync" is handing it the live adapters (side-path,
                # ops/quant.lora_delta). No merge, no re-quantize, no copy.
                from .lora import lora_layers_tree

                tree, rest = lora_layers_tree(self.lora)
                assert not rest, "side-path adapters live in the decoder layers"
                self.engine.set_lora_side(tree, self.lora_cfg.scaling)
            elif self.lora is not None and self._merge_quant_jit is not None:
                # drop the engine's previous int8 tree BEFORE dispatching the
                # fused merge+quantize: set_params's early-drop only helps the
                # non-prequantized path — here the jit runs in the argument
                # expression, and base bf16 + old int8 + new int8 (~15.3 GB at
                # 3B) OOMs a 16 GB chip (measured)
                self.engine.params = None
                self.engine.set_params(
                    self._merge_quant_jit(self.params, self.lora), prequantized=True
                )
            else:
                self.engine.set_params(self._policy_params())

        # pack ALL P examples into one request batch: the engine prefills each
        # unique prompt once and decodes the P·G rows together (the reference's
        # DP ranks roll out concurrently; a per-example loop would run P
        # sequential prefill+decode programs instead)
        if requests is None:
            with self.timers.phase("host_preproc"):
                requests = self.prepare_requests(examples)

        sp = SamplingParams(
            temperature=c.temperature,
            max_new_tokens=c.max_completion_length,
            stop_token_ids=(self.cfg.eos_token_id,),
            num_return_sequences=G,
            seed=int(self._rng.integers(0, 2**31 - 1)),
        )
        with self.timers.phase("rollout"):
            all_completions = self.engine.generate(requests, sp)  # row-major P·G

        with self.timers.phase("rewards_host"):
            groups, rewards_all = self._score_rollouts(examples, requests, all_completions)

        with self.timers.phase("batch_build"):
            # assemble batch (host padding + device_put)
            if c.shared_prefix_loss:
                batch = build_grpo_split_batch(self.cfg, groups, dtype=self.dtype)
            else:
                pad_multiple = None
                if self._cp is not None:
                    # zig-zag half-chunks (or contiguous chunks) must be
                    # flash-block aligned across the sequence shards
                    n = c.context_parallel_size
                    pad_multiple = (2 if c.context_parallel_layout == "zigzag" else 1) * n * 128
                batch = build_grpo_batch_groups(
                    self.cfg, groups, dtype=self.dtype, pad_multiple=pad_multiple
                )
            if self.mesh is not None and self._cp is None:
                batch = self._shard_batch(
                    batch, [g["grid_thw"] for g in groups if g.get("grid_thw") is not None]
                )
        if self.hp.fix_vit and batch.vision is not None:
            # frozen ViT blocks: reuse the rollout prefill's captured hidden
            # states when they cover exactly this batch's videos (the engine
            # computed them this step, same padded layout — see
            # Engine.capture_vision_hidden); otherwise run the blocks as
            # their own program (one pass serves the policy AND ref forwards
            # — see grpo.precompute_frozen_vision)
            with self.timers.phase("vision_frozen"):
                cap = self.engine.captured_vision
                sig = (
                    tuple(
                        tuple(int(x) for x in g["grid_thw"])
                        for g in groups
                        if g.get("grid_thw") is not None
                    ),
                    int(batch.vision.perm.shape[0]),
                )
                if cap is not None and cap[0] == sig:
                    batch = batch._replace(vision_hidden=cap[1])
                else:
                    batch = precompute_frozen_vision(self.params, self.cfg, batch)
        if self.ref_params is not None:
            with self.timers.phase("ref_logps"):
                ref_logps = self._ref_logps_jit(self.ref_params, batch)
            batch = batch._replace(ref_logps=jax.lax.stop_gradient(ref_logps))

        with self.timers.phase("train_step"):
            if self.lora is not None:
                self.lora, self.opt_state, loss, metrics = self._train_step(
                    self.params, self.lora, self.opt_state, batch
                )
            else:
                self.params, self.opt_state, loss, metrics = self._train_step(
                    self.params, self.opt_state, batch
                )
            if self._opt_sharding is not None:
                # offload: the moments return to pinned host OUTSIDE jit
                # (async device→host copy; see make_train_step's offload notes)
                self.opt_state = jax.device_put(self.opt_state, self._opt_sharding)
        for k, v in metrics.items():
            self._log_metric(k, float(v))
        self.global_step += 1
        return {"loss": float(loss), "reward": float(rewards_all.mean())}

    def _score_rollouts(self, examples, requests, all_completions):
        """Host-side scoring of a step's P·G rollouts: decode texts, run the
        reward/metric functions, compute per-group advantages, and build the
        loss-batch group dicts. Pure host work (regex + numpy) — runs while
        the device sits idle between rollout and the loss forward, which is
        why it gets its own phase timer."""
        G = self.c.num_generations
        groups, rewards_all = [], []
        for ei, (example, req) in enumerate(zip(examples, requests)):
            completions = all_completions[ei * G : (ei + 1) * G]
            completion_texts = self.processor.batch_decode(
                [self._strip_stop(cmp) for cmp in completions], skip_special_tokens=True
            )

            # rewards (host) for this example's group
            reward_kwargs = {
                k: [example[k]] * G for k in example.keys() if k not in ("prompt", "completion")
            }
            rewards_per_func = np.zeros((G, len(self.reward_funcs)), np.float32)
            for i, fn in enumerate(self.reward_funcs):
                out = fn(completions=completion_texts, **reward_kwargs)
                rewards_per_func[:, i] = [0.0 if r is None else float(r) for r in out]
            rewards = rewards_per_func.sum(axis=1)
            if self._debug_log.enabled:
                for g in range(G):
                    self._debug_log.log_reward(
                        completion_texts[g], None, example.get("solution"), float(rewards[g])
                    )
            for i, fn in enumerate(self.reward_funcs):
                self._log_metric(f"rewards/{fn.__name__}", rewards_per_func[:, i].mean())
            for fn in self.metric_funcs:
                vals = fn(completions=completion_texts, **reward_kwargs)
                vals = [v for v in vals if v is not None]
                if vals:
                    self._log_metric(f"metrics/{fn.__name__}", float(np.mean(vals)))
            rewards_all.append(rewards)
            groups.append(
                {
                    "prompt_ids": req.input_ids,
                    "completions": completions,
                    "patches": req.patches,
                    "grid_thw": req.grid_thw,
                    "second_per_grid_t": req.second_per_grid_t,
                }
            )

        rewards_all = np.concatenate(rewards_all)
        advantages = compute_group_advantages(rewards_all, G)
        for i, g in enumerate(groups):
            g["advantages"] = advantages[i * G : (i + 1) * G]
        self._log_metric("reward", rewards_all.mean())
        self._log_metric("reward_std", rewards_all.reshape(-1, G).std(axis=1, ddof=1).mean())
        return groups, rewards_all

    def _shard_batch(self, batch, vis_grids=None):
        """Shard the P·G rollout rows over the data axis.

        Multi-process (jax.distributed): each process contributes its LOCAL
        rows and the global batch is assembled across processes
        (`make_array_from_process_local_data`) — the global train step then
        sees effective batch n_processes × local rows, the reference's
        torchrun-DP semantics with GSPMD doing the gradient reduction.
        Vision rows are assembled globally too (`_global_vision`): every
        process host-allgathers the other ranks' patches + grids, rebuilds
        the vision prep for the UNION of videos, and rebases its rows'
        feature offsets — so a multi-host video step is one SPMD program
        (per-rank video decode + global reduction, timer1_trainer.py:531-607)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS
        from .grpo import GRPOSplitBatch

        if isinstance(batch, GRPOSplitBatch):
            return self._shard_split_batch(batch, vis_grids)
        rows = NamedSharding(self.mesh, P(DATA_AXIS))
        pos_rows = NamedSharding(self.mesh, P(None, DATA_AXIS))
        if jax.process_count() > 1:
            def glob(x, sh):
                return jax.make_array_from_process_local_data(sh, np.asarray(x))

            vision, feat_offsets = batch.vision, batch.feat_offsets
            if self._any_process_has_vision(vision):
                vision, feat_offsets = self._global_vision(batch, vis_grids or [])
            return batch._replace(
                input_ids=glob(batch.input_ids, rows),
                attention_mask=glob(batch.attention_mask, rows),
                completion_mask=glob(batch.completion_mask, rows),
                advantages=glob(batch.advantages, rows),
                position_ids=glob(batch.position_ids, pos_rows),
                vision=vision,
                feat_offsets=(
                    glob(feat_offsets, rows) if feat_offsets is not None else None
                ),
            )
        if batch.input_ids.shape[0] % self.mesh.shape[DATA_AXIS] != 0:
            return batch  # G not divisible by the data axis: replicate
        return batch._replace(
            input_ids=jax.device_put(batch.input_ids, rows),
            attention_mask=jax.device_put(batch.attention_mask, rows),
            completion_mask=jax.device_put(batch.completion_mask, rows),
            advantages=jax.device_put(batch.advantages, rows),
            position_ids=jax.device_put(batch.position_ids, pos_rows),
            feat_offsets=(
                jax.device_put(batch.feat_offsets, rows)
                if batch.feat_offsets is not None
                else None
            ),
        )

    def _shard_split_batch(self, batch, vis_grids=None):
        """Sharding for the shared-prefix (GRPOSplitBatch) layout.

        Completion rows (B = P·G) shard over the data axis exactly like the
        full-row layout. Prompt rows (P) shard over data when P divides the
        axis; otherwise they REPLICATE — each device then runs the (short)
        prompt prefill redundantly, which is never slower than the full-row
        layout where every device ran its rows over the whole prompt anyway.
        Multi-process: completion rows assemble globally per process
        (`make_array_from_process_local_data`); prompt rows host-allgather in
        process order and replicate (group i's comp rows index prefix i via
        the row-major reshape, so prompt order must match the comp-row
        concatenation order — it does, both are process-major)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        rows = NamedSharding(self.mesh, P(DATA_AXIS))
        pos_rows = NamedSharding(self.mesh, P(None, DATA_AXIS))
        rep = NamedSharding(self.mesh, P())
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            def glob(x, sh):
                return jax.make_array_from_process_local_data(sh, np.asarray(x))

            # common bucket widths (power-of-2 buckets usually agree; re-pad
            # when they don't — different processes saw different lengths)
            Lp = int(np.asarray(multihost_utils.process_allgather(
                np.array([batch.prompt_ids.shape[1]], np.int64))).max())
            Lc = int(np.asarray(multihost_utils.process_allgather(
                np.array([batch.comp_ids.shape[1]], np.int64))).max())
            pid, pmask = np.asarray(batch.prompt_ids), np.asarray(batch.prompt_mask)
            ppos = np.asarray(batch.prompt_pos)
            dp = Lp - pid.shape[1]
            if dp:  # grow the LEFT pad (prompts stay ending at column Lp-1)
                pid = np.pad(pid, ((0, 0), (dp, 0)), constant_values=self.cfg.pad_token_id)
                pmask = np.pad(pmask, ((0, 0), (dp, 0)))
                ppos = np.pad(ppos, ((0, 0), (0, 0), (dp, 0)))
            cid, cmask = np.asarray(batch.comp_ids), np.asarray(batch.comp_mask)
            cpos = np.asarray(batch.comp_pos)
            dc = Lc - cid.shape[1]
            if dc:  # grow the RIGHT pad; positions keep advancing
                cid = np.pad(cid, ((0, 0), (0, dc)), constant_values=self.cfg.pad_token_id)
                cmask = np.pad(cmask, ((0, 0), (0, dc)))
                cpos = np.concatenate(
                    [cpos, cpos[:, :, -1:] + np.arange(1, dc + 1)[None, None, :]], axis=2
                )

            vision, feat_offsets = batch.vision, batch.feat_offsets
            if self._any_process_has_vision(vision):
                vision, feat_offsets = self._global_vision(batch, vis_grids or [])

            # prompts: host-allgather the local P rows in process order
            def allg_rows(x):  # (P_local, ...) → (P_global, ...)
                g = np.asarray(multihost_utils.process_allgather(np.asarray(x)))
                return g.reshape((-1,) + g.shape[2:])

            pid_g, pmask_g = allg_rows(pid), allg_rows(pmask)
            ppos_g = np.concatenate(
                list(np.asarray(multihost_utils.process_allgather(ppos))), axis=1
            )
            fo_g = allg_rows(np.asarray(feat_offsets)) if feat_offsets is not None else None

            def repl(x):
                return jax.make_array_from_process_local_data(rep, np.asarray(x))

            return batch._replace(
                prompt_ids=repl(pid_g),
                prompt_mask=repl(pmask_g),
                prompt_pos=repl(ppos_g),
                comp_ids=glob(cid, rows),
                comp_mask=glob(cmask, rows),
                comp_pos=glob(cpos, pos_rows),
                advantages=glob(batch.advantages, rows),
                vision=vision,
                feat_offsets=repl(fo_g) if fo_g is not None else None,
            )

        n_data = self.mesh.shape[DATA_AXIS]
        if batch.comp_ids.shape[0] % n_data != 0:
            return batch  # B not divisible by the data axis: replicate
        p_ok = batch.prompt_ids.shape[0] % n_data == 0
        p_rows = rows if p_ok else rep
        p_pos = pos_rows if p_ok else rep
        return batch._replace(
            prompt_ids=jax.device_put(batch.prompt_ids, p_rows),
            prompt_mask=jax.device_put(batch.prompt_mask, p_rows),
            prompt_pos=jax.device_put(batch.prompt_pos, p_pos),
            comp_ids=jax.device_put(batch.comp_ids, rows),
            comp_mask=jax.device_put(batch.comp_mask, rows),
            comp_pos=jax.device_put(batch.comp_pos, pos_rows),
            advantages=jax.device_put(batch.advantages, rows),
            feat_offsets=(
                jax.device_put(batch.feat_offsets, p_rows)
                if batch.feat_offsets is not None
                else None
            ),
        )

    def _any_process_has_vision(self, vision) -> bool:
        """COLLECTIVE decision whether to run the vision allgathers: every
        rank must take the same branch — a rank whose local shard happens to
        be text-only still has to participate in _global_vision's collectives
        (with zero videos) or the video-carrying ranks hang."""
        from jax.experimental import multihost_utils

        flags = np.asarray(
            multihost_utils.process_allgather(
                np.array([0 if vision is None else 1], np.int64)
            )
        )
        return bool(flags.sum() > 0)

    def _global_vision(self, batch, vis_grids):
        """Union of every process's videos as ONE replicated VisionInputs,
        plus this process's rows' feature offsets rebased to the global
        feature table.

        Host-side DCN allgather of patches (a few MB per video at the
        reference budgets) + a rebuilt vision prep for the union. The ViT
        then runs over all P_global unique videos replicated on each device —
        the dedup already removed the G× factor; the remaining P× redundancy
        matches the reference's per-rank B·G-row ViT forward in spirit
        (timer1_trainer.py:601-607). Patch-axis sharding of the ViT is a
        future optimization (window attention's gathers make GSPMD insert
        early allgathers anyway)."""
        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..models.qwen25vl import VisionInputs
        from .rollout import _pack_vision

        # vis_grids may be EMPTY on this rank (text-only local shard): the
        # rank still participates in every collective with zero videos
        pc, pi = jax.process_count(), jax.process_index()
        unit = self.cfg.vision.merge_unit

        # metadata allgather: per-process video counts + grids (zero-padded)
        counts = np.asarray(
            multihost_utils.process_allgather(np.array([len(vis_grids)], np.int64))
        ).reshape(pc)
        n_max = int(counts.max())
        g_pad = np.zeros((n_max, 3), np.int64)
        for i, g in enumerate(vis_grids):
            g_pad[i] = g
        grids_all = np.asarray(multihost_utils.process_allgather(g_pad)).reshape(pc, n_max, 3)

        # patch allgather on host (rows padded to the max per-process bucket)
        if batch.vision is not None:
            local_np = np.asarray(batch.vision.patches)  # includes local pad rows
        else:
            local_np = np.zeros((0, self.cfg.vision.patch_input_dim), np.float32)
        local_rows = int(g_pad.prod(axis=1).sum())
        rows_all = np.asarray(
            multihost_utils.process_allgather(np.array([local_rows], np.int64))
        ).reshape(pc)
        pad_to = int(
            np.asarray(
                multihost_utils.process_allgather(np.array([local_np.shape[0]], np.int64))
            ).max()
        )
        pp = np.zeros((pad_to, local_np.shape[1]), local_np.dtype)
        pp[: local_np.shape[0]] = local_np
        patches_all = np.asarray(multihost_utils.process_allgather(pp))

        global_grids, real_patches = [], []
        for p in range(pc):
            for i in range(int(counts[p])):
                global_grids.append(tuple(int(x) for x in grids_all[p, i]))
            real_patches.append(patches_all[p, : int(rows_all[p])])

        rep = NamedSharding(self.mesh, P())

        def repl(x):
            return jax.make_array_from_process_local_data(rep, np.asarray(x))

        local_vis = _pack_vision(self.cfg, global_grids, real_patches, self.dtype)
        vis = VisionInputs(*[repl(leaf) for leaf in local_vis])

        # rebase this process's per-row feature offsets past the earlier
        # processes' feature rows (text-only local rows carry offset 0 —
        # unused by the merge, but the array must stay row-aligned)
        feats_per_proc = (grids_all.prod(axis=2) // unit).sum(axis=1)
        base = int(feats_per_proc[:pi].sum())
        if batch.feat_offsets is not None:
            local_off = np.asarray(batch.feat_offsets)
        else:
            from .grpo import GRPOSplitBatch

            rows = (
                batch.prompt_ids if isinstance(batch, GRPOSplitBatch) else batch.input_ids
            ).shape[0]
            local_off = np.zeros((rows,), np.int32)
        return vis, local_off + base

    def _policy_params(self) -> dict:
        """Current policy weights: base, or base functionally merged with the
        live adapters (rollouts and checkpoints see the merged model).

        Quantized base: there IS no merged bf16 tree (that's the point — it
        wouldn't fit the chip). Rollouts use side-path adapters over the base
        (step_batch's weight sync); checkpoints save base + raw adapters."""
        if self.lora is not None:
            if self._quantized_base:
                return self.params
            return self._merge_jit(self.params, self.lora)
        return self.params

    def _strip_stop(self, comp):
        # decode for rewards without the stop token (skip_special_tokens parity)
        return [t for t in comp if t != self.cfg.eos_token_id]

    # ------------------------------------------------------------------
    def train(
        self,
        dataset: Sequence[dict],
        log_fn: Optional[Callable] = None,
        max_steps: Optional[int] = None,
    ):
        """Epoch loop with per-epoch checkpointing and early stopping.

        max_steps (in global_step units, i.e. dataset micro-steps): hard stop
        for resume continuation — the reference recomputes and ENFORCES
        max_steps from trainer_state.json on resume (main.py:589-618) so an
        SF-loop round trains exactly its quota and no more."""
        c = self.c
        n_local = math.ceil(len(dataset) / max(jax.process_count(), 1))
        micro_per_epoch = math.ceil(n_local / max(int(c.per_device_train_batch_size), 1))
        steps_per_epoch = math.ceil(micro_per_epoch / c.gradient_accumulation_steps)
        n_epochs = 1 if c.is_early_stopping else int(math.ceil(c.num_train_epochs))
        if c.lr_scheduler_type == "linear":
            # HF Trainer default: linear warmup (warmup_ratio) then decay to 0
            total_updates = max(steps_per_epoch * n_epochs, 1)
            warmup = int(total_updates * c.warmup_ratio)
            schedule = optax.join_schedules(
                [
                    optax.linear_schedule(0.0, c.learning_rate, max(warmup, 1)),
                    optax.linear_schedule(
                        c.learning_rate, 0.0, max(total_updates - warmup, 1)
                    ),
                ],
                boundaries=[warmup],
            ) if warmup else optax.linear_schedule(c.learning_rate, 0.0, total_updates)
            self._setup_optimizer(schedule)
        # multi-process DP: each process trains its own dataset shard (the
        # reference's torchrun per-rank dataloader split); metric gathering
        # happens in pop_metrics via _gather_metrics. Shards are padded to a
        # COMMON length by wrapping around (HF DistributedSampler semantics) —
        # unequal shards would desynchronize the per-step collectives and
        # hang the job when one process exits the loop early.
        shard = dataset
        if jax.process_count() > 1:
            pc = jax.process_count()
            data = list(dataset)
            total = math.ceil(len(data) / pc) * pc
            # modular repetition: a single wrap slice under-fills when the
            # dataset is smaller than the process count (empty shards would
            # exit the step loop early and hang the other ranks' collectives)
            data = [data[i % len(data)] for i in range(total)]
            shard = data[jax.process_index() :: pc]
        bs = max(int(c.per_device_train_batch_size), 1)
        # one-batch-ahead host-preproc prefetch: video decode + resize +
        # tokenize of batch k+1 runs on a worker thread while the device
        # computes step k (rollout + loss + update) — the reference overlaps
        # the same work with DataLoader workers. One worker suffices: preproc
        # (~0.75 s/video) is well under a step's device time, and in-order
        # submission keeps determinism.
        from concurrent.futures import ThreadPoolExecutor

        batches = [
            (epoch, shard[i : i + bs])
            for epoch in range(n_epochs)
            for i in range(0, len(shard), bs)
        ]
        prefetch = ThreadPoolExecutor(max_workers=1)
        try:
            pending = (
                prefetch.submit(self.prepare_requests, batches[0][1]) if batches else None
            )
            for bi, (epoch, examples) in enumerate(batches):
                if max_steps is not None and self.global_step >= max_steps:
                    return
                with self.timers.phase("host_preproc_wait"):
                    requests = pending.result()
                if bi + 1 < len(batches):
                    pending = prefetch.submit(self.prepare_requests, batches[bi + 1][1])
                info = self.step_batch(examples, requests=requests)
                if self.global_step % c.logging_steps == 0:
                    logs = {"epoch": epoch, "step": self.global_step, **self.pop_metrics()}
                    if self._tb is not None:
                        self._tb.log(logs, self.global_step)
                    (log_fn or print)(logs)
                # save cadence counts OPTIMIZER steps like HF Trainer (its
                # global_step increments per update, ours per micro batch):
                # save when an accumulation window closes AND the update count
                # hits save_steps — with accum=2, save_steps=50 saves at micro
                # steps 100, 200, ..., not 50, 100, ...
                accum = max(int(c.gradient_accumulation_steps), 1)
                opt_step, in_window = divmod(self.global_step, accum)
                if (
                    c.save_strategy == "steps"
                    and in_window == 0
                    and opt_step % c.save_steps == 0
                ):
                    self.save_checkpoint(os.path.join(c.output_dir, f"checkpoint-{opt_step}"))
                # epoch boundary: last batch of this epoch index
                if bi + 1 == len(batches) or batches[bi + 1][0] != epoch:
                    if c.save_strategy == "epoch":
                        self.save_checkpoint(
                            os.path.join(c.output_dir, f"checkpoint-{self.global_step}")
                        )
                    self.save_checkpoint(os.path.join(c.output_dir, f"epoch-{epoch + 1}"))
        finally:
            prefetch.shutdown(wait=False, cancel_futures=True)

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str):
        from ..utils.checkpoint import save_params

        os.makedirs(path, exist_ok=True)
        # LoRA runs save the MERGED model (checkpoints stay HF-exportable and
        # resumable on the non-peft path) plus the raw adapters alongside.
        # Quantized-base runs save the int8 base + adapters (a merged bf16
        # tree would not fit the chip that trained it); HF export goes
        # through the original bf16 checkpoint + lora_adapters.npz.
        save_params(path, self._policy_params())
        if self.lora is not None:
            np.savez(
                os.path.join(path, "lora_adapters.npz"),
                **{
                    f"{p}::{n}": np.asarray(v)
                    for p, ab in self.lora.items()
                    for n, v in ab.items()
                },
            )
        if not self.c.save_only_model:
            # full training state (HF --save_only_model false parity): resume
            # restores Adam moments + the accumulation/schedule counters
            # instead of silently restarting them
            save_params(path, self.opt_state, name="opt_state")
        with open(os.path.join(path, "trainer_state.json"), "w") as f:
            json.dump({"global_step": self.global_step}, f)
        from ..models.qwen25vl.convert import config_to_plain_dict

        with open(os.path.join(path, "timer1_config.json"), "w") as f:
            json.dump(config_to_plain_dict(self.cfg), f)
        self.save_model_card(path)

    def load_checkpoint_state(self, path: str):
        """Restore params, global_step and (when saved) optimizer state.

        LoRA runs: the checkpoint carries MERGED params plus the raw adapters
        (lora_adapters.npz). The frozen base this trainer was constructed with
        is the original checkpoint, so resume keeps the base untouched and
        reloads only the adapters — the saved Adam moments then correspond to
        the restored adapter values. A merged-only checkpoint (adapters file
        missing) is loaded as a new base with fresh adapters; any saved
        opt_state is SKIPPED in that case (it would be stale — moments over
        adapter values that no longer exist)."""
        from ..utils.checkpoint import load_params

        restore_opt = True
        if self.lora is not None:
            lora_path = os.path.join(path, "lora_adapters.npz")
            if os.path.exists(lora_path):
                z = np.load(lora_path)
                lora: dict[str, dict] = {}
                for key in z.files:
                    p, n = key.split("::")
                    lora.setdefault(p, {})[n] = jnp.asarray(z[key], jnp.float32)
                self.lora = lora
            elif self._quantized_base:
                # a quantized-base run always saves base + adapters together
                # (_policy_params); loading a merged-only checkpoint here
                # would allocate a SECOND base tree (engine keeps the old
                # one — 2× HBM and silent rollout/loss divergence)
                raise ValueError(
                    f"quantized-base resume needs {lora_path} — this "
                    "checkpoint has no adapters; pass it as "
                    "--model_name_or_path to start a fresh run instead"
                )
            else:
                self.params = load_params(path, like=self.params)
                restore_opt = False
        else:
            self.params = load_params(path, like=self.params)
        if self.lora is not None and self._quantized_base:
            from .lora import lora_layers_tree

            self.engine.set_lora_side(lora_layers_tree(self.lora)[0], self.lora_cfg.scaling)
        else:
            self.engine.set_params(self._policy_params())
        state_path = os.path.join(path, "trainer_state.json")
        if os.path.exists(state_path):
            with open(state_path) as f:
                self.global_step = json.load(f).get("global_step", self.global_step)
        if restore_opt and os.path.isdir(os.path.join(path, "opt_state")):
            self.opt_state = load_params(path, like=self.opt_state, name="opt_state")
            if self._opt_sharding is not None:
                # offloaded moments live in pinned host memory between steps
                self.opt_state = jax.device_put(self.opt_state, self._opt_sharding)

    def save_model_card(self, path: str):
        """Draft model card (timer1_trainer.py:795-857 capability)."""
        card = (
            "# GRPO-trained Qwen2.5-VL (Time-R1 TPU)\n\n"
            "Trained with Group Relative Policy Optimization "
            "([DeepSeekMath](https://huggingface.co/papers/2402.03300)) on "
            "temporal video grounding with verifiable tIoU/format rewards.\n\n"
            f"- global_step: {self.global_step}\n"
            f"- num_generations (G): {self.c.num_generations}\n"
            f"- temperature: {self.c.temperature}\n"
            f"- beta (KL): {self.c.beta}\n"
            f"- loss: {'vanilla GRPO' if self.c.use_grpo else 'PPO-clip (eps=0.2)'}\n"
            f"- reward_funcs: {[f.__name__ for f in self.reward_funcs]}\n"
        )
        with open(os.path.join(path, "README.md"), "w") as f:
            f.write(card)
