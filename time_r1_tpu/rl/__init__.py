from .grpo import (
    GRPOBatch,
    GRPOHyperParams,
    GRPOSplitBatch,
    compute_group_advantages,
    grpo_loss,
    make_train_step,
)
from .rollout import build_grpo_batch, build_grpo_batch_groups, build_grpo_split_batch
from .trainer import GRPOTrainer, TrainConfig, make_conversation_video

__all__ = [
    "GRPOBatch",
    "GRPOSplitBatch",
    "GRPOHyperParams",
    "compute_group_advantages",
    "grpo_loss",
    "make_train_step",
    "build_grpo_batch",
    "build_grpo_batch_groups",
    "build_grpo_split_batch",
    "GRPOTrainer",
    "TrainConfig",
    "make_conversation_video",
]
