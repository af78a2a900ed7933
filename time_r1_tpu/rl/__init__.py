from .grpo import GRPOBatch, GRPOHyperParams, compute_group_advantages, grpo_loss, make_train_step
from .rollout import build_grpo_batch, build_grpo_batch_groups
from .trainer import GRPOTrainer, TrainConfig, make_conversation_video

__all__ = [
    "GRPOBatch",
    "GRPOHyperParams",
    "compute_group_advantages",
    "grpo_loss",
    "make_train_step",
    "build_grpo_batch",
    "build_grpo_batch_groups",
    "GRPOTrainer",
    "TrainConfig",
    "make_conversation_video",
]
