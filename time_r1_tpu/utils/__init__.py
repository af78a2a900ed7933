"""Pure-math host-side core (vision budgeting, rewards, parsing, scoring,
curriculum sampling — no jax/torch imports in those modules) plus shared
infrastructure (checkpointing, profiling, logging sinks, imported lazily)."""

from .metrics import calc_difficulty, calc_score, compute_IoU
from .parsing import extract_answer, extract_answer_force, mcq_is_correct
from .rewards import (
    METRIC_FUNCS_REGISTRY,
    REWARD_FUNCS_REGISTRY,
    format_reward,
    iou_timestamp_reward,
    iou_timestamp_reward_v2,
    parse_timestamp_output,
)
from .vision_math import (
    FPS_MAX_FRAMES,
    FRAME_FACTOR,
    IMAGE_FACTOR,
    VIDEO_MAX_PIXELS,
    VIDEO_MIN_PIXELS,
    ceil_by_factor,
    floor_by_factor,
    plan_frame_window,
    plan_video_shapes,
    round_by_factor,
    smart_nframes,
    smart_resize,
)

__all__ = [
    "calc_difficulty",
    "calc_score",
    "compute_IoU",
    "extract_answer",
    "extract_answer_force",
    "mcq_is_correct",
    "METRIC_FUNCS_REGISTRY",
    "REWARD_FUNCS_REGISTRY",
    "format_reward",
    "iou_timestamp_reward",
    "iou_timestamp_reward_v2",
    "parse_timestamp_output",
    "FPS_MAX_FRAMES",
    "FRAME_FACTOR",
    "IMAGE_FACTOR",
    "VIDEO_MAX_PIXELS",
    "VIDEO_MIN_PIXELS",
    "ceil_by_factor",
    "floor_by_factor",
    "plan_frame_window",
    "plan_video_shapes",
    "round_by_factor",
    "smart_nframes",
    "smart_resize",
]
