from .checkpoint import (
    find_latest_checkpoint,
    load_weights,
    restore_checkpoint,
    save_checkpoint,
)
from .logging import MetricWriter, format_progress
from .loop import fit
from .metrics import DictAverageMeter, abs_depth_error, depth_metrics, thres_metric
from .schedule import make_schedule, warmup_multistep
from .step import TrainState, make_eval_step, make_optimizer, make_train_step

__all__ = [
    "DictAverageMeter",
    "MetricWriter",
    "TrainState",
    "abs_depth_error",
    "depth_metrics",
    "find_latest_checkpoint",
    "fit",
    "format_progress",
    "load_weights",
    "make_eval_step",
    "make_optimizer",
    "make_schedule",
    "make_train_step",
    "restore_checkpoint",
    "save_checkpoint",
    "thres_metric",
    "warmup_multistep",
]
