"""Evaluation: device-batched sliding-window 3D inference, 2D per-slice
inference, and segmentation metrics."""

from bcp_tpu.eval.metrics import (
    dice_binary,
    jaccard_binary,
    hd95,
    asd,
    calculate_metric_percase,
    host_largest_cc,
)
from bcp_tpu.eval.sliding_window import SlidingWindowEvaluator
from bcp_tpu.eval.slice2d import Slice2DEvaluator

__all__ = [
    "dice_binary", "jaccard_binary", "hd95", "asd",
    "calculate_metric_percase", "host_largest_cc",
    "SlidingWindowEvaluator", "Slice2DEvaluator",
]
