"""Reference-compatible module path (reference: evaluations/detection.py):
batched detection metrics (vectorized, mask-returning) and AP machinery."""

from scd_resnet_tpu.evaluations.detection import (
    ap_all as apAll,
    ap_plots as apPlots,
    average_precision_all as averagePrecisionAll,
    average_precision_plots as averagePrecisionPlots,
    iou as IoU,
    iou_confidence as IoUConfidence,
    mae as MAE,
    orthogonality as Orthogonity,
)

__all__ = ["IoU", "IoUConfidence", "MAE", "Orthogonity",
           "averagePrecisionPlots", "averagePrecisionAll", "apAll",
           "apPlots"]
