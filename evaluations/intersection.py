"""Reference-compatible module path (reference: evaluations/intersection.py):
IoU-threshold Gaussian radius solvers."""

from scd_resnet_tpu.ops.radius import (
    center_threshold_radius as centerThresholdRadius,
    corner_threshold_radius as cornerThresholdRadius,
)

__all__ = ["centerThresholdRadius", "cornerThresholdRadius"]
