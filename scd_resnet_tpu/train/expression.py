"""Validation metric aggregation and the report line.

Host-side re-expression of the profile ``expression()`` aggregator
(trainer/model/centerOffsetRes10.py:18-106): concatenates masked metric
selections across validation batches, computes the means (NaN-filtered
orthogonality), interpolated AP at 0.3/0.5/0.7/0.9, and formats the exact
``[mIoU] ... [avgS]`` line the reference appends to ``evals.{name}.txt``.

Inputs are the (values, mask) tuples produced by
``center_net_evaluation`` — device arrays or numpy."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from scd_resnet_tpu.evaluations.detection import (
    average_precision_all,
    average_precision_plots,
)


def _masked(values, mask) -> np.ndarray:
    return np.asarray(values)[np.asarray(mask)]


def _mean(x: np.ndarray) -> float:
    return float(x.mean()) if x.size else 0.0


def _sum_count_mean(batches: List[Dict], key: str, index=None) -> float:
    """Mean from per-batch device-side (sum, count) pairs."""
    total = 0.0
    count = 0.0
    for batch in batches:
        entry = batch[key] if index is None else batch[key][index]
        total += float(np.asarray(entry[0]))
        count += float(np.asarray(entry[1]))
    return total / count if count > 0 else 0.0


def aggregate_center_net(batches: List[Dict]) -> Dict[str, float]:
    """Aggregate per-batch metric dicts into the scalar report metrics.

    The mean metrics arrive as device-side (sum, count) pairs; only the AP
    pair grid (iouscore) is transferred in full."""
    ious, scores = [], []
    obj_num = 0.0

    for batch in batches:
        obj_num += float(np.asarray(batch["objs"]).sum())
        vals, svals, mask = batch["iouscore"]
        ious.append(_masked(vals, mask))
        scores.append(_masked(svals, mask))

    ious = np.concatenate(ious) if ious else np.zeros(0)
    scores = np.concatenate(scores) if scores else np.zeros(0)

    result = {
        "mIoU": _mean(ious),
        "mIoUC": _sum_count_mean(batches, "ioucenter"),
        "mIoUO": _sum_count_mean(batches, "iouoffset"),
        "mIoUwoO": _sum_count_mean(batches, "iouoffsetwo"),
        "orthogonity": _sum_count_mean(batches, "ortho"),
        "avgScore": _mean(scores),
        "majMAE": _sum_count_mean(batches, "maes", 0),
        "minMAE": _sum_count_mean(batches, "maes", 1),
        "radMAE": _sum_count_mean(batches, "maes", 2),
    }

    obj_num = max(obj_num, float(len(ious)))
    for t in (30, 50, 70, 90):
        plots = average_precision_plots(ious, scores, obj_num, t / 100.0)
        result[f"ap{t}"] = average_precision_all(plots)
    return result


def aggregate_corner_net(batches: List[Dict]) -> Dict[str, float]:
    """Peak AP50/AP75 per head for the corner families. A decoded peak
    counts as a true positive when the ground-truth Gaussian at its pixel
    is >= the threshold (the reference's corner evaluation named these
    metrics but the functions were missing, cornerNet.py:306-321)."""
    result: Dict[str, float] = {}
    obj_num = sum(float(np.asarray(b["objs"]).sum()) for b in batches)
    for head in ("heat", "tl", "br"):
        gts, scores = [], []
        for batch in batches:
            gt, sc, mask = batch[head]
            gts.append(_masked(gt, mask))
            scores.append(_masked(sc, mask))
        gts = np.concatenate(gts) if gts else np.zeros(0)
        scores = np.concatenate(scores) if scores else np.zeros(0)
        denom = max(obj_num, float(len(gts)))
        for t in (50, 75):
            plots = average_precision_plots(gts, scores, denom, t / 100.0)
            result[f"{head}AP{t}"] = average_precision_all(plots)

    # box AP50 over center-gated tl/br pairs (models/corner_net.py
    # pair_corner_boxes) — the box-level metric the peak APs can't give
    ious, scores = [], []
    for batch in batches:
        if "box" not in batch:
            result["boxAP50"] = 0.0
            return result
        vals, svals, mask = batch["box"]
        ious.append(_masked(vals, mask))
        scores.append(_masked(svals, mask))
    ious = np.concatenate(ious) if ious else np.zeros(0)
    scores = np.concatenate(scores) if scores else np.zeros(0)
    denom = max(obj_num, float(len(ious)))
    result["boxAP50"] = average_precision_all(
        average_precision_plots(ious, scores, denom, 0.5))
    return result


def expression_corner_net(batches: List[Dict]) -> str:
    e = aggregate_corner_net(batches)
    return (
        "[heatPeakAP50] {}    [heatPeakAP75] {}    [tlPeakAP50] {}    "
        "[tlPeakAP75] {}    [brPeakAP50] {}    [brPeakAP75] {}    "
        "[boxAP50] {}".format(
            *(format(e[k] * 100, "-5.2f")
              for k in ("heatAP50", "heatAP75", "tlAP50", "tlAP75",
                        "brAP50", "brAP75", "boxAP50"))
        )
    )


def expression_center_net_size(batches: List[Dict]) -> str:
    """Legacy size-regression CenterNet report: mIoU of regressed boxes and
    peak AP at 0.3/0.5/0.75 (the metric names the reference's centerNet
    evaluation declared, centerNet.py:249-254)."""
    ious = []
    gts, scores = [], []
    obj_num = 0.0
    for batch in batches:
        obj_num += float(np.asarray(batch["objs"]).sum())
        vals, mask = batch["iou"]
        ious.append(_masked(vals, mask))
        gt, sc, mask = batch["heat"]
        gts.append(_masked(gt, mask))
        scores.append(_masked(sc, mask))
    ious = np.concatenate(ious) if ious else np.zeros(0)
    gts = np.concatenate(gts) if gts else np.zeros(0)
    scores = np.concatenate(scores) if scores else np.zeros(0)
    denom = max(obj_num, float(len(gts)))
    aps = {
        t: average_precision_all(
            average_precision_plots(gts, scores, denom, t / 100.0))
        for t in (30, 50, 75)
    }
    return "[mIoU] {}    [peakAP30] {}    [peakAP50] {}    [peakAP75] {}".format(
        format(_mean(ious) * 100, "-10.8f"),
        format(aps[30] * 100, "-5.2f"),
        format(aps[50] * 100, "-5.2f"),
        format(aps[75] * 100, "-5.2f"),
    )


def expression_center_net(batches: List[Dict]) -> str:
    """The exact report line format (centerOffsetRes10.py:88-106)."""
    e = aggregate_center_net(batches)
    return (
        "[mIoU] {}    [mIoUC] {}    [mIoUwoO] {}    [mIoUO] {}    "
        "[AP30] {}    [AP50] {}    [AP70] {}    [AP90] {}    [Orth] {}    "
        "[majMAE] {}    [minMAE] {}    [radMAE] {}    [avgS] {}".format(
            format(e["mIoU"] * 100, "-10.8f"),
            format(e["mIoUC"] * 100, "-10.8f"),
            format(e["mIoUwoO"] * 100, "-10.8f"),
            format(e["mIoUO"] * 100, "-10.8f"),
            format(e["ap30"] * 100, "-5.2f"),
            format(e["ap50"] * 100, "-5.2f"),
            format(e["ap70"] * 100, "-5.2f"),
            format(e["ap90"] * 100, "-5.2f"),
            format(e["orthogonity"], "-8.6f"),
            format(e["majMAE"], "-8.6f"),
            format(e["minMAE"], "-8.6f"),
            format(e["radMAE"], "-8.6f"),
            format(e["avgScore"], "-6.4f"),
        )
    )
