"""The vectorized AP machinery must reproduce the reference's loops
element-for-element (evaluations/detection.py:207-255) — including score
ties, all-negative sets, and precision plateaus."""

import numpy as np

from scd_resnet_tpu.evaluations.detection import (
    ap_all,
    average_precision_all,
    average_precision_plots,
)


def _plots_loop(ious, scores, obj_num, threshold):
    order = np.argsort(scores, kind="stable")[::-1]
    plots = []
    acc_true = 0
    acc_false = 0
    recall = 0
    total = max(obj_num, 1e-9)
    for idx in order:
        if ious[idx] < threshold:
            acc_false += 1
        else:
            acc_true += 1
            recall += 1
        plots.append((recall / total, acc_true / (acc_true + acc_false)))
    return plots


def _ap_loop(plots):
    x1 = x2 = 1.0
    y = 0.0
    ap = 0.0
    for recall, precision in reversed(plots):
        if precision > y:
            ap += (x2 - x1) * y
            x2 = recall
            x1 = recall
            y = precision
        else:
            x1 = recall
    return ap + x2 * y


def test_ap_matches_reference_loop():
    rng = np.random.default_rng(0)
    cases = []
    for n in (1, 7, 300):
        cases.append((rng.uniform(0, 1, n), rng.uniform(0, 1, n), n // 3 + 1))
    # score ties and iou plateaus
    cases.append((np.array([0.6, 0.6, 0.2, 0.9]),
                  np.array([0.5, 0.5, 0.5, 0.5]), 2))
    # all negatives -> AP 0
    cases.append((np.zeros(10), rng.uniform(0, 1, 10), 4))
    # all positives
    cases.append((np.ones(10), rng.uniform(0, 1, 10), 10))

    for ious, scores, objs in cases:
        for threshold in (0.3, 0.5, 0.9):
            loop_plots = _plots_loop(ious, scores, objs, threshold)
            vec_plots = average_precision_plots(ious, scores, objs, threshold)
            np.testing.assert_allclose(
                np.asarray(loop_plots), np.asarray(vec_plots), atol=1e-12)
            loop_ap = _ap_loop(loop_plots)
            vec_ap = average_precision_all(vec_plots)
            np.testing.assert_allclose(vec_ap, loop_ap, atol=1e-12)
            np.testing.assert_allclose(
                ap_all(ious, scores, objs, threshold), loop_ap, atol=1e-12)


def test_ap_empty():
    assert average_precision_all([]) == 0.0
    assert average_precision_plots(np.zeros(0), np.zeros(0), 0, 0.5).shape \
        == (0, 2)
