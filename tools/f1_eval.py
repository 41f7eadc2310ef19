"""f1_eval.py — detection F1 against annotation ground truth.

The north-star metric (BASELINE.json) is detection F1 on the SCD eval set.
This tool matches test.py detections against the slide's annotation file:
a detection is a true positive when it is the nearest unmatched prediction
within ``--radius`` pixels of a ground-truth center (greedy one-to-one
matching by distance).

Usage:
    python tools/f1_eval.py detections.json annots/ [--radius 24]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

from scd_resnet_tpu.data.labels import load_markers  # noqa: E402


def match_f1(pred_xy: np.ndarray, gt_xy: np.ndarray, radius: float):
    """Greedy nearest-distance one-to-one matching within `radius`."""
    if len(pred_xy) == 0 or len(gt_xy) == 0:
        tp = 0
    else:
        d = np.linalg.norm(pred_xy[:, None, :] - gt_xy[None, :, :], axis=-1)
        tp = 0
        used_p = np.zeros(len(pred_xy), bool)
        used_g = np.zeros(len(gt_xy), bool)
        order = np.dstack(np.unravel_index(np.argsort(d, axis=None), d.shape))[0]
        for pi, gi in order:
            if d[pi, gi] > radius:
                break
            if used_p[pi] or used_g[gi]:
                continue
            used_p[pi] = used_g[gi] = True
            tp += 1
    fp = len(pred_xy) - tp
    fn = len(gt_xy) - tp
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return tp, fp, fn, precision, recall, f1


def group_detections(payload, with_rhr: bool = False):
    """{image: [(x, y[, rhr]), ...]} from a test.py detections JSON,
    seeded with every analyzed image so zero-detection slides still count
    their ground-truth objects as false negatives (older JSONs without
    the "images" key fall back to detection-bearing images only). Shared
    by this evaluator and tools/f1_pipeline.py."""
    out = {image: [] for image in payload.get("images", [])}
    for det in payload["detections"]:
        row = (float(det["x"]), float(det["y"]))
        if with_rhr:
            row += (float(det.get("rhr", 0.0)),)
        out.setdefault(det["image"], []).append(row)
    return out


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("detections", help="test.py output JSON")
    parser.add_argument("annotations", help="annotation .txt folder")
    parser.add_argument("--radius", type=float, default=24.0,
                        help="match radius in full-res pixels")
    args = parser.parse_args()

    with open(args.detections) as f:
        payload = json.load(f)

    by_image = group_detections(payload)

    total_tp = total_fp = total_fn = 0
    for image, preds in sorted(by_image.items()):
        stem = os.path.splitext(os.path.basename(image))[0]
        annot = os.path.join(args.annotations, stem + ".txt")
        markers = load_markers(annot) if os.path.exists(annot) else []
        gt = np.asarray([m.center for m in markers], np.float64).reshape(-1, 2)
        pred = np.asarray(preds, np.float64).reshape(-1, 2)
        tp, fp, fn, precision, recall, f1 = match_f1(pred, gt, args.radius)
        total_tp += tp
        total_fp += fp
        total_fn += fn
        print(f"{stem}: tp={tp} fp={fp} fn={fn} "
              f"P={precision:.3f} R={recall:.3f} F1={f1:.3f}")

    precision = total_tp / max(total_tp + total_fp, 1)
    recall = total_tp / max(total_tp + total_fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    print(json.dumps({"tp": total_tp, "fp": total_fp, "fn": total_fn,
                      "precision": round(precision, 4),
                      "recall": round(recall, 4), "f1": round(f1, 4)}))


if __name__ == "__main__":
    main()
