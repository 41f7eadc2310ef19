"""Full-slide inference: overlap tiling, batched decode, coordinate stitch,
relative-halo-radius (Rhr) computation, and the two-Gaussian histogram fit.

Re-design of the served path (reference: test.py:41-183):

- grayscale with the inference coefficients incl. rounding (test.py:21-33);
- reflect pad to a whole number of (512 - 2*64)-strided clips; border
  semantics generalize the reference's hardcoded fix-up — symmetric on x,
  reflect101 on y — to any slide geometry (ops/image.py);
- 512x512 clips with 64 px shared margins, per-clip standardization,
  batches of 24 through the traced decode (fixed batch: the last partial
  batch is padded and sliced, keeping one compiled shape);
- score threshold 0.3 AFTER top-100 (test.py:107);
- stitch: slide_x = clipX*(512-128) - padLR + ctX*4 + offX;
  Rhr = (4*rad - 4*minL) / (2 * 4*minL) (test.py:117-141);
- quantification: histogram Rhr over [-0.25, 1.25) step 0.01 and
  scipy curve_fit of a 2-Gaussian mixture with the reference bounds
  (test.py:148-183).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from scd_resnet_tpu.ops.image import grayscale_inference, pad_reflect_hybrid

INPUT_SIZE = 512
PADDING_SIZE = 64
DOWNSAMPLE_RATIO = 4
BATCH_SIZE = 24
SCORE_THRESHOLD = 0.3


def gauss2(x, a1, m1, s1, a2, m2, s2):
    """Two-Gaussian mixture (test.py:14)."""
    return a1 * np.exp(-((x - m1) / s1) ** 2) + a2 * np.exp(-((x - m2) / s2) ** 2)


def _normalize(clip: np.ndarray) -> np.ndarray:
    mean = clip.mean()
    var = np.mean((clip - mean) ** 2)
    return (clip - mean) / math.sqrt(var)


def tile_slide(gray: np.ndarray) -> Tuple[np.ndarray, int, int, int, int]:
    """Pad and cut a grayscale slide into overlapping clips.

    Returns ``(clips (N, S, S), clip_h, clip_v, pad_lr, pad_tb)`` with clips
    ordered x-major then y (the reference's loop order, test.py:86-90)."""
    height, width = gray.shape
    stride = INPUT_SIZE - 2 * PADDING_SIZE

    clip_h = math.ceil((width - 2 * PADDING_SIZE) / stride)
    clip_v = math.ceil((height - 2 * PADDING_SIZE) / stride)
    resize_w = stride * clip_h + 2 * PADDING_SIZE
    resize_h = stride * clip_v + 2 * PADDING_SIZE
    if (resize_w - width) % 2 != 0:
        resize_w += 1
    if (resize_h - height) % 2 != 0:
        resize_h += 1
    pad_lr = (resize_w - width) // 2
    pad_tb = (resize_h - height) // 2

    padded = pad_reflect_hybrid(gray, pad_lr, pad_tb)

    clips = np.empty((clip_h * clip_v, INPUT_SIZE, INPUT_SIZE), np.float32)
    i = 0
    for x in range(clip_h):
        for y in range(clip_v):
            clips[i] = _normalize(
                padded[y * stride : y * stride + INPUT_SIZE,
                       x * stride : x * stride + INPUT_SIZE]
            )
            i += 1
    return clips, clip_h, clip_v, pad_lr, pad_tb


def analyse_images(model: Callable, full_path: str,
                   dedupe_radius: Optional[float] = None,
                   batch_size: int = BATCH_SIZE) -> List[List[float]]:
    """Detections ``[slide_x, slide_y, Rhr]`` for one slide image.

    ``model`` maps a (B, 512, 512, 1) float batch to the (10, B, K) stacked
    decode rows (infer/wrapper.py)."""
    rgb = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(full_path))
    gray = grayscale_inference(rgb)
    return analyse_grayscale(model, gray, dedupe_radius, batch_size)


def dedupe_detections(detections: List[List[float]],
                      radius: float) -> List[List[float]]:
    """Greedy duplicate suppression for tile-overlap double detections.

    Clips share 2*64 px margins, so an object near a tile border is decoded
    by both neighbors (the reference's margin filter for this was left
    commented out, test.py:127-130, shipping the duplicates). Keeps the
    first detection and drops later ones within ``radius`` px."""
    kept: List[List[float]] = []
    for det in detections:
        duplicate = any(
            (det[0] - other[0]) ** 2 + (det[1] - other[1]) ** 2
            <= radius * radius
            for other in kept
        )
        if not duplicate:
            kept.append(det)
    return kept


def analyse_grayscale(model: Callable, gray: np.ndarray,
                      dedupe_radius: Optional[float] = None,
                      batch_size: int = BATCH_SIZE) -> List[List[float]]:
    """``batch_size`` must match the model's compiled batch (jax.export
    bundles are shape-specialized; test.py passes the traced shape)."""
    clips, clip_h, clip_v, pad_lr, pad_tb = tile_slide(gray)
    stride = INPUT_SIZE - 2 * PADDING_SIZE

    results = []
    n = len(clips)
    for start in range(0, n, batch_size):
        batch = clips[start : start + batch_size]
        valid = len(batch)
        if valid < batch_size:  # pad to the compiled shape
            batch = np.concatenate(
                [batch, np.zeros((batch_size - valid, INPUT_SIZE, INPUT_SIZE),
                                 np.float32)]
            )
        rows = np.asarray(model(batch[..., None]))
        (scores, _inds, ct_y, ct_x, maj_x, maj_y, min_l, rad,
         off_x, off_y) = rows
        for item in range(valid):
            keep = scores[item] > SCORE_THRESHOLD
            results.append(
                [ct_x[item][keep], ct_y[item][keep], off_x[item][keep],
                 off_y[item][keep], maj_x[item][keep], maj_y[item][keep],
                 min_l[item][keep], rad[item][keep]]
            )

    detections: List[List[float]] = []
    idx = 0
    for x in range(clip_h):
        for y in range(clip_v):
            (center_x, center_y, offset_x, offset_y, _mx, _my, minor_l,
             radius) = results[idx]
            for det in range(len(center_x)):
                dminl = float(minor_l[det]) * 4
                halo = float(radius[det]) * 4
                ratio = (halo - dminl) / (2 * dminl)
                detections.append(
                    [
                        int(x * stride - pad_lr
                            + float(center_x[det]) * 4 + float(offset_x[det])),
                        int(y * stride - pad_tb
                            + float(center_y[det]) * 4 + float(offset_y[det])),
                        ratio,
                    ]
                )
            idx += 1
    if dedupe_radius is not None:
        detections = dedupe_detections(detections, dedupe_radius)
    return detections


def rhr_histogram(rhrs: Sequence[float]) -> Tuple[np.ndarray, np.ndarray]:
    """Frequency histogram over Rhr in [-0.25, 1.25) step 0.01
    (test.py:174-176)."""
    xs = np.array([(x - 25) / 100 for x in range(150)])
    ys = np.zeros(150)
    for r in rhrs:
        bucket = int(math.floor((r + 0.25) * 100))
        if 0 <= bucket < 150:
            ys[bucket] += 1
    total = ys.sum()
    if total > 0:
        ys = ys / total
    return xs, ys


def fit_rhr(rhrs: Sequence[float]):
    """Two-Gaussian fit with the reference's bounds (test.py:177-182).
    Returns ``[a1, m1, s1, a2, m2, s2]``."""
    from scipy.optimize import curve_fit

    xs, ys = rhr_histogram(rhrs)
    bounds = ([0, -0.25, 0, 0, 0, 0], [1, 0.33, 0.2, 1, 1.25, 1])
    popt, _ = curve_fit(gauss2, xs, ys, bounds=bounds, maxfev=5000)
    return list(popt)
