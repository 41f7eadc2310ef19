"""On-device Gaussian heatmap label rendering.

The reference stamps one Gaussian per object in a Python loop on the host
(reference: datasets/scds/scdx16p100.py:514-531 via ``drawGaussian`` at
575-591 and ``gaussianMargin2D`` in datasets/utility.py:11-16). Per stamp:

- integer-truncated center ``(x, y)``;
- radius from ``centerThresholdRadius(2*|maj|, 2*minL, iou)``;
- ROI half-width ``ceil(2 * radius)`` clipped to the image;
- ``exp(-(dx^2 + dy^2) / (2 * sigma^2))`` with ``sigma = radius / 3``;
- additive composition, clamping to 1 after every stamp.

Clamping after every non-negative addition is equivalent to a single
``min(1, sum)`` at the end, so the whole render vectorizes into one
broadcasted O(K*H*W) expression — trivially fused by XLA into the training
step, removing the host-side hot loop named in SURVEY.md §3.5.
"""

from __future__ import annotations

import jax.numpy as jnp

from scd_resnet_tpu.ops.radius import center_threshold_radius


def render_heatmap(locs, valid, size: int, iou_threshold: float = 0.5,
                   radius_fn=None, position_offset=None):
    """Render a (size, size) Gaussian heatmap from up to K objects.

    Args:
      locs: (K, 8) float array of
        ``[ctX, ctY, offX, offY, majX, majY, minL, halo]`` in heatmap
        coordinates (the `.d` archive loc layout, scdManual.py:96-106).
      valid: (K,) bool mask of real objects (tag mask).
      size: heatmap side length (128 for the SCD pipeline).
      iou_threshold: IoU used by the radius solver (0.5 at train time,
        scdx16p100.py:52).
      radius_fn: radius solver, ``center_threshold_radius`` by default;
        pass ``corner_threshold_radius`` for CornerNet-style corner
        heatmaps (intersection.py:40-44).
      position_offset: optional (K, 2) displacement added to the centers
        before stamping — used to render top-left / bottom-right corner
        heatmaps from the same loc records.

    Returns:
      (size, size) float32 heatmap with peaks exactly 1.0 at object centers
      (required: the focal loss selects positives via ``gt == 1``).
    """
    locs = jnp.asarray(locs, jnp.float32)
    k = locs.shape[0]

    # integer-truncated centers; reference uses int() which truncates toward
    # zero — valid objects are non-negative so trunc == floor there, and
    # invalid ones are masked out below.
    px = locs[:, 0]
    py = locs[:, 1]
    if position_offset is not None:
        px = px + position_offset[:, 0]
        py = py + position_offset[:, 1]
    cx = jnp.trunc(px)
    cy = jnp.trunc(py)

    in_bounds = (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
    mask = jnp.asarray(valid, bool) & in_bounds

    width = 2.0 * jnp.sqrt(locs[:, 4] ** 2 + locs[:, 5] ** 2)
    height = 2.0 * locs[:, 6]
    solver = radius_fn if radius_fn is not None else center_threshold_radius
    radius = solver(width, height, iou_threshold)
    # guard degenerate objects so masked lanes don't produce NaNs
    radius = jnp.where(mask & (radius > 0), radius, 1.0)

    roi = jnp.ceil(radius * 2.0)
    sigma = radius / 3.0

    ys = jnp.arange(size, dtype=jnp.float32)
    xs = jnp.arange(size, dtype=jnp.float32)
    # (K, H, W) displacement fields via broadcasting
    dy = ys[None, :, None] - cy[:, None, None]
    dx = xs[None, None, :] - cx[:, None, None]

    gauss = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma)[:, None, None])
    roi_box = (
        (jnp.abs(dx) <= roi[:, None, None]) & (jnp.abs(dy) <= roi[:, None, None])
    )
    stamp = gauss * roi_box * mask[:, None, None].astype(jnp.float32)
    if k == 0:
        return jnp.zeros((size, size), jnp.float32)
    return jnp.minimum(stamp.sum(axis=0), 1.0)
