"""Legacy CenterNet: center heatmap + box-size regression.

Re-design of models/centerNet.py (unimportable as committed — it pulls
``averageIoU``/``averagePrecision`` that don't exist, SURVEY.md defect #1):
heads heatmap(1) + size(2), loss = focal + smoothL1(size /
(DOWNSAMPLE * SIZEREGRFACTOR)) (centerNet.py:152-192), decode returns
``[scores, inds, y, x, regr(B,K,2), dict]`` (194-222).

Dataset adaptation: the reference's box dataset is absent from its repo;
here size targets derive from the SCD loc records as
``(2*|maj|, 2*minL)`` in heatmap coordinates (the same box geometry the
offset-model evaluation uses, centerNetOffset.py:262-271), so the profile
trains on standard `.d` archives.
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from scd_resnet_tpu.evaluations.detection import iou
from scd_resnet_tpu.models.resnet import DEFAULT_DIMENSIONS, ResNetBackbone, TerminalSpec
from scd_resnet_tpu.ops.decode import (
    clamp_sigmoid,
    extract_topk,
    non_maximum_suppression,
    reshape_gather_features,
)
from scd_resnet_tpu.ops.losses import focal_loss, smooth_l1_loss_mask

CLASS_DIMENSION = 1
SIZE_REGR_FACTOR = 10  # centerNet.py:47
DOWNSAMPLE = 4


class CenterNetSizeResidual(nn.Module):
    """ResNet backbone with heatmap + size heads (centerNet.py:138-150)."""

    num_layers: int = 10
    dims: Sequence[int] = DEFAULT_DIMENSIONS
    # conv-path compute dtype; params/BN stats/heads-output stay float32
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        terminals = [
            TerminalSpec("heatmap", CLASS_DIMENSION, 128, final_bias=-2.19),
            TerminalSpec("size", 2, 128, small_init=True),
        ]
        return ResNetBackbone(self.num_layers, terminals, tuple(self.dims),
                              dtype=jnp.dtype(self.compute_dtype))(
            x, train
        )


def _size_targets(regr_gt_full):
    """(B, K, 2) = (2*|maj|, 2*minL) from the 6-col regr records."""
    maj_l = jnp.sqrt(regr_gt_full[:, :, 2] ** 2 + regr_gt_full[:, :, 3] ** 2)
    return jnp.stack([2 * maj_l, 2 * regr_gt_full[:, :, 4]], axis=-1)


class CenterNetSizeLoss:
    """focal + smoothL1(size / (DOWNSAMPLE*SIZEREGRFACTOR))
    (centerNet.py:152-192)."""

    def __init__(self, regression_weight: float = 1.0):
        self.regression_weight = regression_weight

    def __call__(self, outs, ys):
        heat_gt, tag_mask, regr_gt_full, indices = ys[0], ys[1], ys[2], ys[3]
        size_gt = _size_targets(regr_gt_full)

        heats = [clamp_sigmoid(out["heatmap"]) for out in outs]
        focal = focal_loss(heats, heat_gt)

        size_l = 0.0
        for out in outs:
            size = reshape_gather_features(out["size"], indices)
            size_l += smooth_l1_loss_mask(
                size, size_gt / (DOWNSAMPLE * SIZE_REGR_FACTOR), tag_mask
            )
        size_l = self.regression_weight * size_l

        loss = (focal + size_l) / len(heats)
        return loss, [focal, size_l]


def decode_center_net_size(out_dict: Dict[str, jnp.ndarray], k: int = 100,
                           nms_kernel_size: int = 3):
    """(centerNet.py:194-222)."""
    heat = non_maximum_suppression(
        jax.nn.sigmoid(out_dict["heatmap"]), nms_kernel_size
    )
    scores, inds, _cats, ys, xs = extract_topk(heat, k)
    regression = reshape_gather_features(out_dict["size"], inds)
    return [scores, inds, ys, xs, regression, out_dict]


def center_net_size_evaluation(xs, ys, ct_scores, ct_inds, ct_y, ct_x,
                               regression, out_dict):
    """IoU of size-regressed boxes vs ground truth plus peak hit-rates
    (the reference's intended metrics named at centerNet.py:224-254; the
    functions were missing there — concretely defined here)."""
    tag_mask = ys[1]
    regr_gt = ys[2]

    # the loss trains the head on size / (DOWNSAMPLE * SIZE_REGR_FACTOR)
    # with size already in heatmap coordinates, so the full factor is
    # undone here (the reference divided full-res gt by DOWNSAMPLE instead,
    # centerNet.py:242-246 — same geometry, different unit bookkeeping)
    half = 0.5 * regression * (DOWNSAMPLE * SIZE_REGR_FACTOR)
    bounds = jnp.stack(
        [ct_x - half[:, :, 0], ct_y - half[:, :, 1],
         ct_x + half[:, :, 0], ct_y + half[:, :, 1]], axis=-1,
    )
    heat_size = out_dict["heatmap"].shape[2]
    if jnp.ndim(ys[3]) == 2:
        cx = (ys[3] % heat_size).astype(jnp.float32)
        cy = (ys[3] // heat_size).astype(jnp.float32)
    else:
        cx, cy = ys[3][:, :, 0], ys[3][:, :, 1]
    size_gt = _size_targets(regr_gt)
    gt_bounds = jnp.stack(
        [cx - 0.5 * size_gt[:, :, 0], cy - 0.5 * size_gt[:, :, 1],
         cx + 0.5 * size_gt[:, :, 0], cy + 0.5 * size_gt[:, :, 1]], axis=-1,
    )
    valid = ct_scores >= 0.5

    flat = ys[0][..., 0].reshape(ys[0].shape[0], -1)
    gt_at_peak = jnp.take_along_axis(flat, ct_inds, axis=1)
    obj_num = jnp.asarray(tag_mask, jnp.float32).sum(axis=1)
    return {
        "iou": iou(bounds, gt_bounds, valid),
        "heat": (gt_at_peak, ct_scores, ct_scores >= 0.3),
        "objs": obj_num,
    }
