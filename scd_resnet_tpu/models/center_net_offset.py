"""CenterNet-with-offset — the production SCD detector.

TPU-native re-design of models/centerNetOffset.py: three terminal heads on
the upsampled ResNet features — heatmap(1), regr(4: majX, majY, minL, halo),
offset(2), all with hidden width 128 (146-148; the `h` variant halves it to
64 per centerNetOffseth.py) — penalty-reduced focal + weighted masked-L1
losses (170-217), sigmoid→NMS→top-K decode (219-251), and the metric
battery evaluation (253-353).

Model contract (shared by every model family here, mirroring the
reference's profile contract at trainer/model/centerOffsetRes10.py:9-18):

- ``Model``: flax module; ``apply(vars, x, train=...)`` → dict of heads
- ``Loss``: callable ``(outs: list[dict], ys) -> (loss, [stat, ...])``
- ``decode(out_dict, k, nms_kernel)`` → list of decode tensors
- ``evaluation(xs, ys, *decode)`` → dict of (values, mask) metric arrays
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from scd_resnet_tpu.evaluations.detection import iou, iou_confidence, mae, orthogonality
from scd_resnet_tpu.models.resnet import DEFAULT_DIMENSIONS, ResNetBackbone, TerminalSpec
from scd_resnet_tpu.ops.decode import (
    clamp_sigmoid,
    extract_topk,
    non_maximum_suppression,
    reshape_gather_features,
)
from scd_resnet_tpu.ops.losses import focal_loss, l1_loss_mask

CLASS_DIMENSION = 1
HEATMAP_SIZE = 128
DOWNSAMPLE = 4


def as_stack_list(outs):
    """Normalize model output to a list of per-stack head dicts: the ResNet
    backbone returns one dict, the stacked hourglass a list (the
    reference's list-of-dicts contract, residuals.py:334 /
    stackHourglass.py:196-229)."""
    return outs if isinstance(outs, (list, tuple)) else [outs]


def _terminals(hidden: int) -> List[TerminalSpec]:
    return [
        TerminalSpec("heatmap", CLASS_DIMENSION, hidden, final_bias=-2.19),
        TerminalSpec("regr", 4, hidden, small_init=True),
        TerminalSpec("offset", 2, hidden, small_init=True),
    ]


class CenterNetResidual(nn.Module):
    """ResNet-backed center detector (centerNetOffset.py:150-168).

    ``terminal_hidden=128`` is the full-width variant; 64 reproduces
    centerNetOffseth.py (the `h`/`q` profiles)."""

    num_layers: int = 10
    dims: Sequence[int] = DEFAULT_DIMENSIONS
    terminal_hidden: int = 128
    # 'bfloat16' runs the conv path at the MXU's native precision;
    # parameters, BN statistics, and the loss stay float32
    compute_dtype: str = "float32"
    # DCNv2 deformable prologue before the first deconv stage
    # (CenterNet-DCN upsampling; the reference's dcn_v2.py capability)
    dcn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        return ResNetBackbone(
            self.num_layers, _terminals(self.terminal_hidden),
            tuple(self.dims), dtype=jnp.dtype(self.compute_dtype),
            deconv_dcn=self.dcn,
        )(x, train)


#: Production hourglass geometry (centerNetOffset.py:80-101) — consumed by
#: CenterNetHourglass below AND the pipelined trainer (parallel/pipeline.py
#: stages must be built from the SAME literals for checkpoint compatibility)
HOURGLASS_ITERATIONS = 5
HOURGLASS_DIMENSIONS = (128, 128, 192, 192, 192, 256)
HOURGLASS_MODULES = (2, 2, 2, 2, 2, 4)
HOURGLASS_PREDICTION_DIM = 256
HOURGLASS_TERMINALS = (
    ("heatmap", CLASS_DIMENSION, -2.19),
    ("regr", 4, None),
    ("offset", 2, None),
)


class CenterNetHourglass(nn.Module):
    """Stacked-hourglass center detector (centerNetOffset.py:78-101):
    5 hourglass iterations, dims [128,128,192,192,192,256], modules
    [2,2,2,2,2,4], stride-2 downsampling (identity pool), heads
    heatmap(1)/regr(4)/offset(2) at prediction dim 256."""

    stacks: int = 1
    # conv-path compute dtype; round-4 finding: the full-cadence champion
    # run trained f32 because this field didn't exist — bf16 is the
    # recommended production mode (see CLAUDE.md hourglass step numbers)
    compute_dtype: str = "float32"
    # per-stack activation rematerialization (memory for FLOPs)
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from scd_resnet_tpu.models.hourglass import StackHourglass

        return StackHourglass(
            hourglass_iterations=HOURGLASS_ITERATIONS,
            stacks=self.stacks,
            dimensions=HOURGLASS_DIMENSIONS,
            modules=HOURGLASS_MODULES,
            prediction_dim=HOURGLASS_PREDICTION_DIM,
            terminals=HOURGLASS_TERMINALS,
            pool_downsample=False,
            remat=self.remat,
            dtype=jnp.dtype(self.compute_dtype),
        )(x, train)


class CenterNetLoss:
    """Focal + weighted masked-L1 regression/offset (centerNetOffset.py:170-217).

    ``ys`` layout (the dataset contract, scdx16p100.py:376-379):
      ys[0] heat (B, H, W, 1); ys[1] tag mask (B, K); ys[2] regr
      (B, K, 6) = [offX, offY, majX, majY, minL, halo]; ys[3] indices (B, K).
    """

    def __init__(self, regression_weight: float = 1.0, offset_weight: float = 0.5):
        self.regression_weight = regression_weight
        self.offset_weight = offset_weight

    def __call__(self, outs: Sequence[Dict[str, jnp.ndarray]], ys):
        heat_gt, tag_mask, regr_gt_full, indices = ys[0], ys[1], ys[2], ys[3]
        regr_gt = regr_gt_full[:, :, 2:6]
        offset_gt = regr_gt_full[:, :, 0:2]

        heats = [clamp_sigmoid(out["heatmap"]) for out in outs]
        focal = focal_loss(heats, heat_gt)

        size_l = 0.0
        offset_l = 0.0
        for out in outs:
            regr = reshape_gather_features(out["regr"], indices)
            off = reshape_gather_features(out["offset"], indices)
            size_l += l1_loss_mask(regr, regr_gt, tag_mask)
            offset_l += l1_loss_mask(off, offset_gt, tag_mask)
        size_l = self.regression_weight * size_l
        offset_l = self.offset_weight * offset_l

        loss = (focal + size_l + offset_l) / len(heats)
        return loss, [focal, size_l, offset_l]


def decode_center_net(out_dict: Dict[str, jnp.ndarray], k: int = 100,
                      nms_kernel_size: int = 3):
    """sigmoid → NMS → top-K → gather (centerNetOffset.py:219-251).

    Returns ``[scores, indices, y, x, offset(B,K,2), regr(B,K,4), out_dict]``.
    """
    heat = jnp.asarray(out_dict["heatmap"], jnp.float32)
    heat = non_maximum_suppression(jax.nn.sigmoid(heat), nms_kernel_size)
    scores, indices, _categories, ys, xs = extract_topk(heat, k)
    regression = reshape_gather_features(out_dict["regr"], indices)
    offset = reshape_gather_features(out_dict["offset"], indices)
    return [scores, indices, ys, xs, offset, regression, out_dict]


def center_net_evaluation(xs, ys, ct_scores, ct_indices, ct_y, ct_x, offset,
                          regression, out_dict, score_threshold: float = 0.3):
    """Validation metric battery (centerNetOffset.py:253-353).

    Builds predicted / ground-truth boxes in heatmap coordinates and runs
    the IoU / orthogonality / MAE family. Returns a dict of
    ``(values..., mask)`` tuples plus per-sample object counts; the profile
    ``expression`` aggregates them on host.
    """
    tag_mask = ys[1]
    regr_gt = ys[2]

    obj_num = jnp.asarray(tag_mask, jnp.float32).sum(axis=1)

    # ys[3] is either (B, K) flat heat indices (training batches) or the
    # (B, K, 8) float loc records (validation batches) — the reference's
    # evaluation branches on the same distinction (centerNetOffset.py:287-292).
    heat_size = out_dict["heatmap"].shape[2]  # HEATMAPSIZE (128 in production)
    if jnp.ndim(ys[3]) == 2:
        indices_gt = ys[3]
        center_y_gt = (indices_gt // heat_size).astype(jnp.float32)
        center_x_gt = (indices_gt % heat_size).astype(jnp.float32)
    else:
        center_x_gt = ys[3][:, :, 0]
        center_y_gt = ys[3][:, :, 1]

    maj_l = jnp.sqrt(regression[:, :, 0] ** 2 + regression[:, :, 1] ** 2)
    bounds = jnp.stack(
        [
            ct_x - maj_l + offset[:, :, 0] / 4,
            ct_y - regression[:, :, 2] + offset[:, :, 1] / 4,
            ct_x + maj_l + offset[:, :, 0] / 4,
            ct_y + regression[:, :, 2] + offset[:, :, 1] / 4,
        ],
        axis=-1,
    )
    bounds_center = jnp.stack([ct_x - 2, ct_y - 2, ct_x + 2, ct_y + 2], axis=-1)
    bounds_offset = jnp.stack(
        [
            ct_x - 2 + offset[:, :, 0] / 4,
            ct_y - 2 + offset[:, :, 1] / 4,
            ct_x + 2 + offset[:, :, 0] / 4,
            ct_y + 2 + offset[:, :, 1] / 4,
        ],
        axis=-1,
    )

    maj_l_gt = jnp.sqrt(regr_gt[:, :, 2] ** 2 + regr_gt[:, :, 3] ** 2)
    gt_locs = jnp.stack(
        [
            center_x_gt - maj_l_gt + regr_gt[:, :, 0] / 4,
            center_y_gt - regr_gt[:, :, 4] + regr_gt[:, :, 1] / 4,
            center_x_gt + maj_l_gt + regr_gt[:, :, 0] / 4,
            center_y_gt + regr_gt[:, :, 4] + regr_gt[:, :, 1] / 4,
        ],
        axis=-1,
    )
    gt_locs_center = jnp.stack(
        [center_x_gt - 2, center_y_gt - 2, center_x_gt + 2, center_y_gt + 2],
        axis=-1,
    )
    gt_locs_offset = jnp.stack(
        [
            center_x_gt - 2 + regr_gt[:, :, 0] / 4,
            center_y_gt - 2 + regr_gt[:, :, 1] / 4,
            center_x_gt + 2 + regr_gt[:, :, 0] / 4,
            center_y_gt + 2 + regr_gt[:, :, 1] / 4,
        ],
        axis=-1,
    )

    maj_pred = jnp.stack(
        [regression[:, :, 0], regression[:, :, 1], maj_l], axis=-1
    )
    regr_pred = jnp.stack(
        [maj_l, regression[:, :, 2], regression[:, :, 3]], axis=-1
    )
    maj_gt = jnp.stack(
        [regr_gt[:, :, 2], regr_gt[:, :, 3], maj_l_gt], axis=-1
    )
    regr_gt3 = jnp.stack(
        [maj_l_gt, regr_gt[:, :, 4], regr_gt[:, :, 5]], axis=-1
    )

    valid = ct_scores >= score_threshold

    def summed(vals, mask, nan_filter=False):
        """Device-side (sum, count) of masked values — the mean metrics
        never leave the chip as full (N, K, L) grids; only the AP pair list
        (iouscore) is transferred. Masked-out lanes can hold inf (IoU with
        a zero union) so they must be zeroed BEFORE the multiply —
        inf * 0 is NaN and would poison the sum."""
        maskf = jnp.asarray(mask, jnp.float32)
        if nan_filter:
            finite = jnp.isfinite(vals)
            maskf = maskf * finite
        vals = jnp.where(maskf > 0, vals, 0.0)
        return (vals * maskf).sum(), maskf.sum()

    ortho_vals, ortho_mask = orthogonality(bounds, gt_locs, maj_pred, maj_gt,
                                           valid)
    ae_maj, ae_min, ae_rad, mae_mask = mae(bounds, gt_locs, regr_pred,
                                           regr_gt3, valid)
    return {
        "iouscore": iou_confidence(bounds, gt_locs, ct_scores, valid),
        "ortho": summed(ortho_vals, ortho_mask, nan_filter=True),
        "ioucenter": summed(*iou(bounds_center, gt_locs_center, valid)),
        "iouoffsetwo": summed(*iou(bounds_center, gt_locs_offset, valid)),
        "iouoffset": summed(*iou(bounds_offset, gt_locs_offset, valid)),
        "maes": (summed(ae_maj, mae_mask), summed(ae_min, mae_mask),
                 summed(ae_rad, mae_mask)),
        "objs": obj_num,
    }
