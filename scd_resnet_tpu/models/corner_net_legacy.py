"""Full original CornerNet: stacked hourglass, per-stack tl/br
heat + embedding-tag + offset heads with corner pooling, associative
embedding pairing decode.

Re-design of models/cornerNetLegacy.py: the backbone diagram at 54-130,
the loss at 558-627 (focal on both corner heatmaps + pull/push embedding +
smooth-L1 corner offsets), and the paired decode at 332-446 producing
(B, detectionCount, 8) detections ``[tlX, tlY, brX, brY, score, tlScore,
brScore, category]``.

Two reference defects fixed here (SURVEY.md #4 and the shape bug noted in
its loss): the loss returns the factory's ``(loss, stats)`` contract, and
embedding tags / offsets are gathered at the ground-truth corner indices
before the pull/push and regression terms (the reference passed raw maps,
which cannot match the (B, K) mask).

Targets (this framework's legacy-corner layout):
``ys = [tlHeat, brHeat, tagMask, tlRegr(B,K,2), brRegr(B,K,2),
tlInds(B,K), brInds(B,K)]``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from scd_resnet_tpu.models.corner_net import CornerPoolBlock
from scd_resnet_tpu.models.hourglass import Hourglass
from scd_resnet_tpu.models.layers import BatchNorm, ConvBlock, conv1x1
from scd_resnet_tpu.models.resnet import Residual
from scd_resnet_tpu.ops.corner_pool import bottom_pool, left_pool, right_pool, top_pool
from scd_resnet_tpu.ops.decode import (
    clamp_sigmoid,
    extract_topk,
    gather_features,
    non_maximum_suppression,
    reshape_gather_features,
)
from scd_resnet_tpu.ops.losses import embedding_loss, focal_loss, smooth_l1_loss_mask


class _CornerBranch(nn.Module):
    """Corner-pool block followed by heat/tag/regr heads
    (cornerNetLegacy.py:131-199 pattern)."""

    categories: int
    pools: Sequence
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = CornerPoolBlock(x.shape[-1], self.pools,
                               dtype=self.dtype)(x, train)

        def head(out_features, name, bias=None):
            y = ConvBlock(256, 3, batch_norm=False, dtype=self.dtype)(feat)
            bias_init = (
                nn.initializers.constant(bias)
                if bias is not None
                else nn.initializers.zeros_init()
            )
            return nn.Conv(out_features, (1, 1), use_bias=True,
                           bias_init=bias_init, name=name)(y)

        return (
            head(self.categories, "heat", bias=-2.19),
            head(1, "tag"),
            head(2, "regr"),
        )


class CornerNetLegacy(nn.Module):
    """Stacked-hourglass CornerNet (cornerNetLegacy.py:540-556: 5
    iterations, dims [256,256,384,384,384,512] — scaled down by default
    here for the single-category SCD task; pass the original dims to
    reproduce the COCO-size network)."""

    categories: int = 1
    stacks: int = 2
    iterations: int = 5
    dimensions: Sequence[int] = (128, 128, 192, 192, 192, 256)
    modules: Sequence[int] = (2, 2, 2, 2, 2, 4)
    prediction_dim: int = 256
    # per-stack/branch activation rematerialization (jax.checkpoint):
    # the 2-stack model's hourglasses + corner branches at 128^2 OOM
    # v5e-1 HBM at batch 32/512^2 when every activation is stored.
    # Scope names are pinned, so parameters are identical either way.
    remat: bool = False
    # conv-path compute dtype; params/BN stats/final 1x1 heads stay float32
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[Dict[str, jnp.ndarray]]:
        dt = jnp.dtype(self.compute_dtype)
        cur_dim = self.dimensions[0]
        inter = ConvBlock(128, 7, stride=2, dtype=dt)(x, train)
        inter = Residual(cur_dim, stride=2, dtype=dt)(inter, train)

        # static_argnums=(2,): (self, x, train) — train is a Python bool
        hourglass_cls = (
            nn.remat(Hourglass, static_argnums=(2,)) if self.remat
            else Hourglass
        )
        branch_cls = (
            nn.remat(_CornerBranch, static_argnums=(2,)) if self.remat
            else _CornerBranch
        )
        outs = []
        for stack_idx in range(self.stacks):
            kp = hourglass_cls(
                self.iterations, self.dimensions, self.modules,
                pool_downsample=False, dtype=dt,
                name="Hourglass_{}".format(stack_idx),
            )(inter, train)
            cnv = ConvBlock(self.prediction_dim, 3, dtype=dt)(kp, train)

            tl_heat, tl_tag, tl_regr = branch_cls(
                self.categories, (top_pool, left_pool), dtype=dt,
                name=f"tl_{stack_idx}"
            )(cnv, train)
            br_heat, br_tag, br_regr = branch_cls(
                self.categories, (bottom_pool, right_pool), dtype=dt,
                name=f"br_{stack_idx}",
            )(cnv, train)
            outs.append(
                {
                    "tl_heat": tl_heat, "br_heat": br_heat,
                    "tl_tag": tl_tag, "br_tag": br_tag,
                    "tl_regr": tl_regr, "br_regr": br_regr,
                }
            )

            if stack_idx < self.stacks - 1:
                shortcut = BatchNorm(dtype=dt)(
                    conv1x1(cur_dim, dtype=dt)(inter), train)
                prev = BatchNorm(dtype=dt)(
                    conv1x1(cur_dim, dtype=dt)(cnv), train)
                inter = nn.relu(shortcut + prev)
                inter = Residual(cur_dim, dtype=dt)(inter, train)

        return outs


class CornerNetLegacyLoss:
    """focal(tl) + focal(br) + pull + push + smoothL1 offsets, averaged
    over stacks (cornerNetLegacy.py:558-627)."""

    def __init__(self, pull_weight: float = 1.0, push_weight: float = 1.0,
                 regression_weight: float = 1.0):
        self.pull_weight = pull_weight
        self.push_weight = push_weight
        self.regression_weight = regression_weight

    def __call__(self, outs, ys):
        tl_heat_gt, br_heat_gt, mask = ys[0], ys[1], ys[2]
        tl_regr_gt, br_regr_gt = ys[3], ys[4]
        tl_inds, br_inds = ys[5], ys[6]

        focal = focal_loss([clamp_sigmoid(o["tl_heat"]) for o in outs],
                           tl_heat_gt)
        focal += focal_loss([clamp_sigmoid(o["br_heat"]) for o in outs],
                            br_heat_gt)

        pull_l = 0.0
        push_l = 0.0
        regr_l = 0.0
        for out in outs:
            tl_tag = reshape_gather_features(out["tl_tag"], tl_inds)
            br_tag = reshape_gather_features(out["br_tag"], br_inds)
            pull, push = embedding_loss(tl_tag, br_tag, mask)
            pull_l += pull
            push_l += push
            tl_regr = reshape_gather_features(out["tl_regr"], tl_inds)
            br_regr = reshape_gather_features(out["br_regr"], br_inds)
            regr_l += smooth_l1_loss_mask(tl_regr, tl_regr_gt, mask)
            regr_l += smooth_l1_loss_mask(br_regr, br_regr_gt, mask)

        pull_l *= self.pull_weight
        push_l *= self.push_weight
        regr_l *= self.regression_weight
        loss = (focal + pull_l + push_l + regr_l) / len(outs)
        return loss, [focal, pull_l, push_l, regr_l]


def decode_corner_net_legacy(out_dict: Dict[str, jnp.ndarray], k: int = 100,
                             nms_kernel_size: int = 1,
                             avg_embedding_threshold: float = 1.0,
                             detection_count: int = 1000):
    """Associative-embedding pairing decode (cornerNetLegacy.py:332-446).

    Returns (B, detection_count, 8) detections
    ``[tlX, tlY, brX, brY, score, tlScore, brScore, category]``; rejected
    pairs carry score -1.
    """
    tl_heat = non_maximum_suppression(
        jax.nn.sigmoid(out_dict["tl_heat"]), nms_kernel_size)
    br_heat = non_maximum_suppression(
        jax.nn.sigmoid(out_dict["br_heat"]), nms_kernel_size)

    tl_s, tl_i, tl_c, tl_y, tl_x = extract_topk(tl_heat, k)
    br_s, br_i, br_c, br_y, br_x = extract_topk(br_heat, k)
    batch = tl_s.shape[0]

    tl_yk = tl_y[:, :, None]
    tl_xk = tl_x[:, :, None]
    br_yk = br_y[:, None, :]
    br_xk = br_x[:, None, :]

    tl_regr = reshape_gather_features(out_dict["tl_regr"], tl_i)
    br_regr = reshape_gather_features(out_dict["br_regr"], br_i)
    tl_xk = tl_xk + tl_regr[:, :, None, 0]
    tl_yk = tl_yk + tl_regr[:, :, None, 1]
    br_xk = br_xk + br_regr[:, None, :, 0]
    br_yk = br_yk + br_regr[:, None, :, 1]

    bboxes = jnp.stack(
        [jnp.broadcast_to(tl_xk, (batch, k, k)),
         jnp.broadcast_to(tl_yk, (batch, k, k)),
         jnp.broadcast_to(br_xk, (batch, k, k)),
         jnp.broadcast_to(br_yk, (batch, k, k))], axis=3,
    )

    tl_tag = reshape_gather_features(out_dict["tl_tag"], tl_i)[:, :, None, 0]
    br_tag = reshape_gather_features(out_dict["br_tag"], br_i)[:, None, :, 0]
    tag_dist = jnp.abs(tl_tag - br_tag)

    scores = (tl_s[:, :, None] + br_s[:, None, :]) / 2.0
    reject = (
        (tl_c[:, :, None] != br_c[:, None, :])
        | (tag_dist > avg_embedding_threshold)
        | (br_xk < tl_xk)
        | (br_yk < tl_yk)
    )
    scores = jnp.where(reject, -1.0, scores)

    flat_scores = scores.reshape(batch, -1)
    top_scores, top_inds = jax.lax.top_k(flat_scores, detection_count)

    flat_boxes = bboxes.reshape(batch, -1, 4)
    boxes = gather_features(flat_boxes, top_inds)

    cats = jnp.broadcast_to(tl_c[:, :, None], (batch, k, k)).reshape(batch, -1)
    cats = jnp.take_along_axis(cats, top_inds, axis=1).astype(jnp.float32)
    tl_sel = jnp.broadcast_to(tl_s[:, :, None], (batch, k, k)).reshape(batch, -1)
    tl_sel = jnp.take_along_axis(tl_sel, top_inds, axis=1)
    br_sel = jnp.broadcast_to(br_s[:, None, :], (batch, k, k)).reshape(batch, -1)
    br_sel = jnp.take_along_axis(br_sel, top_inds, axis=1)

    return jnp.concatenate(
        [boxes, top_scores[:, :, None], tl_sel[:, :, None],
         br_sel[:, :, None], cats[:, :, None]], axis=2,
    )


def decode_corner_net_legacy_list(out_dict, k: int = 100,
                                  nms_kernel_size: int = 1):
    """Factory-contract wrapper: decode returns a list
    (the detections tensor as its single element)."""
    return [decode_corner_net_legacy(out_dict, k, nms_kernel_size)]


def corner_net_legacy_evaluation(xs, ys, detections,
                                 score_threshold: float = 0.3):
    """IoU of embedding-paired boxes vs ground-truth corner boxes.

    Ground-truth boxes recovered from the legacy target layout
    (tl/br indices + fractional offsets). Returns the (values, mask)
    contract for the expression aggregator."""
    from scd_resnet_tpu.evaluations.detection import iou

    mask = ys[2]
    tl_regr, br_regr = ys[3], ys[4]
    tl_inds, br_inds = ys[5], ys[6]
    heat_size = ys[0].shape[2]

    def to_xy(inds, frac):
        x = (inds % heat_size).astype(jnp.float32) + frac[:, :, 0]
        y = (inds // heat_size).astype(jnp.float32) + frac[:, :, 1]
        return x, y

    tlx, tly = to_xy(tl_inds, tl_regr)
    brx, bry = to_xy(br_inds, br_regr)
    gt_boxes = jnp.stack([tlx, tly, brx, bry], axis=-1)
    gt_boxes = jnp.where(mask[:, :, None], gt_boxes, 0.0)

    det_boxes = detections[:, :, 0:4]
    scores = detections[:, :, 4]
    valid = scores >= score_threshold
    obj_num = jnp.asarray(mask, jnp.float32).sum(axis=1)
    vals, pair_mask = iou(det_boxes, gt_boxes, valid)
    sel_scores = jnp.broadcast_to(scores[:, :, None], vals.shape)
    return {"iouscore": (vals, sel_scores, pair_mask), "objs": obj_num}


def expression_corner_net_legacy(batches) -> str:
    import numpy as np

    from scd_resnet_tpu.evaluations.detection import (
        average_precision_all,
        average_precision_plots,
    )

    ious, scores = [], []
    obj_num = 0.0
    for batch in batches:
        obj_num += float(np.asarray(batch["objs"]).sum())
        vals, svals, mask = batch["iouscore"]
        m = np.asarray(mask)
        ious.append(np.asarray(vals)[m])
        scores.append(np.asarray(svals)[m])
    ious = np.concatenate(ious) if ious else np.zeros(0)
    scores = np.concatenate(scores) if scores else np.zeros(0)
    miou = float(ious.mean()) if ious.size else 0.0
    denom = max(obj_num, float(len(ious)))
    ap50 = average_precision_all(
        average_precision_plots(ious, scores, denom, 0.5))
    return "[mIoU] {}    [AP50] {}".format(
        format(miou * 100, "-10.8f"), format(ap50 * 100, "-5.2f"))
