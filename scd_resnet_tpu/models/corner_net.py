"""CornerNet-style detectors on the ResNet backbone.

Three model families re-designed from the reference (all three were
unimportable as committed — broken imports, SURVEY.md defect #1 — so this
rebuild makes them actually trainable, as BASELINE.json requires):

- ``CornerNetResidual`` (models/cornerNet.py:200-230): heads heatmap(1) +
  tl(1) + br(1), plain conv terminals, 3x focal loss (234-270),
  3x sigmoid->NMS->top-K decode (272-304);
- ``CornerNetCPoolResidual`` (models/cornerNetCPool.py): same, but the
  tl/br terminals get a real corner-pooling prologue — the ``CornerPool``
  fusion block (two 3x3 conv branches, directional running-max pools,
  merge + shortcut; cornerNetCPool.py:53-122) built on the cummax corner
  pools in ops/corner_pool.py (replacing the reference's C++ extensions);
- ``CornerNetCombined`` (models/cornerNetCombined.py): one heatmap(3)
  terminal whose channels 0/1/2 are center/tl/br, sliced in the loss and
  decode (242-305).

Dataset contract: the corner families train with ``corner_targets=True``
batches — ``ys = [heat, tagMask, regr, inds, tlHeat, brHeat]`` (the
reference's corner dataset is absent from its repo; this layout is this
framework's, documented here).

The reference's corner evaluation called undefined functions
(``averagePrecision``, cornerNet.py:43); here ``corner_net_evaluation``
defines peak AP concretely: a decoded peak is a true positive when the
ground-truth Gaussian at its pixel is at least the IoU threshold.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from scd_resnet_tpu.models.layers import BatchNorm, ConvBlock, conv1x1
from scd_resnet_tpu.models.resnet import (
    DEFAULT_DIMENSIONS,
    RESNET_SPEC,
    ResNetBackbone,
    TerminalSpec,
)
from scd_resnet_tpu.ops.corner_pool import bottom_pool, left_pool, right_pool, top_pool
from scd_resnet_tpu.ops.decode import (
    clamp_sigmoid,
    extract_topk,
    non_maximum_suppression,
    reshape_gather_features,
)
from scd_resnet_tpu.ops.losses import focal_loss

CLASS_DIMENSION = 1


class CornerPoolBlock(nn.Module):
    """Corner-pool fusion block (cornerNetCPool.py:53-122): two 128-wide
    conv branches with directional pools, merged 3x3 conv + BN, plus a
    1x1 conv + BN shortcut, ReLU, and a final 3x3 conv block."""

    features: int
    pools: Sequence  # two pooling callables, e.g. (top_pool, left_pool)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p1 = ConvBlock(128, 3, dtype=self.dtype)(x, train)
        p1 = self.pools[0](p1)
        p2 = ConvBlock(128, 3, dtype=self.dtype)(x, train)
        p2 = self.pools[1](p2)

        merged = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                         dtype=self.dtype)(p1 + p2)
        merged = BatchNorm(dtype=self.dtype)(merged, train)

        shortcut = conv1x1(self.features, dtype=self.dtype)(x)
        shortcut = BatchNorm(dtype=self.dtype)(shortcut, train)

        out = nn.relu(merged + shortcut)
        return ConvBlock(self.features, 3, dtype=self.dtype)(out, train)


def _heat_terminals() -> List[TerminalSpec]:
    return [
        TerminalSpec("heatmap", CLASS_DIMENSION, 128, final_bias=-2.19),
        TerminalSpec("tl", CLASS_DIMENSION, 128, final_bias=-2.19),
        TerminalSpec("br", CLASS_DIMENSION, 128, final_bias=-2.19),
    ]


class CornerNetResidual(nn.Module):
    """Plain-terminal corner detector (cornerNet.py:200-230)."""

    num_layers: int = 10
    dims: Sequence[int] = DEFAULT_DIMENSIONS
    # conv-path compute dtype; params/BN stats/heads-output stay float32
    # (the CenterNetResidual convention, center_net_offset.py:69)
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        return ResNetBackbone(self.num_layers, _heat_terminals(),
                              tuple(self.dims),
                              dtype=jnp.dtype(self.compute_dtype))(x, train)


class _CornerHead(nn.Module):
    """CornerPool prologue + Conv3x3(128)+ReLU+Conv1x1 terminal
    (cornerNetCPool.py:163-199)."""

    pools: Sequence
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = CornerPoolBlock(x.shape[-1], self.pools, dtype=self.dtype)(x, train)
        x = nn.Conv(128, (3, 3), padding=1, use_bias=True,
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        # final 1x1 emits float32 (dtype=None promotes with the f32 params)
        return nn.Conv(
            CLASS_DIMENSION, (1, 1), use_bias=True,
            bias_init=nn.initializers.constant(-2.19),
        )(x)


class CornerNetCPoolResidual(nn.Module):
    """Corner detector with real corner pooling on the tl/br heads
    (cornerNetCPool.py:220-236).

    Training note (observed, reproduced on CPU and TPU with both pool
    implementations): with the reference's head composition — plain center
    terminal next to CornerPool-prologue tl/br heads on a shared trunk —
    the corner heads learn quickly but the center heatmap head converges
    far slower than in CornerNetResidual (the reference never trained this
    model; it was unimportable as committed). Budget extra iterations or a
    separate LR for the center head when using this family."""

    num_layers: int = 10
    dims: Sequence[int] = DEFAULT_DIMENSIONS
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = jnp.dtype(self.compute_dtype)
        # shared trunk (stem + stages + deconvs), then the plain center head
        # and the corner-pooled tl/br heads on the same feature map
        features = ResNetBackbone(self.num_layers, (), tuple(self.dims),
                                  dtype=dt)(x, train)
        heat = nn.Conv(128, (3, 3), padding=1, use_bias=True,
                       dtype=dt)(features)
        heat = nn.relu(heat)
        heat = nn.Conv(CLASS_DIMENSION, (1, 1), use_bias=True,
                       bias_init=nn.initializers.constant(-2.19))(heat)
        tl = _CornerHead((top_pool, left_pool), dtype=dt,
                         name="tl_head")(features, train)
        br = _CornerHead((bottom_pool, right_pool), dtype=dt,
                         name="br_head")(features, train)
        return {"heatmap": heat, "tl": tl, "br": br}


class CornerNetCombined(nn.Module):
    """Single heatmap(3) terminal; channels = center/tl/br
    (cornerNetCombined.py:213-230)."""

    num_layers: int = 10
    dims: Sequence[int] = DEFAULT_DIMENSIONS
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        return ResNetBackbone(
            self.num_layers,
            [TerminalSpec("heatmap", 3, 128, final_bias=-2.19)],
            tuple(self.dims),
            dtype=jnp.dtype(self.compute_dtype),
        )(x, train)


def _split_combined(out: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    heat = out["heatmap"]
    return {
        "heatmap": heat[..., 0:1],
        "tl": heat[..., 1:2],
        "br": heat[..., 2:3],
    }


class CornerNetLoss:
    """3x penalty-reduced focal over center/tl/br heatmaps
    (cornerNet.py:234-270; cornerNetCombined slices channels, 242-270).

    ``ys = [heat, tagMask, regr, inds, tlHeat, brHeat]``."""

    def __init__(self, combined: bool = False):
        self.combined = combined

    def __call__(self, outs, ys):
        heat_gt, tl_gt, br_gt = ys[0], ys[4], ys[5]
        heats, tls, brs = [], [], []
        for out in outs:
            if self.combined:
                out = _split_combined(out)
            heats.append(clamp_sigmoid(out["heatmap"]))
            tls.append(clamp_sigmoid(out["tl"]))
            brs.append(clamp_sigmoid(out["br"]))
        focal = (
            focal_loss(heats, heat_gt)
            + focal_loss(tls, tl_gt)
            + focal_loss(brs, br_gt)
        )
        loss = focal / len(heats)
        return loss, [focal]


def decode_corner_net(out_dict: Dict[str, jnp.ndarray], k: int = 100,
                      nms_kernel_size: int = 3, combined: bool = False):
    """3x sigmoid -> NMS -> top-K (cornerNet.py:272-304). Returns
    ``[ctS, ctI, ctY, ctX, tlS, tlI, tlY, tlX, brS, brI, brY, brX, dict]``."""
    if combined:
        out_dict = _split_combined(out_dict)
    rows = []
    for head in ("heatmap", "tl", "br"):
        heat = non_maximum_suppression(
            jax.nn.sigmoid(out_dict[head]), nms_kernel_size
        )
        scores, inds, _cats, ys, xs = extract_topk(heat, k)
        rows += [scores, inds, ys, xs]
    return rows + [out_dict]


def pair_corner_boxes(ct_heat, tl_s, tl_y, tl_x, br_s, br_y, br_x,
                      detection_count: int = 1000,
                      center_threshold: float = 0.05,
                      center_window: int = 5,
                      center_gate: str = "point"):
    """Geometric tl/br peak pairing into boxes for the embedding-free
    corner families.

    The cornerRes/cornerCPool/cornerCombined heads carry no associative
    embeddings or offset regressions (cornerNet.py:200-230 — only three
    heatmaps), so pairing is geometric, center-gated in the spirit of
    CenterNet-triplets: every (tl, br) peak pair scores (tlS + brS)/2,
    rejected when br is not below-right of tl or when the center heatmap
    (sigmoid) near the pair midpoint falls below ``center_threshold`` —
    the model's own center head arbitrates which corner pairs belong to
    one object. Three gate variants, ablated offline with
    tools/eval_checkpoint.py (SCD_CORNER_CENTER_GATE/_WINDOW env):

    - ``point`` (default): sample the sigmoid heat at the floored pair
      midpoint — the original gate.
    - ``window``: max over a ``center_window``² neighborhood. Measured
      round 5 (gate_rescore_r5.txt): a split negative — it rescues LATE
      checkpoints whose focal-sharpened center peaks the floored midpoint
      misses by 1-2 px (cpool @13,200: boxAP50 20.19 → 41.61) but
      collapses EARLY ones whose blurry heat exceeds the threshold almost
      everywhere, flooding the pairing with false boxes (corner best
      @550: 80.48 → 65.68; cpool best @1,100: 61.76 → 31.57).
    - ``peak``: non-maximum-suppress the center heat first (only local
      maxima survive), then window-max — the CenterNet-triplets check
      "does a detected center keypoint fall in the central region".
      Measured: the only gate that rescues the late cpool collapse
      (20.19 → 49.57) while staying near-point early (corner best
      @550: 79.42 vs point 80.48), but 5-10 boxAP50 below point at the
      mid checkpoints — the corner-family decay is therefore PART decode
      artifact (point-sampling sharp peaks) and PART real pairing
      dynamics (it decays under every gate). Point stays the default:
      best at 3 of the 4 measured checkpoints and round-4-comparable.

    Returns ``(boxes, scores)``: (B, D, 4)
    [tlX, tlY, brX, brY] and (B, D); rejected pairs carry score -1.
    """
    b, k = tl_s.shape
    hs_y, hs_x = ct_heat.shape[1], ct_heat.shape[2]
    tlx, tly = tl_x[:, :, None], tl_y[:, :, None]
    brx, bry = br_x[:, None, :], br_y[:, None, :]

    ct = jax.nn.sigmoid(ct_heat[..., :1])
    if center_gate == "peak":
        ct = non_maximum_suppression(ct)
    if center_gate != "point" and center_window > 1:
        pad = (center_window - 1) // 2
        ct = jax.lax.reduce_window(
            ct, -jnp.inf, jax.lax.max,
            window_dimensions=(1, center_window, center_window, 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
        )
    heat = ct[..., 0].reshape(b, -1)
    mid_x = jnp.clip(jnp.floor((tlx + brx) / 2.0), 0, hs_x - 1)
    mid_y = jnp.clip(jnp.floor((tly + bry) / 2.0), 0, hs_y - 1)
    mid_i = (mid_y * hs_x + mid_x).astype(jnp.int32).reshape(b, -1)
    mid_score = jnp.take_along_axis(heat, mid_i, axis=1).reshape(b, k, k)

    scores = (tl_s[:, :, None] + br_s[:, None, :]) / 2.0
    reject = (brx < tlx) | (bry < tly) | (mid_score < center_threshold)
    scores = jnp.where(reject, -1.0, scores)

    count = min(detection_count, k * k)
    top_scores, top_inds = jax.lax.top_k(scores.reshape(b, -1), count)
    boxes = jnp.stack(
        [jnp.broadcast_to(tlx, (b, k, k)),
         jnp.broadcast_to(tly, (b, k, k)),
         jnp.broadcast_to(brx, (b, k, k)),
         jnp.broadcast_to(bry, (b, k, k))], axis=3,
    ).reshape(b, -1, 4)
    boxes = jnp.take_along_axis(boxes, top_inds[:, :, None], axis=1)
    return boxes, top_scores


def corner_net_evaluation(xs, ys, ct_s, ct_i, ct_y, ct_x, tl_s, tl_i, tl_y,
                          tl_x, br_s, br_i, br_y, br_x, out_dict):
    """Peak AP battery + box AP: a decoded peak is a true positive when the
    ground-truth Gaussian value at its pixel >= the AP threshold. Returns
    per-head (tp_value, score, mask) triples plus an ``iou_confidence``
    grid for center-gated paired boxes (``pair_corner_boxes``) against the
    ground-truth corner boxes, so the expression reports box AP50 next to
    the per-head peak APs (the reference's intended but undefined metrics,
    cornerNet.py:306-321)."""
    from scd_resnet_tpu.evaluations.detection import iou_confidence

    def gt_at(gt_heat, inds):
        flat = gt_heat[..., 0].reshape(gt_heat.shape[0], -1)
        return jnp.take_along_axis(flat, inds, axis=1)

    obj_num = jnp.asarray(ys[1], jnp.float32).sum(axis=1)
    valid_ct = ct_s >= 0.3
    valid_tl = tl_s >= 0.3
    valid_br = br_s >= 0.3

    # ground-truth boxes: integer center (ys[3] indices) -/+ (|maj|, minL)
    # — the same geometry the tl/br target renderer stamps
    # (data/pipeline.py corner_targets branch); masked rows zero out so
    # the gt_area>eps guard in _pairwise excludes them
    hs = ys[0].shape[2]
    regr, inds, tag_mask = ys[2], ys[3], ys[1]
    cx = (inds % hs).astype(jnp.float32)
    cy = (inds // hs).astype(jnp.float32)
    maj_l = jnp.sqrt(regr[:, :, 2] ** 2 + regr[:, :, 3] ** 2)
    min_l = regr[:, :, 4]
    gt_boxes = jnp.stack(
        [cx - maj_l, cy - min_l, cx + maj_l, cy + min_l], axis=-1)
    gt_boxes = jnp.where(tag_mask[:, :, None], gt_boxes, 0.0)

    # SCD_CORNER_CENTER_GATE / _WINDOW ablate the pairing gate (read at
    # trace time; see pair_corner_boxes for the measured trade-offs).
    # Used by tools/eval_checkpoint.py to re-score checkpoints offline.
    boxes, box_scores = pair_corner_boxes(
        out_dict["heatmap"], tl_s, tl_y, tl_x, br_s, br_y, br_x,
        center_window=int(os.environ.get("SCD_CORNER_CENTER_WINDOW", "5")),
        center_gate=os.environ.get("SCD_CORNER_CENTER_GATE", "point"))
    vals, svals, pair_mask = iou_confidence(
        boxes, gt_boxes, box_scores, box_scores >= 0.3)

    return {
        "heat": (gt_at(ys[0], ct_i), ct_s, valid_ct),
        "tl": (gt_at(ys[4], tl_i), tl_s, valid_tl),
        "br": (gt_at(ys[5], br_i), br_s, valid_br),
        "box": (vals, svals, pair_mask),
        "objs": obj_num,
    }
