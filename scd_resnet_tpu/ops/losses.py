"""Detection losses: penalty-reduced focal, masked L1/smooth-L1,
associative-embedding pull/push.

Semantics match the reference exactly (models/losses/focal.py:25-53,
regression.py:28-44, embeddings.py:32-77) but are expressed as pure masked
jnp reductions — no boolean fancy-indexing, so everything stays
static-shaped and jit/pjit friendly. Under a data-parallel mesh these
reductions span the global batch automatically (GSPMD inserts the psum).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def focal_loss(predictions: Sequence[jnp.ndarray], ground_truth, alpha: float = 2.0,
               beta: float = 4.0):
    """CornerNet-style penalty-reduced focal loss over Gaussian heatmaps.

    Args:
      predictions: list of probability heatmaps (one per hourglass stack),
        each the same shape as ``ground_truth``, already sigmoid-clamped.
      ground_truth: rendered Gaussian heatmap; positives are exactly 1.0.

    Positive-count normalization and the all-negative fallback follow
    focal.py:25-53.
    """
    gt = jnp.asarray(ground_truth, jnp.float32)
    pos = (gt == 1.0).astype(jnp.float32)
    neg = (gt < 1.0).astype(jnp.float32)
    neg_weights = jnp.power(1.0 - gt, beta)
    num_pos = pos.sum()

    loss = 0.0
    for pred in predictions:
        pred = jnp.asarray(pred, jnp.float32)
        pos_loss = (jnp.log(pred) * jnp.power(1.0 - pred, alpha) * pos).sum()
        neg_loss = (
            jnp.log(1.0 - pred) * jnp.power(pred, alpha) * neg_weights * neg
        ).sum()
        loss = loss - jnp.where(
            num_pos > 0, (pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0), neg_loss
        )
    return loss


def _masked_regression(err, mask):
    mask = jnp.asarray(mask, jnp.float32)
    num = mask.sum()
    total = (err * mask[:, :, None]).sum()
    return total / (num + 1e-4)


def l1_loss_mask(regression, ground_truth, mask):
    """Masked L1 over gathered (B, K, D) features, sum / (objects + 1e-4)
    (regression.py:37-44). ``mask`` is the (B, K) tag mask; the denominator
    counts objects, not elements — matching the reference."""
    err = jnp.abs(regression - ground_truth)
    return _masked_regression(err, mask)


def smooth_l1_loss_mask(regression, ground_truth, mask):
    """Masked smooth-L1 (Huber, beta=1) — regression.py:28-35."""
    d = jnp.abs(regression - ground_truth)
    err = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    return _masked_regression(err, mask)


def embedding_loss(tag_tl, tag_br, mask):
    """Associative-embedding pull/push loss for corner pairing
    (embeddings.py:32-77).

    Args:
      tag_tl, tag_br: (B, K) or (B, K, 1) embedding tags gathered at
        ground-truth corner locations.
      mask: (B, K) tag mask.

    Returns:
      (pull, push) scalars.
    """
    tag_tl = jnp.asarray(tag_tl, jnp.float32).reshape(mask.shape)
    tag_br = jnp.asarray(tag_br, jnp.float32).reshape(mask.shape)
    maskf = jnp.asarray(mask, jnp.float32)

    num_objs = maskf.sum(axis=1, keepdims=True)  # (B, 1)
    tag_mean = (tag_tl + tag_br) / 2.0

    pull_tl = (jnp.square(tag_tl - tag_mean) / (num_objs + 1e-4) * maskf).sum()
    pull_br = (jnp.square(tag_br - tag_mean) / (num_objs + 1e-4) * maskf).sum()
    pull = pull_tl + pull_br

    # pairwise mask over the K^2 object grid
    pair_mask = maskf[:, None, :] * maskf[:, :, None]  # (B, K, K)
    n = num_objs[:, :, None]  # (B, 1, 1)
    n_sq = (n - 1.0) * n

    dist = tag_mean[:, None, :] - tag_mean[:, :, None]
    dist = jnp.maximum(1.0 - jnp.abs(dist), 0.0)
    dist = dist - 1.0 / (n + 1e-4)
    dist = dist / (n_sq + 1e-4)
    push = (dist * pair_mask).sum()
    return pull, push
