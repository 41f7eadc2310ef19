"""Heatmap decode primitives: peak NMS, top-K extraction, feature gathering.

TPU-native re-expression of the reference decode math
(reference: models/backbones/utility.py:76-122):

- ``nonMaximumSuppression``: 3x3 max-pool peak-keep → ``lax.reduce_window``;
- ``extractTopK``: flattened top-k → ``jax.lax.top_k`` (fixed K, static
  shapes — the reference thresholds *after* top-K, which maps cleanly onto
  masked fixed-K arrays, SURVEY.md §7 "hard parts" #2);
- ``gatherFeatures`` / ``reshapeGatherFeatures``: batched index gather via
  ``jnp.take_along_axis``.

Feature maps here are NHWC (TPU-native layout). The flattened index space
matches the reference's NCHW ordering: index = category*(H*W) + y*W + x,
with CLASSDIMENSION categories handled by an explicit transpose before the
flatten (cheap: C is 1 or 3 in every head).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clamp_sigmoid(x, eps: float = 1e-4):
    """Sigmoid clamped to [eps, 1-eps] (utility.py:120-122)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def non_maximum_suppression(heat, kernel_size: int = 3):
    """Keep only local maxima of an NHWC heatmap (utility.py:87-92).

    A window max with SAME padding; positions that equal the window max keep
    their score, every other position is zeroed.
    """
    if kernel_size == 1:
        return heat
    pad = (kernel_size - 1) // 2
    hmax = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return jnp.where(hmax == heat, heat, 0.0)


def extract_topk(scores, k: int = 20):
    """Top-K peaks of an NHWC score map across all categories.

    Returns ``(values, index, category, y, x)``, each (B, K), matching the
    reference contract (utility.py:106-118). ``index`` is the within-category
    flat index ``y*W + x`` used later for feature gathering.
    """
    b, h, w, c = scores.shape
    # match the reference's NCHW flatten order so indices are comparable
    flat = jnp.transpose(scores, (0, 3, 1, 2)).reshape(b, c * h * w)
    top_scores, top_indices = jax.lax.top_k(flat, k)
    top_categories = top_indices // (h * w)
    top_indices = top_indices % (h * w)
    top_y = (top_indices // w).astype(jnp.float32)
    top_x = (top_indices % w).astype(jnp.float32)
    return top_scores, top_indices, top_categories, top_y, top_x


def gather_features(feature, indices):
    """Gather (B, K, D) rows of a (B, HW, D) feature at (B, K) indices
    (utility.py:76-84)."""
    return jnp.take_along_axis(feature, indices[:, :, None], axis=1)


def reshape_gather_features(feat, ind):
    """Flatten an NHWC feature map to (B, HW, C) and gather at (B, K)
    indices (utility.py:94-98).

    NHWC flattens directly to (B, H*W, C) in the same y*W+x order the
    reference obtains from its NCHW permute.
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return gather_features(flat, ind)
