"""Fused on-device batch augmentation + label rendering.

The reference does per-sample augmentation and Gaussian stamping in Python
inside ``Dataset.__getitem__`` with ``.cuda()`` transfers per tensor
(scdx16p100.py:304-379, 416-536) — the host-side hot loop called out in
SURVEY.md §3.5. Here the whole thing is one jittable batch transform, fused
by XLA into the training step so raw uint8/float clips are the only
host→device traffic:

- random H/V flips with the coordinate/vector sign flips (scdx16p100.py:424-436),
- per-image standardization, variance jitter, Gaussian pixel noise (438-440),
- tag mask with out-of-bounds suppression (332-344),
- flat heatmap indices with dummy-0 for masked lanes (337-344),
- vectorized Gaussian heatmap rendering at IoU threshold 0.5 (514-531).
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp

from scd_resnet_tpu.ops.gaussian import render_heatmap

THRESHOLD_IOU = 0.5  # scdx16p100.py:52


def _flip_locs_x(locs, heat_size):
    out = locs.at[:, :, 0].set(heat_size - 1 - locs[:, :, 0])
    out = out.at[:, :, 2].set(-locs[:, :, 2])  # offset x
    out = out.at[:, :, 4].set(-locs[:, :, 4])  # major axis x
    return out


def _flip_locs_y(locs, heat_size):
    out = locs.at[:, :, 1].set(heat_size - 1 - locs[:, :, 1])
    out = out.at[:, :, 3].set(-locs[:, :, 3])  # offset y
    out = out.at[:, :, 5].set(-locs[:, :, 5])  # major axis y
    return out


@partial(jax.jit, static_argnames=("heat_size", "augment"))
def augment_and_render_batch(key, samples, locs, counts, heat_size: int,
                             augment: bool = True, noise_sv: float = 0.05,
                             jitter_sv: float = 0.05):
    """Batch transform: raw clips + loc records -> (xs, ys) training arrays.

    Args:
      key: PRNG key (ignored when ``augment=False``).
      samples: (B, S, S) float raw clips.
      locs: (B, K, 8) padded loc records in heatmap coordinates.
      counts: (B,) int real object counts per clip.
      heat_size: heatmap side (S // 4).
      augment: flips + jitter + noise when True (training); plain
        normalization when False (validation pre-render).

    Returns:
      xs: (B, S, S, 1) normalized inputs.
      ys: ``[heat (B,Hs,Hs,1), tag_mask (B,K) bool, regr (B,K,6),
      indices (B,K) int32]`` — the dataset contract (scdx16p100.py:363-379).
    """
    b, k = locs.shape[:2]
    samples = jnp.asarray(samples, jnp.float32)
    locs = jnp.asarray(locs, jnp.float32)

    lane = jnp.arange(k)[None, :]
    present = lane < counts[:, None]

    if augment:
        k_fliph, k_flipv, k_jit, k_noise = jax.random.split(key, 4)
        flip_h = jax.random.bernoulli(k_fliph, 0.5, (b,))
        flip_v = jax.random.bernoulli(k_flipv, 0.5, (b,))

        samples = jnp.where(flip_h[:, None, None],
                            jnp.flip(samples, axis=2), samples)
        samples = jnp.where(flip_v[:, None, None],
                            jnp.flip(samples, axis=1), samples)
        locs = jnp.where(flip_h[:, None, None], _flip_locs_x(locs, heat_size), locs)
        locs = jnp.where(flip_v[:, None, None], _flip_locs_y(locs, heat_size), locs)

    # per-image standardization (argumentations.py:40-44)
    mean = samples.mean(axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(samples - mean), axis=(1, 2), keepdims=True)
    samples = (samples - mean) / jnp.sqrt(var)

    if augment:
        gauss = jax.random.normal(k_jit, (b, 1, 1), jnp.float32)
        samples = samples * (1.0 + jitter_sv * gauss)
        samples = samples + jax.random.normal(
            k_noise, samples.shape, jnp.float32) * noise_sv

    cx = locs[:, :, 0]
    cy = locs[:, :, 1]
    in_bounds = (cx >= 0) & (cx < heat_size) & (cy >= 0) & (cy < heat_size)
    tag_mask = present & in_bounds

    indices = (jnp.floor(cy) * heat_size + jnp.floor(cx)).astype(jnp.int32)
    indices = jnp.where(tag_mask, indices, 0)

    regr = locs[:, :, 2:8]
    heat = jax.vmap(lambda l, v: render_heatmap(l, v, heat_size, THRESHOLD_IOU))(
        locs, present
    )

    xs = samples[..., None]
    ys = [heat[..., None], tag_mask, regr, indices]
    return xs, ys
