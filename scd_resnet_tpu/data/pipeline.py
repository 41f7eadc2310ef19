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

from scd_resnet_tpu.ops.augment import (
    flip_locs_horizontal,
    flip_locs_vertical,
    normalize,
)
from scd_resnet_tpu.ops.gaussian import render_heatmap

THRESHOLD_IOU = 0.5  # scdx16p100.py:52


@partial(jax.jit, static_argnames=("heat_size", "augment", "corner_targets"))
def augment_and_render_batch(key, samples, locs, counts, heat_size: int,
                             augment: bool = True, noise_sv: float = 0.05,
                             jitter_sv: float = 0.05,
                             corner_targets: bool = False):
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
        locs = jnp.where(flip_h[:, None, None],
                         flip_locs_horizontal(locs, heat_size), locs)
        locs = jnp.where(flip_v[:, None, None],
                         flip_locs_vertical(locs, heat_size), locs)

    # per-image standardization — ops/augment.normalize is the canonical
    # definition (incl. the constant-clip zero guard: one NaN sample
    # would poison the whole batch through BatchNorm)
    samples = jax.vmap(normalize)(samples)

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

    if corner_targets == "legacy":
        # original-CornerNet targets (models/corner_net_legacy.py):
        # float corner = (center + offset/4) -/+ (|maj|, minL); integer part
        # indexes the heatmap, fractional part is the offset regression
        # target. ys = [tlHeat, brHeat, mask, tlRegr, brRegr, tlInds, brInds]
        from scd_resnet_tpu.ops.radius import corner_threshold_radius

        maj_l = jnp.sqrt(locs[:, :, 4] ** 2 + locs[:, :, 5] ** 2)
        half = jnp.stack([maj_l, locs[:, :, 6]], axis=-1)
        center_float = locs[:, :, 0:2] + locs[:, :, 2:4] / 4.0

        def corner_pack(sign):
            true = center_float + sign * half
            ints = jnp.floor(true)
            frac = true - ints
            in_b = ((ints[..., 0] >= 0) & (ints[..., 0] < heat_size)
                    & (ints[..., 1] >= 0) & (ints[..., 1] < heat_size))
            cmask = present & in_b
            inds = (ints[..., 1] * heat_size + ints[..., 0]).astype(jnp.int32)
            inds = jnp.where(cmask, inds, 0)
            offs = true - locs[:, :, 0:2]  # displacement for the renderer
            render = lambda l, v, off: render_heatmap(  # noqa: E731
                l, v, heat_size, THRESHOLD_IOU,
                radius_fn=corner_threshold_radius, position_offset=off,
            )
            # render with the SAME floor-based bounds mask used for the
            # indices: the renderer's trunc() would otherwise stamp a peak
            # for corners in (-1, 0) that the mask/indices deny
            heatc = jax.vmap(render)(locs, cmask, offs)
            return heatc[..., None], frac, inds, cmask

        tl_heat, tl_regr, tl_inds, tl_mask = corner_pack(-1.0)
        br_heat, br_regr, br_inds, br_mask = corner_pack(1.0)
        mask = tl_mask & br_mask
        return xs, [tl_heat, br_heat, mask, tl_regr, br_regr, tl_inds, br_inds]

    if corner_targets:
        # top-left / bottom-right corner heatmaps for the cornerNet family:
        # corners at center -/+ (|maj|, minL) — the box geometry the
        # evaluation uses (centerNetOffset.py:262-271) — with the corner
        # radius solver (intersection.py:40-44).
        from scd_resnet_tpu.ops.radius import corner_threshold_radius

        maj_l = jnp.sqrt(locs[:, :, 4] ** 2 + locs[:, :, 5] ** 2)
        half = jnp.stack([maj_l, locs[:, :, 6]], axis=-1)  # (B, K, 2)
        render = lambda l, v, off: render_heatmap(  # noqa: E731
            l, v, heat_size, THRESHOLD_IOU,
            radius_fn=corner_threshold_radius, position_offset=off,
        )
        tl = jax.vmap(render)(locs, present, -half)
        br = jax.vmap(render)(locs, present, half)
        ys = ys + [tl[..., None], br[..., None]]

    return xs, ys
