"""Image augmentation kernels (keyed-PRNG, jittable).

TPU-native counterparts of the reference's torch/torchvision augmentation
(datasets/argumentations.py): per-image standardization (40-44), uniform
noise (47-53), Gaussian noise (55-61), variance jitter (63-67), flips
(70-96), and mirror-padded bilinear rotation (149-159).

Randomness discipline: the reference relies on a global seed-42 torch/numpy
RNG (argumentations.py:36-37), which cannot be replayed bit-for-bit in JAX;
per SURVEY.md "hard parts" #6 we commit to metric-level parity with
explicit `jax.random` keys threaded through every stochastic op.

Images are (H, W) or (..., H, W) float arrays; batch dims broadcast or are
vmapped by callers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def normalize(image):
    """Standardize to zero mean / unit variance over the whole image
    (argumentations.py:40-44; population variance, no epsilon)."""
    image = jnp.asarray(image, jnp.float32)
    mean = image.mean()
    var = jnp.mean(jnp.square(image - mean))
    return (image - mean) / jnp.sqrt(var)


def uniform_noise(key, image, stdvar: float = 0.05):
    """Additive uniform noise, (U[0,1)-0.5) * 12*stdvar
    (argumentations.py:47-53)."""
    u = jax.random.uniform(key, jnp.shape(image), jnp.float32)
    return image + (u - 0.5) * (stdvar * 12.0)


def gaussian_noise(key, image, stdvar: float = 0.05):
    """Additive N(0, stdvar^2) noise (argumentations.py:55-61)."""
    n = jax.random.normal(key, jnp.shape(image), jnp.float32)
    return image + n * stdvar


def variance_jitter(key, image, stdvar: float = 0.05):
    """Multiply the whole image by 1 + stdvar*N(0,1)
    (argumentations.py:63-67)."""
    g = jax.random.normal(key, (), jnp.float32)
    return image * (1.0 + stdvar * g)


def _nearest_sample(image, ys, xs):
    """Nearest-neighbor sample (the reference's hand-rolled
    rotateNearestNeighbour gather, argumentations.py:111-146)."""
    h, w = image.shape
    yi = jnp.clip(jnp.round(ys), 0, h - 1).astype(jnp.int32)
    xi = jnp.clip(jnp.round(xs), 0, w - 1).astype(jnp.int32)
    return image[yi, xi]


def _bilinear_sample(image, ys, xs):
    """Bilinear sample of an (H, W) image at float coordinate grids."""
    h, w = image.shape
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = ys - y0
    wx = xs - x0
    y0i, y1i, x0i, x1i = (a.astype(jnp.int32) for a in (y0, y1, x0, x1))
    v00 = image[y0i, x0i]
    v01 = image[y0i, x1i]
    v10 = image[y1i, x0i]
    v11 = image[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def rotate(image, angle_deg: float, pad_mode: str = "reflect",
           pad_value: float = 0.0, resample: str = "bilinear"):
    """Rotate an (H, W) image about its center, mirror-padded bilinear.

    Matches argumentations.py:149-159: pad to the diagonal radius (so no
    sample falls outside), resample, crop back to (H, W). The coordinate
    convention pairs with :func:`rotate_coordinates`: a feature at p moves
    to ``R(-angle) @ (p - c) + c`` with pixel centers at integer indices and
    ``c = (S-1)/2`` (the reference's own 0.5-shifted center,
    scdManual.py:239-247).

    ``angle_deg`` may be a traced scalar — the pad amount is static.
    """
    image = jnp.asarray(image, jnp.float32)
    h, w = image.shape
    pad_r = math.sqrt(h * h + w * w) / 2.0
    pl = int(math.ceil(pad_r - 0.5 * w))
    pt = int(math.ceil(pad_r - 0.5 * h))
    if pad_mode == "constant":
        padded = jnp.pad(image, ((pt, pt), (pl, pl)), constant_values=pad_value)
    else:
        padded = jnp.pad(image, ((pt, pt), (pl, pl)), mode=pad_mode)

    theta = jnp.deg2rad(angle_deg)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0

    ys = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    # inverse map: destination -> source rotates by +angle
    src_x = cos_t * xs - sin_t * ys + cx + pl
    src_y = sin_t * xs + cos_t * ys + cy + pt
    src_x = jnp.broadcast_to(src_x, (h, w))
    src_y = jnp.broadcast_to(src_y, (h, w))
    sampler = _nearest_sample if resample == "nearest" else _bilinear_sample
    return sampler(padded, src_y, src_x)


def rotate_coordinates(locs, center_x, center_y, angle_deg):
    """Rotate object records ``[ctX, ctY, offX, offY, majX, majY, ...]``
    clockwise by ``angle_deg`` about ``(center_x - 0.5, center_y - 0.5)``
    (scdManual.py:236-274 / scdx16p100.py:538-573).

    Positions and both direction vectors (offset, major axis) rotate by
    ``-angle``; zero-length offsets stay zero. Expressed directly as a 2x2
    rotation instead of the reference's atan2-free sin/cos decomposition —
    algebraically identical, and NaN-free for points exactly at the center.
    """
    locs = jnp.asarray(locs, jnp.float32)
    a = jnp.deg2rad(-jnp.asarray(angle_deg, jnp.float32))
    cos_a = jnp.cos(a)
    sin_a = jnp.sin(a)

    def rot(x, y):
        return x * cos_a - y * sin_a, y * cos_a + x * sin_a

    px = locs[:, 0] + (0.5 - center_x)
    py = locs[:, 1] + (0.5 - center_y)
    rx, ry = rot(px, py)
    ox, oy = rot(locs[:, 2], locs[:, 3])
    mx, my = rot(locs[:, 4], locs[:, 5])

    out = locs.at[:, 0].set(rx - (0.5 - center_x))
    out = out.at[:, 1].set(ry - (0.5 - center_y))
    out = out.at[:, 2].set(ox)
    out = out.at[:, 3].set(oy)
    out = out.at[:, 4].set(mx)
    out = out.at[:, 5].set(my)
    return out
