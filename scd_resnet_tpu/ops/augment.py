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

import enum
import math

import jax
import jax.numpy as jnp
import numpy as np


class PaddingMode(enum.Enum):
    """Padding semantics for rotation (argumentations.py:98-102). Values are
    jnp.pad mode strings (torch 'replicate' == numpy 'edge')."""

    ConstantPadding = "constant"
    MirrorPadding = "reflect"
    ReplicatePadding = "edge"


class ResampleMode(enum.Enum):
    """Resampling kernels for rotation (argumentations.py:103-106)."""

    NearestNeighbour = "nearest"
    Bilinear = "bilinear"
    Bicubic = "bicubic"


def _mode_value(mode, default):
    if mode is None:
        return default
    return getattr(mode, "value", mode)


def normalize(image):
    """Standardize to zero mean / unit variance over the whole image
    (argumentations.py:40-44; population variance, no epsilon).

    A CONSTANT image (possible after float16/uint8 storage quantization
    of a blank background tile) maps to zeros instead of 0/0 = NaN — the
    reference never guarded this because its torch path ran f32 from
    source scans, but one NaN sample here would poison the whole batch
    through BatchNorm statistics. Non-constant images are bit-identical
    to the unguarded form."""
    image = jnp.asarray(image, jnp.float32)
    mean = image.mean()
    var = jnp.mean(jnp.square(image - mean))
    safe_var = jnp.where(var > 0, var, 1.0)
    return jnp.where(var > 0, (image - mean) / jnp.sqrt(safe_var), 0.0)


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


def horizontal_flip(image):
    """Flip the width (last) axis (argumentations.py:70-71)."""
    return jnp.flip(jnp.asarray(image), axis=-1)


def vertical_flip(image):
    """Flip the height axis (argumentations.py:74-75)."""
    return jnp.flip(jnp.asarray(image), axis=-2)


def random_flip(key, image):
    """Independent 50% horizontal + vertical flips (argumentations.py:78-83),
    keyed instead of global-RNG. Returns ``(image, flip_h, flip_v)`` so
    callers can apply the matching coordinate flips."""
    kh, kv = jax.random.split(key)
    flip_h = jax.random.bernoulli(kh, 0.5)
    flip_v = jax.random.bernoulli(kv, 0.5)
    image = jnp.where(flip_h, horizontal_flip(image), image)
    image = jnp.where(flip_v, vertical_flip(image), image)
    return image, flip_h, flip_v


def horizontal_flip_numpy(arr):
    """argumentations.py:85-86."""
    return arr[:, ::-1]


def vertical_flip_numpy(arr):
    """argumentations.py:88-89."""
    return arr[::-1, :]


def random_flip_numpy(arr, rng=None):
    """argumentations.py:91-96 (host-side; numpy RNG)."""
    rng = rng or np.random.default_rng()
    if rng.uniform() > 0.5:
        arr = arr[:, ::-1]
    if rng.uniform() > 0.5:
        arr = arr[::-1, :]
    return arr


def flip_locs_horizontal(locs, heat_size: int):
    """Coordinate/vector flips matching a horizontal image flip
    (scdx16p100.py:424-429): mirror x positions on the heatmap grid, negate
    the x components of the offset and major-axis vectors. ``locs`` is
    (..., K, 8)."""
    locs = jnp.asarray(locs)
    out = locs.at[..., 0].set(heat_size - 1 - locs[..., 0])
    out = out.at[..., 2].set(-locs[..., 2])  # offset x
    out = out.at[..., 4].set(-locs[..., 4])  # major axis x
    return out


def flip_locs_vertical(locs, heat_size: int):
    """Coordinate/vector flips matching a vertical image flip
    (scdx16p100.py:430-436)."""
    locs = jnp.asarray(locs)
    out = locs.at[..., 1].set(heat_size - 1 - locs[..., 1])
    out = out.at[..., 3].set(-locs[..., 3])  # offset y
    out = out.at[..., 5].set(-locs[..., 5])  # major axis y
    return out


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


def _cubic_kernel(t):
    """Keys cubic convolution kernel, a = -0.5 (the PIL BICUBIC family)."""
    a = -0.5
    at = jnp.abs(t)
    w1 = (a + 2) * at**3 - (a + 3) * at**2 + 1
    w2 = a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))


def _bicubic_sample(image, ys, xs):
    """Bicubic (Keys a=-0.5) sample of an (H, W) image at float grids."""
    h, w = image.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    out = jnp.zeros_like(ys)
    norm = jnp.zeros_like(ys)
    for dy in range(-1, 3):
        wy = _cubic_kernel(ys - (y0 + dy))
        yi = jnp.clip(y0 + dy, 0, h - 1).astype(jnp.int32)
        for dx in range(-1, 3):
            wx = _cubic_kernel(xs - (x0 + dx))
            xi = jnp.clip(x0 + dx, 0, w - 1).astype(jnp.int32)
            weight = wy * wx
            out = out + weight * image[yi, xi]
            norm = norm + weight
    return out / norm


_SAMPLERS = {
    "nearest": _nearest_sample,
    "bilinear": _bilinear_sample,
    "bicubic": _bicubic_sample,
}


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
    ``pad_mode``/``resample`` accept the mode strings or the
    :class:`PaddingMode`/:class:`ResampleMode` enums.
    """
    padded, pl, pt, h, w = _diagonal_pad(image, pad_mode, pad_value)
    return _rotate_sampled(padded, angle_deg, resample,
                           out_shape=(h, w), origin=(pt, pl),
                           center=((h - 1) / 2.0, (w - 1) / 2.0))


def rotate_non_clip(image, angle_deg: float, pad_mode: str = "reflect",
                    pad_value: float = 0.0, resample: str = "bilinear"):
    """Rotate the diagonal-padded frame WITHOUT cropping back
    (argumentations.py:162-173): returns ``(rotated_padded, left_padding,
    top_padding)`` so callers can map coordinates into the padded frame."""
    padded, pl, pt, h, w = _diagonal_pad(image, pad_mode, pad_value)
    ph, pw = h + 2 * pt, w + 2 * pl
    rotated = _rotate_sampled(padded, angle_deg, resample,
                              out_shape=(ph, pw), origin=(0, 0),
                              center=((ph - 1) / 2.0, (pw - 1) / 2.0))
    return rotated, pl, pt


def random_rotate(key, image, pad_mode: str = "reflect",
                  pad_value: float = 0.0, resample: str = "bilinear"):
    """Rotate by a keyed U(0, 90)-degree angle (argumentations.py:175).
    Returns ``(rotated, angle_deg)`` so callers can rotate coordinates with
    the same draw (the reference discards the angle)."""
    angle = jax.random.uniform(key, (), jnp.float32) * 90.0
    return rotate(image, angle, pad_mode, pad_value, resample), angle


def _diagonal_pad(image, pad_mode, pad_value):
    image = jnp.asarray(image, jnp.float32)
    h, w = image.shape
    pad_r = math.sqrt(h * h + w * w) / 2.0
    pl = int(math.ceil(pad_r - 0.5 * w))
    pt = int(math.ceil(pad_r - 0.5 * h))
    mode = _mode_value(pad_mode, "reflect")
    if mode == "constant":
        padded = jnp.pad(image, ((pt, pt), (pl, pl)), constant_values=pad_value)
    else:
        padded = jnp.pad(image, ((pt, pt), (pl, pl)), mode=mode)
    return padded, pl, pt, h, w


def _rotate_sampled(padded, angle_deg, resample, out_shape, origin, center):
    """Inverse-map rotation: sample ``padded`` at the source of each
    destination cell. ``origin`` offsets the destination grid into the
    padded frame; ``center`` is the rotation center in destination coords."""
    theta = jnp.deg2rad(angle_deg)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    oh, ow = out_shape
    oy, ox = origin
    cy, cx = center

    ys = jnp.arange(oh, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(ow, dtype=jnp.float32)[None, :] - cx
    # inverse map: destination -> source rotates by +angle
    src_x = cos_t * xs - sin_t * ys + cx + ox
    src_y = sin_t * xs + cos_t * ys + cy + oy
    src_x = jnp.broadcast_to(src_x, (oh, ow))
    src_y = jnp.broadcast_to(src_y, (oh, ow))
    sampler = _SAMPLERS[_mode_value(resample, "bilinear")]
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
