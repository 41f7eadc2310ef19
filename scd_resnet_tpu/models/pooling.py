"""Pooling / unpooling layer factories.

Rebuilds the reference's full factory surface
(models/backbones/pooling.py:27-53): ``PoolingType`` / ``UpsampleType``
enums, fixed-scale ``pooling_layer``, target-size ``adaptive_pooling_layer``
and ``unpooling_layer``. The reference models only ever instantiate
MaxPool(k=s=2) and nearest upsample (hourglass.py:46,58); the remaining
modes are dead capability there but part of the public API, so they are
rebuilt here as first-class TPU citizens: NHWC layout, pure
``lax.reduce_window`` / ``jax.image.resize`` lowerings (MXU/VPU friendly,
static shapes), usable directly inside jit.

camelCase aliases (``poolingLayer`` etc.) mirror the reference spelling for
drop-in imports.

Semantics notes vs torch (documented divergences, PARITY.md):
  - bilinear/linear/trilinear follow torch ``align_corners=False``
    (half-pixel centers) — identical to ``jax.image.resize`` 'linear'.
  - bicubic uses the Keys a=-0.5 kernel (jax.image.resize 'cubic');
    torch uses a=-0.75. Same support, slightly different ringing.
  - adaptive pooling reproduces torch's floor/ceil bin edges exactly.
"""
from enum import Enum
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class PoolingType(Enum):
    """models/backbones/pooling.py:27-29 (values preserved)."""

    MaximalPool = 0
    AveragePool = 2


class UpsampleType(Enum):
    """models/backbones/pooling.py:31-36 (torch mode strings preserved)."""

    NearestNeighbour = "nearest"
    Linear = "linear"
    Bilinear = "bilinear"
    Trilinear = "trilinear"
    Bicubic = "bicubic"


def pooling_layer(
    scale_factor: int = 2,
    downsample_type: PoolingType = PoolingType.MaximalPool,
    width: Optional[int] = None,
    height: Optional[int] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """k = s = scale_factor max/avg pool over NHWC
    (models/backbones/pooling.py:39-44; width/height accepted-and-unused
    exactly as in the reference signature)."""
    del width, height
    window = (scale_factor, scale_factor)
    if downsample_type == PoolingType.MaximalPool:
        return lambda x: nn.max_pool(x, window, strides=window)
    if downsample_type == PoolingType.AveragePool:
        return lambda x: nn.avg_pool(x, window, strides=window)
    raise ValueError(f"unknown pooling type: {downsample_type}")


def _adaptive_edges(in_size: int, out_size: int):
    """torch AdaptiveXPool bin edges: bin i spans
    [floor(i*in/out), ceil((i+1)*in/out))."""
    starts = [(i * in_size) // out_size for i in range(out_size)]
    ends = [-(-((i + 1) * in_size) // out_size) for i in range(out_size)]
    return starts, ends


def adaptive_pooling_layer(
    output_width: int,
    output_height: int,
    downsample_type: PoolingType = PoolingType.MaximalPool,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Adaptive max/avg pool to (output_height, output_width)
    (models/backbones/pooling.py:45-49), NHWC.

    Output sizes are static, so the variable-width torch bins unroll at
    trace time into a fixed gather/reduce program. The common
    evenly-divisible case collapses to a single uniform reduce_window
    (one fused XLA op); the general case reduces each axis independently
    (separable for both max and mean since bins are axis-aligned
    products).
    """

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        maximal = downsample_type == PoolingType.MaximalPool
        if not maximal and downsample_type != PoolingType.AveragePool:
            raise ValueError(f"unknown pooling type: {downsample_type}")
        if h % output_height == 0 and w % output_width == 0:
            window = (h // output_height, w // output_width)
            pool = nn.max_pool if maximal else nn.avg_pool
            return pool(x, window, strides=window)

        def reduce_axis(arr, axis, out_size):
            in_size = arr.shape[axis]
            starts, ends = _adaptive_edges(in_size, out_size)
            slices = []
            for s, e in zip(starts, ends):
                piece = jax.lax.slice_in_dim(arr, s, e, axis=axis)
                red = (jnp.max if maximal else jnp.mean)(
                    piece, axis=axis, keepdims=True)
                slices.append(red)
            return jnp.concatenate(slices, axis=axis)

        return reduce_axis(reduce_axis(x, 1, output_height), 2, output_width)

    return apply


def unpooling_layer(
    scale_factor: int = 2,
    upsample_type: UpsampleType = UpsampleType.NearestNeighbour,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """torch nn.Upsample(scale_factor, mode) equivalent
    (models/backbones/pooling.py:51-52).

    Channels-last: NHWC for 2D modes (nearest/bilinear/bicubic), NWC for
    'linear' (torch's 1D mode), NDHWC for 'trilinear'. Nearest with an
    integer scale is an exact ``jnp.repeat`` (pure data movement, fuses
    into neighbors); the interpolating modes lower to
    ``jax.image.resize`` with half-pixel centers (torch
    align_corners=False).
    """

    def spatial_rank(mode: UpsampleType) -> int:
        return {
            UpsampleType.Linear: 1,
            UpsampleType.Trilinear: 3,
        }.get(mode, 2)

    rank = spatial_rank(upsample_type)

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim != rank + 2:
            raise ValueError(
                f"{upsample_type.value} upsample expects rank-{rank + 2} "
                f"channels-last input, got shape {x.shape}")
        spatial = x.shape[1:-1]
        out = tuple(int(s * scale_factor) for s in spatial)
        if upsample_type == UpsampleType.NearestNeighbour:
            if all(o == s * int(scale_factor) for s, o in zip(spatial, out)):
                for axis in range(1, 1 + rank):
                    x = jnp.repeat(x, int(scale_factor), axis=axis)
                return x
            method = "nearest"
        elif upsample_type == UpsampleType.Bicubic:
            method = "cubic"
        else:  # linear / bilinear / trilinear — rank picks the dimensionality
            method = "linear"
        shape = (x.shape[0],) + out + (x.shape[-1],)
        return jax.image.resize(x, shape, method=method)

    return apply


# Reference-spelling aliases (drop-in import compatibility).
poolingLayer = pooling_layer
adaptivePoolingLayer = adaptive_pooling_layer
unpoolingLayer = unpooling_layer
