"""Basic building blocks: Conv+BN+ReLU, FC+BN+ReLU.

TPU-native counterparts of models/backbones/convolutions.py (Convolution at
25-49, FullyConnected at 51-71). NHWC layout throughout; batch norm uses
``momentum=0.9`` in the flax convention, which equals the reference's torch
``BNMOMENTUM = 0.1`` (residuals.py:32) — both mean
``running = 0.9*running + 0.1*batch``.

Cross-replica statistics: under pjit/GSPMD the batch axis is sharded over
the 'data' mesh axis and BN's batch reductions automatically become global
(XLA inserts the collectives), so torch's explicit
``SyncBatchNorm.convert_sync_batchnorm`` (networkFactory.py:128-133) has no
analog here — it is the default behavior.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM_FLAX = 0.9  # == torch momentum 0.1


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent with the project-wide momentum."""

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM_FLAX,
            epsilon=1e-5,
            dtype=jnp.float32,
        )(x)


class ConvBlock(nn.Module):
    """k x k same-size Conv -> BN -> ReLU (convolutions.py:25-49).

    ``batch_norm=False`` drops the BN and enables the conv bias, matching
    the reference's ``bias = not batchNorm``. ``dtype`` selects the compute
    precision of the convolution (bfloat16 feeds the MXU at full rate);
    parameters and BN statistics stay float32.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=(self.kernel_size - 1) // 2,
            use_bias=not self.batch_norm,
            dtype=self.dtype,
        )(x)
        if self.batch_norm:
            x = BatchNorm()(x, train)
        return nn.relu(x)


class FullyConnected(nn.Module):
    """Linear -> BN1d -> ReLU (convolutions.py:51-71)."""

    features: int
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features)(x)
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM_FLAX
            )(x)
        return nn.relu(x)


def conv3x3(features: int, stride: int = 1, dtype=jnp.float32) -> nn.Conv:
    """3x3 conv, pad 1, no bias (models/backbones/utility.py:125-127)."""
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=1,
                   use_bias=False, dtype=dtype)


def conv1x1(features: int, stride: int = 1, use_bias: bool = False,
            dtype=jnp.float32) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=(stride, stride), padding=0,
                   use_bias=use_bias, dtype=dtype)


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) equivalent."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
