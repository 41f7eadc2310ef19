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
import jax
import jax.numpy as jnp

BN_MOMENTUM_FLAX = 0.9  # == torch momentum 0.1


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent with the project-wide momentum.

    ``dtype`` sets the normalize/output precision — pass the conv-path
    compute dtype so bf16 activations are not round-tripped through f32
    HBM traffic around every BN. flax computes the batch statistics in
    float32 regardless (its ``_compute_stats`` upcasts half precision),
    and the running stats / scale / bias parameters stay float32.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM_FLAX,
            epsilon=1e-5,
            dtype=self.dtype,
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
            x = BatchNorm(dtype=self.dtype)(x, train)
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
    """torch MaxPool2d(kernel=3, stride=2, padding=1) equivalent.

    Deliberately the plain reduce_window lowering. Four
    SelectAndScatter-free gradient rewrites were measured in-step on v5e
    at the production shape (512^2/batch-32, 64-channel stem, bf16;
    stem segment = conv+BN+relu+pool fwd+bwd; one canonical table in
    docs/PERFORMANCE.md):

      reduce_window (this)                      12.7 ms
      9 stride-2-slice custom VJP               ~60 ms (2D strided slices)
      separable fwd + parity-phase custom VJP   33.9 ms
      full-res stencil-routing custom VJP       31.0 ms
      hand-written Pallas scatter kernel        26.4 ms
                              (tools/pool_bwd_pallas_probe.py)

    The pool contributes ~6.6 ms of the segment (6.1 ms poolless; its
    SelectAndScatter backward alone is 5.9) — XLA's fused scan is still
    the fastest option at this shape. Negative result recorded 2026-08
    (round 2); do not revisit without new layout tools. Gradient ties
    route to the FIRST window maximum (matches torch; pinned by
    tests/test_s2d_stem.py) — any replacement must preserve that.
    """
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def max_pool_2x2_s2(x):
    """torch MaxPool2d(kernel=2, stride=2) equivalent (hourglass.py:46)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class SubpixelConvTranspose4x4S2(nn.Module):
    """4x4/stride-2 transposed conv, lowered as four dense 2x2 convs +
    depth-to-space interleave.

    XLA lowers ConvTranspose as an input-dilated convolution — on TPU the
    dilation zeros waste ~4x of the MXU work, and the gradient convs
    inherit the dilated layout. The exact decomposition (verified
    numerically against flax.linen.ConvTranspose, strides 2, SAME, no
    bias):

      y[2i+u, 2j+v] = sum_{a,b<2} x[i+a+u-1, j+b+v-1] * K[2a+u, 2b+v]

    so each output subpixel phase (u, v) is a dense stride-1 2x2 conv with
    the K[u::2, v::2] subkernel over the 1-padded input. The parameter is
    the standard flax (4, 4, in, out) kernel under the caller-chosen name,
    keeping checkpoints and the torch converter unchanged.
    """

    features: int
    kernel_init: Any = nn.initializers.normal(stddev=0.001)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c_in = x.shape
        kernel = self.param("kernel", self.kernel_init,
                            (4, 4, c_in, self.features))
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(self.dtype)
        subs = []
        for u in (0, 1):
            for v in (0, 1):
                sub_kernel = kernel[u::2, v::2].astype(self.dtype)
                conv = jax.lax.conv_general_dilated(
                    xp, sub_kernel, window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )  # (b, h+1, w+1, f)
                subs.append(conv[:, u:u + h, v:v + w, :])
        y = jnp.stack(subs, axis=3)  # (b, h, w, 4=(u,v), f)
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, 2 * h, 2 * w, self.features)


class StemConv7x7S2(nn.Module):
    """7x7/stride-2/pad-3 stem conv, lowered via space-to-depth.

    A 1-channel 7x7 convolution is MXU-layout-hostile: the single input
    channel pads out the systolic array's contraction lanes and the filter
    gradient reduces over the full 512^2 input. Measured on v5e (batch 32,
    bf16) the naive lowering costs 15.6 ms fwd+bwd vs 2.9 ms for a
    space-to-depth form (tools/bwd_profile.json).

    This module computes the EXACT same function with the EXACT same
    parameter (a (7, 7, C, F) kernel under the standard flax ``Conv_*``
    naming, so checkpoints/converters are unchanged):

      y[i,j] = sum_{a,b<7} x[2i+a-3, 2j+b-3] W[a,b]
             = sum_{al,be<4; u,v<2} x2[i+al, j+be, (u,v)] W[2al+u-1, 2be+v-1]

    where ``x2`` is the zero-padded input split into 2x2 blocks
    (space-to-depth) and the kernel is zero-padded to 8x8 then regrouped to
    (4, 4, 4C, F) at trace time — XLA folds the regroup into a constant-
    like transpose, and the conv runs stride-1 on a 4C-channel input.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),  # nn.Conv's default
            (7, 7, c_in, self.features),
        )
        if x.shape[1] % 2 or x.shape[2] % 2:
            # odd spatial sizes do not split into 2x2 blocks — use the
            # plain lowering (same kernel parameter, same result)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # regroup kernel: pad to 8x8 with a leading zero row/col so tap
        # a maps to index a+1 = 2*al + u, then split (al, u) per axis
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kp = kp.reshape(4, 2, 4, 2, c_in, self.features)
        kp = kp.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * c_in, self.features
        )

        # space-to-depth input: pad 4 (=3+1 alignment) each side, 2x2 blocks
        b, h, w, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        hp, wp = h + 8, w + 8
        x2 = xp.reshape(b, hp // 2, 2, wp // 2, 2, c_in)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, hp // 2, wp // 2, 4 * c_in
        )

        y = jax.lax.conv_general_dilated(
            x2.astype(self.dtype), kp.astype(self.dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # VALID on (h/2 + 4) rows with a 4-tap window gives h/2 + 1 outputs;
        # the conv's true output grid is the first h/2
        return y[:, : h // 2, : w // 2, :]
