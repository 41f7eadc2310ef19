"""Flax modules around the deformable ops.

Counterparts of the reference's torch modules (models/backbones/deformable/
dcn_v2.py): ``DCN`` (95-192) — a deformable conv whose offsets and
modulation masks come from an internal zero-initialized conv — and
``DCNPooling`` (194-344) — deformable PSROI pooling with an optional
offset-predicting FC branch.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from scd_resnet_tpu.ops.dcn import deform_conv2d, deform_psroi_pooling


class DCN(nn.Module):
    """Modulated deformable conv with internal offset/mask predictor
    (dcn_v2.py:150-192). The offset conv is zero-initialized so the layer
    starts as a plain convolution."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size * self.kernel_size
        om = nn.Conv(
            3 * k,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(),
            name="conv_offset_mask",
        )(x)
        o1, o2, mask = jnp.split(om, 3, axis=-1)
        offset = jnp.stack([o1, o2], axis=-1)  # (..., K, 2) = (dy, dx)
        mask = nn.sigmoid(mask)

        weights = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return deform_conv2d(
            x, offset, mask, weights, bias,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
        )


class DCNPooling(nn.Module):
    """Deformable PSROI pooling with a learned offset branch
    (dcn_v2.py:282-344): a no-trans pooling pass feeds an FC that predicts
    normalized bin displacements, then the deformable pass re-pools."""

    output_dim: int
    pooled_size: int = 7
    group_size: int = 1
    spatial_scale: float = 1.0 / 4
    trans_std: float = 0.1
    sample_per_part: int = 4
    deform_fc_dim: int = 1024
    no_trans: bool = False

    @nn.compact
    def __call__(self, x, rois):
        p = self.pooled_size
        n = rois.shape[0]
        base = deform_psroi_pooling(
            x, rois, jnp.zeros((n, p, p, 2)),
            output_dim=self.output_dim, group_size=self.group_size,
            pooled_size=p, spatial_scale=self.spatial_scale,
            trans_std=self.trans_std, sample_per_part=self.sample_per_part,
            no_trans=True,
        )
        if self.no_trans:
            return base

        flat = base.reshape(n, -1)
        h = nn.relu(nn.Dense(self.deform_fc_dim)(flat))
        h = nn.relu(nn.Dense(self.deform_fc_dim)(h))
        trans = nn.Dense(
            p * p * 2, kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(),
        )(h).reshape(n, p, p, 2)
        return deform_psroi_pooling(
            x, rois, trans,
            output_dim=self.output_dim, group_size=self.group_size,
            pooled_size=p, spatial_scale=self.spatial_scale,
            trans_std=self.trans_std, sample_per_part=self.sample_per_part,
            no_trans=False,
        )
