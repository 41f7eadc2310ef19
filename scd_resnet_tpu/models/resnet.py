"""Generic ResNet backbone with transposed-conv upsampling and pluggable
terminal heads.

TPU-native re-design of models/backbones/residuals.py: ``Residual`` (34-79),
``BasicBlock`` (84-120), ``Bottleneck`` (122-165), the generic ``ResNet``
with 7x7/s2 stem + maxpool (210-215), four stages (218-221), three 2x
deconv stages with BN+ReLU (224-228, 286-310), pluggable terminal heads
(230-253), and the ``ResNetSpec`` depth table including the shallow
10/12/14/16 variants (355-365).

Initialization matches ``ResNet.initialize`` (336-353): deconv weights
N(0, 0.001), BN scale 1 / bias 0 (flax default), heatmap-head final bias
-2.19, regression-head final weights N(0, 0.001) with zero bias
(centerNetOffset.py:124-129).

Everything is NHWC; a 512x512x1 clip maps to 128x128 features (4x
downsample), the heatmap geometry the whole pipeline is built around.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from scd_resnet_tpu.models.layers import (
    BatchNorm,
    StemConv7x7S2,
    SubpixelConvTranspose4x4S2,
    conv1x1,
    conv3x3,
    max_pool_3x3_s2,
)

DEFAULT_DIMENSIONS = (64, 64, 128, 256, 512, 256, 256, 256)


class Residual(nn.Module):
    """Pre-ResNet residual block with 1x1-conv skip (residuals.py:34-79)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        y = conv3x3(self.features, self.stride, dtype=self.dtype)(x)
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = conv3x3(self.features, dtype=self.dtype)(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        if self.stride != 1 or in_features != self.features:
            skip = conv1x1(self.features, self.stride, dtype=self.dtype)(x)
            skip = BatchNorm(dtype=self.dtype)(skip, train)
        else:
            skip = x
        return nn.relu(y + skip)


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (residuals.py:84-120)."""

    expansion = 1
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = conv3x3(self.features, self.stride, dtype=self.dtype)(x)
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = conv3x3(self.features, dtype=self.dtype)(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        if self.downsample:
            residual = conv1x1(self.features * self.expansion, self.stride,
                               dtype=self.dtype)(x)
            residual = BatchNorm(dtype=self.dtype)(residual, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 x4 bottleneck (residuals.py:122-165)."""

    expansion = 4
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = conv1x1(self.features, dtype=self.dtype)(x)
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = conv3x3(self.features, self.stride, dtype=self.dtype)(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = conv1x1(self.features * self.expansion, dtype=self.dtype)(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        if self.downsample:
            residual = conv1x1(self.features * self.expansion, self.stride,
                               dtype=self.dtype)(x)
            residual = BatchNorm(dtype=self.dtype)(residual, train)
        return nn.relu(y + residual)


# depth -> (block, stage repeats); residuals.py:355-365
RESNET_SPEC: Dict[int, Tuple[type, Tuple[int, int, int, int]]] = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
    16: (BasicBlock, (1, 2, 2, 2)),
    14: (BasicBlock, (1, 2, 2, 1)),
    12: (BasicBlock, (1, 1, 2, 1)),
    10: (BasicBlock, (1, 1, 1, 1)),
}


@dataclasses.dataclass(frozen=True)
class TerminalSpec:
    """Descriptor of a prediction head attached to the upsampled features.

    Mirrors ``ResNetTerminal`` (residuals.py:167-182): ``hidden == 0`` means
    a bare 1x1 conv; otherwise Conv3x3(hidden)+ReLU+Conv1x1(out).
    ``final_bias`` implements the heatmap prior init (-2.19); ``small_init``
    the regression N(0, 0.001) init.
    """

    name: str
    out_features: int
    hidden: int = 0
    final_bias: Optional[float] = None
    small_init: bool = False


def _final_conv_inits(spec: TerminalSpec):
    kernel_init = (
        nn.initializers.normal(stddev=0.001)
        if spec.small_init
        else nn.initializers.lecun_normal()
    )
    bias_init = (
        nn.initializers.constant(spec.final_bias)
        if spec.final_bias is not None
        else nn.initializers.zeros_init()
    )
    return kernel_init, bias_init


class TerminalHead(nn.Module):
    spec: TerminalSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        spec = self.spec
        kernel_init, bias_init = _final_conv_inits(spec)
        if spec.hidden > 0:
            x = nn.Conv(spec.hidden, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Conv(
            spec.out_features,
            (1, 1),
            padding=0,
            use_bias=True,
            kernel_init=kernel_init,
            bias_init=bias_init,
        )(x.astype(jnp.float32))


# NOTE (negative result, v5e): fusing the three heads' hidden 3x3 convs
# into one conv over concatenated output channels (exact same math via
# trace-time kernel concat) measured 48.26 vs 48.10 ms full step — no
# gain; the heads are MXU-compute-bound and XLA already reuses the input
# read. Per-head TerminalHead stays.


class ResNetBackbone(nn.Module):
    """ResNet stem + 4 stages + 3 deconv stages + terminal heads.

    Returns ``{head_name: (B, H/4, W/4, out_features)}`` — one raw output
    dict per forward, the list-of-dicts stacking (for hourglass parity) is
    handled by the model wrappers.
    """

    num_layers: int
    terminals: Sequence[TerminalSpec]
    dimensions: Sequence[int] = DEFAULT_DIMENSIONS
    dtype: Any = jnp.float32
    # insert a modulated deformable conv (DCNv2) + BN + ReLU prologue before
    # the first deconv stage — the CenterNet-DCN upsampling pattern, wired
    # to the reference's dormant dcn_v2.py capability (imported by nothing
    # there; a trainable profile here)
    deconv_dcn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, stages = RESNET_SPEC[self.num_layers]
        dims = tuple(self.dimensions)

        # stem: 7x7/s2 conv + BN + ReLU + 3x3/s2 maxpool (residuals.py:210-215).
        # The conv is lowered via space-to-depth (exact same function and
        # parameter tree; ~1.2 ms faster forward at 512^2/b32 on v5e —
        # see StemConv7x7S2 and tools/bwd_profile.json)
        x = StemConv7x7S2(dims[0], dtype=self.dtype, name="Conv_0")(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        # four stages (residuals.py:218-221, 256-271)
        for stage_idx, (features, blocks) in enumerate(
            zip(dims[1:5], stages)
        ):
            stride = 1 if stage_idx == 0 else 2
            needs_down = stride != 1 or x.shape[-1] != features * block.expansion
            x = block(features, stride, downsample=needs_down,
                      dtype=self.dtype)(x, train)
            for _ in range(1, blocks):
                x = block(features, dtype=self.dtype)(x, train)

        # three 2x transposed-conv stages (residuals.py:224-228, 286-310):
        # kernel 4, stride 2, no bias, N(0, 0.001) init, BN + ReLU
        if self.deconv_dcn:
            from scd_resnet_tpu.models.deformable import DCN

            # same-width deformable prologue at the coarsest (S/32) map,
            # where the bilinear-gather cost is smallest; zero-initialized
            # offsets make it a plain conv at step 0
            x = DCN(x.shape[-1], name="deconv_dcn")(x.astype(jnp.float32))
            x = BatchNorm(dtype=self.dtype)(x, train)
            x = nn.relu(x).astype(self.dtype)
        # NOTE: a subpixel (depth-to-space) lowering of these was measured
        # SLOWER end-to-end on v5e (62.9 vs 55.1 ms full step; the module
        # and its equivalence test remain in layers.py as the negative
        # result) — XLA's input-dilated transposed-conv lowering wins here
        for features in dims[5:8]:
            x = nn.ConvTranspose(
                features,
                (4, 4),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                kernel_init=nn.initializers.normal(stddev=0.001),
                dtype=self.dtype,
            )(x)
            x = BatchNorm(dtype=self.dtype)(x, train)
            x = nn.relu(x)

        # terminals=() exposes the raw upsampled features so model families
        # with custom head prologues (e.g. corner pooling) share this trunk
        if not self.terminals:
            return x

        # heads compute in the same dtype but emit float32 for the losses
        return {
            spec.name: TerminalHead(spec, dtype=self.dtype, name=spec.name)(x)
            for spec in self.terminals
        }
