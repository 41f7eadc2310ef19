"""Recursive hourglass and stacked-hourglass backbones.

TPU-native re-design of models/backbones/hourglass.py (recursive module,
61-114) and models/backbones/stackHourglass.py (stacked network with
terminal heads, inter-stack shortcuts, 130-272).

One hourglass level:

    up1  = residual stack at the current dimension        (preserve)
    low  = downsample -> residual stack to next dimension (change)
    low2 = recurse (or central residual stack at the innermost level)
    low3 = residual stack back to the current dimension   (change back)
    up2  = 2x nearest-neighbor upsample
    out  = up1 + up2

Downsampling is either a 2x max-pool (the original CornerNet recipe) or a
stride-2 first residual (the reference's CenterNetHourglass variant, which
passes an identity pool and a stride-2 pre-stack —
centerNetOffset.py:70-76, 87-101).

The stacked network: 4x preprocess (Conv7/s2 + Residual/s2), then per stack
hourglass -> redim conv -> terminal heads, with shortcut/merge between
stacks (stackHourglass.py:196-229). ``__call__`` returns the list of
per-stack head dicts; decode consumes the LAST stack (the reference's
evalNetwork collects only the final stack, stackHourglass.py:231-264).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from scd_resnet_tpu.models.layers import (
    BatchNorm,
    ConvBlock,
    conv1x1,
    max_pool_2x2_s2,
)
from scd_resnet_tpu.models.resnet import Residual


class ResidualStack(nn.Module):
    """`modules` residuals; dimension change in the first block
    (utility.py:35-42 stackLayers)."""

    features: int
    modules: int
    first_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Residual(self.features, self.first_stride,
                     dtype=self.dtype)(x, train)
        for _ in range(1, self.modules):
            x = Residual(self.features, dtype=self.dtype)(x, train)
        return x


class ResidualStackReverted(nn.Module):
    """`modules` residuals; dimension change in the last block
    (utility.py:44-49 stackLayersReverted)."""

    features: int
    modules: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        for _ in range(self.modules - 1):
            x = Residual(in_features, dtype=self.dtype)(x, train)
        return Residual(self.features, dtype=self.dtype)(x, train)


class Hourglass(nn.Module):
    """Recursive hourglass (hourglass.py:61-114)."""

    iterations: int
    dimensions: Sequence[int]
    modules: Sequence[int]
    pool_downsample: bool = True  # False => stride-2 first residual instead
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = tuple(self.dimensions)
        mods = tuple(self.modules)
        cur_dim, nxt_dim = dims[0], dims[1]
        cur_mod = mods[0]

        up1 = ResidualStack(cur_dim, cur_mod, dtype=self.dtype)(x, train)

        if self.pool_downsample:
            low = max_pool_2x2_s2(x)
            low = ResidualStack(nxt_dim, cur_mod, dtype=self.dtype)(low, train)
        else:
            low = ResidualStack(nxt_dim, cur_mod, first_stride=2,
                                dtype=self.dtype)(x, train)

        if self.iterations > 1:
            low = Hourglass(
                self.iterations - 1, dims[1:], mods[1:], self.pool_downsample,
                dtype=self.dtype,
            )(low, train)
        else:
            low = ResidualStack(nxt_dim, mods[1], dtype=self.dtype)(low, train)

        low = ResidualStackReverted(cur_dim, cur_mod,
                                    dtype=self.dtype)(low, train)

        b, h, w, c = low.shape
        up2 = jnp.repeat(jnp.repeat(low, 2, axis=1), 2, axis=2)
        return up1 + up2


class HourglassHead(nn.Module):
    """convolutionConv1x1 terminal: Conv3x3 (no BN, biased) + ReLU via
    ConvBlock, then 1x1 conv (utility.py:61-65); ``final_bias`` implements
    the heatmap prior init (centerNetOffset.py:54-55)."""

    out_features: int
    hidden: int
    final_bias: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(self.hidden, 3, batch_norm=False,
                      dtype=self.dtype)(x)
        bias_init = (
            nn.initializers.constant(self.final_bias)
            if self.final_bias is not None
            else nn.initializers.zeros_init()
        )
        # final 1x1 in f32 (the ResNet TerminalHead convention)
        return nn.Conv(self.out_features, (1, 1), use_bias=True,
                       bias_init=bias_init)(x.astype(jnp.float32))


class StackHourglass(nn.Module):
    """Stacked hourglass with terminal heads (stackHourglass.py:130-272).

    ``terminals`` maps head name -> (out_features, final_bias | None).
    Returns a list of per-stack ``{head: (B, H/4, W/4, C)}`` dicts.
    """

    hourglass_iterations: int = 5
    stacks: int = 1
    dimensions: Sequence[int] = (128, 128, 192, 192, 192, 256)
    modules: Sequence[int] = (2, 2, 2, 2, 2, 4)
    prediction_dim: int = 256
    terminals: Sequence[Tuple[str, int, Optional[float]]] = (
        ("heatmap", 1, -2.19),
    )
    pool_downsample: bool = False
    input_features: int = 1
    # rematerialize each hourglass in the backward pass (jax.checkpoint):
    # activations of a stack are recomputed instead of stored, trading
    # ~1/3 more FLOPs for a large activation-memory cut — the 2-stack
    # legacy model OOMs v5e-1 HBM at batch 32/512^2 without it (18.9 G
    # needed vs 15.75 G). Parameter names/trees are identical either way
    # (the scope name is pinned), so checkpoints are interchangeable.
    remat: bool = False
    # conv-path compute dtype (bfloat16 for the MXU's native precision);
    # params, BN statistics, and the final head convs stay float32 — the
    # same split the ResNet families use
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[Dict[str, jnp.ndarray]]:
        cur_dim = self.dimensions[0]

        # 4x preprocess: Conv7/s2 + Residual/s2 (stackHourglass.py:130-134)
        inter = ConvBlock(128, 7, stride=2, dtype=self.dtype)(x, train)
        inter = Residual(cur_dim, stride=2, dtype=self.dtype)(inter, train)

        # static_argnums=(2,): (self, x, train) — train is a Python bool
        hourglass_cls = (
            nn.remat(Hourglass, static_argnums=(2,)) if self.remat
            else Hourglass
        )
        outs: List[Dict[str, jnp.ndarray]] = []
        for stack_idx in range(self.stacks):
            kp = hourglass_cls(
                self.hourglass_iterations, self.dimensions, self.modules,
                self.pool_downsample, self.dtype,
                name="Hourglass_{}".format(stack_idx),
            )(inter, train)
            cnv = ConvBlock(self.prediction_dim, 3, dtype=self.dtype)(kp, train)

            out = {
                name: HourglassHead(
                    features, cur_dim, final_bias=bias, dtype=self.dtype,
                    name=f"{name}_{stack_idx}"
                )(cnv)
                for name, features, bias in self.terminals
            }
            outs.append(out)

            if stack_idx < self.stacks - 1:
                shortcut = conv1x1(cur_dim, dtype=self.dtype)(inter)
                shortcut = BatchNorm(dtype=self.dtype)(shortcut, train)
                prev = conv1x1(cur_dim, dtype=self.dtype)(cnv)
                prev = BatchNorm(dtype=self.dtype)(prev, train)
                inter = nn.relu(shortcut + prev)
                inter = Residual(cur_dim, dtype=self.dtype)(inter, train)

        return outs
