"""Corner pooling: directional running-max over feature maps.

The reference ships four compiled C++ torch extensions
(models/backbones/cornerPooling/source/{top,bottom,left,right}Pool.cpp):
forward is an iterated pairwise ``max_out`` over row/column slices — i.e. a
(reverse) cumulative max — and backward scatter-adds the output gradient
into the argmax positions (topPool.cpp:33-74).

On TPU there is no need for native code: the forward is exactly
``jax.lax.cummax`` (one fused XLA op), and the argmax-routed backward is a
custom VJP built from an associative scan that tracks indices plus a
scatter-add. SURVEY.md §2.9 documents this C++→XLA mapping.

Feature maps are NHWC. Pool directions (matching the reference's NCHW
definitions on H=axis 1, W=axis 2 here):

- ``top_pool``    — out[i] = max over rows i..H-1  (reverse cummax, H)
- ``bottom_pool`` — out[i] = max over rows 0..i    (cummax, H)
- ``left_pool``   — out[j] = max over cols j..W-1  (reverse cummax, W)
- ``right_pool``  — out[j] = max over cols 0..j    (cummax, W)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _running_argmax(x, axis: int, reverse: bool):
    """Indices (along `axis`) of the running maximum, ties keep the element
    scanned first (nearest), matching the reference's iterated pairwise max."""
    n = x.shape[axis]
    idx_shape = [1] * x.ndim
    idx_shape[axis] = n
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)

    def combine(a, b):
        # `a` is earlier in scan order; keep it on ties
        av, ai = a
        bv, bi = b
        take_b = bv > av
        return jnp.where(take_b, bv, av), jnp.where(take_b, bi, ai)

    _, am = lax.associative_scan(combine, (x, idx), axis=axis, reverse=reverse)
    return am


def _scatter_add_along_axis(template, idx, updates, axis: int):
    """zeros_like(template) with `updates` scatter-added at `idx` along axis."""
    x = jnp.moveaxis(template, axis, -1)
    idxm = jnp.moveaxis(idx, axis, -1)
    upd = jnp.moveaxis(updates, axis, -1)
    lead = x.shape[:-1]
    n = x.shape[-1]
    flat_idx = idxm.reshape(-1, n)
    flat_upd = upd.reshape(-1, n)
    rows = lax.broadcasted_iota(jnp.int32, flat_idx.shape, 0)
    out = jnp.zeros((flat_idx.shape[0], n), x.dtype)
    out = out.at[rows, flat_idx].add(flat_upd)
    return jnp.moveaxis(out.reshape(*lead, n), -1, axis)


def _forward_impl(x, axis: int, reverse: bool):
    """Forward dispatch: the hand-scheduled Pallas running-max kernel on
    TPU (measured ~1.4x faster than the cummax lowering at production
    shapes), lax.cummax elsewhere. SCD_DISABLE_PALLAS_POOL=1 forces the
    cummax path everywhere (debug/ablation switch).

    float32 only: the kernel's W-axis variant advances a single-element
    dynamic slice along the sublane dimension, which Mosaic cannot prove
    aligned under the packed (16, 128) bf16 tile ("cannot statically
    prove that index in dimension 2 is a multiple of 8" at kernel
    compile) — bf16 corner models take the cummax lowering instead."""
    import os

    if (jax.default_backend() == "tpu" and x.ndim == 4
            and x.dtype == jnp.float32
            and not os.environ.get("SCD_DISABLE_PALLAS_POOL")):
        from scd_resnet_tpu.ops.pallas_kernels import corner_pool_pallas

        return corner_pool_pallas(x, axis, reverse)
    return lax.cummax(x, axis=axis, reverse=reverse)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _directional_pool(x, axis: int, reverse: bool):
    return _forward_impl(x, axis, reverse)


def _pool_fwd(x, axis, reverse):
    return _forward_impl(x, axis, reverse), x


def _pool_bwd(axis, reverse, x, g):
    idx = _running_argmax(x, axis, reverse)
    return (_scatter_add_along_axis(x, idx, g, axis),)


_directional_pool.defvjp(_pool_fwd, _pool_bwd)


def top_pool(x):
    return _directional_pool(x, 1, True)


def bottom_pool(x):
    return _directional_pool(x, 1, False)


def left_pool(x):
    return _directional_pool(x, 2, True)


def right_pool(x):
    return _directional_pool(x, 2, False)
