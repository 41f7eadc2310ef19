"""Corner pooling: directional running-max over feature maps.

The reference ships four compiled C++ torch extensions
(models/backbones/cornerPooling/source/{top,bottom,left,right}Pool.cpp):
forward is an iterated pairwise ``max_out`` over row/column slices — i.e. a
(reverse) cumulative max — and backward scatter-adds the output gradient
into the argmax positions (topPool.cpp:33-74).

On TPU the forward is exactly ``jax.lax.cummax`` (with a hand-scheduled
Pallas variant, ~1.4x), and the argmax-routed backward is a custom VJP
computed scatter-free as a cumsum-difference over new-max segments — one
Pallas kernel on TPU, three XLA scans elsewhere (_pool_bwd; the naive
scatter-add lowering costs ~760 ms per pool at production shape and is
kept only as a test reference). SURVEY.md §2.9 documents this C++→XLA
mapping.

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
    """zeros_like(template) with `updates` scatter-added at `idx` along axis.

    Kept as the reference backward for tests; NOT used in the VJP — the
    XLA scatter lowering costs ~760 ms per pool at the production shape
    (32,128,128,128) on v5e, see _pool_bwd."""
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


def _shift_along_axis(x, axis: int, offset: int, fill):
    """x shifted by `offset` along `axis` (positive = towards higher
    indices), vacated positions filled with `fill`."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(offset, 0), max(-offset, 0))
    lo = max(-offset, 0)
    return lax.slice_in_dim(
        jnp.pad(x, pad, constant_values=fill), lo, lo + n, axis=axis)


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
    """Scatter-free running-max VJP (exact, first-occurrence tie routing).

    out[i]'s cotangent belongs to the running argmax at i. Argmax segments
    are contiguous and start exactly where the input strictly exceeds every
    earlier element ("new max"), so

        grad[j] = sum of g over j's segment
                = R[j] - R[next new-max after j]     (R = suffix cumsum of g)

    — three scans (cummax, cumsum, one associative fill) plus elementwise
    ops instead of a scatter-add. On v5e at (32,128,128,128) this is
    ~40 ms vs ~780 ms for the scatter lowering (the scatter made a
    cornerCPool train step >1 s; measured live, see docs/PERFORMANCE.md).
    jax.grad of lax.cummax itself is NOT usable: it SPLITS the gradient
    among tied running-max positions, while the reference's compiled
    extensions (topPool.cpp:33-74) route to the first occurrence —
    post-ReLU feature maps tie constantly at 0.

    On TPU the same algorithm runs as one Pallas kernel (two VMEM row
    loops, ops/pallas_kernels.corner_pool_bwd_pallas) instead of the
    three-scan XLA composition; SCD_DISABLE_PALLAS_POOL=1 disables it
    together with the forward kernel."""
    import os

    if (jax.default_backend() == "tpu" and x.ndim == 4
            and x.dtype == jnp.float32
            and not os.environ.get("SCD_DISABLE_PALLAS_POOL")):
        from scd_resnet_tpu.ops.pallas_kernels import corner_pool_bwd_pallas

        return (corner_pool_bwd_pallas(x, g, axis, reverse),)

    if reverse:
        x = jnp.flip(x, axis)
        g = jnp.flip(g, axis)

    m_prev = _shift_along_axis(
        lax.cummax(x, axis=axis), axis, 1, -jnp.inf)
    is_new = x > m_prev

    # R[i] = sum of g[i..n-1]
    R = jnp.flip(jnp.cumsum(jnp.flip(g, axis), axis=axis), axis)

    # nxt_r[i] = R at the first new-max position strictly after i (0 if
    # none): shift (R where new) left by one, then fill each hole with the
    # nearest valid value to its RIGHT via a flipped forward-fill scan
    vals = jnp.flip(_shift_along_axis(jnp.where(is_new, R, 0.0),
                                      axis, -1, 0.0), axis)
    valid = jnp.flip(_shift_along_axis(is_new, axis, -1, False), axis)

    def fill(a, b):  # "latest valid wins" monoid (b is later in scan order)
        return jnp.where(b[1], b[0], a[0]), a[1] | b[1]

    filled, _ = lax.associative_scan(fill, (vals, valid), axis=axis)
    nxt_r = jnp.flip(filled, axis)

    grad = jnp.where(is_new, R - nxt_r, 0.0).astype(g.dtype)
    if reverse:
        grad = jnp.flip(grad, axis)
    return (grad,)


_directional_pool.defvjp(_pool_fwd, _pool_bwd)


def _pool(x, axis: int, reverse: bool):
    """Public pool entry: ALWAYS computes in float32.

    For bf16 feature maps this is exact — a running max only ever returns
    input values and bf16→f32 is lossless — and it keeps bf16 corner
    models on the fast TPU kernels: Mosaic rejects the Pallas forward's
    (and backward's) single-element W-axis slice under the packed
    (16,128) bf16 tile, and no bf16 lowering measured faster than the
    f32 kernels anyway. f32 in/out passes through untouched."""
    if x.dtype != jnp.float32:
        return _directional_pool(
            x.astype(jnp.float32), axis, reverse).astype(x.dtype)
    return _directional_pool(x, axis, reverse)


def top_pool(x):
    return _pool(x, 1, True)


def bottom_pool(x):
    return _pool(x, 1, False)


def left_pool(x):
    return _pool(x, 2, True)


def right_pool(x):
    return _pool(x, 2, False)
