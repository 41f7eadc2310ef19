"""Pallas TPU kernels for the framework's custom hot ops.

These are the hand-scheduled variants of ops that XLA otherwise composes
from primitives:

- ``render_heatmap_pallas``: per-image Gaussian label rendering — one grid
  program per batch element, object loop accumulated in a VMEM tile (the
  whole K x H x W broadcast never materializes in HBM, unlike the XLA
  version's (K, H, W) intermediate);
- ``corner_pool_pallas``: directional running-max over H or W as an
  in-VMEM ``fori_loop`` carry (one row/column vector), avoiding the
  log-depth associative-scan lowering.

Each kernel is numerically exact against its XLA counterpart (tested in
interpret mode on CPU); ``ops.gaussian.render_heatmap`` /
``ops.corner_pool`` remain the default path — XLA's fusions are already
near memory-bound speed for these shapes, so the Pallas variants are kept
for (a) shapes where the broadcast intermediate matters (large K·H·W) and
(b) as the scheduling substrate for future fused decode work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scd_resnet_tpu.ops.radius import center_threshold_radius


def _render_kernel(locs_ref, valid_ref, heat_ref, *, size: int,
                   iou_threshold: float):
    """One batch element: accumulate K ROI-boxed Gaussians into the tile."""
    k = locs_ref.shape[1]  # block is (1, K, 8)
    # Mosaic iota is integer-only; cast afterwards
    ys = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1).astype(jnp.float32)

    def body(i, acc):
        cx = jnp.trunc(locs_ref[0, i, 0])
        cy = jnp.trunc(locs_ref[0, i, 1])
        majx = locs_ref[0, i, 4]
        majy = locs_ref[0, i, 5]
        minl = locs_ref[0, i, 6]
        ok = (
            (valid_ref[0, i, 0] > 0)
            & (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
        )
        width = 2.0 * jnp.sqrt(majx * majx + majy * majy)
        height = 2.0 * minl
        radius = center_threshold_radius(width, height, iou_threshold)
        radius = jnp.where(ok & (radius > 0), radius, 1.0)
        roi = jnp.ceil(radius * 2.0)
        sigma = radius / 3.0

        dx = xs - cx
        dy = ys - cy
        gauss = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
        box = (jnp.abs(dx) <= roi) & (jnp.abs(dy) <= roi)
        stamp = jnp.where(box & ok, gauss, 0.0)
        return acc + stamp

    acc = jax.lax.fori_loop(0, k, body, jnp.zeros((size, size), jnp.float32))
    heat_ref[0, :, :] = jnp.minimum(acc, 1.0)


def render_heatmap_pallas(locs, valid, size: int, iou_threshold: float = 0.5,
                          interpret: bool = False):
    """Batched Gaussian heatmap render, (B, K, 8) + (B, K) -> (B, S, S).

    Matches :func:`scd_resnet_tpu.ops.gaussian.render_heatmap` exactly."""
    b, k, _ = locs.shape
    kernel = functools.partial(_render_kernel, size=size,
                               iou_threshold=iou_threshold)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            # loc records are per-object scalars — SMEM supports the
            # dynamic per-object reads inside the fori_loop
            pl.BlockSpec((1, k, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, size, size), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, size, size), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(locs, jnp.float32),
        jnp.asarray(valid, jnp.float32)[:, :, None],
    )


def _pool_kernel(x_ref, out_ref, *, axis: int, reverse: bool):
    """Running max along `axis` (1=H, 2=W of the NHWC block) with a
    VMEM-resident carry vector."""
    n = x_ref.shape[axis]

    def step(j, carry):
        i = n - 1 - j if reverse else j
        if axis == 1:
            row = x_ref[0, pl.ds(i, 1), :, :]
            carry = jnp.maximum(carry, row)
            out_ref[0, pl.ds(i, 1), :, :] = carry
        else:
            row = x_ref[0, :, pl.ds(i, 1), :]
            carry = jnp.maximum(carry, row)
            out_ref[0, :, pl.ds(i, 1), :] = carry
        return carry

    if axis == 1:
        shape = (1, x_ref.shape[2], x_ref.shape[3])
    else:
        shape = (x_ref.shape[1], 1, x_ref.shape[3])
    init = jnp.full(shape, -jnp.inf, x_ref.dtype)
    jax.lax.fori_loop(0, n, step, init)


def _pick_tile(full: int, align: int, max_size: int) -> int:
    """Largest divisor of `full` that is a multiple of `align` and fits
    `max_size`; falls back to `full` (Mosaic accepts full dims)."""
    if full <= max_size:
        return full
    t = (max_size // align) * align
    while t >= align:
        if full % t == 0:
            return t
        t -= align
    return full


def corner_pool_pallas(x, axis: int, reverse: bool, interpret: bool = False,
                       vmem_budget_bytes: int = 4 * 1024 * 1024):
    """Directional running max of an NHWC tensor (axis 1 or 2).

    The pooled dimension stays whole in the block; the other spatial
    dimension and channels are tiled so one input+output block pair fits
    the VMEM budget."""
    b, h, w, c = x.shape
    kernel = functools.partial(_pool_kernel, axis=axis, reverse=reverse)
    itemsize = jnp.dtype(x.dtype).itemsize
    ct = _pick_tile(c, 128, max(128, vmem_budget_bytes // (2 * h * w * itemsize))) \
        if c > 128 else c
    budget_elems = vmem_budget_bytes // (2 * itemsize * ct)
    if axis == 1:
        wt = _pick_tile(w, 8, max(8, budget_elems // h))
        block = (1, h, wt, ct)
        grid = (b, w // wt, c // ct)
        index = lambda i, j, k_: (i, 0, j, k_)  # noqa: E731
    else:
        ht = _pick_tile(h, 8, max(8, budget_elems // w))
        block = (1, ht, w, ct)
        grid = (b, h // ht, c // ct)
        index = lambda i, j, k_: (i, j, 0, k_)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(block, index, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(block, index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)
