"""Pallas TPU kernels for the framework's custom hot ops.

These are the hand-scheduled variants of ops that XLA otherwise composes
from primitives:

- ``render_heatmap_pallas``: per-image Gaussian label rendering — one grid
  program per batch element, object loop accumulated in a VMEM tile (the
  whole K x H x W broadcast never materializes in HBM, unlike the XLA
  version's (K, H, W) intermediate);
- ``corner_pool_pallas``: directional running-max over H or W as an
  in-VMEM ``fori_loop`` carry (one row/column vector), avoiding the
  log-depth associative-scan lowering;
- ``dcn_gather_pallas``: the deformable bilinear gather (DCNv2 im2col,
  the counterpart of the reference's hand-scheduled CUDA kernels at
  dcn.im2col.cuda.cu:125-256) — per batch element the feature map stays
  resident in VMEM, each sample tile builds its sparse bilinear-weight
  matrix in-register and contracts it against the feature map on the MXU,
  so the irregular gather never issues scalar loads and the one-hot
  matrix never round-trips HBM. Custom VJP: XLA (onehot) backward.

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


def _dcn_gather_kernel(py_ref, px_ref, x_ref, out_ref, *, h: int, w: int):
    """One (batch element, sample tile): build the (TILE_N, HW) bilinear
    weight matrix from the sample positions and contract it with the
    VMEM-resident (HW, C) feature map on the MXU.

    Semantics identical to ops.dcn._bilinear_gather (per-corner zero
    validity + the outer (-1, size) cutoff)."""
    py = py_ref[0]  # (TILE_N, 1) — column layout, no in-kernel transpose
    px = px_ref[0]
    tile_n = py.shape[0]
    hw = h * w

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0
    hy = 1.0 - ly
    hx = 1.0 - lx
    inside = (py > -1) & (py < h) & (px > -1) & (px < w)
    hw_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, hw), 1)

    def corner(yi, xi, weight):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w) & inside
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c  # (TILE_N, 1)
        return jnp.where(valid, weight, 0.0) * (idx == hw_ids)

    wt = corner(y0, x0, hy * hx)
    wt += corner(y0, x0 + 1, hy * lx)
    wt += corner(y0 + 1, x0, ly * hx)
    wt += corner(y0 + 1, x0 + 1, ly * lx)

    out_ref[0] = jnp.dot(
        wt, x_ref[0].astype(jnp.float32), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _dcn_gather_pallas_fwd_impl(x, py, px, interpret):
    b, h, w, c = x.shape
    n = py.shape[1]
    hw = h * w

    # the whole per-image feature map must sit in VMEM next to the weight
    # tile; beyond this the one-hot contraction stops being the right tool
    # anyway (use the gather path)
    if hw * c * 4 > 8 * 1024 * 1024:
        raise ValueError(
            "dcn_gather_pallas: feature map {}x{}x{} exceeds the VMEM "
            "budget; use method='gather'".format(h, w, c)
        )
    budget = 6 * 1024 * 1024 // (hw * 4)
    tile_n = max(8, min(256, (budget // 8) * 8))
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        fill = jnp.full((b, n_pad - n), -10.0, py.dtype)
        py = jnp.concatenate([py, fill], axis=1)
        px = jnp.concatenate([px, fill], axis=1)

    kernel = functools.partial(_dcn_gather_kernel, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), x.dtype),
        interpret=interpret,
    )(
        jnp.asarray(py, jnp.float32)[..., None],
        jnp.asarray(px, jnp.float32)[..., None],
        x.reshape(b, hw, c),
    )
    return out[:, :n] if n_pad != n else out


@jax.custom_vjp
def dcn_gather_pallas(x, py, px):
    """Deformable bilinear gather, (B, H, W, C) sampled at (B, N) float
    positions -> (B, N, C); drop-in for ops.dcn._bilinear_gather.

    Forward is the fused Pallas kernel; backward re-derives through the
    XLA onehot formulation (same lerp-weight gradients the reference
    hand-writes in dcn.im2col.cuda.cu:88-123). Interpret mode is selected
    automatically off-TPU so the kernel stays testable on CPU."""
    return _dcn_gather_pallas_fwd_impl(
        x, py, px, interpret=jax.default_backend() != "tpu")


def _dcn_gather_pallas_fwd(x, py, px):
    return dcn_gather_pallas(x, py, px), (x, py, px)


def _dcn_gather_pallas_bwd(residuals, g):
    from scd_resnet_tpu.ops.dcn import _bilinear_gather, \
        _bilinear_gather_onehot, _pick_method

    x, py, px = residuals
    b, h, w, _ = x.shape
    ref = (_bilinear_gather_onehot
           if _pick_method(b, py.shape[1], h, w) == "onehot"
           else _bilinear_gather)
    _, vjp = jax.vjp(ref, x, py, px)
    return vjp(g.astype(jnp.float32))


dcn_gather_pallas.defvjp(_dcn_gather_pallas_fwd, _dcn_gather_pallas_bwd)


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


def _pool_bwd_kernel(x_ref, g_ref, out_ref, new_ref, *, axis: int,
                     reverse: bool):
    """Running-max VJP in two VMEM row loops (the one-pass counterpart of
    ops/corner_pool._pool_bwd's three XLA scans).

    Pass 1 walks the scan order with the running max as the carry and
    records strict new-max rows (first-occurrence tie routing, matching
    the reference's iterated pairwise max). Pass 2 walks backwards with
    two vector carries — the suffix cumsum of the cotangent ``r_run`` and
    its value at the most recent new-max ``last_new_r`` — emitting
    ``grad = is_new * (r_run - last_new_r)``."""
    n = x_ref.shape[axis]

    def row(ref, i):
        if axis == 1:
            return ref[0, pl.ds(i, 1), :, :]
        return ref[0, :, pl.ds(i, 1), :]

    def put(ref, i, v):
        if axis == 1:
            ref[0, pl.ds(i, 1), :, :] = v
        else:
            ref[0, :, pl.ds(i, 1), :] = v

    if axis == 1:
        cshape = (1, x_ref.shape[2], x_ref.shape[3])
    else:
        cshape = (x_ref.shape[1], 1, x_ref.shape[3])

    def fwd_step(j, m):
        i = n - 1 - j if reverse else j
        xr = row(x_ref, i)
        put(new_ref, i, (xr > m).astype(x_ref.dtype))
        return jnp.maximum(m, xr)

    jax.lax.fori_loop(0, n, fwd_step,
                      jnp.full(cshape, -jnp.inf, x_ref.dtype))

    def bwd_step(j, carry):
        r_run, last_new_r = carry
        i = j if reverse else n - 1 - j
        r_run = r_run + row(g_ref, i)
        is_new = row(new_ref, i) > 0
        put(out_ref, i, jnp.where(is_new, r_run - last_new_r,
                                  jnp.zeros_like(r_run)))
        return r_run, jnp.where(is_new, r_run, last_new_r)

    zeros = jnp.zeros(cshape, x_ref.dtype)
    jax.lax.fori_loop(0, n, bwd_step, (zeros, zeros))


def corner_pool_bwd_pallas(x, g, axis: int, reverse: bool,
                           interpret: bool = False,
                           vmem_budget_bytes: int = 4 * 1024 * 1024):
    """Gradient of the directional running max wrt ``x`` given cotangent
    ``g`` — one kernel launch instead of the XLA scan composition
    (measured ~23 ms -> ~? per pool at (32,128,128,128) f32 on v5e; see
    docs/PERFORMANCE.md). Blocking mirrors ``corner_pool_pallas`` with
    the budget split over four resident blocks (x, g, grad, new-max
    scratch)."""
    b, h, w, c = x.shape
    kernel = functools.partial(_pool_bwd_kernel, axis=axis, reverse=reverse)
    itemsize = jnp.dtype(x.dtype).itemsize
    ct = _pick_tile(c, 128, max(128, vmem_budget_bytes // (4 * h * w * itemsize))) \
        if c > 128 else c
    budget_elems = vmem_budget_bytes // (4 * itemsize * ct)
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
    spec = pl.BlockSpec(block, index, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM(block, x.dtype)],
        interpret=interpret,
    )(x, g)
