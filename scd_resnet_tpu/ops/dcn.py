"""Modulated deformable convolution v2 and deformable PSROI pooling.

TPU-native replacement for the reference's vendored DCNv2 extension
(models/backbones/deformable/ — ~2,980 lines of C++/CUDA: dcn.im2col
kernels, dcn.roipool kernels, the `_DCNv2` autograd Functions in
dcn_v2.py:14-93 and the pooling Functions at 194-344). On TPU the whole
thing collapses into a bilinear-gather "deformable im2col" followed by ONE
large matmul, and autodiff derives the backward (the reference needed 4
hand-written CUDA gradient kernels). SURVEY.md §2.9 documents this C++→XLA
mapping.

Three interchangeable im2col lowerings (``deform_conv2d(method=...)``):

- ``"gather"`` — ``jnp.take_along_axis`` per corner; XLA's gather lowering
  is memory-bound on TPU (measured 5.8x a plain conv at 64²/128ch);
- ``"onehot"`` — the gather rewritten as a sparse bilinear-weight matrix
  times the flattened feature map, so the irregular access lands on the
  MXU as ONE dense matmul (W[n, hw] has <=4 nonzeros per row — the corner
  lerp weights). O(N*HW*C) FLOPs instead of O(N*C) loads: brute force,
  but the MXU is fast enough that this wins wherever the one-hot matrix
  fits (the production S/32 map: HW=256);
- ``"pallas"`` — the fused Pallas kernel in ops/pallas_kernels.py
  (dcn_gather_pallas): per-batch-element feature map resident in VMEM,
  one-hot tile built in-register, matmul on the MXU, im2col never
  round-trips HBM. Custom VJP: Pallas forward, XLA (onehot) backward.

``method="auto"`` picks by one-hot matrix size; see _pick_method.

Measured on v5e-1 (tools/dcn_probe_r4.{py,json}; within-process
comparisons — tunnel dispatch inflates absolutes): the full
centerOffsetRes10dcn train step (512², b32, bf16) runs 68.8 ms with
gather, 68.1 ms with pallas, **54.0 ms with onehot** — the DCN overhead
over the plain 47.5 ms step drops 21.3 -> 6.5 ms (3.3x). onehot also wins
the 64²/128ch micro shape despite a 4.8 GB transient weight matrix, but
auto stays memory-safe (128 MB limit) and falls back to gather there;
force SCD_DCN_METHOD=onehot for inference-only large maps with free HBM.
The Pallas kernel matches onehot in isolation (fwd 19.3 vs 18.1 ms,
fwd+bwd 22.8 vs 23.6) but loses in-step — a pallas_call boundary inside
the step blocks the XLA fusions the pure-jnp onehot enjoys (measured
negative; the kernel stays for shapes where VMEM residency matters).
docs/PERFORMANCE.md records the table.

Semantics (bit-matched to dcn.im2col.cpp / dcn.roipool.cpp):

- bilinear sampling with per-corner zero validity (dmcn_im2col_bilinear_cpu,
  dcn.im2col.cpp:27-56) and the outer (-1, size) cutoff;
- offsets per kernel tap in (dy, dx) order, modulation mask multiplied
  after sampling;
- PSROI: rounded ROI corners scaled by spatial_scale minus 0.5, bins of
  sample_per_part^2 sub-samples, per-bin group channel selection, mean of
  in-bounds samples (dcn.roipool.cpp:78-144).

Layouts are NHWC; weights are HWIO.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# one-hot matrix budget for method="auto": beyond this the (B, N, HW)
# bilinear-weight matrix (and its N*HW*C matmul FLOPs) stop paying for
# themselves against the gather's N*C loads
_ONEHOT_BYTES_LIMIT = 128 * 1024 * 1024


def _pick_method(b: int, n: int, h: int, w: int) -> str:
    """Choose the im2col lowering (see module docstring). The
    ``SCD_DCN_METHOD`` env var (gather|onehot|pallas) overrides — the
    ablation switch for benchmarks and tests."""
    forced = os.environ.get("SCD_DCN_METHOD")
    if forced:
        return forced
    if b * n * h * w * 4 <= _ONEHOT_BYTES_LIMIT:
        return "onehot"
    return "gather"


def _bilinear_gather(x, py, px):
    """Sample (B, H, W, C) at float positions (B, N) -> (B, N, C) with
    zero outside, per-corner validity."""
    b, h, w, c = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    flat = x.reshape(b, h * w, c)

    def corner(yi, xi, weight):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c
        vals = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
        return vals * (weight * valid)[:, :, None]

    out = corner(y0, x0, hy * hx)
    out += corner(y0, x0 + 1, hy * lx)
    out += corner(y0 + 1, x0, ly * hx)
    out += corner(y0 + 1, x0 + 1, ly * lx)

    # outer cutoff: whole sample zero when the position leaves (-1, size)
    inside = (py > -1) & (py < h) & (px > -1) & (px < w)
    return out * inside[:, :, None]


def bilinear_onehot_matrix(py, px, h: int, w: int):
    """The sparse bilinear-sampling matrix, densified: W[..., n, hw] such
    that ``sample = W @ x.reshape(h*w, c)`` reproduces
    :func:`_bilinear_gather` exactly (same per-corner validity and outer
    (-1, size) cutoff).

    Each row holds at most the 4 corner lerp weights; building it is a few
    VPU compares over an (N, HW) grid and the sample itself becomes a dense
    MXU matmul. Differentiable in (py, px) through the lerp weights — the
    same gradient the reference's dmcn_get_coordinate_weight CUDA kernel
    hand-computes (dcn.im2col.cuda.cu:88-123).
    """
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0
    hy = 1.0 - ly
    hx = 1.0 - lx
    inside = (py > -1) & (py < h) & (px > -1) & (px < w)
    hw_ids = jnp.arange(h * w, dtype=jnp.int32)

    def corner(yi, xi, weight):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w) & inside
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c
        # invalid corners scatter weight 0 at a clipped (harmless) slot
        return jnp.where(valid, weight, 0.0)[..., None] * (
            idx[..., None] == hw_ids
        )

    return (corner(y0, x0, hy * hx) + corner(y0, x0 + 1, hy * lx)
            + corner(y0 + 1, x0, ly * hx) + corner(y0 + 1, x0 + 1, ly * lx))


def _bilinear_gather_onehot(x, py, px):
    """:func:`_bilinear_gather` as one dense matmul (see module docstring)."""
    b, h, w, c = x.shape
    weight = bilinear_onehot_matrix(py, px, h, w)  # (B, N, HW)
    return jax.lax.dot_general(
        weight, x.reshape(b, h * w, c),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def deform_conv2d(x, offset, mask, weights, bias: Optional[jnp.ndarray] = None,
                  stride: int = 1, padding: int = 1, dilation: int = 1,
                  method: str = "auto"):
    """Modulated deformable convolution (DCNv2 forward,
    dcn.im2col.cpp:308-394 + dcn.cpp dispatch).

    Args:
      x: (B, H, W, Cin).
      offset: (B, Ho, Wo, K, 2) learned per-tap (dy, dx) offsets.
      mask: (B, Ho, Wo, K) modulation scalars (already sigmoided).
      weights: (kh, kw, Cin, Cout).
      bias: optional (Cout,).
      method: im2col lowering — "auto" | "gather" | "onehot" | "pallas"
        (module docstring); all are numerically interchangeable.

    Returns (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weights.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    oy = jnp.arange(ho) * stride - padding
    ox = jnp.arange(wo) * stride - padding
    ky, kx = jnp.meshgrid(jnp.arange(kh), jnp.arange(kw), indexing="ij")
    ky = ky.reshape(-1) * dilation  # (K,)
    kx = kx.reshape(-1) * dilation

    # float sampling positions (B, Ho, Wo, K)
    py = (oy[None, :, None, None] + ky[None, None, None, :]
          + offset[..., 0])
    px = (ox[None, None, :, None] + kx[None, None, None, :]
          + offset[..., 1])

    n = ho * wo * k
    if method == "auto":
        method = _pick_method(b, n, h, w)
    if method == "onehot":
        sampled = _bilinear_gather_onehot(
            x, py.reshape(b, n), px.reshape(b, n))
    elif method == "pallas":
        from scd_resnet_tpu.ops.pallas_kernels import dcn_gather_pallas

        sampled = dcn_gather_pallas(x, py.reshape(b, n), px.reshape(b, n))
    else:
        sampled = _bilinear_gather(x, py.reshape(b, n), px.reshape(b, n))
    sampled = sampled.reshape(b, ho, wo, k, cin)
    sampled = sampled * mask[..., None]

    out = jax.lax.dot_general(
        sampled.reshape(b, ho * wo, k * cin),
        weights.reshape(k * cin, cout),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


def deform_psroi_pooling(x, rois, trans, *, output_dim: int, group_size: int,
                         pooled_size: int, spatial_scale: float,
                         trans_std: float = 0.1, sample_per_part: int = 4,
                         part_size: Optional[int] = None,
                         no_trans: bool = False):
    """Deformable position-sensitive ROI pooling (dcn.roipool.cpp:59-144).

    Args:
      x: (B, H, W, C) with C == output_dim * group_size^2.
      rois: (N, 5) rows ``[batch_index, x1, y1, x2, y2]``.
      trans: (N, part_size, part_size, 2) normalized (dx, dy) bin
        displacements (ignored when ``no_trans``).

    Returns (N, pooled_size, pooled_size, output_dim).
    """
    b, h, w, c = x.shape
    part_size = part_size or pooled_size
    n = rois.shape[0]
    p = pooled_size

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)

    bin_w = roi_w / p  # (N,)
    bin_h = roi_h / p
    sub_w = bin_w / sample_per_part
    sub_h = bin_h / sample_per_part

    ph = jnp.arange(p)
    pw = jnp.arange(p)
    part_h = jnp.floor(ph / p * part_size).astype(jnp.int32)  # (p,)
    part_w = jnp.floor(pw / p * part_size).astype(jnp.int32)

    if no_trans:
        trans_x = jnp.zeros((n, p, p))
        trans_y = jnp.zeros((n, p, p))
    else:
        tx = trans[..., 0] * trans_std  # (N, part, part)
        ty = trans[..., 1] * trans_std
        trans_x = tx[:, part_h][:, :, part_w]  # (N, p, p)
        trans_y = ty[:, part_h][:, :, part_w]

    wstart = (pw[None, None, :] * bin_w[:, None, None]
              + x1[:, None, None] + trans_x * roi_w[:, None, None])
    hstart = (ph[None, :, None] * bin_h[:, None, None]
              + y1[:, None, None] + trans_y * roi_h[:, None, None])

    s = jnp.arange(sample_per_part).astype(jnp.float32)
    # sample positions (N, p, p, s, s) at i * sub_bin (dcn.roipool.cpp:128-129)
    sy = hstart[..., None, None] + s[None, None, None, :, None] * \
        sub_h[:, None, None, None, None]
    sx = wstart[..., None, None] + s[None, None, None, None, :] * \
        sub_w[:, None, None, None, None]

    inside = ((sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5))
    sy_c = jnp.clip(sy, 0.0, h - 1.0)
    sx_c = jnp.clip(sx, 0.0, w - 1.0)

    # group channel selection: bin (i, j) reads channels
    # (ctop * group_size + gh) * group_size + gw
    gh = jnp.clip(jnp.floor(ph * group_size / p), 0, group_size - 1)
    gw = jnp.clip(jnp.floor(pw * group_size / p), 0, group_size - 1)
    xg = x.reshape(b, h, w, output_dim, group_size, group_size)

    gh_grid = jnp.broadcast_to(gh[:, None], (p, p)).astype(jnp.int32)
    gw_grid = jnp.broadcast_to(gw[None, :], (p, p)).astype(jnp.int32)

    def pool_bin(feat, syb, sxb, insb, ghi, gwi):
        """feat (h, w, output_dim, g, g); syb/sxb/insb (s, s) ->
        (output_dim,) mean of in-bounds bilinear samples."""
        fb = feat[:, :, :, ghi, gwi]  # (h, w, output_dim)
        y0 = jnp.floor(syb)
        x0 = jnp.floor(sxb)
        ly = syb - y0
        lx = sxb - x0

        def corner(yi, xi, weight):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            return fb[yi_c, xi_c] * (weight * valid)[..., None]

        v = corner(y0, x0, (1 - ly) * (1 - lx))
        v += corner(y0, x0 + 1, (1 - ly) * lx)
        v += corner(y0 + 1, x0, ly * (1 - lx))
        v += corner(y0 + 1, x0 + 1, ly * lx)
        cnt = insb.sum()
        pooled = (v * insb[..., None]).sum(axis=(0, 1)) / jnp.maximum(cnt, 1)
        return jnp.where(cnt > 0, pooled, 0.0)

    def pool_one(bi, syr, sxr, ins):
        feat = xg[bi]
        over_cols = jax.vmap(pool_bin, in_axes=(None, 0, 0, 0, 0, 0))
        over_rows = jax.vmap(over_cols, in_axes=(None, 0, 0, 0, 0, 0))
        return over_rows(feat, syr, sxr, ins, gh_grid, gw_grid)

    return jax.vmap(pool_one)(batch_idx, sy_c, sx_c, inside)


# Module-style DCN wrappers live in scd_resnet_tpu.models.deformable (flax).

