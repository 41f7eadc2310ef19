"""Parity against the REFERENCE's actual compiled C++ native ops.

``tests/goldens/native_goldens.npz`` is produced by
tools/gen_native_goldens.py, which compiles the reference's own
cornerPooling torch extensions and DCNv2 CPU extension
(/root/reference/models/backbones/{cornerPooling,deformable}) and records
fixed seeded inputs with their outputs AND backward gradients. Here the
JAX ops reproduce them: this is stronger than tests/test_dcn.py /
test_pallas_kernels.py (which check against re-implementations and
finite differences) — it pins our kernels to the reference's bits.

Layout mapping (reference NCHW torch ↔ this framework NHWC):
  input   (B, C, H, W)        ↔ (B, H, W, C)
  weight  (Cout, Cin, kh, kw) ↔ (kh, kw, Cin, Cout)
  offset  (B, 2K, Ho, Wo), channel 2k = dy, 2k+1 = dx
          (dcn.im2col.cpp data_offset indexing)
                               ↔ (B, Ho, Wo, K, 2) with [...,0]=dy
  mask    (B, K, Ho, Wo)       ↔ (B, Ho, Wo, K)
  trans   (N, 2, P, P), channel 0 = dx, 1 = dy (dcn.roipool.cpp)
                               ↔ (N, P, P, 2) with [...,0]=dx
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scd_resnet_tpu.ops.corner_pool import (
    bottom_pool,
    left_pool,
    right_pool,
    top_pool,
)
from scd_resnet_tpu.ops.dcn import deform_conv2d, deform_psroi_pooling

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "goldens", "native_goldens.npz")


@pytest.fixture(scope="module")
def g():
    assert os.path.exists(GOLDENS), (
        "missing {}; regenerate with tools/gen_native_goldens.py".format(
            GOLDENS)
    )
    return np.load(GOLDENS)


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


POOLS = {"topPool": top_pool, "bottomPool": bottom_pool,
         "leftPool": left_pool, "rightPool": right_pool}


@pytest.mark.parametrize("name", sorted(POOLS))
def test_corner_pool_forward_matches_reference_native(g, name):
    got = _nchw(POOLS[name](_nhwc(g["pool_x"])))
    np.testing.assert_allclose(got, g["pool_{}_out".format(name)],
                               rtol=0, atol=0)


def _dcn_inputs(g):
    kh, kw, sh, sw, p_h, p_w, dh, dw, dg = (int(v) for v in g["dcn_geom"])
    assert (sh, p_h, dh, dg) == (sw, p_w, dw, 1)
    b, _, ho, wo = g["dcn_grad_out"].shape
    k = kh * kw
    x = _nhwc(g["dcn_input"])
    w = jnp.asarray(np.transpose(g["dcn_weight"], (2, 3, 1, 0)))
    bias = jnp.asarray(g["dcn_bias"])
    # (B, 2K, Ho, Wo) -> (B, K, 2, Ho, Wo) -> (B, Ho, Wo, K, 2)
    off = jnp.asarray(np.transpose(
        g["dcn_offset"].reshape(b, k, 2, ho, wo), (0, 3, 4, 1, 2)))
    mask = _nhwc(g["dcn_mask"])
    return x, off, mask, w, bias, dict(stride=sh, padding=p_h, dilation=dh)


@pytest.mark.parametrize("method", ["gather", "onehot", "pallas"])
def test_dcn_forward_matches_reference_native(g, method):
    x, off, mask, w, bias, kw_ = _dcn_inputs(g)
    got = _nchw(deform_conv2d(x, off, mask, w, bias, method=method, **kw_))
    np.testing.assert_allclose(got, g["dcn_out"], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("method", ["gather", "onehot", "pallas"])
def test_dcn_backward_matches_reference_native(g, method):
    x, off, mask, w, bias, kw_ = _dcn_inputs(g)
    ct = _nhwc(g["dcn_grad_out"])

    def fwd(x, off, mask, w, bias):
        return deform_conv2d(x, off, mask, w, bias, method=method, **kw_)

    _, vjp = jax.vjp(fwd, x, off, mask, w, bias)
    gx, goff, gmask, gw, gbias = vjp(ct)
    b, _, ho, wo = g["dcn_grad_out"].shape
    k = off.shape[3]
    np.testing.assert_allclose(_nchw(gx), g["dcn_grad_input"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.transpose(np.asarray(gw), (3, 2, 0, 1)), g["dcn_grad_weight"],
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gbias), g["dcn_grad_bias"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.transpose(np.asarray(goff), (0, 3, 4, 1, 2)).reshape(
            b, 2 * k, ho, wo),
        g["dcn_grad_offset"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(_nchw(gmask), g["dcn_grad_mask"],
                               rtol=2e-5, atol=2e-5)


def _psroi_inputs(g):
    output_dim, group_size, pooled, part, spp = (
        int(v) for v in g["psroi_geom"])
    scale, trans_std = (float(v) for v in g["psroi_scales"])
    x = _nhwc(g["psroi_input"])
    rois = jnp.asarray(g["psroi_rois"])
    trans = jnp.asarray(np.transpose(g["psroi_trans"], (0, 2, 3, 1)))
    kw_ = dict(output_dim=output_dim, group_size=group_size,
               pooled_size=pooled, spatial_scale=scale,
               trans_std=trans_std, sample_per_part=spp, part_size=part)
    return x, rois, trans, kw_


@pytest.mark.parametrize("tag,no_trans", [("", False), ("_nt", True)])
def test_psroi_forward_matches_reference_native(g, tag, no_trans):
    x, rois, trans, kw_ = _psroi_inputs(g)
    got = deform_psroi_pooling(x, rois, trans, no_trans=no_trans, **kw_)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, g["psroi_out" + tag],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("tag,no_trans", [("", False), ("_nt", True)])
def test_psroi_backward_matches_reference_native(g, tag, no_trans):
    x, rois, trans, kw_ = _psroi_inputs(g)
    ct = jnp.asarray(np.transpose(g["psroi_grad_out"], (0, 2, 3, 1)))

    def fwd(x, trans):
        return deform_psroi_pooling(x, rois, trans, no_trans=no_trans,
                                    **kw_)

    _, vjp = jax.vjp(fwd, x, trans)
    gx, gtrans = vjp(ct)
    np.testing.assert_allclose(_nchw(gx), g["psroi_grad_input" + tag],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.transpose(np.asarray(gtrans), (0, 3, 1, 2)),
        g["psroi_grad_trans" + tag], rtol=2e-5, atol=2e-5)
