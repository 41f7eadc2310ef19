"""Pooling/unpooling factory surface vs torch (the reference's backend).

The reference's models/backbones/pooling.py:39-53 factories wrap torch
modules; ours must reproduce their numerics in NHWC. torch (CPU) is baked
into the image, so every live mode is pinned directly against it."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from scd_resnet_tpu.models.pooling import (
    PoolingType,
    UpsampleType,
    adaptive_pooling_layer,
    pooling_layer,
    unpooling_layer,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


def _to_nhwc(t):
    return np.moveaxis(t.numpy(), 1, -1)


@pytest.fixture()
def x():
    rng = np.random.default_rng(0)
    return rng.normal(size=(2, 12, 16, 3)).astype(np.float32)


@pytest.mark.parametrize("ptype,tmod", [
    (PoolingType.MaximalPool, torch.nn.MaxPool2d),
    (PoolingType.AveragePool, torch.nn.AvgPool2d),
])
@pytest.mark.parametrize("scale", [2, 4])
def test_pooling_layer_matches_torch(x, ptype, tmod, scale):
    ours = np.asarray(pooling_layer(scale, ptype)(x))
    ref = _to_nhwc(tmod(kernel_size=scale, stride=scale)(_nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("ptype,tmod", [
    (PoolingType.MaximalPool, torch.nn.AdaptiveMaxPool2d),
    (PoolingType.AveragePool, torch.nn.AdaptiveAvgPool2d),
])
@pytest.mark.parametrize("out_hw", [(6, 8), (5, 7), (3, 16), (12, 16)])
def test_adaptive_pooling_matches_torch(x, ptype, tmod, out_hw):
    oh, ow = out_hw
    ours = np.asarray(adaptive_pooling_layer(ow, oh, ptype)(x))
    ref = _to_nhwc(tmod((oh, ow))(_nchw(x)))
    assert ours.shape == (2, oh, ow, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("mode,scale", [
    (UpsampleType.NearestNeighbour, 2),
    (UpsampleType.NearestNeighbour, 3),
    (UpsampleType.Bilinear, 2),
])
def test_unpooling_2d_matches_torch(x, mode, scale):
    ours = np.asarray(unpooling_layer(scale, mode)(x))
    ref = _to_nhwc(torch.nn.Upsample(
        scale_factor=scale, mode=mode.value)(_nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_unpooling_linear_1d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 9, 4)).astype(np.float32)  # NWC
    ours = np.asarray(unpooling_layer(2, UpsampleType.Linear)(x))
    t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    ref = np.moveaxis(
        torch.nn.Upsample(scale_factor=2, mode="linear")(t).numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_unpooling_trilinear_3d_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 6, 5, 2)).astype(np.float32)  # NDHWC
    ours = np.asarray(unpooling_layer(2, UpsampleType.Trilinear)(x))
    t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    ref = np.moveaxis(
        torch.nn.Upsample(scale_factor=2, mode="trilinear")(t).numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_unpooling_bicubic_close_to_torch():
    """Documented divergence: Keys a=-0.5 (jax) vs a=-0.75 (torch). On a
    smooth field the two cubics agree closely; pin shape + proximity."""
    yy, xx = np.meshgrid(np.linspace(0, 1, 10), np.linspace(0, 1, 12),
                         indexing="ij")
    x = (np.sin(3 * xx) * np.cos(2 * yy)).astype(np.float32)[None, :, :, None]
    ours = np.asarray(unpooling_layer(2, UpsampleType.Bicubic)(x))
    ref = _to_nhwc(torch.nn.Upsample(
        scale_factor=2, mode="bicubic")(_nchw(x)))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() < 0.02


def test_unpooling_rank_guard():
    with pytest.raises(ValueError):
        unpooling_layer(2, UpsampleType.Trilinear)(np.zeros((1, 4, 4, 2)))


def test_reference_spelling_aliases():
    from scd_resnet_tpu.models import pooling as m

    assert m.poolingLayer is m.pooling_layer
    assert m.adaptivePoolingLayer is m.adaptive_pooling_layer
    assert m.unpoolingLayer is m.unpooling_layer
