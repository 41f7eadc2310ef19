"""DCNv2 semantics tests, mirroring the reference extension's own test
strategy (deformable/testcpu.py: zero-offset equivalence to standard conv,
gradient checks, pooling zero-offset) with lax.conv and finite differences
as oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from scd_resnet_tpu.models.deformable import DCN, DCNPooling
from scd_resnet_tpu.ops.dcn import deform_conv2d, deform_psroi_pooling


def _plain_conv(x, weights, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, weights, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_zero_offset_equals_standard_conv():
    rng = np.random.default_rng(0)
    x = jnp.array(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    w = jnp.array(rng.standard_normal((3, 3, 3, 4)) * 0.1, jnp.float32)
    offset = jnp.zeros((2, 8, 8, 9, 2))
    mask = jnp.ones((2, 8, 8, 9))
    got = deform_conv2d(x, offset, mask, w)
    want = _plain_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_integer_offset_shifts_sampling():
    rng = np.random.default_rng(1)
    x = jnp.array(rng.standard_normal((1, 8, 8, 1)), jnp.float32)
    w = jnp.zeros((1, 1, 1, 1)).at[0, 0, 0, 0].set(1.0)
    # 1x1 kernel with (dy=1, dx=0) offset: out[y, x] = x[y+1, x]
    offset = jnp.zeros((1, 8, 8, 1, 2)).at[..., 0].set(1.0)
    mask = jnp.ones((1, 8, 8, 1))
    got = deform_conv2d(x, offset, mask, w, stride=1, padding=0, dilation=1)
    want = jnp.concatenate([x[:, 1:], jnp.zeros((1, 1, 8, 1))], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_mask_modulates_linearly():
    rng = np.random.default_rng(2)
    x = jnp.array(rng.standard_normal((1, 6, 6, 2)), jnp.float32)
    w = jnp.array(rng.standard_normal((3, 3, 2, 2)) * 0.1, jnp.float32)
    offset = jnp.zeros((1, 6, 6, 9, 2))
    full = deform_conv2d(x, offset, jnp.ones((1, 6, 6, 9)), w)
    half = deform_conv2d(x, offset, jnp.full((1, 6, 6, 9), 0.5), w)
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5,
                               atol=1e-5)


def test_gradients_match_finite_differences():
    rng = np.random.default_rng(3)
    x = jnp.array(rng.standard_normal((1, 5, 5, 2)), jnp.float32)
    w = jnp.array(rng.standard_normal((3, 3, 2, 1)) * 0.3, jnp.float32)
    offset = jnp.array(rng.standard_normal((1, 5, 5, 9, 2)) * 0.4, jnp.float32)
    mask = jnp.array(rng.random((1, 5, 5, 9)), jnp.float32)

    def f_off(o):
        return (deform_conv2d(x, o, mask, w) ** 2).sum()

    g = jax.grad(f_off)(offset)
    eps = 1e-3
    for idx in [(0, 2, 2, 4, 0), (0, 1, 3, 7, 1), (0, 4, 0, 0, 0)]:
        op = offset.at[idx].add(eps)
        om = offset.at[idx].add(-eps)
        fd = (f_off(op) - f_off(om)) / (2 * eps)
        assert abs(float(g[idx]) - float(fd)) < 5e-2 * max(1.0, abs(float(fd))), idx


def test_dcn_module_initializes_as_plain_conv():
    rng = np.random.default_rng(4)
    x = jnp.array(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    model = DCN(features=4)
    variables = model.init(jax.random.PRNGKey(0), x)
    got = model.apply(variables, x)
    # zero-init offsets, sigmoid(0)=0.5 masks => 0.5 * standard conv + bias
    w = variables["params"]["kernel"]
    want = 0.5 * _plain_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_psroi_zero_trans_pools_bin_means():
    # constant feature map: pooling must return that constant everywhere
    b, h, w = 1, 16, 16
    output_dim, group = 2, 2
    x = jnp.full((b, h, w, output_dim * group * group), 3.25)
    rois = jnp.array([[0, 4.0, 4.0, 40.0, 40.0]])  # full-res coords, /4 scale
    out = deform_psroi_pooling(
        x, rois, jnp.zeros((1, 4, 4, 2)), output_dim=output_dim,
        group_size=group, pooled_size=4, spatial_scale=0.25, no_trans=True,
    )
    assert out.shape == (1, 4, 4, output_dim)
    np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-5)


def test_dcn_pooling_module_runs():
    rng = np.random.default_rng(5)
    x = jnp.array(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    rois = jnp.array([[0, 0.0, 0.0, 32.0, 32.0], [0, 8.0, 8.0, 56.0, 56.0]])
    model = DCNPooling(output_dim=2, pooled_size=4, group_size=2,
                       spatial_scale=0.25, deform_fc_dim=32)
    variables = model.init(jax.random.PRNGKey(0), x, rois)
    out = model.apply(variables, x, rois)
    assert out.shape == (2, 4, 4, 2)
    assert np.all(np.isfinite(np.asarray(out)))
    # zero-init trans branch => identical to no_trans pooling at init
    base = deform_psroi_pooling(
        x, rois, jnp.zeros((2, 4, 4, 2)), output_dim=2, group_size=2,
        pooled_size=4, spatial_scale=0.25, no_trans=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


def test_im2col_methods_agree_on_awkward_geometry():
    """gather / onehot / pallas im2col lowerings are interchangeable —
    identical forward and gradients on a geometry that exercises tile
    padding (N not a multiple of the Pallas sample tile), stride, dilation
    and far out-of-bounds offsets."""
    rng = np.random.default_rng(7)
    x = jnp.array(rng.standard_normal((2, 9, 11, 5)), jnp.float32)
    w = jnp.array(rng.standard_normal((3, 3, 5, 4)) * 0.1, jnp.float32)
    ho = (9 + 2 * 2 - 2 * 2 - 1) // 2 + 1
    wo = (11 + 2 * 2 - 2 * 2 - 1) // 2 + 1
    off = jnp.array(rng.standard_normal((2, ho, wo, 9, 2)) * 6.0, jnp.float32)
    mask = jnp.array(rng.uniform(0, 1, (2, ho, wo, 9)), jnp.float32)
    kw = dict(stride=2, padding=2, dilation=2)

    outs, grads = {}, {}
    for method in ("gather", "onehot", "pallas"):
        outs[method] = deform_conv2d(x, off, mask, w, method=method, **kw)

        def f(x, off, mask, w, method=method):
            return jnp.sum(
                deform_conv2d(x, off, mask, w, method=method, **kw) ** 2)

        grads[method] = jax.grad(f, argnums=(0, 1, 2, 3))(x, off, mask, w)

    for method in ("onehot", "pallas"):
        np.testing.assert_allclose(outs[method], outs["gather"],
                                   rtol=1e-5, atol=1e-5)
        for got, want in zip(grads[method], grads["gather"]):
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_im2col_method_env_override(monkeypatch):
    """SCD_DCN_METHOD forces the lowering (the benchmark ablation switch)."""
    from scd_resnet_tpu.ops import dcn

    monkeypatch.setenv("SCD_DCN_METHOD", "gather")
    assert dcn._pick_method(1, 10, 4, 4) == "gather"
    monkeypatch.delenv("SCD_DCN_METHOD")
    assert dcn._pick_method(1, 10, 4, 4) == "onehot"  # tiny: under budget
    assert dcn._pick_method(64, 200000, 128, 128) == "gather"  # over budget
