"""Pallas kernels vs their XLA counterparts (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from scd_resnet_tpu.ops.corner_pool import bottom_pool, left_pool, top_pool
from scd_resnet_tpu.ops.gaussian import render_heatmap
from scd_resnet_tpu.ops.pallas_kernels import corner_pool_pallas, render_heatmap_pallas


def test_render_heatmap_pallas_matches_xla():
    rng = np.random.default_rng(0)
    b, k, size = 2, 6, 32
    locs = np.zeros((b, k, 8), np.float32)
    locs[..., 0] = rng.uniform(2, size - 3, (b, k))
    locs[..., 1] = rng.uniform(2, size - 3, (b, k))
    locs[..., 4] = rng.uniform(1, 4, (b, k))
    locs[..., 5] = rng.uniform(1, 4, (b, k))
    locs[..., 6] = rng.uniform(1, 3, (b, k))
    valid = np.ones((b, k), bool)
    valid[:, -2:] = False

    want = jax.vmap(lambda l, v: render_heatmap(l, v, size))(
        jnp.array(locs), jnp.array(valid))
    got = render_heatmap_pallas(jnp.array(locs), jnp.array(valid), size,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_corner_pool_pallas_matches_cummax():
    rng = np.random.default_rng(1)
    x = jnp.array(rng.standard_normal((2, 8, 16, 4)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(corner_pool_pallas(x, 1, True, interpret=True)),
        np.asarray(top_pool(x)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(corner_pool_pallas(x, 1, False, interpret=True)),
        np.asarray(bottom_pool(x)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(corner_pool_pallas(x, 2, True, interpret=True)),
        np.asarray(left_pool(x)), atol=1e-6)


def test_corner_pool_bf16_takes_cummax_path():
    """bf16 corner pools must NOT dispatch to the Pallas kernel: its W-axis
    variant advances a single-element dynamic slice along the sublane dim,
    unprovable under the packed (16,128) bf16 tile (Mosaic compile error
    observed on v5e, see ops/corner_pool._forward_impl). The cummax
    fallback must be exact vs the f32 pools cast to bf16."""
    from scd_resnet_tpu.ops.corner_pool import _forward_impl, right_pool

    rng = np.random.default_rng(2)
    x32 = jnp.array(rng.standard_normal((2, 8, 16, 4)), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    for fn, axis, rev in [(top_pool, 1, True), (bottom_pool, 1, False),
                          (left_pool, 2, True), (right_pool, 2, False)]:
        o16 = fn(x16)
        assert o16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(o16, np.float32),
            np.asarray(fn(x32).astype(jnp.bfloat16), np.float32))
    assert _forward_impl(x16, 2, False).dtype == jnp.bfloat16


def test_corner_pool_bwd_pallas_matches_scan_vjp():
    """The one-pass Pallas pool backward must match the XLA scan VJP
    exactly in routing (same zero pattern, first-occurrence ties) and to
    float tolerance in values."""
    from scd_resnet_tpu.ops.pallas_kernels import corner_pool_bwd_pallas

    rng = np.random.default_rng(5)
    x = jnp.asarray(np.maximum(rng.integers(-3, 4, (2, 16, 8, 128)), 0),
                    jnp.float32)
    g = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    for axis in (1, 2):
        for rev in (False, True):
            ref = np.asarray(_pool_bwd_reference(axis, rev, x, g))
            got = np.asarray(
                corner_pool_bwd_pallas(x, g, axis, rev, interpret=True))
            np.testing.assert_array_equal(got == 0, ref == 0)
            np.testing.assert_allclose(got, ref, atol=1e-5)


def _pool_bwd_reference(axis, rev, x, g):
    """The scan VJP with the TPU-kernel dispatch bypassed (tests run on
    CPU where the gate is off anyway, but keep it explicit)."""
    import os
    from scd_resnet_tpu.ops.corner_pool import _pool_bwd

    os.environ["SCD_DISABLE_PALLAS_POOL"] = "1"
    try:
        return _pool_bwd(axis, rev, x, g)[0]
    finally:
        del os.environ["SCD_DISABLE_PALLAS_POOL"]
