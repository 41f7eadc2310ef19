"""Unit tests for the radius solvers and heatmap rendering against
independent NumPy oracles implementing the documented reference semantics
(evaluations/intersection.py:46-64, scdx16p100.py:575-591)."""

import math

import numpy as np
import jax.numpy as jnp

from scd_resnet_tpu.ops.radius import center_threshold_radius, corner_threshold_radius
from scd_resnet_tpu.ops.gaussian import render_heatmap


def _oracle_center_radius(width, height, threshold):
    # quadratic roots written the reference's way: (b + sqrt(disc)) / 2
    b1 = height + width
    c1 = width * height * (1 - threshold) / (1 + threshold)
    r1 = (b1 + math.sqrt(b1 * b1 - 4 * c1)) / 2
    b2 = 2 * (height + width)
    c2 = (1 - threshold) * width * height
    r2 = (b2 + math.sqrt(b2 * b2 - 16 * c2)) / 2
    a3 = 4 * threshold
    b3 = -2 * threshold * (height + width)
    c3 = (threshold - 1) * width * height
    r3 = (b3 + math.sqrt(b3 * b3 - 4 * a3 * c3)) / 2
    return min(r1, r2, r3)


def test_center_threshold_radius_matches_reference_math():
    for w, h, t in [(10, 4, 0.5), (3.5, 3.5, 0.7), (20, 6, 0.3), (1.0, 2.0, 0.5)]:
        got = float(center_threshold_radius(w, h, t))
        want = _oracle_center_radius(w, h, t)
        assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (w, h, t, got, want)


def test_center_threshold_radius_vectorized():
    ws = jnp.array([10.0, 3.5, 20.0])
    hs = jnp.array([4.0, 3.5, 6.0])
    rs = center_threshold_radius(ws, hs, 0.5)
    assert rs.shape == (3,)
    for i, (w, h) in enumerate([(10, 4), (3.5, 3.5), (20, 6)]):
        assert abs(float(rs[i]) - _oracle_center_radius(w, h, 0.5)) < 1e-3


def test_corner_threshold_radius_positive():
    r = float(corner_threshold_radius(10.0, 8.0, 0.7))
    assert r > 0


def _oracle_draw(heat, x, y, radius):
    """Sequential ROI-boxed gaussian stamp with clamp-after-each."""
    roi = math.ceil(radius * 2)
    hgt, wid = heat.shape
    x, y = int(x), int(y)
    left = min(roi, x)
    right = min(roi, wid - x - 1)
    top = min(roi, y)
    bottom = min(roi, hgt - y - 1)
    sigma = radius / 3
    yy, xx = np.ogrid[-top:bottom + 1, -left:right + 1]
    g = np.exp(-(xx * xx + yy * yy) / (2 * sigma * sigma))
    heat[y - top:y + bottom + 1, x - left:x + right + 1] += g
    heat[heat > 1] = 1
    return heat


def test_render_heatmap_matches_sequential_oracle():
    size = 64
    rng = np.random.default_rng(0)
    k = 6
    locs = np.zeros((k, 8), np.float32)
    locs[:, 0] = rng.uniform(2, size - 3, k)  # ctX
    locs[:, 1] = rng.uniform(2, size - 3, k)  # ctY
    locs[:, 4] = rng.uniform(1, 4, k)         # majX
    locs[:, 5] = rng.uniform(1, 4, k)         # majY
    locs[:, 6] = rng.uniform(1, 3, k)         # minL
    valid = np.ones(k, bool)
    valid[-1] = False  # padding lane must contribute nothing

    got = np.asarray(render_heatmap(jnp.array(locs), jnp.array(valid), size))

    want = np.zeros((size, size), np.float32)
    for i in range(k - 1):
        w = 2 * math.sqrt(locs[i, 4] ** 2 + locs[i, 5] ** 2)
        h = 2 * locs[i, 6]
        r = _oracle_center_radius(w, h, 0.5)
        want = _oracle_draw(want, locs[i, 0], locs[i, 1], r)

    assert got.shape == (size, size)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_render_heatmap_peak_is_exactly_one():
    locs = np.zeros((2, 8), np.float32)
    locs[0] = [10, 20, 0, 0, 3, 0, 2, 5]
    heat = np.asarray(render_heatmap(jnp.array(locs), jnp.array([True, False]), 32))
    assert heat[20, 10] == 1.0
    # masked lane contributes nothing
    assert heat[0, 0] < 1e-3


def test_render_heatmap_out_of_bounds_object_skipped():
    locs = np.zeros((1, 8), np.float32)
    locs[0] = [-5, 10, 0, 0, 3, 0, 2, 5]
    heat = np.asarray(render_heatmap(jnp.array(locs), jnp.array([True]), 32))
    assert heat.max() == 0.0
