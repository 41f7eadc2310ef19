"""Analytic Gaussian-radius-from-IoU-threshold solvers.

Vectorized jnp re-derivation of the reference solvers
(reference: evaluations/intersection.py:40-64). The reference inherits the
well-known CornerNet quirk of computing the quadratic root as
``(b + sqrt(b^2 - 4ac)) / 2`` — without dividing by ``2a`` — for all three
cases. Label geometry parity requires reproducing that exact formula, so we
do (documented here rather than silently copied).

All functions accept scalars or arrays and are jittable.
"""

from __future__ import annotations

import jax.numpy as jnp


def corner_threshold_radius(width, height, threshold=0.7):
    """Radius bound for corner heatmaps (intersection.py:40-44)."""
    width = jnp.asarray(width, jnp.float32)
    height = jnp.asarray(height, jnp.float32)
    sum_sq = width**2 + height**2
    prod = width * height
    return (
        (2 * jnp.sqrt(sum_sq) / prod)
        - jnp.sqrt(4 * sum_sq / (prod**2) - (16 * (1 - threshold)) / sum_sq)
    ) / (8 / sum_sq)


def center_threshold_radius(width, height, threshold=0.7):
    """Radius bound for center heatmaps (intersection.py:46-64).

    Three overlap cases are solved and the minimum taken. Note the roots are
    intentionally ``(b + sqrt(disc)) / 2`` — no ``/(2a)`` — matching the
    reference bit-for-bit (same quirk as the public CornerNet code).
    """
    width = jnp.asarray(width, jnp.float32)
    height = jnp.asarray(height, jnp.float32)

    b1 = height + width
    c1 = width * height * (1 - threshold) / (1 + threshold)
    r1 = (b1 + jnp.sqrt(b1**2 - 4 * 1 * c1)) / 2

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - threshold) * width * height
    r2 = (b2 + jnp.sqrt(b2**2 - 4 * a2 * c2)) / 2

    a3 = 4 * threshold
    b3 = -2 * threshold * (height + width)
    c3 = (threshold - 1) * width * height
    r3 = (b3 + jnp.sqrt(b3**2 - 4 * a3 * c3)) / 2

    return jnp.minimum(jnp.minimum(r1, r2), r3)
