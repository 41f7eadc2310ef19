"""Reference-compatible module path (reference: datasets/utility.py):
gaussian stamp helpers. The vectorized renderer supersedes the per-stamp
generators; both are exposed."""

import numpy

from scd_resnet_tpu.ops.gaussian import render_heatmap


def gaussian2D(shape, sigma=1):
    m, n = [(ss - 1.0) / 2.0 for ss in shape]
    y, x = numpy.ogrid[-m:m + 1, -n:n + 1]
    return numpy.exp(-(x * x + y * y) / (2 * sigma * sigma))


def gaussianMargin2D(margin, sigma=1):
    left, top, right, bottom = margin
    y, x = numpy.ogrid[-top:bottom + 1, -left:right + 1]
    return numpy.exp(-(x * x + y * y) / (2 * sigma * sigma))


__all__ = ["gaussian2D", "gaussianMargin2D", "render_heatmap"]
