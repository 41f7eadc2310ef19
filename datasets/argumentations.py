"""Reference-compatible module path (reference: datasets/argumentations.py):
augmentation kernels, keyed-PRNG JAX versions.

Surface parity with argumentations.py:40-175. Divergences (documented):
stochastic ops take an explicit ``jax.random`` key instead of the global
seed-42 RNG; ``randomFlip`` returns ``(image, flip_h, flip_v)`` and
``randomRotate`` returns ``(image, angle)`` so callers can apply the
matching coordinate transforms; ``rotateNearestNeighbour`` is ``rotate``
with nearest resampling (same gather semantics as argumentations.py:111-146).
"""

from functools import partial

from scd_resnet_tpu.ops.augment import (
    PaddingMode,
    ResampleMode,
    flip_locs_horizontal as flipCoordinatesHorizontal,
    flip_locs_vertical as flipCoordinatesVertical,
    gaussian_noise as gaussianNoise,
    horizontal_flip as horizontalFlip,
    horizontal_flip_numpy as horizontalFlipNumpy,
    normalize,
    random_flip as randomFlip,
    random_flip_numpy as randomFlipNumpy,
    random_rotate as randomRotate,
    rotate,
    rotate_coordinates as rotateCoordinates,
    rotate_non_clip as rotateNonClip,
    uniform_noise as noise,
    variance_jitter as varianceJitter,
    vertical_flip as verticalFlip,
    vertical_flip_numpy as verticalFlipNumpy,
)

rotateNearestNeighbour = partial(rotate, resample="nearest")

__all__ = [
    "PaddingMode", "ResampleMode",
    "normalize", "noise", "gaussianNoise", "varianceJitter",
    "horizontalFlip", "verticalFlip", "randomFlip",
    "horizontalFlipNumpy", "verticalFlipNumpy", "randomFlipNumpy",
    "flipCoordinatesHorizontal", "flipCoordinatesVertical",
    "rotate", "rotateNearestNeighbour", "rotateNonClip", "randomRotate",
    "rotateCoordinates",
]
