"""Reference-compatible module path (reference: datasets/argumentations.py):
augmentation kernels, keyed-PRNG JAX versions."""

from scd_resnet_tpu.ops.augment import (
    gaussian_noise as gaussianNoise,
    normalize,
    rotate,
    rotate_coordinates as rotateCoordinates,
    uniform_noise as noise,
    variance_jitter as varianceJitter,
)

__all__ = ["normalize", "noise", "gaussianNoise", "varianceJitter", "rotate",
           "rotateCoordinates"]
