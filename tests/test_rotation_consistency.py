"""Image rotation and coordinate rotation must agree: a bright dot placed
at a loc record's position must still sit (approximately) at the rotated
record's position after rotating the image with the same angle — the
invariant the preprocessing stage relies on (ops/augment.py rotate +
rotate_coordinates pair)."""

import numpy as np
import jax.numpy as jnp

from scd_resnet_tpu.ops.augment import rotate, rotate_coordinates


def test_rotate_image_and_coordinates_agree():
    size = 128
    for angle in (7.0, -12.5, 30.0):
        for px, py in ((40.0, 32.0), (90.0, 80.0), (64.0, 20.0)):
            img = np.zeros((size, size), np.float32)
            img[int(py), int(px)] = 100.0

            rotated = np.asarray(rotate(jnp.array(img), angle))
            # loc record in /4 coordinates, rotated about the /4 grid center
            locs = np.zeros((1, 8), np.float32)
            locs[0, 0] = px / 4.0
            locs[0, 1] = py / 4.0
            locs[0, 4] = 1.0  # unit major axis (avoids 0/0 in vector rotate)
            out = np.asarray(
                rotate_coordinates(jnp.array(locs), size / 8.0, size / 8.0,
                                   angle)
            )
            exp_x, exp_y = out[0, 0] * 4.0, out[0, 1] * 4.0

            found_y, found_x = np.unravel_index(rotated.argmax(),
                                                rotated.shape)
            # bilinear smears the dot over a 2x2 patch; the peak must sit
            # within ~1.5 px of the rotated coordinate
            assert abs(found_x - exp_x) < 1.6, (angle, px, py, found_x, exp_x)
            assert abs(found_y - exp_y) < 1.6, (angle, px, py, found_y, exp_y)


def test_rotate_vectors_preserve_norm():
    locs = np.zeros((3, 8), np.float32)
    locs[:, 4] = [3.0, 0.0, 1.0]
    locs[:, 5] = [0.0, 2.0, 1.0]
    locs[:, 2] = [1.0, 0.5, 0.0]
    locs[:, 3] = [0.0, 0.5, 0.0]
    out = np.asarray(rotate_coordinates(jnp.array(locs), 16.0, 16.0, 33.0))
    maj_before = np.hypot(locs[:, 4], locs[:, 5])
    maj_after = np.hypot(out[:, 4], out[:, 5])
    np.testing.assert_allclose(maj_after, maj_before, atol=1e-5)
    # zero offsets stay exactly zero (the reference's modMask handling)
    assert out[2, 2] == 0.0 and out[2, 3] == 0.0


def test_normalize_constant_image_is_zero_not_nan():
    """A constant clip (float16/uint8-quantized blank tile) must map to
    zeros, not 0/0 NaN — one NaN sample would poison the whole batch
    through BatchNorm statistics. Non-constant images keep the exact
    unguarded arithmetic (argumentations.py:40-44)."""
    import numpy as np

    from scd_resnet_tpu.ops.augment import normalize

    const = normalize(np.full((8, 8), 180.0, np.float32))
    assert np.all(np.asarray(const) == 0.0)

    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    out = np.asarray(normalize(x))
    mean = x.mean()
    var = ((x - mean) ** 2).mean()
    np.testing.assert_array_equal(out, (x - mean) / np.sqrt(var))
