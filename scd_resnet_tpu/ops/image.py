"""Host/device image primitives: grayscale conversion and generic
reflect padding with explicit OpenCV-vs-torch border semantics.

The reference uses *two different* grayscale formulas (SURVEY.md defect #9):

- preprocessing: ``0.30 R + 0.59 G + 0.11 B`` unrounded
  (datasets/preprocessor/scdManual.py:46-56);
- inference: ``round(0.1140 R + 0.5870 G + 0.2989 B)`` — BGR-ordered
  weights applied to RGB channels, rounded (test.py:21-33). Checkpoint
  parity at inference requires this exact formula including the round.

The reference's inference-side reflect pad hardcodes slide geometry to fake
OpenCV semantics on the x-axis only (test.py:59-84, defect #10). Here both
border conventions are implemented generically:

- ``reflect101`` (torch 'reflect' / cv2 BORDER_REFLECT_101): edge pixel not
  repeated — ``... c b | a b c ...``;
- ``symmetric`` (cv2 BORDER_REFLECT / numpy 'symmetric'): edge repeated —
  ``... b a | a b c ...``.

``pad_reflect_hybrid`` reproduces the reference's served behavior for any
slide size: symmetric on x, reflect101 on y.
"""

from __future__ import annotations

import numpy as np


def grayscale_preprocess(rgb: np.ndarray) -> np.ndarray:
    """WSI grayscale used when building training archives
    (scdManual.py:46-56)."""
    rgb = np.asarray(rgb)
    return (
        0.30 * rgb[..., 0] + 0.59 * rgb[..., 1] + 0.11 * rgb[..., 2]
    ).astype(np.float32)


def grayscale_inference(rgb: np.ndarray) -> np.ndarray:
    """Inference grayscale, matching test.py:21-33 exactly (including the
    BGR-ordered coefficients and the rounding)."""
    rgb = np.asarray(rgb)
    return np.round(
        0.1140 * rgb[..., 0] + 0.5870 * rgb[..., 1] + 0.2989 * rgb[..., 2]
    ).astype(np.float32)


def grayscale_inference_u8(rgb: np.ndarray) -> np.ndarray:
    """:func:`grayscale_inference` cast to uint8 — the exact same rounded
    integers (the formula's range is [0, 255]), one dtype earlier.

    The device-fused serving path uploads the slide as uint8
    (infer/analyse.make_device_analyzer); producing float32 here only to
    have ``coerce_gray_u8`` round/clip it back added several full-slide
    float64 passes per served slide. Feed THIS to the device analyzers;
    keep :func:`grayscale_inference` for the host-tiled float path.

    uint8 RGB input takes the native single-pass path
    (native/scdio.cpp scdio_grayscale_u8 — same double arithmetic and
    round-half-even, bit-exact by test, ~10x less memory traffic than
    numpy's strided float64 passes); anything else falls back to numpy."""
    rgb = np.asarray(rgb)
    if rgb.dtype == np.uint8 and rgb.ndim >= 2 and rgb.shape[-1] == 3:
        lib = _native_lib()
        if lib is not None and hasattr(lib, "scdio_grayscale_u8"):
            src = np.ascontiguousarray(rgb)
            out = np.empty(rgb.shape[:-1], np.uint8)
            lib.scdio_grayscale_u8(src.reshape(-1, 3), out.size,
                                   out.reshape(-1))
            return out
    # fallback: the one Python definition of the formula, cast (exact —
    # round output is integral in [0, 255])
    return grayscale_inference(rgb).astype(np.uint8)


def _native_lib():
    """The shared native host library, or None (pure-numpy fallback)."""
    try:
        from scd_resnet_tpu.data.native_io import get_library

        return get_library()
    except Exception:
        return None


def _pad_axis(image: np.ndarray, before: int, after: int, axis: int,
              mode: str) -> np.ndarray:
    if before == 0 and after == 0:
        return image
    np_mode = {"reflect101": "reflect", "symmetric": "symmetric"}[mode]
    pad = [(0, 0)] * image.ndim
    pad[axis] = (before, after)
    return np.pad(image, pad, mode=np_mode)


def pad_reflect_hybrid(image: np.ndarray, pad_lr: int, pad_tb: int) -> np.ndarray:
    """Reflect-pad an (H, W) image: symmetric on x, reflect101 on y.

    Generalizes the reference's hardcoded 3092x2056 fix-up (test.py:79-82)
    to arbitrary slide geometry: torch's reflect101 pad is applied on both
    axes, then the x borders are overwritten with the OpenCV symmetric
    convention — which is what the hardcoded loops did for 3200-wide pads.
    """
    image = np.asarray(image)
    out = _pad_axis(image, pad_tb, pad_tb, 0, "reflect101")
    out = _pad_axis(out, pad_lr, pad_lr, 1, "symmetric")
    return out
