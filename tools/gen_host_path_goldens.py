"""Golden generator for the inference HOST path: grayscale + reflect pad
(with the reference's hardcoded OpenCV fix-up) + overlap tiling +
per-clip standardization.

The reference's served path lives in /root/reference/test.py:21-90, but
that module is not importable (module-level ``torch.jit.load('xxx.pt')``,
test.py:145 — SURVEY defect), so this harness re-executes its documented
recipe step by step with the reference's own constants and its importable
``datasets.argumentations.normalize``, and dumps the intermediates as
goldens for tests/test_host_path_goldens.py.

Geometry note (load-bearing): the fix-up loops (test.py:79-82) overwrite
columns [0, 64) with ``col 127 - x`` and [3136, 3200) with ``col 6271 -
x`` — a mirror around the 64-column boundary, i.e. OpenCV BORDER_REFLECT
(symmetric) **assuming padLR == 64**. That only holds for a 3072-wide
slide (resizeW 3200, padLR 64); the reference's own bounds filter uses
3072 (test.py:164-170) and its "3092 x 2056" docstring is a typo. For any
other width the hardcoded loops would clobber real image columns, so the
golden is generated at the geometry where the reference semantics are
well-defined: 3072 x 2056.

Usage: python tools/gen_host_path_goldens.py <out.npz> [reference_root]
"""

import sys
from math import ceil


def main(out_path: str, reference_root: str) -> None:
    sys.path.insert(0, reference_root)
    from gen_reference_goldens import _stub_torchvision

    _stub_torchvision()

    import numpy as np
    import torch
    import torch.nn.functional as F

    from datasets.argumentations import normalize  # reference's own fn

    INPUTSIZE, PADDINGSIZE = 512, 64
    WIDTH, HEIGHT = 3072, 2056

    rng = np.random.default_rng(11)
    color = rng.integers(0, 256, (HEIGHT, WIDTH, 3), dtype=np.uint8)

    # test.py:21-33: BGR-ordered weights on RGB channels, rounded
    r = color[:, :, 0].astype(np.float64)
    g = color[:, :, 1].astype(np.float64)
    b = color[:, :, 2].astype(np.float64)
    gray = np.round(0.1140 * r + 0.5870 * g + 0.2989 * b)

    # test.py:44-90: pad geometry, torch reflect pad, OpenCV fix-up, tiling
    stride = INPUTSIZE - 2 * PADDINGSIZE
    clip_h = ceil((WIDTH - 2 * PADDINGSIZE) / stride)
    clip_v = ceil((HEIGHT - 2 * PADDINGSIZE) / stride)
    resize_w = stride * clip_h + 2 * PADDINGSIZE
    resize_h = stride * clip_v + 2 * PADDINGSIZE
    if (resize_w - WIDTH) % 2 != 0:
        resize_w += 1
    if (resize_h - HEIGHT) % 2 != 0:
        resize_h += 1
    pad_lr = (resize_w - WIDTH) // 2
    pad_tb = (resize_h - HEIGHT) // 2
    assert pad_lr == 64 and resize_w == 3200, (pad_lr, resize_w)

    img = torch.from_numpy(gray).reshape(1, 1, HEIGHT, WIDTH)
    padded = F.pad(img, (pad_lr, pad_lr, pad_tb, pad_tb), "reflect")
    for x in range(0, 64):  # test.py:79-80
        padded[0, 0, :, x] = padded[0, 0, :, 127 - x]
    for x in range(3136, 3200):  # test.py:81-82
        padded[0, 0, :, x] = padded[0, 0, :, 6271 - x]
    padded = padded.reshape(1, resize_h, resize_w)

    clips = []
    for x in range(clip_h):  # test.py:86-90 (x-major then y)
        for y in range(clip_v):
            clips.append(
                normalize(
                    padded[:, y * stride: y * stride + INPUTSIZE,
                           x * stride: x * stride + INPUTSIZE]
                ).float()
            )
    clips = torch.cat(clips, 0).numpy()

    np.savez_compressed(
        out_path,
        color=color,
        gray=gray.astype(np.float32),
        padded=padded[0].numpy().astype(np.float32),
        clips=clips.astype(np.float32),
        geometry=np.array([clip_h, clip_v, pad_lr, pad_tb]),
    )
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1],
         sys.argv[2] if len(sys.argv) > 2 else "/root/reference")
