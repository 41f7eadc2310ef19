"""Full-slide inference: overlap tiling, batched decode, coordinate stitch,
relative-halo-radius (Rhr) computation, and the two-Gaussian histogram fit.

Re-design of the served path (reference: test.py:41-183):

- grayscale with the inference coefficients incl. rounding (test.py:21-33);
- reflect pad to a whole number of (512 - 2*64)-strided clips; border
  semantics generalize the reference's hardcoded fix-up — symmetric on x,
  reflect101 on y — to any slide geometry (ops/image.py);
- 512x512 clips with 64 px shared margins, per-clip standardization,
  batches of 24 through the traced decode (fixed batch: the last partial
  batch is padded and sliced, keeping one compiled shape);
- score threshold 0.3 AFTER top-100 (test.py:107);
- stitch: slide_x = clipX*(512-128) - padLR + ctX*4 + offX;
  Rhr = (4*rad - 4*minL) / (2 * 4*minL) (test.py:117-141) — one
  vectorized numpy pass over the whole (10, N, K) rows array (the
  reference loops Python per clip and per detection, test.py:95-141);
- slide-bounds filter 0 <= x < W, 0 <= y < H before output/fit
  (test.py:164-170; the reference hardcodes 3072x2056 — see PARITY.md);
- quantification: histogram Rhr over [-0.25, 1.25) step 0.01 and
  scipy curve_fit of a 2-Gaussian mixture with the reference bounds
  (test.py:148-183).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from scd_resnet_tpu.ops.augment import normalize
from scd_resnet_tpu.ops.image import grayscale_inference, pad_reflect_hybrid

INPUT_SIZE = 512
PADDING_SIZE = 64
DOWNSAMPLE_RATIO = 4
BATCH_SIZE = 24
SCORE_THRESHOLD = 0.3


def gauss2(x, a1, m1, s1, a2, m2, s2):
    """Two-Gaussian mixture (test.py:14)."""
    return a1 * np.exp(-((x - m1) / s1) ** 2) + a2 * np.exp(-((x - m2) / s2) ** 2)


def _normalize(clip: np.ndarray) -> np.ndarray:
    mean = clip.mean()
    var = np.mean((clip - mean) ** 2)
    if var <= 0:  # constant clip (blank padding region): no information
        return np.zeros_like(clip)
    return (clip - mean) / math.sqrt(var)


def _cut_normalized(padded: np.ndarray, n_cols: int, clip_v: int
                    ) -> np.ndarray:
    """Cut a padded region into per-clip-standardized overlapping clips,
    x-major then y (the reference's loop order, test.py:86-90)."""
    stride = INPUT_SIZE - 2 * PADDING_SIZE
    clips = np.empty((n_cols * clip_v, INPUT_SIZE, INPUT_SIZE), np.float32)
    i = 0
    for x in range(n_cols):
        for y in range(clip_v):
            clips[i] = _normalize(
                padded[y * stride : y * stride + INPUT_SIZE,
                       x * stride : x * stride + INPUT_SIZE]
            )
            i += 1
    return clips


def tile_slide(gray: np.ndarray) -> Tuple[np.ndarray, int, int, int, int]:
    """Pad and cut a grayscale slide into overlapping clips.

    Returns ``(clips (N, S, S), clip_h, clip_v, pad_lr, pad_tb)`` with clips
    ordered x-major then y (the reference's loop order, test.py:86-90)."""
    height, width = gray.shape
    clip_h, clip_v, pad_lr, pad_tb = slide_geometry(width, height)
    padded = pad_reflect_hybrid(gray, pad_lr, pad_tb)
    return (_cut_normalized(padded, clip_h, clip_v),
            clip_h, clip_v, pad_lr, pad_tb)


def band_plan(clip_h: int, clip_v: int, max_resident_clips: int
              ) -> List[Tuple[int, int]]:
    """Split the clip grid into ``(first_column, n_columns)`` column bands
    of at most ``max_resident_clips`` clips each (at least one column —
    one column of clips is the floor of residency).

    Clips stack x-major then y, so consecutive COLUMN bands concatenate
    into exactly the monolithic clip order: banded and monolithic analysis
    produce identical detection sequences (and therefore identical greedy
    dedupe results)."""
    cols = max(1, max_resident_clips // clip_v)
    return [(x0, min(cols, clip_h - x0)) for x0 in range(0, clip_h, cols)]


def extract_padded_band(gray: np.ndarray, x0_clip: int, n_cols: int,
                        pad_lr: int, pad_tb: int) -> np.ndarray:
    """The pixels of ``pad_reflect_hybrid(gray, pad_lr, pad_tb)`` covering
    clip columns ``[x0_clip, x0_clip + n_cols)`` — computed from only that
    band's source columns, never materializing the full padded slide.

    ``gray`` may be any 2-D array-like including a ``np.memmap``: the one
    slice below is the only read, so a slide larger than host memory
    streams from disk band by band (SURVEY §5's giant-slide scaling path).
    Boundary bands rebuild the x-symmetric padding from the slide's own
    edge columns (identical pixels: the symmetric pad width is < one clip
    stride, so the band always contains its own reflection source)."""
    stride = INPUT_SIZE - 2 * PADDING_SIZE
    width = gray.shape[1]
    px0 = x0_clip * stride  # band bounds in padded-x coordinates
    px1 = px0 + (n_cols - 1) * stride + INPUT_SIZE
    gx0 = max(px0 - pad_lr, 0)
    gx1 = min(px1 - pad_lr, width)
    band = np.asarray(gray[:, gx0:gx1])
    # pad order matches pad_reflect_hybrid: reflect101 on y first, then
    # symmetric on x (at the slide edges only; interior band boundaries
    # are real pixels)
    band = np.pad(band, ((pad_tb, pad_tb), (0, 0)), mode="reflect")
    left = gx0 - (px0 - pad_lr)
    right = (px1 - pad_lr) - gx1
    if left or right:
        band = np.pad(band, ((0, 0), (max(left, 0), max(right, 0))),
                      mode="symmetric")
    return band


def analyse_images(model: Callable, full_path: str,
                   dedupe_radius: Optional[float] = None,
                   batch_size: int = BATCH_SIZE,
                   bounds="slide",
                   max_resident_clips: Optional[int] = None
                   ) -> List[List[float]]:
    """Detections ``[slide_x, slide_y, Rhr]`` for one slide image.

    ``model`` maps a (B, 512, 512, 1) float batch to the (10, B, K) stacked
    decode rows (infer/wrapper.py). The slide-bounds filter
    (test.py:164-170) is ON by default — pass ``bounds=None`` to keep
    out-of-bounds detections from the padded margins."""
    image = __import__("PIL.Image", fromlist=["Image"]).open(full_path)
    if image.mode == "P":
        image = image.convert("RGB")
    color = np.asarray(image)
    if color.ndim == 2:  # already grayscale (robustness vs the reference)
        gray = coerce_gray_u8(color).astype(np.float32)
    else:
        gray = grayscale_inference(coerce_gray_u8(color[..., :3]))
    return analyse_grayscale(model, gray, dedupe_radius, batch_size,
                             bounds=bounds,
                             max_resident_clips=max_resident_clips)


def coerce_gray_u8(gray: np.ndarray) -> np.ndarray:
    """Coerce a grayscale slide into the [0, 255] uint8 range the
    device-fused analyzer uploads.

    uint8 passes through; 16-bit scanner output rescales (x/257); other
    integer/float arrays are peak-rescaled when they exceed 255, else
    rounded and clipped. Guards the uint8 upload cast in
    :func:`make_device_analyzer` — without this a >8-bit slide would
    wrap modulo 256 into structured noise and serve garbage detections
    with no error."""
    gray = np.asarray(gray)
    if gray.dtype == np.uint8:
        return gray
    if gray.dtype == np.uint16:
        return np.round(gray / 257.0).astype(np.uint8)
    work = np.asarray(gray, np.float64)
    peak = float(work.max()) if work.size else 0.0
    if peak > 255.0:
        work = work * (255.0 / peak)
    return np.clip(np.round(work), 0.0, 255.0).astype(np.uint8)


def dedupe_detections(detections: List[List[float]],
                      radius: float) -> List[List[float]]:
    """Greedy duplicate suppression for tile-overlap double detections.

    Clips share 2*64 px margins, so an object near a tile border is decoded
    by both neighbors (the reference's margin filter for this was left
    commented out, test.py:127-130, shipping the duplicates). Keeps the
    first detection and drops later ones within ``radius`` px.

    Greedy order-dependent suppression is inherently sequential; the
    distance check against everything kept so far is a single vectorized
    numpy op per candidate (the pure-Python pairwise loop was part of the
    host-load sensitivity this file's round-3 rework removes)."""
    kept: List[List[float]] = []
    if not detections:
        return kept
    kept_xy = np.empty((len(detections), 2), np.float64)
    n_kept = 0
    r2 = radius * radius
    for det in detections:
        if n_kept:
            d2 = kept_xy[:n_kept] - (det[0], det[1])
            if ((d2 * d2).sum(axis=1) <= r2).any():
                continue
        kept_xy[n_kept] = (det[0], det[1])
        n_kept += 1
        kept.append(det)
    return kept


def dedupe_contract(detections: List[List[float]], radius: float,
                    contract: str) -> List[List[float]]:
    """Contract-aware duplicate suppression: corner peaks dedupe within
    each head (a tl peak never suppresses a ct peak); legacy boxes dedupe
    on box centers; the point contracts on (x, y) directly."""
    if contract == "corner":
        out: List[List[float]] = []
        for head in _CORNER_HEADS:
            out.extend(dedupe_detections(
                [d for d in detections if d[3] == head], radius))
        return out
    if contract == "cornerLegacy":
        centered = [[(d[0] + d[2]) / 2, (d[1] + d[3]) / 2, d]
                    for d in detections]
        return [c[2] for c in dedupe_detections(centered, radius)]
    return dedupe_detections(detections, radius)


def _clip_grid(clip_h: int, clip_v: int) -> Tuple[np.ndarray, np.ndarray]:
    """(grid_x, grid_y) column vectors for the x-major clip stacking order
    (the reference's loop order, test.py:86-90) — shared by every
    per-contract stitch."""
    g = np.arange(clip_h * clip_v)
    return (g // clip_v)[:, None], (g % clip_v)[:, None]


def _bounds_keep(keep: np.ndarray, slide_x: np.ndarray, slide_y: np.ndarray,
                 bounds: Optional[Tuple[int, int]]) -> np.ndarray:
    """AND the slide-bounds filter (0 <= x < W, 0 <= y < H) into ``keep``
    (test.py:164-170; the reference hardcodes 3072x2056 — PARITY.md)."""
    if bounds is None:
        return keep
    width, height = bounds
    return keep & ((slide_x >= 0) & (slide_x < width)
                   & (slide_y >= 0) & (slide_y < height))


def stitch_rows(rows: np.ndarray, clip_h: int, clip_v: int,
                pad_lr: int, pad_tb: int,
                bounds: Optional[Tuple[int, int]] = None) -> List[List[float]]:
    """Threshold + clip->slide coordinate stitch + Rhr (test.py:106-141),
    vectorized over the FULL (10, N, K) decode rows in one numpy pass.

    Round 2 did this with per-clip Python loops, which made serving
    throughput host-load-sensitive (~2x spread between an idle and a
    loaded host). Here the host does three array ops over the whole grid
    — the per-detection Python work is only the final list conversion.

    Math is float64 with toward-zero truncation, matching the reference's
    ``int(...)`` semantics exactly (test.py:136-137). Detection order is
    clip-major (x-major then y, the stacking order) then top-K order
    within a clip — identical to the reference's nested loops, so the
    greedy dedupe sees the same sequence.

    ``bounds``: optional ``(width, height)``; detections outside
    ``0 <= x < width and 0 <= y < height`` are dropped — the reference's
    quantification recipe's slide-bounds filter (test.py:164-170; the
    reference hardcodes 3072x2056 for its 3092-wide slides, we use the
    true geometry — PARITY.md).
    """
    rows = np.asarray(rows, np.float64)[:, : clip_h * clip_v]
    (scores, _inds, ct_y, ct_x, _maj_x, _maj_y, min_l, rad,
     off_x, off_y) = rows

    stride = INPUT_SIZE - 2 * PADDING_SIZE
    grid_x, grid_y = _clip_grid(clip_h, clip_v)

    slide_x = np.trunc(grid_x * stride - pad_lr + ct_x * 4 + off_x)
    slide_y = np.trunc(grid_y * stride - pad_tb + ct_y * 4 + off_y)
    dminl = min_l * 4
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = (rad * 4 - dminl) / (2 * dminl)

    keep = _bounds_keep(scores > SCORE_THRESHOLD, slide_x, slide_y, bounds)

    return [
        [int(sx), int(sy), float(r)]
        for sx, sy, r in zip(slide_x[keep], slide_y[keep], ratio[keep])
    ]


CONTRACT_FIELDS = {
    "centerOffset": ("x", "y", "rhr"),
    "centerSize": ("x", "y", "w", "h", "score"),
    "corner": ("x", "y", "score", "head"),
    "cornerLegacy": ("tlx", "tly", "brx", "bry", "score"),
}

# centerSize regression is trained on size / (DOWNSAMPLE * SIZE_REGR_FACTOR)
# (centerNet.py:47, 152-192) — undo the full factor for pixel-unit boxes
_SIZE_SCALE = 4 * 10

_CORNER_HEADS = ("ct", "tl", "br")


def stitch_size_rows(rows: np.ndarray, clip_h: int, clip_v: int,
                     pad_lr: int, pad_tb: int,
                     bounds: Optional[Tuple[int, int]] = None
                     ) -> List[List[float]]:
    """centerSize contract (6, N, K) -> ``[x, y, w, h, score]`` in slide
    pixels. No sub-pixel offset head in this family: peaks land on the
    4 px heatmap grid (centerNet.py:194-222)."""
    rows = np.asarray(rows, np.float64)[:, : clip_h * clip_v]
    scores, _inds, ct_y, ct_x, size_w, size_h = rows

    stride = INPUT_SIZE - 2 * PADDING_SIZE
    grid_x, grid_y = _clip_grid(clip_h, clip_v)
    slide_x = np.trunc(grid_x * stride - pad_lr + ct_x * 4)
    slide_y = np.trunc(grid_y * stride - pad_tb + ct_y * 4)

    keep = _bounds_keep(scores > SCORE_THRESHOLD, slide_x, slide_y, bounds)
    return [
        [int(x), int(y), float(w * _SIZE_SCALE), float(h * _SIZE_SCALE),
         float(s)]
        for x, y, w, h, s in zip(slide_x[keep], slide_y[keep],
                                 size_w[keep], size_h[keep], scores[keep])
    ]


def stitch_corner_rows(rows: np.ndarray, clip_h: int, clip_v: int,
                       pad_lr: int, pad_tb: int,
                       bounds: Optional[Tuple[int, int]] = None
                       ) -> List[List[float]]:
    """corner contract (12, N, K) -> ``[x, y, score, head]`` with head in
    {"ct", "tl", "br"} (the three per-head top-K blocks,
    cornerNet.py:272-304)."""
    rows = np.asarray(rows, np.float64)[:, : clip_h * clip_v]
    stride = INPUT_SIZE - 2 * PADDING_SIZE
    grid_x, grid_y = _clip_grid(clip_h, clip_v)

    detections: List[List[float]] = []
    for h, head in enumerate(_CORNER_HEADS):
        scores, _inds, ys, xs = rows[4 * h : 4 * h + 4]
        slide_x = np.trunc(grid_x * stride - pad_lr + xs * 4)
        slide_y = np.trunc(grid_y * stride - pad_tb + ys * 4)
        keep = _bounds_keep(scores > SCORE_THRESHOLD, slide_x, slide_y,
                            bounds)
        detections.extend(
            [int(x), int(y), float(s), head]
            for x, y, s in zip(slide_x[keep], slide_y[keep], scores[keep])
        )
    return detections


def stitch_legacy_boxes(rows: np.ndarray, clip_h: int, clip_v: int,
                        pad_lr: int, pad_tb: int,
                        bounds: Optional[Tuple[int, int]] = None
                        ) -> List[List[float]]:
    """cornerLegacy contract (N, 1000, 8) paired boxes -> slide-pixel
    ``[tlx, tly, brx, bry, score]`` (rejected pairs carry score -1 and
    fall to the threshold; cornerNetLegacy.py:332-446). The bounds filter
    keeps boxes whose center is inside the slide."""
    rows = np.asarray(rows, np.float64)[: clip_h * clip_v]
    stride = INPUT_SIZE - 2 * PADDING_SIZE
    grid_x, grid_y = _clip_grid(clip_h, clip_v)

    tlx = grid_x * stride - pad_lr + rows[:, :, 0] * 4
    tly = grid_y * stride - pad_tb + rows[:, :, 1] * 4
    brx = grid_x * stride - pad_lr + rows[:, :, 2] * 4
    bry = grid_y * stride - pad_tb + rows[:, :, 3] * 4
    scores = rows[:, :, 4]

    # bounds keep boxes whose CENTER is inside the slide
    keep = _bounds_keep(scores > SCORE_THRESHOLD,
                        (tlx + brx) / 2, (tly + bry) / 2, bounds)
    return [
        [float(a), float(b), float(c), float(d), float(s)]
        for a, b, c, d, s in zip(tlx[keep], tly[keep], brx[keep],
                                 bry[keep], scores[keep])
    ]


def stitch_any(rows: np.ndarray, contract: str, clip_h: int, clip_v: int,
               pad_lr: int, pad_tb: int,
               bounds: Optional[Tuple[int, int]] = None
               ) -> List[List[float]]:
    """Dispatch the per-contract stitch (CONTRACT_FIELDS names the output
    columns)."""
    fn = {
        "centerOffset": stitch_rows,
        "centerSize": stitch_size_rows,
        "corner": stitch_corner_rows,
        "cornerLegacy": stitch_legacy_boxes,
    }.get(contract)
    if fn is None:
        raise KeyError("unknown wrapper contract '{}'".format(contract))
    return fn(rows, clip_h, clip_v, pad_lr, pad_tb, bounds)


def _batched_rows(model: Callable, clips: np.ndarray, batch_size: int,
                  batch_axis: int) -> List[np.ndarray]:
    """Run clips through the fixed-batch model (padding the last partial
    batch to the compiled shape), returning per-batch valid rows."""
    rows = []
    for start in range(0, len(clips), batch_size):
        batch = clips[start : start + batch_size]
        valid = len(batch)
        if valid < batch_size:  # pad to the compiled shape
            batch = np.concatenate(
                [batch, np.zeros((batch_size - valid, INPUT_SIZE, INPUT_SIZE),
                                 np.float32)]
            )
        out = np.asarray(model(batch[..., None]))
        rows.append(out[:valid] if batch_axis == 0 else out[:, :valid])
    return rows


def analyse_grayscale(model: Callable, gray: np.ndarray,
                      dedupe_radius: Optional[float] = None,
                      batch_size: int = BATCH_SIZE,
                      bounds: Optional[Tuple[int, int]] = None,
                      contract: Optional[str] = None,
                      max_resident_clips: Optional[int] = None
                      ) -> List[List[float]]:
    """``batch_size`` must match the model's compiled batch (jax.export
    bundles are shape-specialized; test.py passes the traced shape).

    ``bounds``: ``(width, height)`` slide-bounds filter (test.py:164-170),
    ``"slide"`` to use ``gray``'s own geometry, or None (default here —
    the slide entry points ``analyse_images``/``make_device_analyzer``
    default it ON).

    ``contract``: wrapper-family output contract (CONTRACT_FIELDS);
    default reads ``model.contract`` (set by load_traced/load_wrapper),
    falling back to centerOffset.

    ``max_resident_clips``: streaming giant-slide mode — the clip stack is
    materialized one column band at a time (at most this many clips, floor
    one column), so host memory stays bounded by the band instead of the
    slide; pass ``gray`` as a ``np.memmap`` and the slide itself never
    fully loads either. Detections are identical to the monolithic path
    (band boundaries respect the x-major clip order)."""
    height, width = gray.shape
    clip_h, clip_v, pad_lr, pad_tb = slide_geometry(width, height)
    if bounds == "slide":
        bounds = (width, height)
    if contract is None:
        contract = getattr(model, "contract", "centerOffset")

    # the legacy contract is batch-major (B, 1000, 8); the stacked-row
    # contracts put batch on axis 1
    batch_axis = 0 if contract == "cornerLegacy" else 1

    all_rows = []
    if max_resident_clips and clip_h * clip_v > max_resident_clips:
        for x0, n_cols in band_plan(clip_h, clip_v, max_resident_clips):
            band = extract_padded_band(gray, x0, n_cols, pad_lr, pad_tb)
            clips = _cut_normalized(band, n_cols, clip_v)
            all_rows.extend(_batched_rows(model, clips, batch_size,
                                          batch_axis))
    else:
        clips, _, _, _, _ = tile_slide(gray)
        all_rows.extend(_batched_rows(model, clips, batch_size, batch_axis))

    rows = np.concatenate(all_rows, axis=batch_axis)
    detections = stitch_any(rows, contract, clip_h, clip_v, pad_lr, pad_tb,
                            bounds)
    if dedupe_radius is not None:
        detections = dedupe_contract(detections, dedupe_radius, contract)
    return detections


def slide_geometry(width: int, height: int) -> Tuple[int, int, int, int]:
    """(clip_h, clip_v, pad_lr, pad_tb) for a width x height slide — the
    same arithmetic as :func:`tile_slide` (test.py:48-65)."""
    stride = INPUT_SIZE - 2 * PADDING_SIZE
    clip_h = math.ceil((width - 2 * PADDING_SIZE) / stride)
    clip_v = math.ceil((height - 2 * PADDING_SIZE) / stride)
    resize_w = stride * clip_h + 2 * PADDING_SIZE
    resize_h = stride * clip_v + 2 * PADDING_SIZE
    if (resize_w - width) % 2 != 0:
        resize_w += 1
    if (resize_h - height) % 2 != 0:
        resize_h += 1
    return clip_h, clip_v, (resize_w - width) // 2, (resize_h - height) // 2


def make_device_tiler(width: int, height: int) -> Callable:
    """Jitted (H, W) grayscale -> (N, 512, 512) normalized clips, the
    on-device equivalent of :func:`tile_slide`: reflect101 pad on y,
    symmetric on x (ops/image.pad_reflect_hybrid), overlap tiling x-major,
    per-clip standardization."""
    import jax
    import jax.numpy as jnp

    stride = INPUT_SIZE - 2 * PADDING_SIZE
    clip_h, clip_v, pad_lr, pad_tb = slide_geometry(width, height)

    @jax.jit
    def tiler(gray_u8):
        gray = jnp.asarray(gray_u8, jnp.float32)
        padded = jnp.pad(gray, ((pad_tb, pad_tb), (0, 0)), mode="reflect")
        padded = jnp.pad(padded, ((0, 0), (pad_lr, pad_lr)), mode="symmetric")
        clips = jnp.stack([
            jax.lax.dynamic_slice(
                padded, (y * stride, x * stride), (INPUT_SIZE, INPUT_SIZE)
            )
            for x in range(clip_h) for y in range(clip_v)
        ])
        # ops/augment.normalize is the canonical standardization (incl.
        # the constant-clip zero guard) — train and serve share one
        # definition
        return jax.vmap(normalize)(clips)

    return tiler


def make_device_analyzer(wrapper: Callable, width: int, height: int,
                         dedupe_radius: Optional[float] = None,
                         mesh=None, bounds="slide",
                         max_resident_clips: Optional[int] = None) -> Callable:
    """Slide analyzer with the tiling fused ON DEVICE.

    The host-tiled path ships every overlapping 512x512 clip as float32 —
    ~8x the slide's own bytes (the 2x64 px shared margins duplicate
    pixels, and float32 quadruples uint8). Here the uint8 grayscale slide
    uploads ONCE; reflect-pad (symmetric x / reflect101 y, matching
    ops/image.pad_reflect_hybrid), overlap tiling, per-clip
    standardization, forward, and NMS/top-K decode all run in one jitted
    program, and only the (10, N, K) decode rows come back. Geometry is
    shape-specialized per (width, height) like the traced model itself.

    ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis —
    multi-chip slide serving, the spatial-scaling analog of the
    reference's "long context" (SURVEY.md §5: slides scale by tiling;
    chips scale by sharding the clip batch over ICI). The slide uploads
    replicated (one uint8 image, tiny); the clip batch is padded to a
    multiple of the axis size and sharded, so forward + decode of one
    slide run data-parallel across every chip. No reference counterpart
    (test.py serves on a single device).

    ``max_resident_clips``: streaming giant-slide mode (SURVEY §5's "if a
    slide exceeds host memory, by streaming tiles"). The slide is
    processed in column bands of at most this many clips: each band's
    pixels are extracted host-side (``gray`` may be a ``np.memmap`` — only
    band columns are ever read), uploaded, tiled/normalized/decoded on
    device, and at most two bands are in flight at a time, so host AND
    device residency are bounded by the band instead of the slide.
    Detections are identical to the monolithic analyzer (band boundaries
    respect the x-major clip order). Mutually exclusive with ``mesh``.

    Returns ``analyse(gray) -> [[x, y, Rhr], ...]``.
    """
    import jax
    import jax.numpy as jnp

    clip_h, clip_v, pad_lr, pad_tb = slide_geometry(width, height)
    streaming = bool(max_resident_clips
                     and clip_h * clip_v > max_resident_clips)
    if streaming and mesh is not None:
        raise ValueError("max_resident_clips and mesh are mutually "
                         "exclusive (shard OR stream, not both)")
    contract = getattr(wrapper, "contract", "centerOffset")
    # the legacy contract is batch-major (B, 1000, 8); the stacked-row
    # contracts put the clip batch on axis 1
    batch_axis = 0 if contract == "cornerLegacy" else 1

    if streaming:
        device_rows = None  # per-band programs below instead
    elif mesh is None:
        tiler = make_device_tiler(width, height)

        @jax.jit
        def device_rows(gray_u8):
            return wrapper(tiler(gray_u8)[..., None])

    else:
        tiler = make_device_tiler(width, height)
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(mesh.shape["data"])
        n = clip_h * clip_v
        n_pad = -(-n // n_dev) * n_dev
        clip_shard = NamedSharding(mesh, P("data"))

        @jax.jit
        def device_rows(gray_u8):
            clips = tiler(gray_u8)[..., None]
            clips = jnp.pad(
                clips, ((0, n_pad - n), (0, 0), (0, 0), (0, 0)))
            clips = jax.lax.with_sharding_constraint(clips, clip_shard)
            out = wrapper(clips)
            return out[:n] if batch_axis == 0 else out[:, :n]

    if bounds == "slide":
        # slide-bounds filter ON by default at this real-slide entry point
        # (test.py:164-170; pass bounds=None to keep margin detections)
        bounds = (width, height)

    def _finish(rows: np.ndarray) -> List[List[float]]:
        # the stitch walks x-major then y — the clip stacking order above
        detections = stitch_any(rows, contract, clip_h, clip_v, pad_lr,
                                pad_tb, bounds)
        if dedupe_radius is not None:
            detections = dedupe_contract(detections, dedupe_radius, contract)
        return detections

    if streaming:
        bands = band_plan(clip_h, clip_v, max_resident_clips)
        stride = INPUT_SIZE - 2 * PADDING_SIZE
        band_h = (clip_v - 1) * stride + INPUT_SIZE
        band_programs = {}

        def _band_program(n_cols: int):
            """Jitted (band_h, band_w) padded-band uint8 -> decode rows;
            one compiled shape per distinct band width (at most two: the
            full band and the remainder band)."""
            if n_cols not in band_programs:

                @jax.jit
                def prog(band_u8):
                    band = jnp.asarray(band_u8, jnp.float32)
                    clips = jnp.stack([
                        jax.lax.dynamic_slice(
                            band, (y * stride, x * stride),
                            (INPUT_SIZE, INPUT_SIZE))
                        for x in range(n_cols) for y in range(clip_v)
                    ])
                    return wrapper(jax.vmap(normalize)(clips)[..., None])

                band_programs[n_cols] = prog
            return band_programs[n_cols]

        def dispatch(gray: np.ndarray) -> np.ndarray:
            """Bounded-window band execution: extract/upload band i+1
            while band i's device program runs; at most two bands (and
            their decode rows) are resident anywhere. Returns the
            CONCATENATED rows (synced), so ``finish`` is pure host
            stitch — the window, not the caller, bounds memory."""
            gray = coerce_gray_u8(gray)
            parts: List[np.ndarray] = []
            pending = None
            for x0, n_cols in bands:
                band = extract_padded_band(gray, x0, n_cols, pad_lr, pad_tb)
                fut = _band_program(n_cols)(jnp.asarray(band))
                if pending is not None:
                    parts.append(np.asarray(pending))
                pending = fut
            parts.append(np.asarray(pending))
            return np.concatenate(parts, axis=batch_axis)

        def finish(rows: np.ndarray) -> List[List[float]]:
            return _finish(rows)

        def analyse(gray: np.ndarray) -> List[List[float]]:
            return finish(dispatch(gray))

        def analyse_many(grays) -> List[List[List[float]]]:
            # no cross-slide pipelining in streaming mode: holding several
            # giant slides in flight is exactly what this mode bounds
            return [analyse(g) for g in grays]

        analyse.many = analyse_many
        analyse.dispatch = dispatch
        analyse.finish = finish
        return analyse

    def analyse(gray: np.ndarray) -> List[List[float]]:
        # uint8 upload: grayscale_inference output is already rounded to
        # [0, 255] so the conversion is exact, and 4x smaller on the wire
        return _finish(np.asarray(device_rows(
            jnp.asarray(coerce_gray_u8(gray)))))

    def analyse_many(grays) -> List[List[List[float]]]:
        """Pipelined multi-slide pass: every slide's device program is
        dispatched before any result is read back, so uploads and compute
        of slide i+1 overlap the host threshold/stitch of slide i (jit
        dispatch is asynchronous; ``np.asarray`` is the sync point).

        ``grays`` may be any iterable — pass a GENERATOR that produces
        each grayscale lazily (e.g. decode/grayscale per slide) and that
        host work interleaves with the in-flight slides' wire transfers
        and device compute (dispatch itself is ~17 ms; the caller's
        per-slide CPU is the serial part worth overlapping)."""
        futures = [device_rows(jnp.asarray(coerce_gray_u8(g)))
                   for g in grays]
        return [_finish(np.asarray(f)) for f in futures]

    def dispatch(gray: np.ndarray):
        """Enqueue the device program and return its result future
        (async jit dispatch — does not block on compute)."""
        return device_rows(jnp.asarray(coerce_gray_u8(gray)))

    def finish(future) -> List[List[float]]:
        """Block on a :func:`dispatch` future and stitch detections
        (the host-side half; safe to run while another dispatch's
        device program executes)."""
        return _finish(np.asarray(future))

    analyse.many = analyse_many
    analyse.dispatch = dispatch
    analyse.finish = finish
    return analyse


def rhr_histogram(rhrs: Sequence[float]) -> Tuple[np.ndarray, np.ndarray]:
    """Frequency histogram over Rhr in [-0.25, 1.25) step 0.01
    (test.py:174-176)."""
    xs = np.array([(x - 25) / 100 for x in range(150)])
    ys = np.zeros(150)
    for r in rhrs:
        bucket = int(math.floor((r + 0.25) * 100))
        if 0 <= bucket < 150:
            ys[bucket] += 1
    total = ys.sum()
    if total > 0:
        ys = ys / total
    return xs, ys


def fit_rhr(rhrs: Sequence[float]):
    """Two-Gaussian fit with the reference's bounds (test.py:177-182).
    Returns ``[a1, m1, s1, a2, m2, s2]``."""
    from scipy.optimize import curve_fit

    xs, ys = rhr_histogram(rhrs)
    bounds = ([0, -0.25, 0, 0, 0, 0], [1, 0.33, 0.2, 1, 1.25, 1])
    popt, _ = curve_fit(gauss2, xs, ys, bounds=bounds, maxfev=5000)
    return list(popt)
