"""Inference path: tiling geometry, padding semantics, stitching, Rhr,
and the two-Gaussian fit — golden-checked against the reference formulas
(test.py:41-183)."""

import math

import numpy as np

from scd_resnet_tpu.infer.analyse import (
    BATCH_SIZE,
    INPUT_SIZE,
    PADDING_SIZE,
    analyse_grayscale,
    fit_rhr,
    gauss2,
    rhr_histogram,
    tile_slide,
)
from scd_resnet_tpu.ops.image import (
    grayscale_inference,
    grayscale_preprocess,
    pad_reflect_hybrid,
)


def test_tile_geometry_reference_slide():
    """The canonical 3092x2056 slide (test.py docstring) must map to the
    reference's grid: 8x6 clips, 3200x2432 padded, padLR 54, padTB 188."""
    gray = np.zeros((2056, 3092), np.float32)
    clips, clip_h, clip_v, pad_lr, pad_tb = tile_slide(gray)
    assert (clip_h, clip_v) == (8, 6)
    assert (pad_lr, pad_tb) == (54, 188)
    assert clips.shape == (48, 512, 512)


def test_pad_reflect_hybrid_semantics():
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = pad_reflect_hybrid(img, pad_lr=2, pad_tb=1)
    assert out.shape == (5, 8)
    # y axis: reflect101 (edge not repeated): row -1 == row 1
    np.testing.assert_array_equal(out[0, 2:6], img[1])
    # x axis: symmetric (edge repeated): col -1 == col 0
    np.testing.assert_array_equal(out[2, 1], img[1, 0])
    np.testing.assert_array_equal(out[2, 0], img[1, 1])


def test_grayscale_formulas():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 0] = 100  # R
    rgb[..., 1] = 50   # G
    rgb[..., 2] = 200  # B
    pre = grayscale_preprocess(rgb)
    np.testing.assert_allclose(pre, 0.30 * 100 + 0.59 * 50 + 0.11 * 200)
    inf = grayscale_inference(rgb)
    np.testing.assert_allclose(
        inf, np.round(0.1140 * 100 + 0.5870 * 50 + 0.2989 * 200))


def test_grayscale_inference_u8_matches_float_path():
    """The uint8 serving fast path must produce the exact same rounded
    integers as the float32 reference formula — including the extremes
    (all-0, all-255) and random content."""
    from scd_resnet_tpu.ops.image import grayscale_inference_u8

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    rgb[0, 0] = (0, 0, 0)
    rgb[0, 1] = (255, 255, 255)
    f32 = grayscale_inference(rgb)
    u8 = grayscale_inference_u8(rgb)
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8.astype(np.float32), f32)
    # and through the serving boundary guard: u8 passes through untouched
    from scd_resnet_tpu.infer.analyse import coerce_gray_u8

    assert coerce_gray_u8(u8) is u8
    np.testing.assert_array_equal(coerce_gray_u8(f32), u8)


def test_native_grayscale_bit_exact():
    """The native single-pass grayscale (scdio_grayscale_u8) must be
    bit-exact to the numpy double-arithmetic reference — same association
    order, -ffp-contract=off, round-half-even. The exhaustive 256^3 check
    ran at integration time (all 16.7M triples equal); here a dense
    sample + the half-even-critical edges guard regressions."""
    from scd_resnet_tpu.ops.image import _native_lib

    if _native_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    def ref(rgb):
        return np.round(0.1140 * rgb[..., 0] + 0.5870 * rgb[..., 1]
                        + 0.2989 * rgb[..., 2]).astype(np.uint8)

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (512, 512, 3), dtype=np.uint8)
    rgb[0, 0] = (0, 0, 0)
    rgb[0, 1] = (255, 255, 255)
    # exhaustive r/g plane at a few b values (catches channel mixups and
    # rounding-mode drift cheaply)
    rr, gg = np.meshgrid(np.arange(256, dtype=np.uint8),
                         np.arange(256, dtype=np.uint8), indexing="ij")
    for b in (0, 5, 128, 255):
        plane = np.stack([rr, gg, np.full_like(rr, b)], axis=-1)
        from scd_resnet_tpu.ops.image import grayscale_inference_u8

        np.testing.assert_array_equal(grayscale_inference_u8(plane),
                                      ref(plane))
    from scd_resnet_tpu.ops.image import grayscale_inference_u8

    np.testing.assert_array_equal(grayscale_inference_u8(rgb), ref(rgb))
    # non-contiguous input (a cropped view) must also be handled
    view = rgb[64:256, 32:500]
    np.testing.assert_array_equal(grayscale_inference_u8(view), ref(view))


def test_stitch_and_rhr_formula():
    """A fake decode model placing one detection per clip must stitch to
    slide coords by x = clipX*(512-128) - padLR + ctX*4 + offX and compute
    Rhr = (4*rad - 4*minL)/(2*4*minL) (test.py:117-141)."""
    gray = np.zeros((600, 900), np.float32)

    k = 100

    def fake_model(batch):
        b = batch.shape[0]
        rows = np.zeros((10, b, k), np.float32)
        rows[0, :, 0] = 0.9     # score above threshold, one det per clip
        rows[2, :, 0] = 10.0    # ctY
        rows[3, :, 0] = 20.0    # ctX
        rows[6, :, 0] = 2.0     # minL
        rows[7, :, 0] = 6.0     # rad
        rows[8, :, 0] = 1.5     # offX
        rows[9, :, 0] = -0.5    # offY
        return rows

    dets = analyse_grayscale(fake_model, gray)
    stride = INPUT_SIZE - 2 * PADDING_SIZE
    clip_h = math.ceil((900 - 128) / stride)
    clip_v = math.ceil((600 - 128) / stride)
    assert len(dets) == clip_h * clip_v
    # padded geometry
    resize_w = stride * clip_h + 2 * PADDING_SIZE
    resize_h = stride * clip_v + 2 * PADDING_SIZE
    if (resize_w - 900) % 2:
        resize_w += 1
    if (resize_h - 600) % 2:
        resize_h += 1
    pad_lr = (resize_w - 900) // 2
    pad_tb = (resize_h - 600) // 2
    x0, y0, rhr = dets[0]
    assert x0 == int(0 * stride - pad_lr + 20.0 * 4 + 1.5)
    assert y0 == int(0 * stride - pad_tb + 10.0 * 4 - 0.5)
    dminl, halo = 2.0 * 4, 6.0 * 4
    assert abs(rhr - (halo - dminl) / (2 * dminl)) < 1e-9
    # clip (1, 0) shifts x by one stride (int() truncates toward zero, the
    # reference's exact semantics — test.py:134)
    x1 = dets[clip_v][0]
    assert x1 == int(1 * stride - pad_lr + 20.0 * 4 + 1.5)


def test_rhr_histogram_and_fit():
    rng = np.random.default_rng(0)
    rhrs = np.concatenate([
        rng.normal(0.15, 0.05, 400), rng.normal(0.8, 0.12, 600)])
    xs, ys = rhr_histogram(rhrs)
    assert xs.shape == ys.shape == (150,)
    assert abs(xs[0] + 0.25) < 1e-9 and abs(xs[-1] - 1.24) < 1e-9
    popt = fit_rhr(rhrs)
    a1, m1, s1, a2, m2, s2 = popt
    # the two fitted modes recover the generating means
    assert abs(m1 - 0.15) < 0.05
    assert abs(m2 - 0.8) < 0.08
    # fit reproduces the histogram
    resid = np.abs(gauss2(xs, *popt) - ys).max()
    assert resid < 0.02


def test_two_population_fit_end_to_end():
    """The full quantification recipe (tile -> decode rows -> threshold ->
    stitch -> slide-bounds filter -> fit_rhr) recovers two planted Rhr
    populations — the end-to-end path behind ``test.py --fit``
    (reference test.py:143-183)."""
    gray = np.zeros((2056, 3092), np.float32)  # canonical 8x6 slide

    # two (minL, halo) populations at stride 4: Rhr = (halo-minL)/(2*minL)
    # pop A: minL 5, halo 7  -> Rhr 0.2;  pop B: minL 4, halo 10.4 -> 0.8
    k = 16

    def fake_model(batch):
        b = batch.shape[0]
        rng = np.random.default_rng(7)
        rows = np.zeros((10, b, k), np.float32)
        rows[0] = 0.9                                  # all above threshold
        rows[2] = rng.uniform(40, 90, (b, k))          # ctY well inside
        rows[3] = rng.uniform(40, 90, (b, k))          # ctX
        pop_b = rng.random((b, k)) < 0.6
        minl = np.where(pop_b, 4.0, 5.0)
        rows[6] = minl * (1 + rng.normal(0, 0.08, (b, k)))
        rows[7] = np.where(pop_b, 10.4, 7.0) * (
            1 + rng.normal(0, 0.08, (b, k)))
        return rows

    dets = analyse_grayscale(fake_model, gray, bounds=(3092, 2056))
    assert len(dets) > 500  # 48 clips x 16 detections, minus bounds drops
    popt = fit_rhr([d[2] for d in dets])
    _, m1, _, _, m2, _ = popt
    assert abs(m1 - 0.2) < 0.05, popt
    assert abs(m2 - 0.8) < 0.06, popt


def test_device_tiler_matches_host_tiling():
    """The on-device pad/tile/normalize program must reproduce the host
    tile_slide clips bit-near-exactly (uint8 grayscale input is exact)."""
    from scd_resnet_tpu.infer.analyse import make_device_tiler, slide_geometry

    rng = np.random.default_rng(5)
    gray = np.round(rng.uniform(0, 255, (600, 900))).astype(np.float32)

    host_clips, clip_h, clip_v, pad_lr, pad_tb = tile_slide(gray)
    assert slide_geometry(900, 600) == (clip_h, clip_v, pad_lr, pad_tb)

    device_clips = np.asarray(make_device_tiler(900, 600)(
        gray.astype(np.uint8)))
    assert device_clips.shape == host_clips.shape
    np.testing.assert_allclose(device_clips, host_clips, atol=1e-4)


def test_device_analyzer_matches_host_stitch():
    """make_device_analyzer must stitch identically to analyse_grayscale
    when both see the same decode rows."""
    from scd_resnet_tpu.infer.analyse import make_device_analyzer

    gray = np.zeros((600, 900), np.float32)
    k = 100

    def fake_rows(batch):
        import numpy as _np

        b = batch.shape[0]
        rows = _np.zeros((10, b, k), _np.float32)
        rows[0, :, 0] = 0.9
        rows[2, :, 0] = 10.0
        rows[3, :, 0] = 20.0
        rows[6, :, 0] = 2.0
        rows[7, :, 0] = 6.0
        rows[8, :, 0] = 1.5
        rows[9, :, 0] = -0.5
        return rows

    host_dets = analyse_grayscale(fake_rows, gray)

    import jax.numpy as jnp

    def wrapper(clips_nhwc):
        return jnp.asarray(fake_rows(clips_nhwc))

    analyse = make_device_analyzer(wrapper, 900, 600, bounds=None)
    device_dets = analyse(gray)
    assert device_dets == host_dets

    # pipelined multi-slide: list input, generator input (interleaves the
    # caller's per-slide host work with in-flight transfers — bench.py's
    # mode), and the sequential path must all agree
    grays = [gray, gray + 1.0, gray]
    from_list = analyse.many(list(grays))
    from_gen = analyse.many(g for g in grays)
    assert from_list == from_gen == [analyse(g) for g in grays]


def test_slide_bounds_filter():
    """The default analyzer drops detections the stitch places outside the
    slide (reflection artifacts from the padded margins) — the reference
    quantification recipe's filter (test.py:164-170)."""
    from scd_resnet_tpu.infer.analyse import stitch_rows

    gray = np.zeros((600, 900), np.float32)
    k = 100

    def fake_rows(batch):
        b = batch.shape[0]
        rows = np.zeros((10, b, k), np.float32)
        rows[0, :, 0] = 0.9   # one det per clip at ctX=20 -> clip 0 lands
        rows[2, :, 0] = 10.0  # at slide x ~ -110 (pad_lr 190): out of
        rows[3, :, 0] = 20.0  # bounds, the others in
        rows[6, :, 0] = 2.0
        rows[7, :, 0] = 6.0
        return rows

    unfiltered = analyse_grayscale(fake_rows, gray)
    filtered = analyse_grayscale(fake_rows, gray, bounds="slide")
    assert len(filtered) < len(unfiltered)
    assert all(0 <= x < 900 and 0 <= y < 600 for x, y, _ in filtered)
    assert any(x < 0 or y < 0 for x, y, _ in unfiltered)
    # the filtered set is exactly the in-bounds subset, same order
    assert filtered == [d for d in unfiltered
                        if 0 <= d[0] < 900 and 0 <= d[1] < 600]

    # stitch_rows with explicit bounds matches (the device analyzer path)
    clips, clip_h, clip_v, pad_lr, pad_tb = tile_slide(gray)
    rows = fake_rows(clips[:, :, :, None])
    assert stitch_rows(rows, clip_h, clip_v, pad_lr, pad_tb,
                       (900, 600)) == filtered


def test_device_analyzer_mesh_sharded_matches_single():
    """Multi-chip serving: sharding the clip batch over the mesh 'data'
    axis (including padding 6 clips up to the 8-device axis) must decode
    and stitch identically to the single-device analyzer."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from scd_resnet_tpu.infer.analyse import make_device_analyzer

    rng = np.random.default_rng(5)
    gray = rng.uniform(0.0, 255.0, (600, 900)).astype(np.float32)
    k = 100

    def wrapper(clips):
        # data-dependent fake decode rows so wrong sharding would show
        b = clips.shape[0]
        m = clips.mean(axis=(1, 2, 3))
        rows = jnp.zeros((10, b, k), jnp.float32)
        rows = rows.at[0, :, 0].set(jax.nn.sigmoid(m) * 0.5 + 0.4)
        rows = rows.at[2, :, 0].set(10.0 + m)
        rows = rows.at[3, :, 0].set(20.0 - m)
        rows = rows.at[6, :, 0].set(2.0)
        rows = rows.at[7, :, 0].set(6.0)
        return rows

    single = make_device_analyzer(wrapper, 900, 600)(gray)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharded = make_device_analyzer(wrapper, 900, 600, mesh=mesh)(gray)
    assert len(single) > 0
    assert sharded == single


def test_coerce_gray_u8_bit_depths():
    """The device analyzer's uint8 upload boundary must rescale >8-bit
    slides, not wrap them modulo 256 (infer/analyse.coerce_gray_u8)."""
    from scd_resnet_tpu.infer.analyse import coerce_gray_u8

    u8 = np.array([[0, 128, 255]], np.uint8)
    assert coerce_gray_u8(u8) is u8  # pass-through, no copy
    u16 = u8.astype(np.uint16) * 257
    np.testing.assert_array_equal(coerce_gray_u8(u16), u8)
    f = np.array([[0.0, 1000.0, 2000.0]])
    np.testing.assert_array_equal(coerce_gray_u8(f),
                                  np.array([[0, 128, 255]], np.uint8))
    small = np.array([[-3.0, 100.4, 300.0]])
    np.testing.assert_array_equal(
        coerce_gray_u8(small), np.array([[0, 85, 255]], np.uint8))
    assert coerce_gray_u8(np.zeros((0, 0))).shape == (0, 0)


def test_analyse_grayscale_corner_contract():
    """The serving host path consumes the (12, B, K) corner contract:
    per-head peaks stitched to slide coords, deduped within each head."""
    gray = np.zeros((600, 900), np.float32)
    k = 100

    def fake_model(batch):
        b = batch.shape[0]
        rows = np.zeros((12, b, k), np.float32)
        for h, (y, x) in enumerate([(10, 20), (8, 16), (12, 24)]):
            rows[4 * h, :, 0] = 0.9   # score
            rows[4 * h + 2, :, 0] = y
            rows[4 * h + 3, :, 0] = x
        return rows

    fake_model.contract = "corner"
    dets = analyse_grayscale(fake_model, gray, bounds="slide")
    heads = {d[3] for d in dets}
    assert heads == {"ct", "tl", "br"}
    assert all(0 <= d[0] < 900 and 0 <= d[1] < 600 for d in dets)
    # dedupe is per-head: nearby ct and tl peaks both survive
    deduped = analyse_grayscale(fake_model, gray, bounds="slide",
                                dedupe_radius=1e9)
    assert {d[3] for d in deduped} == {"ct", "tl", "br"}
    assert len(deduped) == 3


def test_analyse_grayscale_center_size_contract():
    """The (6, B, K) centerSize contract stitches to [x, y, w, h, score]
    with sizes scaled back to pixels (x 4*10, centerNet.py:47)."""
    gray = np.zeros((600, 900), np.float32)
    k = 100

    def fake_model(batch):
        b = batch.shape[0]
        rows = np.zeros((6, b, k), np.float32)
        rows[0, :, 0] = 0.8
        rows[2, :, 0] = 10.0
        rows[3, :, 0] = 20.0
        rows[4, :, 0] = 0.5   # sizeW (training scale)
        rows[5, :, 0] = 0.25  # sizeH
        return rows

    fake_model.contract = "centerSize"
    dets = analyse_grayscale(fake_model, gray, bounds="slide")
    assert dets and all(len(d) == 5 for d in dets)
    assert all(abs(d[2] - 0.5 * 40) < 1e-6 and abs(d[3] - 0.25 * 40) < 1e-6
               for d in dets)


def test_analyse_grayscale_legacy_contract():
    """The (B, 1000, 8) cornerLegacy contract stitches paired boxes to
    slide pixels; rejected pairs (score -1) are dropped by threshold."""
    gray = np.zeros((600, 900), np.float32)

    def fake_model(batch):
        b = batch.shape[0]
        dets = np.full((b, 1000, 8), -1.0, np.float32)
        dets[:, 0] = [20.0, 10.0, 30.0, 18.0, 0.9, 0.9, 0.9, 0.0]
        return dets

    fake_model.contract = "cornerLegacy"
    dets = analyse_grayscale(fake_model, gray, bounds="slide")
    assert dets and all(len(d) == 5 for d in dets)
    for tlx, tly, brx, bry, s in dets:
        assert brx - tlx == 40.0 and bry - tly == 32.0
        assert abs(s - 0.9) < 1e-6  # float32 readback


def test_extract_padded_band_matches_global_pad():
    """Band extraction must reproduce the exact pixels of the full padded
    slide for every band, including the symmetric-x edges."""
    from scd_resnet_tpu.infer.analyse import (
        INPUT_SIZE, PADDING_SIZE, band_plan, extract_padded_band,
        slide_geometry,
    )
    from scd_resnet_tpu.ops.image import pad_reflect_hybrid

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 255, (900, 1700)).astype(np.uint8)
    clip_h, clip_v, pad_lr, pad_tb = slide_geometry(1700, 900)
    full = pad_reflect_hybrid(gray, pad_lr, pad_tb)
    stride = INPUT_SIZE - 2 * PADDING_SIZE
    for max_clips in (clip_v, 2 * clip_v + 1, 5 * clip_v):
        for x0, n_cols in band_plan(clip_h, clip_v, max_clips):
            band = extract_padded_band(gray, x0, n_cols, pad_lr, pad_tb)
            want = full[:, x0 * stride : x0 * stride
                        + (n_cols - 1) * stride + INPUT_SIZE]
            np.testing.assert_array_equal(band, want)


def _content_dependent_rows(batch):
    """Fake decode rows derived from clip content, so any pixel or
    ordering error in a banded path changes the detections."""
    b = batch.shape[0]
    k = 100
    m = np.asarray(batch).mean(axis=(1, 2, 3))
    rows = np.zeros((10, b, k), np.float32)
    rows[0, :, 0] = 1.0 / (1.0 + np.exp(-m)) * 0.5 + 0.4
    rows[2, :, 0] = 10.0 + m
    rows[3, :, 0] = 20.0 - m
    rows[6, :, 0] = 2.0
    rows[7, :, 0] = 6.0
    rows[8, :, 0] = m
    rows[9, :, 0] = -m
    return rows


def test_analyse_grayscale_streaming_matches_monolithic():
    """max_resident_clips must not change detections — the host-tiled
    giant-slide streaming mode (SURVEY §5) against the monolithic path,
    on a slide several times the production geometry's clip count."""
    rng = np.random.default_rng(3)
    gray = rng.uniform(0.0, 255.0, (1200, 3600)).astype(np.float32)

    want = analyse_grayscale(_content_dependent_rows, gray, bounds="slide")
    assert len(want) > 0
    for max_clips in (3, 7, 9):  # one-column floor, mid, remainder band
        got = analyse_grayscale(_content_dependent_rows, gray,
                                bounds="slide",
                                max_resident_clips=max_clips)
        assert got == want

    # memmap input: only band columns are ever read — the literal
    # larger-than-host-memory path
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npy") as f:
        np.save(f.name, gray)
        mm = np.load(f.name, mmap_mode="r")
        got = analyse_grayscale(_content_dependent_rows, mm,
                                bounds="slide", max_resident_clips=7)
        assert got == want


def test_device_analyzer_streaming_matches_monolithic():
    """The device-fused streaming analyzer (bounded band window) must
    produce the monolithic analyzer's exact detections, including with
    dedupe (band order preserves the greedy dedupe sequence)."""
    import jax
    import jax.numpy as jnp

    from scd_resnet_tpu.infer.analyse import make_device_analyzer

    rng = np.random.default_rng(5)
    gray = rng.uniform(0.0, 255.0, (1200, 3600)).astype(np.float32)

    def wrapper(clips):
        b = clips.shape[0]
        k = 100
        m = clips.mean(axis=(1, 2, 3))
        rows = jnp.zeros((10, b, k), jnp.float32)
        rows = rows.at[0, :, 0].set(jax.nn.sigmoid(m) * 0.5 + 0.4)
        rows = rows.at[2, :, 0].set(10.0 + m)
        rows = rows.at[3, :, 0].set(20.0 - m)
        rows = rows.at[6, :, 0].set(2.0)
        rows = rows.at[7, :, 0].set(6.0)
        return rows

    single = make_device_analyzer(wrapper, 3600, 1200, dedupe_radius=16.0)
    want = single(gray)
    assert len(want) > 0
    streamed = make_device_analyzer(wrapper, 3600, 1200, dedupe_radius=16.0,
                                    max_resident_clips=9)
    got = streamed(gray)
    assert got == want
    # the many/dispatch/finish surface agrees too
    assert streamed.many([gray, gray]) == [want, want]
    assert streamed.finish(streamed.dispatch(gray)) == want


def test_device_analyzer_streaming_mesh_exclusive():
    import jax
    import pytest
    from jax.sharding import Mesh

    from scd_resnet_tpu.infer.analyse import make_device_analyzer

    mesh = Mesh(np.array(jax.devices()), ("data",))
    with pytest.raises(ValueError):
        make_device_analyzer(lambda c: c, 3600, 1200, mesh=mesh,
                             max_resident_clips=4)
