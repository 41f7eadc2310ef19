"""Annotation file round-trip (the scd-label format contract) and the
preprocessing annotation decode math (scdManual.py:58-106)."""

import math

from scd_resnet_tpu.data.labels import Marker, load_markers, save_markers, validate_markers
from scd_resnet_tpu.data.preprocess import decode_annotations


def test_marker_round_trip(tmp_path):
    markers = [
        Marker(10.123, 20.456, 30.789, 40.012, 12.5, 25.0),
        Marker(5, 5, 9, 9, 4.0, 8.0),
    ]
    path = str(tmp_path / "1.txt")
    save_markers(path, markers)
    # "F2" two-decimal formatting (FormMain.cs:392-399)
    line = open(path).readline().strip()
    assert line == "10.12;20.46;30.79;40.01;12.50;25.00"
    loaded = load_markers(path)
    assert len(loaded) == 2
    assert abs(loaded[0].major_length - markers[0].major_length) < 0.02
    swapped = loaded[0].swap_ends()
    assert (swapped.head_x, swapped.head_y) == (loaded[0].tail_x,
                                                loaded[0].tail_y)


def test_marker_validation_flags_problems():
    bad = [Marker(5, 5, 5, 5, 0.0, -1.0)]  # degenerate axis, bad width/halo
    problems = validate_markers(bad, width=10, height=10)
    assert len(problems) == 3


def test_decode_annotations_math(tmp_path):
    # one marker: head (10,20), tail (30,40), minor width 8, halo 12
    annot = tmp_path / "img.txt"
    annot.write_text("10.0;20.0;30.0;40.0;8.0;12.0\n")
    locs = decode_annotations(str(tmp_path) + "/", "img.png")
    assert len(locs) == 1
    ct_x, ct_y, off_x, off_y, maj_x, maj_y, min_mod, halo = locs[0]
    # center (20, 30) -> /4 int (5, 7), offset center - int*4
    assert (ct_x, ct_y) == (5.0, 7.0)
    assert (off_x, off_y) == (0.0, 2.0)
    # major axis = (tail - head)/8 = (2.5, 2.5)
    assert (maj_x, maj_y) == (2.5, 2.5)
    # minor = width/8, halo /4 (scdManual.py:96-106)
    assert min_mod == 1.0
    assert halo == 3.0


def test_decode_annotations_missing_file(tmp_path):
    assert decode_annotations(str(tmp_path) + "/", "nope.png") is None
