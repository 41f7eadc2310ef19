"""API tests for the browser annotation editor (tools/label_server.py).

Exercises the full HTTP contract — image listing, image bytes (incl. the
TIFF→PNG transcode), marker load, marker save — and asserts the saved
file is byte-identical to what the reference C# GUI writes
(``"F2"``-rounded ``;``-joined floats, FormMain.cs:392-399) by
round-tripping through :mod:`scd_resnet_tpu.data.labels`.
"""

import json
import os
import sys
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))

from scd_resnet_tpu.data.labels import load_markers, save_markers, Marker  # noqa: E402
import label_server  # noqa: E402


@pytest.fixture()
def server(tmp_path):
    from PIL import Image

    imgs = tmp_path / "imgs"
    annots = tmp_path / "annots"
    imgs.mkdir()
    annots.mkdir()
    rng = np.random.default_rng(0)
    for name in ("1.png", "2.png"):
        Image.fromarray(
            rng.integers(0, 255, (40, 60), np.uint8)).save(str(imgs / name))
    Image.fromarray(
        rng.integers(0, 255, (40, 60), np.uint8)).save(str(imgs / "3.tif"))
    save_markers(str(annots / "1.txt"),
                 [Marker(10.0, 12.0, 30.0, 32.0, 8.0, 14.0)])
    srv, port = label_server.serve_background(str(imgs), str(annots))
    yield f"http://127.0.0.1:{port}", annots
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_page_and_listing(server):
    base, _ = server
    status, ctype, body = _get(base + "/")
    assert status == 200 and ctype.startswith("text/html")
    assert b"scd-label" in body

    status, _, body = _get(base + "/api/images")
    assert status == 200
    assert json.loads(body) == ["1.png", "2.png", "3.tif"]


def test_image_bytes_and_tiff_transcode(server):
    base, _ = server
    status, ctype, body = _get(base + "/api/image/1.png")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"

    # TIFF is transcoded to PNG so the browser can render it
    status, ctype, body = _get(base + "/api/image/3.tif")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_marker_roundtrip(server):
    base, annots = server
    _, _, body = _get(base + "/api/markers/1.png")
    rows = json.loads(body)
    assert rows == [{"tail_x": 10.0, "tail_y": 12.0, "head_x": 30.0,
                     "head_y": 32.0, "width": 8.0, "halo_radius": 14.0}]

    # empty annotation file -> empty list, not an error
    _, _, body = _get(base + "/api/markers/2.png")
    assert json.loads(body) == []

    # save two markers with full-precision floats; file must carry the
    # GUI's two-decimal formatting and round-trip through load_markers
    rows = [
        {"tail_x": 1.23456, "tail_y": 2.0, "head_x": 20.0, "head_y": 21.0,
         "width": 6.789, "halo_radius": 11.111},
        {"tail_x": 40.0, "tail_y": 5.0, "head_x": 55.5, "head_y": 9.25,
         "width": 4.0, "halo_radius": 8.0},
    ]
    req = urllib.request.Request(base + "/api/markers/2.png",
                                 data=json.dumps(rows).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        report = json.loads(r.read())
    assert report["saved"] == 2 and report["problems"] == []

    text = (annots / "2.txt").read_text()
    assert text.splitlines()[0] == "1.23;2.00;20.00;21.00;6.79;11.11"
    loaded = load_markers(str(annots / "2.txt"))
    assert len(loaded) == 2
    assert loaded[1].halo_radius == 8.0


def test_save_reports_validation_problems(server):
    base, annots = server
    rows = [{"tail_x": 5.0, "tail_y": 5.0, "head_x": 5.0, "head_y": 5.0,
             "width": -1.0, "halo_radius": 0.0}]
    req = urllib.request.Request(base + "/api/markers/1.png",
                                 data=json.dumps(rows).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        report = json.loads(r.read())
    assert report["saved"] == 1
    assert len(report["problems"]) == 3  # zero axis, bad width, bad halo


def test_rejects_path_traversal_and_bad_payload(server):
    base, _ = server
    for path in ("/api/markers/..%2Fescape", "/api/image/..%2Fetc"):
        try:
            status, _, _ = _get(base + path)
        except urllib.error.HTTPError as e:
            status = e.code
        assert status in (400, 404)

    req = urllib.request.Request(base + "/api/markers/1.png",
                                 data=b"[{\"nope\": 1}]", method="POST")
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400
