"""preprocess.py CLI: geometry misfits are hard failures (VERDICT r1
weak #4 — the reference proceeded and silently truncated the tile grid),
and a fitting margin still produces a valid archive."""

import os
import subprocess
import sys
import zipfile

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_inputs(root, width=200, height=120):
    img_dir = root / "imgs"
    ann_dir = root / "annots"
    img_dir.mkdir()
    ann_dir.mkdir()
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (height, width, 3), np.uint8)
    Image.fromarray(rgb).save(img_dir / "1.png")
    # one object: headX;headY;tailX;tailY;width;halo (scd-label format)
    (ann_dir / "1.txt").write_text("60.0;50.0;80.0;60.0;8.0;14.0\n")
    return img_dir, ann_dir


def _run(img_dir, ann_dir, out, margin, size=64):
    # pin the subprocess to the CPU backend: initializing the TPU tunnel
    # from inside the suite can stall for minutes under contention
    env = dict(os.environ, SCD_JAX_PLATFORM="cpu")
    return subprocess.run(
        [sys.executable, "preprocess.py",
         "-i", str(img_dir), "-a", str(ann_dir), "-s", str(size),
         "-m", margin, "-p", "datasets.preprocessor.scdManual", str(out)],
        cwd=REPO, capture_output=True, text=True, timeout=900, env=env,
    )


def test_misfit_margin_fails_hard(tmp_path):
    img_dir, ann_dir = _make_inputs(tmp_path)
    # 200 + 10 + 10 = 220, not a multiple of 64 -> must abort nonzero
    proc = _run(img_dir, ann_dir, tmp_path / "bad.d", "10 10 10 10")
    assert proc.returncode != 0
    assert "cannot fit the destination size" in (proc.stderr + proc.stdout)


def test_fitting_margin_writes_archive(tmp_path):
    img_dir, ann_dir = _make_inputs(tmp_path)
    out = tmp_path / "good.d"
    # 200 + 28 + 28 = 256 = 4*64; 120 + 4 + 4 = 128 = 2*64
    proc = _run(img_dir, ann_dir, out, "28 4 28 4")
    assert proc.returncode == 0, proc.stderr[-2000:]
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert any(n.startswith("samples/") for n in names)
    assert "dataset.json" in names and "object-count.json" in names
