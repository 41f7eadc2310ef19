"""`.d` archive format: reader and writer.

The archive is a zip with the layout the reference documents at
scdx16p100.py:66-90:

    object-count.json          {"<img>.<id>": count, ...}
    dataset.json               {"names": ["<img>.<rep>.<id>.npy", ...]}
    samples/<name>.npy         (H, W) float image clip
    locs/<name>.npy            (K, 8) float [ctX, ctY, offX, offY,
                                             majX, majY, minL, halo]

The reference preprocessor never actually wrote into the zip it was handed —
it dumped to a hardcoded temp dir (scdManual.py:204-230, SURVEY.md defect
#5) and the trainer only worked because it extracted to the same temp name.
This writer fixes that: archives are self-contained.

Reading avoids the extract-to-disk round-trip entirely: npy payloads are
parsed straight out of the zip into one contiguous array (the native C++
reader in native/ accelerates the same layout)."""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Dict, List, Optional, Tuple

import numpy as np

MAXTAGLEN = 30  # fixed-shape object packing (scdx16p100.py:46)


class ArchiveWriter:
    """Streams clips into a `.d` zip."""

    def __init__(self, path: str):
        self._zip = zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED)
        self._names: List[str] = []
        self._counts: Dict[str, int] = {}

    def add_clip(self, image_name: str, rep: int, clip_id: int,
                 sample: np.ndarray, locs: np.ndarray) -> None:
        name = f"{image_name}.{rep}.{clip_id}"
        buf = io.BytesIO()
        np.save(buf, np.asarray(sample, np.float32))
        self._zip.writestr(f"samples/{name}.npy", buf.getvalue())
        buf = io.BytesIO()
        np.save(buf, np.asarray(locs, np.float32))
        self._zip.writestr(f"locs/{name}.npy", buf.getvalue())
        self._names.append(name + ".npy")
        # count key matches the reference's "{imageName}.{generalId}"
        self._counts[f"{image_name}.{clip_id}"] = int(len(locs))

    def close(self) -> None:
        self._zip.writestr("object-count.json", json.dumps(self._counts))
        self._zip.writestr("dataset.json", json.dumps({"names": self._names}))
        self._zip.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_archive(path: str, keep_names: Optional[List[str]] = None,
                 prefer_native: bool = True
                 ) -> Tuple[List[str], np.ndarray, np.ndarray, np.ndarray]:
    """Load a `.d` archive into packed host arrays.

    Returns ``(names, samples (N,H,W) f32, locs (N,MAXTAGLEN,8) f32,
    counts (N,) i32)``. Objects beyond MAXTAGLEN are dropped (the
    reference's fixed-length packing, scdx16p100.py:346-351).

    Uses the native C++ reader (native/scdio.cpp) when available — mmap'd
    zip, threaded inflate straight into the contiguous output — and falls
    back to this Python implementation otherwise.
    """
    if prefer_native and keep_names is None:
        from scd_resnet_tpu.data import native_io

        result = native_io.read_archive_native(path)
        if result is not None:
            return result
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("dataset.json"))
        names = meta["names"]
        if keep_names is not None:
            keep = set(keep_names)
            names = [n for n in names if n in keep]
        samples = []
        locs = np.zeros((len(names), MAXTAGLEN, 8), np.float32)
        counts = np.zeros(len(names), np.int32)
        for i, name in enumerate(names):
            sample = np.load(io.BytesIO(zf.read(f"samples/{name}")))
            samples.append(np.asarray(sample, np.float32))
            loc = np.load(io.BytesIO(zf.read(f"locs/{name}")))
            loc = np.asarray(loc, np.float32).reshape(-1, 8)[:MAXTAGLEN]
            locs[i, : len(loc)] = loc
            counts[i] = len(loc)
    stack = (
        np.stack(samples, 0)
        if samples
        else np.zeros((0, 0, 0), np.float32)
    )
    return names, stack, locs, counts
