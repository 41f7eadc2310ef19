"""ctypes bindings for the native archive reader (native/scdio.cpp).

The native library memory-maps the `.d` zip, inflates npy payloads into
contiguous buffers with worker threads, and packs shuffled batches with
memcpy — the C++ counterpart of the reference's Python
extract-then-numpy.load input path (scdx16p100.py:95-134). Falls back to
the pure-Python reader transparently when the library cannot be built.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import zipfile
from typing import List, Optional, Tuple

import numpy as np

from scd_resnet_tpu.core.logging import Logger
from scd_resnet_tpu.data.archive import MAXTAGLEN

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libscdio.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception as exc:  # toolchain absent or build failure
        Logger.warn(":: native_io :: build failed ({}); using the Python "
                    "reader".format(exc))
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    # run make even when the .so exists: the build artifact is gitignored
    # and survives upgrades, so a stale library may lack newer symbols
    # (dlopen caches by path in-process, so rebuild-after-load is too
    # late — make's own mtime check makes this a ~20 ms no-op when
    # current). If the toolchain is gone but an old .so remains, fall
    # through and bind defensively.
    built = _build() or os.path.exists(_LIB_PATH)
    if not built:
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    core = ("scdio_open", "scdio_close", "scdio_num_samples",
            "scdio_entry_size", "scdio_read_entry", "scdio_load_dataset",
            "scdio_gather_batch")
    if not all(hasattr(lib, sym) for sym in core):
        Logger.warn(":: native_io :: libscdio.so is stale (missing core "
                    "symbols) and could not be rebuilt; using the Python "
                    "paths")
        return None
    lib.scdio_open.restype = ctypes.c_void_p
    lib.scdio_open.argtypes = [ctypes.c_char_p]
    lib.scdio_close.argtypes = [ctypes.c_void_p]
    lib.scdio_num_samples.restype = ctypes.c_int64
    lib.scdio_num_samples.argtypes = [ctypes.c_void_p]
    lib.scdio_entry_size.restype = ctypes.c_int64
    lib.scdio_entry_size.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.scdio_read_entry.restype = ctypes.c_int
    lib.scdio_read_entry.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_char_p]
    lib.scdio_load_dataset.restype = ctypes.c_int
    lib.scdio_load_dataset.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    lib.scdio_gather_batch.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    # newer, optional entry point: a stale .so missing it keeps its working
    # archive/batch fast paths; only grayscale falls back to numpy
    # (ops/image.grayscale_inference_u8 checks hasattr before calling)
    if hasattr(lib, "scdio_grayscale_u8"):
        lib.scdio_grayscale_u8.restype = None
        lib.scdio_grayscale_u8.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ]
    else:
        Logger.warn(":: native_io :: libscdio.so is stale (missing "
                    "scdio_grayscale_u8) and could not be rebuilt; "
                    "grayscale uses the numpy path")
    _lib = lib
    return _lib


def read_archive_native(path: str
                        ) -> Optional[Tuple[List[str], np.ndarray, np.ndarray,
                                            np.ndarray]]:
    """Native equivalent of archive.read_archive; None on any failure."""
    lib = get_library()
    if lib is None:
        return None
    handle = lib.scdio_open(path.encode())
    if not handle:
        return None
    try:
        # dataset.json still parsed host-side (tiny)
        size = lib.scdio_entry_size(handle, b"dataset.json")
        if size < 0:
            return None
        buf = ctypes.create_string_buffer(size)
        if lib.scdio_read_entry(handle, b"dataset.json", buf) != 0:
            return None
        names = json.loads(buf.raw[:size])["names"]
        if not names:
            return None

        # clip geometry from the first sample entry
        first = ("samples/" + names[0]).encode()
        fsize = lib.scdio_entry_size(handle, first)
        fbuf = ctypes.create_string_buffer(fsize)
        lib.scdio_read_entry(handle, first, fbuf)
        # npy header: 6-byte magic + 2-byte version, then the v1.0 header
        shape, _, _ = np.lib.format.read_array_header_1_0(_Bytes(fbuf.raw, 8))
        h, w = shape

        n = len(names)
        samples = np.zeros((n, h, w), np.float32)
        locs = np.zeros((n, MAXTAGLEN, 8), np.float32)
        counts = np.zeros(n, np.int32)
        packed_names = b"\0".join(nm.encode() for nm in names) + b"\0"
        threads = min(8, os.cpu_count() or 1)
        ret = lib.scdio_load_dataset(
            handle, packed_names, n, h * w, MAXTAGLEN, samples, locs, counts,
            threads,
        )
        if ret != 0:
            Logger.warn(
                ":: native_io :: load failed at entry {}; falling back".format(
                    -ret - 1
                )
            )
            return None
        return names, samples, locs, counts
    finally:
        lib.scdio_close(handle)


class _Bytes:
    """Minimal file-like over a bytes object for numpy header parsing."""

    def __init__(self, data: bytes, offset: int = 0):
        self._data = data
        self._pos = offset

    def read(self, n: int) -> bytes:
        out = self._data[self._pos : self._pos + n]
        self._pos += n
        return out


def gather_batch(samples: np.ndarray, indices: np.ndarray,
                 out: Optional[np.ndarray] = None) -> np.ndarray:
    """Pack out[b] = samples[indices[b]] via the native memcpy path, with a
    numpy fallback."""
    lib = get_library()
    n, h, w = samples.shape
    idx = np.ascontiguousarray(indices, np.int64)
    if out is None:
        out = np.empty((len(idx), h, w), np.float32)
    if lib is None:
        np.take(samples, idx, axis=0, out=out)
        return out
    lib.scdio_gather_batch(samples, h * w, idx, len(idx), out)
    return out
