"""Persistent slide-serving daemon (HTTP).

The reference's production deployment wraps the traced model in a C++
libtorch host (reference: trace.py:15-17 — "the traced model is for the
deployment environment"); its Python test.py is a one-shot batch client.
This module is the TPU-native serving counterpart: a long-lived process
that owns the device, keeps one jitted device-fused analyzer per slide
geometry (infer/analyse.make_device_analyzer — the uint8 slide uploads
once and only decode rows return), and exposes a minimal HTTP contract:

    GET  /healthz   liveness + device + analyzer-cache info
    GET  /metrics   request/detection/latency counters (JSON)
    POST /warmup?width=W&height=H   pre-compile one geometry
    POST /analyse   body = image bytes (anything PIL reads: PNG/TIFF/JPEG),
                    or Content-Type: application/octet-stream with
                    X-Width/X-Height headers for a raw uint8 grayscale
                    buffer (skips the PNG decode entirely)
                    -> {"detections": [{<contract fields>}...], "contract",
                        "count", "latency_ms"} — field names follow the
                        served family's contract (CONTRACT_FIELDS;
                        centerOffset = x/y/rhr, corner = x/y/score/head,
                        centerSize = x/y/w/h/score, cornerLegacy =
                        tlx/tly/brx/bry/score)

Query params on /analyse: ``dedupe`` overrides the tile-overlap
suppression radius for that request.

stdlib http.server only (no extra deps); device work is serialized by a
lock (one TPU, one program at a time) while image decode runs in the
request thread. The first request at a NEW geometry jit-compiles
(~30 s–2 min over the axon tunnel) while holding that lock — pre-compile
known geometries with ``--warmup``/``/warmup``; compile time is counted
in the ``compile_seconds`` metric, not in serving ``busy_seconds``. The
analyzer cache is LRU-bounded (``max_geometries``) so clients cycling
slide sizes cannot grow device memory without bound. With ``mesh``, each
slide's clip batch is sharded over every local chip (multi-chip
serving).
"""

from __future__ import annotations

import io
import json
import threading
import time
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

from scd_resnet_tpu.infer.analyse import (
    CONTRACT_FIELDS,
    analyse_grayscale,
    coerce_gray_u8,
    dedupe_contract,
    make_device_analyzer,
    slide_geometry,
)
from scd_resnet_tpu.ops.image import grayscale_inference_u8


class ClientError(ValueError):
    """Bad request input (HTTP 400, not counted as a server error)."""


class InferenceService:
    """Analyzer cache + stats around one decode wrapper.

    ``wrapper`` is a batch-flexible decode model (infer/wrapper.
    make_wrapper). Pass ``traced=(model, input_shape)`` instead to serve
    a fixed-shape traced bundle via the host-tiled path (the libtorch
    deployment analog; slower on thin links but geometry-agnostic).
    """

    def __init__(self, wrapper: Optional[Callable] = None,
                 traced=None, dedupe_radius: Optional[float] = None,
                 mesh=None, max_geometries: int = 8):
        if (wrapper is None) == (traced is None):
            raise ValueError("exactly one of wrapper/traced required")
        self._wrapper = wrapper
        self._traced = traced
        # output contract: every trainable family serves (CONTRACT_FIELDS
        # names the detection columns; centerOffset = [x, y, rhr])
        source = wrapper if wrapper is not None else traced[0]
        self.contract = getattr(source, "contract", "centerOffset")
        self.fields = CONTRACT_FIELDS[self.contract]
        self._dedupe = dedupe_radius
        self._mesh = mesh
        self._max_geometries = max_geometries
        self._analyzers: OrderedDict = OrderedDict()
        self._device_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._stats = {
            "requests": 0, "errors": 0, "detections": 0, "clips": 0,
            "warmups": 0, "compiles": 0, "compile_seconds": 0.0,
            "busy_seconds": 0.0, "started": time.time(),
        }

    # -- analysis ---------------------------------------------------------

    def _analyzer(self, width: int, height: int):
        """Get-or-build the analyzer for one geometry. Call with the
        device lock held. A cache miss compiles on a zero slide first so
        serving ``busy_seconds`` never includes jit compile."""
        key = (width, height)
        if key in self._analyzers:
            self._analyzers.move_to_end(key)
            return self._analyzers[key]
        t0 = time.perf_counter()
        analyzer = make_device_analyzer(self._wrapper, width, height,
                                        mesh=self._mesh)
        analyzer(np.zeros((height, width), np.float32))  # compile now
        elapsed = time.perf_counter() - t0
        with self._stats_lock:
            self._stats["compiles"] += 1
            self._stats["compile_seconds"] += elapsed
        self._analyzers[key] = analyzer
        while len(self._analyzers) > self._max_geometries:
            self._analyzers.popitem(last=False)  # evict least-recent
        return analyzer

    def analyse_gray(self, gray: np.ndarray,
                     dedupe: Optional[float] = None):
        """[[x, y, rhr], ...] for a uint8-range grayscale slide."""
        height, width = gray.shape
        if self._wrapper is not None:
            # hold the device lock only for the async dispatch: the
            # readback + host-side stitch of this request then overlap
            # the next request's device program (jit dispatch enqueues;
            # the device executes programs in order anyway)
            with self._device_lock:
                analyzer = self._analyzer(width, height)
                t0 = time.perf_counter()
                future = analyzer.dispatch(gray)
            detections = analyzer.finish(future)
            # dispatch->finish wall time; under concurrent load the
            # per-request spans overlap, so summed busy_seconds can
            # exceed wall clock
            elapsed = time.perf_counter() - t0
        else:
            with self._device_lock:
                model, input_shape = self._traced
                t0 = time.perf_counter()
                # the host-tiled path normalizes in float32 (its numerics
                # are golden-pinned); uint8 intake casts exactly
                detections = analyse_grayscale(
                    model, np.asarray(gray, np.float32),
                    batch_size=input_shape[0],
                    bounds="slide")
                elapsed = time.perf_counter() - t0
        radius = self._dedupe if dedupe is None else dedupe
        if radius is not None:
            # contract-aware: corner peaks dedupe within each head, legacy
            # boxes on box centers (a tl peak must not suppress a ct peak)
            detections = dedupe_contract(detections, radius, self.contract)
        clip_h, clip_v, _, _ = slide_geometry(width, height)
        with self._stats_lock:
            self._stats["requests"] += 1
            self._stats["detections"] += len(detections)
            self._stats["clips"] += clip_h * clip_v
            self._stats["busy_seconds"] += elapsed
        return detections

    def warmup(self, width: int, height: int) -> float:
        """Pre-compile the analyzer for one slide geometry. Returns
        seconds spent (near 0 if already cached)."""
        if self._wrapper is None:
            return 0.0  # traced path has no per-geometry programs
        t0 = time.perf_counter()
        with self._device_lock:
            self._analyzer(width, height)
        with self._stats_lock:
            self._stats["warmups"] += 1
        return time.perf_counter() - t0

    def analyse_raw(self, data: bytes, width: int, height: int,
                    dedupe: Optional[float] = None):
        """Raw uint8 grayscale intake (``X-Width``/``X-Height`` headers +
        ``application/octet-stream`` body): production clients that
        already hold pixel buffers skip the PNG/TIFF encode+decode round
        trip (~100-300 ms per slide of pure host work on each side)."""
        if width <= 0 or height <= 0:
            raise ClientError("bad raw geometry {}x{}".format(width, height))
        if len(data) != width * height:
            raise ClientError(
                "raw body is {} bytes, expected width*height = {}".format(
                    len(data), width * height))
        gray = np.frombuffer(data, np.uint8).reshape(height, width)
        return self.analyse_gray(gray, dedupe=dedupe)

    def analyse_bytes(self, data: bytes, dedupe: Optional[float] = None):
        from PIL import Image, UnidentifiedImageError

        try:
            image = Image.open(io.BytesIO(data))
            if image.mode == "P":  # palette -> real colors
                image = image.convert("RGB")
            color = np.asarray(image)
        except UnidentifiedImageError as exc:
            raise ClientError("unreadable image: {}".format(exc)) from exc
        if not (np.issubdtype(color.dtype, np.integer)
                or np.issubdtype(color.dtype, np.floating)):
            raise ClientError(
                "unsupported image dtype {}".format(color.dtype))
        if color.ndim == 2:
            # already grayscale; >8-bit scanner output (16-bit TIFF etc.)
            # is rescaled by coerce_gray_u8 instead of wrapping mod 256
            # through the device path's uint8 upload cast
            gray = coerce_gray_u8(color)
        elif color.ndim == 3 and color.shape[-1] >= 3:
            # normalize >8-bit color into 8-bit range (one shared scale,
            # preserving color balance) before the BGR-weighted grayscale
            # conversion; stay uint8 end-to-end — the device analyzer
            # uploads u8, and a float detour would just round/clip back
            gray = grayscale_inference_u8(coerce_gray_u8(color[..., :3]))
        else:
            raise ClientError(
                "unsupported image shape {}".format(color.shape))
        return self.analyse_gray(gray, dedupe=dedupe)

    def record_error(self):
        with self._stats_lock:
            self._stats["errors"] += 1

    # -- introspection ----------------------------------------------------

    def health(self) -> dict:
        import jax

        geometries = list(self._analyzers)  # atomic snapshot under GIL
        return {
            "status": "ok",
            "mode": "device-fused" if self._wrapper is not None else "traced",
            "devices": [str(d) for d in jax.devices()],
            "mesh": None if self._mesh is None else str(
                dict(self._mesh.shape)),
            "geometries": ["{}x{}".format(*k) for k in geometries],
        }

    def metrics(self) -> dict:
        with self._stats_lock:
            stats = dict(self._stats)
        stats["uptime_seconds"] = round(time.time() - stats.pop("started"), 1)
        busy = stats["busy_seconds"]
        stats["busy_seconds"] = round(busy, 3)
        stats["compile_seconds"] = round(stats["compile_seconds"], 1)
        stats["clips_per_second"] = round(stats["clips"] / busy, 1) if busy else 0.0
        return stats


def make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet; the service keeps counters
            pass

        def _json(self, payload, code=200):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(service.health())
            elif self.path == "/metrics":
                self._json(service.metrics())
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path == "/warmup":
                try:
                    query = parse_qs(url.query)
                    width = int(query["width"][0])
                    height = int(query["height"][0])
                except (KeyError, ValueError) as exc:
                    self._json({"error": "bad warmup query: {}".format(exc)},
                               400)
                    return
                seconds = service.warmup(width, height)
                self._json({"compiled_seconds": round(seconds, 1)})
                return
            if url.path != "/analyse":
                self._json({"error": "not found"}, 404)
                return
            try:
                query = parse_qs(url.query)
                dedupe = (float(query["dedupe"][0])
                          if "dedupe" in query else None)
                length = int(self.headers.get("Content-Length", 0))
            except ValueError as exc:
                self._json({"error": "bad request: {}".format(exc)}, 400)
                return
            data = self.rfile.read(length)
            try:
                t0 = time.perf_counter()
                if (self.headers.get("Content-Type", "")
                        .startswith("application/octet-stream")):
                    # raw uint8 grayscale: X-Width/X-Height name the
                    # geometry, body is the row-major pixel buffer

                    def int_header(name):
                        value = self.headers.get(name, "0")
                        try:
                            return int(value)
                        except ValueError:
                            raise ClientError(
                                "bad {} header: {!r}".format(name, value))

                    detections = service.analyse_raw(
                        data, int_header("X-Width"), int_header("X-Height"),
                        dedupe=dedupe)
                else:
                    detections = service.analyse_bytes(data, dedupe=dedupe)
                self._json({
                    "detections": [
                        dict(zip(service.fields, d)) for d in detections
                    ],
                    "contract": service.contract,
                    "count": len(detections),
                    "latency_ms": round(
                        (time.perf_counter() - t0) * 1000.0, 1),
                })
            except ClientError as exc:  # bad input, not a server fault
                self._json({"error": str(exc)}, 400)
            except Exception as exc:  # report, keep serving
                service.record_error()
                self._json({"error": str(exc)}, 500)

    return Handler


def create_server(service: InferenceService, host: str = "127.0.0.1",
                  port: int = 8600) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), make_handler(service))
