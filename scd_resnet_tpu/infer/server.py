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
    POST /analyse   body = image bytes (anything PIL reads: PNG/TIFF/JPEG)
                    -> {"detections": [{"x","y","rhr"}...], "count",
                        "latency_ms", "clips"}

Query params on /analyse: ``dedupe`` overrides the tile-overlap
suppression radius for that request.

stdlib http.server only (no extra deps); device work is serialized by a
lock (one TPU, one program at a time) while image decode runs in the
request thread. With ``mesh``, each slide's clip batch is sharded over
every local chip (multi-chip serving).
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

from scd_resnet_tpu.infer.analyse import (
    analyse_grayscale,
    dedupe_detections,
    make_device_analyzer,
    slide_geometry,
)
from scd_resnet_tpu.ops.image import grayscale_inference


class InferenceService:
    """Analyzer cache + stats around one decode wrapper.

    ``wrapper`` is a batch-flexible decode model (infer/wrapper.
    make_wrapper). Pass ``traced=(model, input_shape)`` instead to serve
    a fixed-shape traced bundle via the host-tiled path (the libtorch
    deployment analog; slower on thin links but geometry-agnostic).
    """

    def __init__(self, wrapper: Optional[Callable] = None,
                 traced=None, dedupe_radius: Optional[float] = None,
                 mesh=None):
        if (wrapper is None) == (traced is None):
            raise ValueError("exactly one of wrapper/traced required")
        self._wrapper = wrapper
        self._traced = traced
        self._dedupe = dedupe_radius
        self._mesh = mesh
        self._analyzers = {}
        self._device_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._stats = {
            "requests": 0, "errors": 0, "detections": 0,
            "clips": 0, "busy_seconds": 0.0, "started": time.time(),
        }

    # -- analysis ---------------------------------------------------------

    def analyse_gray(self, gray: np.ndarray,
                     dedupe: Optional[float] = None):
        """[[x, y, rhr], ...] for a uint8-range grayscale slide."""
        height, width = gray.shape
        t0 = time.perf_counter()
        with self._device_lock:
            if self._wrapper is not None:
                key = (width, height)
                if key not in self._analyzers:
                    # per-geometry jit, cached for the server's lifetime
                    self._analyzers[key] = make_device_analyzer(
                        self._wrapper, width, height, mesh=self._mesh)
                detections = self._analyzers[key](gray)
            else:
                model, input_shape = self._traced
                detections = analyse_grayscale(
                    model, gray, batch_size=input_shape[0])
        radius = self._dedupe if dedupe is None else dedupe
        if radius is not None:
            detections = dedupe_detections(detections, radius)
        clip_h, clip_v, _, _ = slide_geometry(width, height)
        with self._stats_lock:
            self._stats["requests"] += 1
            self._stats["detections"] += len(detections)
            self._stats["clips"] += clip_h * clip_v
            self._stats["busy_seconds"] += time.perf_counter() - t0
        return detections

    def warmup(self, width: int, height: int) -> float:
        """Pre-compile the analyzer for one slide geometry (the first
        request at a new geometry otherwise pays the jit compile — ~2 min
        over the axon tunnel). Returns seconds spent."""
        t0 = time.perf_counter()
        with self._stats_lock:
            before = self._stats["busy_seconds"]
        self.analyse_gray(np.zeros((height, width), np.float32))
        clip_h, clip_v, _, _ = slide_geometry(width, height)
        with self._stats_lock:  # don't pollute the serving counters
            self._stats["requests"] -= 1
            self._stats["clips"] -= clip_h * clip_v
            self._stats["busy_seconds"] = before
            self._stats["warmups"] = self._stats.get("warmups", 0) + 1
        return time.perf_counter() - t0

    def analyse_bytes(self, data: bytes, dedupe: Optional[float] = None):
        from PIL import Image

        color = np.asarray(Image.open(io.BytesIO(data)))
        if color.ndim == 2:  # already grayscale
            gray = color.astype(np.float32)
        else:
            gray = grayscale_inference(color)
        return self.analyse_gray(gray, dedupe=dedupe)

    def record_error(self):
        with self._stats_lock:
            self._stats["errors"] += 1

    # -- introspection ----------------------------------------------------

    def health(self) -> dict:
        import jax

        return {
            "status": "ok",
            "mode": "device-fused" if self._wrapper is not None else "traced",
            "devices": [str(d) for d in jax.devices()],
            "mesh": None if self._mesh is None else str(
                dict(self._mesh.shape)),
            "geometries": ["{}x{}".format(*k) for k in self._analyzers],
        }

    def metrics(self) -> dict:
        with self._stats_lock:
            stats = dict(self._stats)
        stats["uptime_seconds"] = round(time.time() - stats.pop("started"), 1)
        busy = stats["busy_seconds"]
        stats["busy_seconds"] = round(busy, 3)
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
                    seconds = service.warmup(int(query["width"][0]),
                                             int(query["height"][0]))
                    self._json({"compiled_seconds": round(seconds, 1)})
                except Exception as exc:
                    self._json({"error": str(exc)}, 400)
                return
            if url.path != "/analyse":
                self._json({"error": "not found"}, 404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(length)
                query = parse_qs(url.query)
                dedupe = (float(query["dedupe"][0])
                          if "dedupe" in query else None)
                t0 = time.perf_counter()
                detections = service.analyse_bytes(data, dedupe=dedupe)
                self._json({
                    "detections": [
                        {"x": d[0], "y": d[1], "rhr": d[2]}
                        for d in detections
                    ],
                    "count": len(detections),
                    "latency_ms": round(
                        (time.perf_counter() - t0) * 1000.0, 1),
                })
            except Exception as exc:  # report, keep serving
                service.record_error()
                self._json({"error": str(exc)}, 500)

    return Handler


def create_server(service: InferenceService, host: str = "127.0.0.1",
                  port: int = 8600) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), make_handler(service))
