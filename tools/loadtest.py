"""Load generator for the serving daemon (serve.py).

Fires concurrent /analyse requests at a running daemon and reports
latency percentiles plus effective clip throughput (from the server's
own /metrics deltas, so compile/warmup time is excluded). The
deployment-side complement of bench.py's in-process serving benchmark.

    python serve.py -c model.pth --warmup 1546x1028 &
    python tools/loadtest.py --url http://127.0.0.1:8600 \
        --width 1546 --height 1028 --requests 12 --concurrency 3
"""

from __future__ import annotations

import argparse
import concurrent.futures
import io
import json
import time
import urllib.request

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", default="http://127.0.0.1:8600")
    parser.add_argument("--width", type=int, default=1546)
    parser.add_argument("--height", type=int, default=1028)
    parser.add_argument("--requests", type=int, default=12)
    parser.add_argument("--concurrency", type=int, default=3)
    parser.add_argument("--image", default=None,
                        help="slide file to send (default: synthetic noise "
                        "of --width x --height)")
    parser.add_argument("--raw", action="store_true",
                        help="send a raw uint8 grayscale buffer "
                        "(application/octet-stream + X-Width/X-Height) "
                        "instead of PNG — skips both sides' codec work")
    args = parser.parse_args()

    headers = {}
    if args.raw:
        if args.image:
            raise SystemExit("--raw uses synthetic pixels; drop --image")
        rng = np.random.default_rng(0)
        payload = rng.integers(
            120, 255, (args.height, args.width), np.uint8).tobytes()
        headers = {"Content-Type": "application/octet-stream",
                   "X-Width": str(args.width), "X-Height": str(args.height)}
    elif args.image:
        with open(args.image, "rb") as f:
            payload = f.read()
    else:
        from PIL import Image

        rng = np.random.default_rng(0)
        noise = rng.integers(120, 255,
                             (args.height, args.width, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(noise).save(buf, format="PNG")
        payload = buf.getvalue()

    def get(path):
        with urllib.request.urlopen(args.url + path, timeout=600) as resp:
            return json.loads(resp.read())

    def analyse():
        req = urllib.request.Request(args.url + "/analyse", data=payload,
                                     method="POST", headers=headers)
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=600) as resp:
            body = json.loads(resp.read())
        return time.perf_counter() - t0, body["count"]

    # one priming request so the analyzer for this geometry is compiled
    analyse()
    before = get("/metrics")

    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(args.concurrency) as pool:
        latencies = [lat for lat, _ in pool.map(
            lambda _: analyse(), range(args.requests))]
    wall = time.perf_counter() - t0
    after = get("/metrics")

    if not latencies:
        raise SystemExit("no requests issued (--requests must be > 0)")
    latencies.sort()
    # nearest-rank percentile: ceil(p/100 * n) - 1
    pct = lambda p: latencies[max(0, -(-int(p) * len(latencies) // 100) - 1)]
    clips = after["clips"] - before["clips"]
    print(json.dumps({
        "requests": args.requests,
        "concurrency": args.concurrency,
        "wall_seconds": round(wall, 2),
        "requests_per_second": round(args.requests / wall, 2),
        "clips_per_second": round(clips / wall, 1),
        "latency_p50_ms": round(pct(50) * 1000, 1),
        "latency_p90_ms": round(pct(90) * 1000, 1),
        "latency_max_ms": round(latencies[-1] * 1000, 1),
        "server_errors": after["errors"] - before["errors"],
    }))


if __name__ == "__main__":
    main()
