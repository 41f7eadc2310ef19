"""Phase-level serving profile: where does a served slide's time go?

Times, within one process on the real chip:
  - host grayscale (RGB -> rounded u8 gray);
  - upload + device program dispatch (async boundary);
  - device compute + readback (np.asarray barrier);
  - host stitch (threshold + coordinate/Rhr math);
and compares the sequential path against analyse.many (pipelined) over the
same slides, several times, so the seq-vs-pipelined ordering is measured
rather than assumed. Absolute numbers through the axon tunnel vary ~2x
across processes (CLAUDE.md); only within-process comparisons matter here.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from scd_resnet_tpu.infer.analyse import (
    coerce_gray_u8,
    make_device_analyzer,
    slide_geometry,
)
from scd_resnet_tpu.infer.wrapper import make_wrapper
from scd_resnet_tpu.models.center_net_offset import CenterNetResidual
from scd_resnet_tpu.ops.image import grayscale_inference_u8

W, H = 3092, 2056
REPS = 6


def main():
    model = CenterNetResidual(num_layers=10, compute_dtype="bfloat16")
    x0 = jnp.zeros((24, 512, 512, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params = variables["params"]
    params["ResNetBackbone_0"]["heatmap"]["Conv_1"]["bias"] = jnp.full_like(
        params["ResNetBackbone_0"]["heatmap"]["Conv_1"]["bias"], 2.0)
    wrapper = make_wrapper(model, params, variables["batch_stats"])
    analyse = make_device_analyzer(wrapper, W, H)

    rng = np.random.default_rng(3)
    rgb = rng.integers(120, 255, (H, W, 3), dtype=np.uint8)
    clip_h, clip_v, _, _ = slide_geometry(W, H)
    n_clips = clip_h * clip_v
    print("slide {}x{} -> {} clips".format(W, H, n_clips))

    # warmup (compile)
    gray = grayscale_inference_u8(rgb)
    analyse(gray)

    # ---- phase timings (sequential anatomy) -----------------------------
    t = {}
    t0 = time.perf_counter()
    grays = [grayscale_inference_u8(rgb) for _ in range(REPS)]
    t["grayscale"] = (time.perf_counter() - t0) / REPS

    t0 = time.perf_counter()
    u8s = [jnp.asarray(coerce_gray_u8(g)) for g in grays]
    for u in u8s:
        u.block_until_ready()  # early-return on axon; lower bound only
    t["upload(dispatch)"] = (time.perf_counter() - t0) / REPS

    t0 = time.perf_counter()
    futs = [analyse.dispatch(g) for g in grays]
    t["dispatch_all"] = (time.perf_counter() - t0) / REPS
    t0 = time.perf_counter()
    rows = [np.asarray(f) for f in futs]
    t["compute+readback(after dispatch_all)"] = (
        time.perf_counter() - t0) / REPS

    t0 = time.perf_counter()
    for r, g in zip(rows, grays):
        analyse.finish(r)
    t["stitch"] = (time.perf_counter() - t0) / REPS

    for k, v in t.items():
        print("  {:<40s} {:7.1f} ms".format(k, v * 1e3))

    # ---- sequential vs pipelined, interleaved 3x ------------------------
    for trial in range(3):
        t0 = time.perf_counter()
        for g in grays:
            analyse(g)
        seq = time.perf_counter() - t0

        t0 = time.perf_counter()
        analyse.many(list(grays))
        pip = time.perf_counter() - t0

        print("trial {}: sequential {:6.1f} clips/s   pipelined {:6.1f} "
              "clips/s".format(
                  trial, n_clips * REPS / seq, n_clips * REPS / pip))


if __name__ == "__main__":
    main()
