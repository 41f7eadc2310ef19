"""test.py — full-slide inference client.

Library + CLI mirror of the reference inference script (reference:
test.py:41-183): tile a whole-slide image into overlapping 512x512 clips,
run the traced decode model, stitch detections back into slide coordinates
with the relative halo radius (Rhr), and optionally fit the two-Gaussian
Rhr histogram.

Usage:
    python test.py -m model.pt slide1.png slide2.png [-o out.json] [--fit]

Library surface keeps the reference names: ``gauss2``, ``grayscale``,
``analyseImages``.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from scd_resnet_tpu.infer.analyse import (
    analyse_grayscale,
    analyse_images,
    fit_rhr,
    gauss2,
    rhr_histogram,
)
from scd_resnet_tpu.ops.image import grayscale_inference_u8


def _grayscale_u8(path):
    """(uint8 grayscale, color) arrays — what the device-fused serving
    path uploads (it ships the slide as uint8; a float detour would only
    be rounded/clipped back by coerce_gray_u8, several full-slide float64
    passes for nothing).

    Robustness beyond the reference (which assumed 8-bit RGB): already-
    grayscale and >8-bit scanner files go through the same coercion the
    serving daemon uses instead of producing garbage shapes/values."""
    from PIL import Image

    from scd_resnet_tpu.infer.analyse import coerce_gray_u8

    image = Image.open(path)
    if image.mode == "P":
        image = image.convert("RGB")
    color = np.asarray(image)
    if color.ndim == 2:
        return coerce_gray_u8(color), color
    return grayscale_inference_u8(coerce_gray_u8(color[..., :3])), color


def grayscale(path):
    """(grayscale float32, color) arrays, matching test.py:21-33 (the
    reference's library surface; the values are the same rounded integers
    :func:`_grayscale_u8` produces)."""
    gray, color = _grayscale_u8(path)
    return gray.astype(np.float32), color


# reference-compatible alias (test.py:41)
analyseImages = analyse_images


def main():
    parser = argparse.ArgumentParser(
        description="test.py - analyse whole-slide images with a traced model."
    )
    parser.add_argument("images", nargs="+", type=str, help="slide image paths")
    parser.add_argument("-m", dest="model", type=str, default=None,
                        help="traced model bundle (.pt from trace.py)")
    parser.add_argument("-c", dest="checkpoint", type=str, default=None,
                        help="live checkpoint (.pth) — serves with the "
                        "device-fused tiling path (uint8 slide uploads once; "
                        "~3x faster than host tiling on slow links)")
    parser.add_argument("-a", dest="arch", type=str,
                        default="centerOffsetRes10",
                        help="model profile for -c (default centerOffsetRes10)")
    parser.add_argument("-o", dest="output", type=str, default=None,
                        help="write detections JSON here")
    parser.add_argument("--fit", action="store_true",
                        help="fit the two-Gaussian Rhr histogram")
    parser.add_argument("--dedupe", type=float, default=None,
                        help="suppress tile-overlap duplicate detections "
                        "within this radius (px)")
    parser.add_argument("--keep-out-of-bounds", action="store_true",
                        help="keep detections outside the slide bounds "
                        "(reflection artifacts from the padded margins); "
                        "default drops them per the reference's "
                        "quantification recipe (test.py:164-170)")
    parser.add_argument("--mesh", action="store_true",
                        help="with -c: shard each slide's clip batch over "
                        "ALL local devices (multi-chip serving)")
    parser.add_argument("--pipelined", action="store_true",
                        help="with -c: dispatch every slide's device "
                        "program before reading any result back (host "
                        "grayscale/stitch of slide i overlaps device work "
                        "of slide i+1; ~15-20%% faster on multi-slide "
                        "batches)")
    parser.add_argument("--max-resident-clips", type=int, default=None,
                        help="streaming giant-slide mode: process each "
                        "slide in column bands of at most this many clips "
                        "so host/device residency is bounded by the band, "
                        "not the slide (detections identical; excludes "
                        "--mesh/--pipelined)")
    args = parser.parse_args()

    from scd_resnet_tpu.core.compile_cache import enable_compilation_cache
    from scd_resnet_tpu.core.logging import Logger

    enable_compilation_cache()

    if (args.model is None) == (args.checkpoint is None):
        parser.error("exactly one of -m (traced bundle) or -c (checkpoint) "
                     "required")
    if args.mesh and not args.checkpoint:
        parser.error("--mesh requires -c (the traced path is host-tiled, "
                     "single-device)")
    if args.pipelined and not args.checkpoint:
        parser.error("--pipelined requires -c (the traced path has no "
                     "async dispatch)")
    if args.max_resident_clips and (args.mesh or args.pipelined):
        parser.error("--max-resident-clips bounds in-flight memory; "
                     "--mesh/--pipelined hold more in flight by design")

    if args.checkpoint:
        # live-model path: fused on-device tiling (infer/analyse.py
        # make_device_analyzer), one analyzer per slide geometry
        from scd_resnet_tpu.infer.analyse import make_device_analyzer
        from scd_resnet_tpu.infer.wrapper import load_wrapper

        wrapper = load_wrapper(args.checkpoint, args.arch)
        contract = wrapper.contract
        Logger.info(":: test.py :: serving checkpoint {} as {} with "
                    "device-fused tiling (contract '{}')".format(
                        args.checkpoint, args.arch, contract))

        bounds = None if args.keep_out_of_bounds else "slide"

        mesh = None
        if args.mesh:
            import jax

            from scd_resnet_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(jax.devices())
            Logger.info(":: test.py :: sharding clip batches over {} "
                        "device(s)".format(mesh.devices.size))

        analyzers = {}

        def analyse_one(path):
            gray = _grayscale_u8(path)[0]
            height, width = gray.shape
            if (width, height) not in analyzers:
                analyzers[(width, height)] = make_device_analyzer(
                    wrapper, width, height, dedupe_radius=args.dedupe,
                    mesh=mesh, bounds=bounds,
                    max_resident_clips=args.max_resident_clips)
            return analyzers[(width, height)](gray)
    else:
        from scd_resnet_tpu.infer.wrapper import load_traced

        model, input_shape = load_traced(args.model)
        contract = model.contract
        Logger.info(":: test.py :: loaded traced model, input {}, "
                    "contract '{}'".format(input_shape, contract))

        def analyse_one(path):
            return analyse_images(
                model, path, dedupe_radius=args.dedupe,
                batch_size=input_shape[0],
                bounds=None if args.keep_out_of_bounds else "slide",
                max_resident_clips=args.max_resident_clips)

    if args.fit and contract != "centerOffset":
        # fail BEFORE any device work: the contract is known at load time
        parser.error("--fit needs the Rhr row — only the centerOffset "
                     "contract carries minL/rad (got '{}')".format(contract))

    register = []
    if args.checkpoint and args.pipelined:
        # dispatch-all-then-finish: device programs for later slides run
        # while earlier slides' readback + stitch happen on the host
        futures = []
        for path in args.images:
            gray = _grayscale_u8(path)[0]
            height, width = gray.shape
            if (width, height) not in analyzers:
                analyzers[(width, height)] = make_device_analyzer(
                    wrapper, width, height, dedupe_radius=args.dedupe,
                    mesh=mesh, bounds=bounds)
            analyzer = analyzers[(width, height)]
            futures.append((path, analyzer, analyzer.dispatch(gray)))
        results = [(path, analyzer.finish(fut))
                   for path, analyzer, fut in futures]
    else:
        results = [(path, analyse_one(path)) for path in args.images]
    from scd_resnet_tpu.infer.analyse import CONTRACT_FIELDS

    fields = CONTRACT_FIELDS[contract]
    for path, detections in results:
        Logger.log("{}: {} detections".format(path, len(detections)))
        for det in detections:
            entry = {"image": path}
            entry.update(zip(fields, det))
            register.append(entry)

    # record every analyzed slide (not just ones with detections): F1
    # scoring needs zero-detection slides to keep their ground truth in
    # the denominator
    result = {"detections": register, "contract": contract,
              "images": list(args.images)}
    if args.fit and register:
        popt = fit_rhr([d["rhr"] for d in register])
        result["gauss2"] = {
            "a1": popt[0], "m1": popt[1], "s1": popt[2],
            "a2": popt[3], "m2": popt[4], "s2": popt[5],
        }
        Logger.info(":: test.py :: gauss2 fit: {}".format(result["gauss2"]))

    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)
        Logger.log("wrote {}".format(args.output))
    else:
        print(json.dumps(result))


if __name__ == "__main__":
    main()
