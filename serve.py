"""serve.py — persistent whole-slide inference service.

The deployment counterpart of test.py's one-shot client: load a model
once, own the device, and answer HTTP requests until stopped (the
reference deploys its traced model inside a long-lived libtorch C++
host — reference trace.py:15-17; this is the TPU-native equivalent).

Usage:
    python serve.py -c model.pth [-a centerOffsetRes10] [--port 8600]
    python serve.py -m traced.pt [--port 8600]

    curl -s -X POST --data-binary @slide.png \
        'http://127.0.0.1:8600/analyse?dedupe=16'
    curl -s http://127.0.0.1:8600/metrics
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(
        description="serve.py - persistent slide inference daemon.")
    parser.add_argument("-m", dest="model", type=str, default=None,
                        help="traced model bundle (.pt from trace.py)")
    parser.add_argument("-c", dest="checkpoint", type=str, default=None,
                        help="live checkpoint (.pth) — device-fused tiling")
    parser.add_argument("-a", dest="arch", type=str,
                        default="centerOffsetRes10",
                        help="model profile for -c")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8600)
    parser.add_argument("--dedupe", type=float, default=None,
                        help="default tile-overlap suppression radius (px)")
    parser.add_argument("--mesh", action="store_true",
                        help="with -c: shard clip batches over all devices")
    parser.add_argument("--warmup", action="append", default=[],
                        metavar="WxH", help="pre-compile the analyzer for "
                        "this slide geometry at startup (repeatable), e.g. "
                        "--warmup 3092x2056")
    args = parser.parse_args()

    from scd_resnet_tpu.core.compile_cache import enable_compilation_cache
    from scd_resnet_tpu.core.logging import Logger
    from scd_resnet_tpu.infer.server import InferenceService, create_server

    enable_compilation_cache()

    if (args.model is None) == (args.checkpoint is None):
        parser.error("exactly one of -m (traced) or -c (checkpoint) required")
    if args.mesh and not args.checkpoint:
        parser.error("--mesh requires -c (the traced path is host-tiled, "
                     "single-device)")

    if args.checkpoint:
        from scd_resnet_tpu.infer.wrapper import load_wrapper

        wrapper = load_wrapper(args.checkpoint, args.arch)
        mesh = None
        if args.mesh:
            import jax

            from scd_resnet_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(jax.devices())
            Logger.info(":: serve.py :: sharding clip batches over {} "
                        "device(s)".format(mesh.devices.size))
        service = InferenceService(wrapper=wrapper,
                                   dedupe_radius=args.dedupe, mesh=mesh)
        Logger.info(":: serve.py :: serving checkpoint {} as {}".format(
            args.checkpoint, args.arch))
    else:
        from scd_resnet_tpu.infer.wrapper import load_traced

        service = InferenceService(traced=load_traced(args.model),
                                   dedupe_radius=args.dedupe)
        Logger.info(":: serve.py :: serving traced bundle {}".format(
            args.model))

    for geom in args.warmup:
        width, height = (int(v) for v in geom.lower().split("x"))
        Logger.info(":: serve.py :: warming up {}x{} ...".format(
            width, height))
        seconds = service.warmup(width, height)
        Logger.info(":: serve.py :: compiled in {:.1f}s".format(seconds))

    server = create_server(service, args.host, args.port)
    Logger.info(":: serve.py :: listening on http://{}:{}".format(
        args.host, args.port))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        Logger.info(":: serve.py :: shutting down")
        server.shutdown()


if __name__ == "__main__":
    main()
